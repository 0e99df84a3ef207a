"""The bench regression gate is BINDING (VERDICT r3 #3): >1.5x slowdowns with
>0.3 s absolute delta fail `python bench.py` (exit 2) unless the query carries
a justification in bench_allowlist.json.  These tests pin the pure gate logic
and the repo invariants (allowlist entries are real queries with real
reasons) without needing a Spark session or a bench run."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import check_regressions, gate_should_fail  # noqa: E402


def test_flags_only_material_slowdowns():
    baseline = {"a": 1.0, "b": 0.1, "c": 2.0, "d": 0.5}
    timings = {
        "a": 1.6,   # 1.6x and +0.6s -> flagged
        "b": 0.25,  # 2.5x but only +0.15s -> noise, not flagged
        "c": 2.5,   # +0.5s but only 1.25x -> not flagged
        "d": 0.74,  # 1.48x -> not flagged
        "e": 9.9,   # no baseline -> not flagged
    }
    assert check_regressions(timings, baseline) == {"a": [1.0, 1.6]}


def test_allowlist_suppresses_named_queries_only():
    baseline = {"a": 1.0, "b": 1.0}
    timings = {"a": 2.0, "b": 2.0}
    out = check_regressions(timings, baseline, {"a": "intentional rewrite"})
    assert out == {"b": [1.0, 2.0]}


def test_empty_inputs():
    assert check_regressions({}, {}) == {}
    assert check_regressions({"a": 1.0}, {}) == {}


def test_gate_exit_decision():
    regs = {"a": [1.0, 2.0]}
    assert gate_should_fail(regs, {})
    assert not gate_should_fail({}, {})
    # disabled gate never fails
    assert not gate_should_fail(regs, {"SPARK_GRAFT_BENCH_GATE": "0"})
    # an intentional baseline refresh must not fail its own invocation
    assert not gate_should_fail(regs, {"SPARK_GRAFT_BENCH_UPDATE": "1"})
    assert gate_should_fail(regs, {"SPARK_GRAFT_BENCH_UPDATE": "0"})


def test_committed_allowlist_is_valid():
    path = os.path.join(REPO, "bench_allowlist.json")
    with open(path) as fh:
        allow = json.load(fh)
    assert isinstance(allow, dict)
    from dbt_trill_shop_spark.harness import QUERIES

    for name, reason in allow.items():
        assert name in QUERIES, f"allowlisted unknown query {name}"
        assert isinstance(reason, str) and len(reason) >= 20, (
            f"allowlist entry {name} needs a real justification"
        )
