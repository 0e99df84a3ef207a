"""The bench regression gate is BINDING (VERDICT r3 #3): >1.5x slowdowns with
>0.3 s absolute delta fail `python bench.py` (exit 2) unless the query carries
a justification in bench_allowlist.json.  Per VERDICT r4's process note the
thresholds are normalized by the sweep-median slowdown so a uniformly
contended box (the r04 rc=2 artifact) doesn't cry wolf.  These tests pin the
pure gate logic and the repo invariants (allowlist entries are real queries
with real reasons) without needing a Spark session or a bench run."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import check_regressions, gate_should_fail, sweep_slowdown  # noqa: E402


# A fleet of stable queries pins the sweep-median slowdown at 1.0 so the
# per-query threshold tests exercise the un-normalized gate arithmetic.
_STABLE = {f"s{i}": 1.0 for i in range(10)}


def test_flags_only_material_slowdowns():
    baseline = {"a": 1.0, "b": 0.1, "c": 2.0, "d": 0.5, **_STABLE}
    timings = {
        "a": 1.6,   # 1.6x and +0.6s -> flagged
        "b": 0.25,  # 2.5x but only +0.15s -> noise, not flagged
        "c": 2.5,   # +0.5s but only 1.25x -> not flagged
        "d": 0.74,  # 1.48x -> not flagged
        "e": 9.9,   # no baseline -> not flagged
        **_STABLE,
    }
    assert check_regressions(timings, baseline) == {"a": [1.0, 1.6]}


def test_allowlist_suppresses_named_queries_only():
    baseline = {"a": 1.0, "b": 1.0, **_STABLE}
    timings = {"a": 2.0, "b": 2.0, **_STABLE}
    out = check_regressions(timings, baseline, {"a": "intentional rewrite"})
    assert out == {"b": [1.0, 2.0]}


def test_contended_sweep_is_normalized_not_flagged():
    """r04 failure mode: the driver box ran the bench under heavy contention
    and EVERY query came back 2-5x slower.  The sweep-median normalizer must
    absorb the uniform slowdown while still flagging the one genuine
    outlier that regressed far beyond the environmental factor."""
    baseline = {f"q{i}": 1.0 for i in range(20)}
    contended = {f"q{i}": 2.5 for i in range(20)}  # uniform 2.5x
    assert check_regressions(contended, baseline) == {}
    outlier = dict(contended, q0=10.0)  # 10x vs the sweep's 2.5x
    assert check_regressions(outlier, baseline) == {"q0": [1.0, 10.0]}


def test_sweep_slowdown_floor_and_tiny_query_exclusion():
    baseline = {"a": 1.0, "b": 1.0, "c": 0.05}
    # faster-than-baseline box floors at 1.0 (never excuses regressions)
    assert sweep_slowdown({"a": 0.5, "b": 0.5, "c": 0.05}, baseline) == 1.0
    # sub-0.2s baseline entries don't enter the median
    assert sweep_slowdown({"a": 2.0, "b": 2.0, "c": 5.0}, baseline) == 2.0
    # no usable ratios -> neutral factor
    assert sweep_slowdown({}, {}) == 1.0


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


def test_gate_env_factor_hard_ceiling():
    """ADVICE r5: the sweep-median normalizer is blind to a regression
    touching >50% of queries (the median absorbs it).  A sweep slowdown
    past 2.0x therefore fails the gate even with zero per-query flags,
    unless explicitly acknowledged as a known-contended environment."""
    assert not gate_should_fail({}, {}, env_factor=1.9)
    assert gate_should_fail({}, {}, env_factor=2.1)
    # explicit ack: the user vouches the box is contended, not the code
    assert not gate_should_fail(
        {}, {"SPARK_GRAFT_BENCH_ENV_ACK": "1"}, env_factor=2.1
    )
    # disabled gate / baseline refresh still short-circuit
    assert not gate_should_fail(
        {}, {"SPARK_GRAFT_BENCH_GATE": "0"}, env_factor=5.0
    )
    assert not gate_should_fail(
        {}, {"SPARK_GRAFT_BENCH_UPDATE": "1"}, env_factor=5.0
    )
    # the ack does NOT suppress confirmed per-query regressions
    assert gate_should_fail(
        {"a": [1.0, 2.0]}, {"SPARK_GRAFT_BENCH_ENV_ACK": "1"}, env_factor=2.1
    )


def test_gate_judges_quieter_of_sweep_and_confirm_factor():
    """ADVICE r6: the 2.0x ceiling must judge min(sweep, confirm) when the
    sentinel re-probe ran — a transient contention spike during the sweep
    exits 2 otherwise, despite fresh evidence the box is quiet again."""
    from bench import gate_env_factor

    # spike during sweep, quiet confirm -> ceiling clears
    assert not gate_should_fail(
        {}, {}, env_factor=gate_env_factor(2.4, 1.1)
    )
    # genuinely contended both times -> ceiling still fails
    assert gate_should_fail({}, {}, env_factor=gate_env_factor(2.4, 2.2))
    # no sentinel re-probe ran -> the sweep factor stands
    assert gate_env_factor(2.4, None) == 2.4
    # a NOISIER confirm pass cannot raise the verdict past the sweep's own
    assert gate_env_factor(1.3, 2.8) == 1.3


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


def test_gate_skipped_on_core_count_mismatch():
    """VERDICT r13 #2: the committed baseline is a 32-core record; judging an
    8-core probe against it manufactures regressions out of the core-count
    mismatch.  The gate applies only when the run's core count matches the
    baseline's recorded one (legacy baselines without a record keep the old
    always-judge behavior)."""
    from bench import gate_cpus_match

    assert gate_cpus_match(32, 32)
    assert not gate_cpus_match(8, 32)
    assert not gate_cpus_match(32, 8)
    # legacy baseline with no recorded core count -> gate still applies
    assert gate_cpus_match(8, None)


def test_committed_baseline_records_core_count():
    path = os.path.join(REPO, "bench_baseline.json")
    with open(path) as fh:
        base = json.load(fh)
    cpus = base.get("_cpus", {})
    for sf in base:
        if sf.startswith("_"):
            continue
        assert sf in cpus and isinstance(cpus[sf], int), (
            f"baseline for sf {sf} must record its core count"
        )


def test_per_query_lines_are_chunked_and_lossless():
    """VERDICT r13 #1: per-query timings must reach the driver's bounded
    output tail — every emitted line stays under the limit and the union of
    chunks reproduces the full timings dict exactly."""
    from bench import chunk_query_lines

    q = {f"q_some_rather_long_query_name_{i:03d}": round(0.01 * i, 2) for i in range(400)}
    lines = chunk_query_lines(q)
    merged: dict = {}
    for line in lines:
        assert len(line) <= 1800
        payload = json.loads(line)
        assert set(payload) == {"queries"}
        merged.update(payload["queries"])
    assert merged == q
    # tiny dicts come out as one line; empty input emits nothing
    assert len(chunk_query_lines({"a": 1.0})) == 1
    assert chunk_query_lines({}) == []
    # an oversized single entry still gets emitted rather than dropped
    big = {"x" * 2500: 1.0}
    assert json.loads(chunk_query_lines(big)[0])["queries"] == big


def test_confirmation_pass_clears_flakes_keeps_regressions():
    from bench import still_regressed

    # a sweep flake that re-runs at baseline speed is cleared
    assert not still_regressed(0.32, 0.311, 1.0)
    # a genuine regression reproduces on the warm re-run
    assert still_regressed(2.1, 0.45, 1.0)
    # the contention normalizer scales the threshold for the re-run too:
    # adj = 0.45*1.3 = 0.585 -> 0.87 is under 1.5*adj, 0.9 is over both bars
    assert not still_regressed(0.87, 0.45, 1.3)
    assert still_regressed(0.9, 0.45, 1.3)
