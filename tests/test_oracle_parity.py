"""Pre-flight of the driver's correctness gate: every oracle-backed query in
the harness must match DuckDB exactly (columns, row count, order-insensitive
values) at the test scale factor.

Every query's physical plan ALSO passes the mechanical scale audit here
(VERDICT r5 #2 — promoted out of opt-in): the DataFrame is already built for
the comparison, so the audit costs one plan-string render + regex per query,
and a refactor that reintroduces a corpus-scaled single-task shape fails the
DEFAULT suite the round it lands (the failure mode that bit
curation_pipeline_v2 in r5: a pipeline inlining a stale shape of a
since-fixed library op).  Rows-only queries get the same audit in
test_rows_only_queries_run, so the full registry is covered.

Empty-input robustness for the full registry lives in
test_zscale_empty_sweep.py: a parallel subprocess runs every query against
zero-row twins of the tables while this suite runs (plan construction is
GIL-bound, so doing it in-process here cost ~26 s of wall; a sibling process
costs ~none).

The ~280 comparisons dominate suite wall-clock, so they run as ONE
cost-ordered chunk with a thread pool (Spark job submission and DuckDB
both release the GIL; each thread gets its own DuckDB connection), and —
since r7 — in a SIBLING PROCESS that overlaps the whole suite (the chunk
was the largest serial block at ~67 s idle and is GIL-/oracle-bound, not
box-bound; same reasoning as the degenerate-input sweep).  This module
keeps the chunk construction and _run_parity executor; the subprocess
(parity_sibling_subprocess.py) imports them verbatim and the join test
lives in test_z_parity_join.py.  Stateful queries — those that register
named sinks/tables (streaming memory sinks, persisted indexes, Python
DataSource registration) — run on a narrower 4-worker lane that overlaps
the pure pool (see _run_parity).

Targeted single-query runs: PARITY_ONLY=name1,name2 pytest
tests/test_oracle_parity.py -k only
Full parity, in one targeted run: pytest tests/test_z_parity_join.py
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from dbt_trill_shop_spark.harness import QUERIES
from dbt_trill_shop_spark.operators.plan_audit import (
    SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION,
    audit_plan,
)

from .oracle_utils import compare, duck_connection, oracle_frame


def _audit(name: str, df) -> list[str]:
    """Scale-audit one query's physical plan, minus its allowlisted
    bounded-by-construction single-partition shapes."""
    flags = audit_plan(df)
    if name in SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION:
        flags = [f for f in flags if not f.startswith("single-partition")]
    return [f"plan: {f}" for f in flags]

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]

# Queries that mutate shared session/catalog state (named memory sinks,
# saveAsTable, persisted index files, DataSource registration): never run two
# of these concurrently.
_STATEFUL_PREFIXES = ("s_stream_",)
_STATEFUL_NAMES = {
    "x_ivfpq_index_search",
    "x_bm25_index_search",
    "q_python_datasource",
    "q_sql_udf_macros",
}


def _is_stateful(name: str) -> bool:
    return name.startswith(_STATEFUL_PREFIXES) or name in _STATEFUL_NAMES


_N_CHUNKS = 1
# One chunk: with per-chunk thread pools, chunks SERIALIZE as separate
# pytest tests, so every extra chunk adds a straggler barrier (round 5
# measured 2 chunks at 37 s + 29 s = 66 s vs 60 s as one; 4 chunks were
# worse still).  LPT over one bin degenerates to longest-first ordering,
# which is exactly the makespan-minimizing submission order for the pool.
# The machinery keeps the k-way form in case memory pressure ever forces
# chunking back.  LPT greedy over the committed sf0.1
# baseline timings (plus a fixed per-query floor for sf0.001 overhead)
# balances each lane; stateful queries pack separately because their lane is
# serial within a chunk, and the heaviest stateful bin pairs with the
# lightest pure bin.
_BASE_TIMINGS: dict[str, float] = {}
_bp = os.path.join(os.path.dirname(__file__), "..", "bench_baseline.json")
if os.path.exists(_bp):
    with open(_bp) as _fh:
        import json as _json

        _BASE_TIMINGS = _json.load(_fh).get("0.1", {})


def _lpt(names: list[str], k: int) -> list[list[str]]:
    """Longest-processing-time greedy: deterministic k-way balance by
    estimated cost (baseline timing + 0.15 s fixed overhead floor)."""
    bins: list[list[str]] = [[] for _ in range(k)]
    loads = [0.0] * k
    for n in sorted(names, key=lambda n: (-_BASE_TIMINGS.get(n, 0.3), n)):
        i = loads.index(min(loads))
        bins[i].append(n)
        loads[i] += _BASE_TIMINGS.get(n, 0.3) + 0.15
    return bins


def _est(names: list[str]) -> float:
    return sum(_BASE_TIMINGS.get(n, 0.3) + 0.15 for n in names)


_sbins = sorted(_lpt([n for n in ORACLE_QUERIES if _is_stateful(n)], _N_CHUNKS),
                key=_est)
_pbins = sorted(_lpt([n for n in ORACLE_QUERIES if not _is_stateful(n)],
                     _N_CHUNKS), key=_est, reverse=True)
_CHUNKS = [s + p for s, p in zip(_sbins, _pbins)]


def _run_parity(spark, sf_dir, names: list[str]) -> list[str]:
    tl = threading.local()

    def one(name: str) -> tuple[str, list[str]]:
        con = getattr(tl, "con", None)
        if con is None:
            con = tl.con = duck_connection(sf_dir)
        spec = QUERIES[name]
        try:
            df = spec.fn(spark, sf_dir)
            probs = _audit(name, df) + compare(df, oracle_frame(con, spec.oracle))
        except Exception as e:  # surface per-query, don't kill the chunk
            probs = [f"exception: {type(e).__name__}: {e}"]
        return name, probs

    stateful = [n for n in names if _is_stateful(n)]
    pure = [n for n in names if not _is_stateful(n)]
    # Stateful queries get their own narrower lane overlapping the pure
    # pool.  They are safe to run concurrently with each other — streaming
    # memory sinks are uuid-named and the drain's session-conf override is
    # reference-counted (streaming/events.py run_stream_to_memory), and the
    # index/datasource/udf singletons each touch distinct resources — but
    # each holds state-store + sink memory, so the lane is kept narrow
    # rather than merged into the pure pool.
    with ThreadPoolExecutor(max_workers=4) as ser, ThreadPoolExecutor(
        max_workers=24
    ) as ex:
        futs = [ser.submit(one, n) for n in stateful]
        results = list(ex.map(one, pure)) + [f.result() for f in futs]
    return [f"{n}: " + "; ".join(p) for n, p in results if p]


_ONLY = [n for n in os.environ.get("PARITY_ONLY", "").split(",") if n]
if _ONLY:

    @pytest.mark.parametrize("name", _ONLY)
    def test_only(spark, sf_dir, name):
        assert name in QUERIES, name
        spec = QUERIES[name]
        assert spec.oracle is not None, f"{name} has no oracle"
        con = duck_connection(sf_dir)
        probs = compare(spec.fn(spark, sf_dir), oracle_frame(con, spec.oracle))
        assert not probs, f"{name}: " + "; ".join(probs)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert not _audit(name, df), (name, _audit(name, df))
            # noop write, not count(): count() lets Catalyst prune output
            # columns, so a crash inside a result expression never
            # evaluates (the r7 noop-sweep lesson)
            df.write.mode("overwrite").format("noop").save()
