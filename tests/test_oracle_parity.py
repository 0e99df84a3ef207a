"""Pre-flight of the driver's correctness gate: every oracle-backed query in
the harness must match DuckDB exactly (columns, row count, order-insensitive
values) at the test scale factor.

The ~280 comparisons dominate suite wall-clock, so they run in 4 large CHUNKS
with a 12-thread pool per chunk (Spark job submission and DuckDB both release
the GIL; each thread gets its own DuckDB connection); few, large chunks
amortize the end-of-chunk straggler barrier.  Stateful queries — those that
register named sinks/tables (streaming memory sinks, persisted indexes,
bucketed saveAsTable, Python DataSource registration) — collide only with
each other, so they run on a dedicated single-worker lane that overlaps the
pure pool.

Targeted single-query runs: PARITY_ONLY=name1,name2 pytest
tests/test_oracle_parity.py -k only
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from dbt_trill_shop_spark.harness import QUERIES

from .oracle_utils import compare, duck_connection, oracle_frame

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


_N_CHUNKS = 4
_CHUNK = -(-len(ORACLE_QUERIES) // _N_CHUNKS)
_CHUNKS = [
    ORACLE_QUERIES[i : i + _CHUNK] for i in range(0, len(ORACLE_QUERIES), _CHUNK)
]


def _run_parity(spark, sf_dir, names: list[str]) -> list[str]:
    tl = threading.local()

    def one(name: str) -> tuple[str, list[str]]:
        con = getattr(tl, "con", None)
        if con is None:
            con = tl.con = duck_connection(sf_dir)
        spec = QUERIES[name]
        try:
            probs = compare(spec.fn(spark, sf_dir), oracle_frame(con, spec.oracle))
        except Exception as e:  # surface per-query, don't kill the chunk
            probs = [f"exception: {type(e).__name__}: {e}"]
        return name, probs

    stateful = [n for n in names if _is_stateful(n)]
    pure = [n for n in names if not _is_stateful(n)]
    # Stateful queries are serialized among THEMSELVES (named sinks/tables
    # collide stateful-vs-stateful, not stateful-vs-pure), so give them a
    # dedicated single-worker lane that overlaps with the pure pool instead
    # of dead-time at the head of the chunk.
    with ThreadPoolExecutor(max_workers=1) as ser, ThreadPoolExecutor(
        max_workers=12
    ) as ex:
        futs = [ser.submit(one, n) for n in stateful]
        results = list(ex.map(one, pure)) + [f.result() for f in futs]
    return [f"{n}: " + "; ".join(p) for n, p in results if p]


@pytest.mark.parametrize(
    "chunk",
    [pytest.param(c, id=f"chunk{i:02d}_{c[0]}") for i, c in enumerate(_CHUNKS)],
)
def test_matches_oracle(spark, sf_dir, chunk):
    bad = _run_parity(spark, sf_dir, chunk)
    assert not bad, "\n".join(bad)


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
            assert df.count() >= 0, name
