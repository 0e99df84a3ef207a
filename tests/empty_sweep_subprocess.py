"""Degenerate-input sweep worker: run EVERY registered query against
zero-row AND one-row parquet twins of the tables and report crashes.

Fully-filtered shards, empty partitions, and tiny post-filter strata are
routine at 100 TB; a query that throws on them has a latent bug.  Each
sweep class found exactly one real defect when introduced in r6:

- empty: ``x_bm25_index_search`` crashed schema inference twice on an
  empty corpus (createDataFrame without schema; part-less parquet dir).
- one-row: ``q_bootstrap_ci`` hit ANSI DIVIDE_BY_ZERO — a Poisson replica
  whose every row draws weight 0 has sum(w) = 0 (certain at n=1).

Empty/degenerate OUTPUT is fine; exceptions are not.

Runs as a SIBLING PROCESS of the main suite (launched at collection time by
test_zscale_empty_sweep.py): per-query cost is dominated by GIL-bound py4j
plan construction, which an in-process thread pool cannot parallelize — the
r6 in-chunk attempt cost ~26 s of suite wall; a second process overlaps the
whole suite.  Own Spark session, so the stateful queries' named
sinks/indexes can't collide with the main session's.

Usage: python tests/empty_sweep_subprocess.py <schema_sf_dir> <out_json>
"""
import json
import os
import sys
import tempfile
import time
import traceback


def _twin_dir(schema_sf_dir: str, n_rows: int) -> str:
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix=f"sf_{n_rows}row_")
    for f in os.listdir(schema_sf_dir):
        if f.endswith(".parquet"):
            src = os.path.join(schema_sf_dir, f)
            if n_rows == 0:
                pq.write_table(
                    pq.read_schema(src).empty_table(), os.path.join(d, f)
                )
            else:
                pq.write_table(
                    pq.read_table(src).slice(0, n_rows), os.path.join(d, f)
                )
    return d


def main(schema_sf_dir: str, out_path: str) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from dbt_trill_shop_spark.harness import QUERIES
    from dbt_trill_shop_spark.session import get_spark

    spark = get_spark(
        app_name="trillshop-degenerate-sweep", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    failures: dict[str, str] = {}
    n_run = 0
    for label, n_rows in (("empty", 0), ("onerow", 1)):
        twin = _twin_dir(schema_sf_dir, n_rows)
        for name, spec in sorted(QUERIES.items()):
            n_run += 1
            try:
                # fn() captures driver-side eager work (collect loops, index
                # builds, createDataFrame) and analysis; count() the
                # execution.
                spec.fn(spark, twin).count()
            except Exception:
                failures[f"{label}:{name}"] = traceback.format_exc()
    result = {
        "n_queries": n_run,
        "elapsed_sec": round(time.time() - t0, 1),
        "failures": failures,
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(result, fh)
    os.replace(tmp, out_path)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
