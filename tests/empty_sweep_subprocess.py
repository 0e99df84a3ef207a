"""Empty-input sweep worker: run EVERY registered query against zero-row
parquet twins of the tables and report crashes.

Fully-filtered shards and empty partitions are routine at 100 TB; a query
that throws on them has a latent bug (the r6 sweep that introduced this
found exactly one — bm25 index search crashed schema inference twice on an
empty corpus).  Empty OUTPUT is fine; exceptions are not.

Runs as a SIBLING PROCESS of the main suite (launched at collection time by
test_zscale_empty_sweep.py): per-query cost is dominated by GIL-bound py4j
plan construction, which an in-process thread pool cannot parallelize — the
r6 in-chunk attempt cost ~26 s of suite wall; a second process overlaps the
whole suite and costs ~none.  Own Spark session, so the stateful queries'
named sinks/indexes can't collide with the main session's.

Usage: python tests/empty_sweep_subprocess.py <schema_sf_dir> <out_json>
"""
import json
import os
import sys
import tempfile
import time
import traceback


def main(schema_sf_dir: str, out_path: str) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import pyarrow.parquet as pq

    empty_dir = tempfile.mkdtemp(prefix="sf_empty_")
    for f in os.listdir(schema_sf_dir):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(schema_sf_dir, f))
            pq.write_table(schema.empty_table(), os.path.join(empty_dir, f))

    from dbt_trill_shop_spark.harness import QUERIES
    from dbt_trill_shop_spark.session import get_spark

    spark = get_spark(
        app_name="trillshop-empty-sweep", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    failures: dict[str, str] = {}
    for name, spec in sorted(QUERIES.items()):
        try:
            # fn() captures driver-side eager work (collect loops, index
            # builds, createDataFrame) and analysis; count() the execution.
            spec.fn(spark, empty_dir).count()
        except Exception:
            failures[name] = traceback.format_exc()
    result = {
        "n_queries": len(QUERIES),
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
