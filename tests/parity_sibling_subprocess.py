"""Oracle-parity sweep worker: the full ~280-query Spark-vs-DuckDB
comparison (plus the per-query physical-plan scale audit — see
test_oracle_parity._run_parity, which this reuses verbatim) in a SIBLING
PROCESS of the main suite.

Why a process, not a chunk test: the parity chunk was the suite's single
largest serial block (~67 s idle, the slowest test by 2×), and its cost is
dominated by GIL-bound py4j plan construction plus DuckDB oracle
evaluation — neither saturates the box, so a sibling process overlaps the
whole rest of the suite for nearly free wall-clock (the same measured
reasoning that moved the degenerate-input sweep out of process in r6:
in-process threading cost ~26 s; a sibling cost ~none).

Own Spark session, so the stateful queries' named sinks / persisted
indexes (already pid-keyed paths) and DataSource/UDF registrations cannot
collide with the main session's.

Launched by conftest.pytest_collection_finish when the join test
(test_z_parity_join.py) survives selection; joined there with full
per-query problem text.

Usage: python tests/parity_sibling_subprocess.py <sf_dir> <out_json>
"""
import json
import os
import sys
import time


def main(sf_dir: str, out_path: str) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from dbt_trill_shop_spark.session import get_spark
    from tests.test_oracle_parity import _CHUNKS, ORACLE_QUERIES, _run_parity

    spark = get_spark(
        app_name="trillshop-parity-sibling",
        master="local[16]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    problems: list[str] = []
    for chunk in _CHUNKS:
        problems += _run_parity(spark, sf_dir, chunk)
    result = {
        "n_queries": sum(len(c) for c in _CHUNKS),
        "n_expected": len(ORACLE_QUERIES),
        "elapsed_sec": round(time.time() - t0, 1),
        "problems": problems,
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(result, fh)
    os.replace(tmp, out_path)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
