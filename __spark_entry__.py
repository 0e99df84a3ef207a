"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``dbt_trill_shop_spark`` package; this module is
a thin adapter over ``dbt_trill_shop_spark.harness``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_trill_shop_spark import harness  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: ``weekly_trends_summary`` —
    the reference's widest model (4-source aggregate + 3-level UNION ALL +
    CASE/LIKE + ORDER BY, models/marts/weekly_trends_summary.sql:1-110)."""
    return harness.QUERIES["weekly_trends_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    return harness.oracle_sql()
