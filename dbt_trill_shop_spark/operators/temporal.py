"""Temporal join operators: as-of join and range (band) join.

The reference's warehouse targets provide these natively (e.g. Snowflake
ASOF JOIN); Spark has no built-in as-of join, so we implement it the
scalable way — the **union + window** formulation:

    tag left/right streams -> union -> single shuffle on (key) ->
    sort within partition by (ts, side) -> last_value(right attrs,
    ignoreNulls) over rows unbounded-preceding..current -> keep left rows.

One shuffle total, no range-explode, no per-key skew blowup beyond the
window sort — this is the plan you want at 100 TB (a sort-merge-join-like
pass).  A broadcast-range variant is NOT used because the right side is a
full stream, not a small dim.

The range join here is the other shape: a fact column banded into a small
interval dimension — a broadcast non-equi join, which Catalyst executes as
BroadcastNestedLoopJoin over a tiny build side (fine: build side is O(10)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row of the
    same ``on`` key with ``right.ts <= left.ts`` (ties: right row counts).

    ``right`` must be unique per (on, ts) — pre-aggregate if not.
    Returns all left columns + right_cols (null when no prior right row).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    # align schemas positionally for the union: left cols + right-only cols
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    left_only = [c for c in left.columns if c not in right.columns and c not in right_cols]
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*lt.columns)

    w = (
        Window.partitionBy(on)
        .orderBy(F.asc(ts), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        *[c for c in lt.columns if c not in right_cols and c != "_side"],
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every non-purchase event: the user's most recent purchase at or
    before the event's timestamp (event time join — the trades/quotes
    canonical as-of, DuckDB `ASOF JOIN` as the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    others = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    joined = asof_join(
        others, purchases, on="user_id", ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        "purchase_event_id",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


ASOF_PURCHASES_SQL = """
SELECT e.event_id, e.user_id, e.event_type,
       p.event_id AS purchase_event_id,
       ROUND(p.value, 6) AS purchase_value
FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


# static band dimension: value ranges -> named tier (broadcast non-equi join)
VALUE_BANDS: list[tuple[float, float, str]] = [
    (0.0, 50.0, "nano"),
    (50.0, 150.0, "small"),
    (150.0, 300.0, "mid"),
    (300.0, 1e18, "large"),
]


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/interval join: each event's value matched to its [lo, hi) tier.
    The band table is tiny and broadcast; Catalyst runs a broadcast
    nested-loop join — the right physical plan for a non-equi join with an
    O(10) build side.  Aggregated to per-tier stats so the output is compact.
    """
    ev = load_table(spark, sf_dir, "events")
    # inline VALUES (LocalRelation), not createDataFrame: the latter goes
    # through a Python RDD (applySchemaToPythonRDD -> python workers) and
    # can't be broadcast-planned without running a job.
    rows = ", ".join(
        f"(CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE), '{t}')" for lo, hi, t in VALUE_BANDS
    )
    bands = spark.sql(f"SELECT * FROM VALUES {rows} AS bands(lo, hi, tier)")
    joined = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
        "inner",
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("tier")
    )


_BANDS_SQL_ROWS = ", ".join(f"({lo}, {hi}, '{t}')" for lo, hi, t in VALUE_BANDS)

RANGE_JOIN_VALUE_BANDS_SQL = f"""
WITH bands(lo, hi, tier) AS (VALUES {_BANDS_SQL_ROWS})
SELECT tier,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id) AS unique_users
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY tier
ORDER BY tier
"""
