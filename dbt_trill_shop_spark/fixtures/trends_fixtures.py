"""Google-trends-shaped source relations derived from the driver's testdata.

The reference's 4 sources (``models/staging/__sources.yml:3-90``) don't exist
in the test environment, so — per FIXTURES.md §B — each is derived
deterministically from the driver tables (`events`, `orders ⋈ customer ⋈
nation ⋈ region`).  The derivations are pure relational expressions (no
rand/now) so the DuckDB oracle (``fixtures/oracle.py``) can reproduce them
bit-for-bit.

Derivation summary (FIXTURES.md §B; deviation: ``country_code`` uses
``concat('C', n_nationkey)`` instead of ``substr(n_name, 1, 2)`` because the
synthetic nation names all share a 2-char prefix, which would collapse the
column to a constant and make the accepted-values/distinct-count tests vacuous):

- ``top_terms``            <- events: dma = user_id%50, term = event_type,
  week = date_trunc('week', ts), score = least(floor(value)%101, 100),
  rank = row_number() over (partition by week, dma order by score desc,
  event_id), refresh_date = max(date(ts)).
- ``top_rising_terms``     <- same + percent_gain = event_id % 1500.
- ``international_top_terms`` <- orders⋈customer⋈nation⋈region (broadcast
  dims): country = nation, region nullable via nullif(r_name,'AFRICA'),
  term = o_orderpriority, score/rank/refresh_date analogous.
- ``international_top_rising_terms`` <- same + percent_gain = o_orderkey%1500.

Scale posture: the only wide operation is the ranking window, partitioned by
(week, geo) — high-cardinality partition keys, so it shuffles evenly and never
single-partitions.  The scalar refresh_date is a broadcast cross join of a
1-row aggregate, not an ``over ()`` window (which would force all rows into
one partition at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def _with_refresh_date(df: DataFrame, dates: DataFrame) -> DataFrame:
    # dates is a 1-row (refresh_date) aggregate: broadcast cross join, so the
    # scalar reaches every partition without a shuffle.
    return df.crossJoin(F.broadcast(dates))


def top_terms(spark: SparkSession, sf_dir: str, rising: bool = False) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 50).alias("dma_id"),
        F.concat(F.lit("dma_"), (F.col("user_id") % 50).cast("string")).alias("dma_name"),
        F.col("event_type").alias("term"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.least(F.floor("value") % 101, F.lit(100)).alias("score"),
        F.col("event_id"),
    )
    w = Window.partitionBy("week", "dma_id").orderBy(F.desc("score"), F.asc("event_id"))
    ranked = base.withColumn("rank", F.row_number().over(w).cast("bigint"))
    dates = ev.agg(F.max(F.col("ts").cast("date")).alias("refresh_date"))
    out = _with_refresh_date(ranked, dates)
    cols = ["dma_id", "dma_name", "term", "week", "score", "rank", "refresh_date"]
    if rising:
        out = out.withColumn("percent_gain", F.col("event_id") % 1500)
        cols.append("percent_gain")
    return out.select(*cols)


def international_top_terms(
    spark: SparkSession, sf_dir: str, rising: bool = False
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # customer/nation/region are dimensions: broadcast them so the only big
    # relation (orders) never shuffles for the join.
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    base = joined.select(
        F.concat(F.lit("C"), F.col("n_nationkey").cast("string")).alias("country_code"),
        F.col("n_name").alias("country_name"),
        F.when(F.col("r_name") == "AFRICA", F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("R"), F.col("r_regionkey").cast("string")))
        .alias("region_code"),
        F.nullif(F.col("r_name"), F.lit("AFRICA")).alias("region_name"),
        F.col("o_orderpriority").alias("term"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week"),
        F.least(F.floor("o_totalprice") % 101, F.lit(100)).alias("score"),
        F.col("o_orderkey"),
    )
    w = Window.partitionBy("week", "country_name").orderBy(F.desc("score"), F.asc("o_orderkey"))
    ranked = base.withColumn("rank", F.row_number().over(w).cast("bigint"))
    dates = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("refresh_date"))
    out = _with_refresh_date(ranked, dates)
    cols = [
        "country_code",
        "country_name",
        "region_code",
        "region_name",
        "term",
        "week",
        "score",
        "rank",
        "refresh_date",
    ]
    if rising:
        out = out.withColumn("percent_gain", F.col("o_orderkey") % 1500)
        cols.append("percent_gain")
    return out.select(*cols)


def register_trends_sources(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build all 4 derived sources and register them as temp views."""
    out = {
        "top_terms": top_terms(spark, sf_dir, rising=False),
        "top_rising_terms": top_terms(spark, sf_dir, rising=True),
        "international_top_terms": international_top_terms(spark, sf_dir, rising=False),
        "international_top_rising_terms": international_top_terms(spark, sf_dir, rising=True),
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out
