"""Relational harness operators over the TPC-H-shaped driver tables.

The reference's models contain zero joins/windows (SURVEY.md §2.3, §2.5 —
the jaffle template's joins were deleted), but the engine must expose the full
relational surface; these operators exercise it on the driver's tables:
hash aggregation, broadcast + shuffle joins, semi/anti joins, window ranking,
top-k, and the ``cents_to_dollars`` macro (``macros/cents_to_dollars.sql``).

Cross-engine exactness: money columns are 2-decimal doubles; every aggregate
converts them to *scaled integers* first (``cast(round(x*100, 0) as bigint)``)
so sums are exact integer arithmetic and the final division back to double is
bit-identical in any engine.  (``round(x*100, 0)`` yields an integral-valued
double, so the bigint cast is exact — this sidesteps the Spark-truncates /
DuckDB-rounds difference in double->int casts.)  At 100 TB the same pattern
holds (bigint sums overflow only past ~9e16 dollars); the decimal(38) variants
in ``functions.macros`` are the escape hatch.

Scale notes per operator are inline: broadcast hints on dimension sides,
pushed-down scan filters, pre-aggregation before joins where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import cents_to_dollars


def cents(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped: scan-filter-aggregate with map-side partial agg.

    The shipdate filter is pushed to the parquet scan (PushedFilters); the
    groupBy keys are low-cardinality so AQE coalesces post-shuffle partitions.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    df = li.select(
        "l_returnflag",
        "l_linestatus",
        cents("l_quantity").alias("qty_c"),
        cents("l_extendedprice").alias("price_c"),
        cents("l_discount").alias("disc_c"),
        cents("l_tax").alias("tax_c"),
    )
    n = F.count(F.lit(1))
    # Accumulator widths are sized to the 100 TB worst case (4 groups, so
    # each accumulates ~the whole corpus).  The centi-/basis-point-cents
    # PRODUCT sums reach ~1e22 with normal prices — decimal(38,0) (int128,
    # exact, what DuckDB's integer SUM already widens to); a long would
    # trap under ANSI (and WRAP SILENTLY without it).  The plain cents
    # sums top out ~3e18 (3x inside int64) and stay long — the fast
    # codegen path — with ANSI as the loud tripwire beyond that.
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qty_c").cast("double") / 100.0).alias("sum_qty"),
            (F.sum("price_c").cast("double") / 100.0).alias("sum_base_price"),
            (
                F.sum(d38(F.col("price_c") * (100 - F.col("disc_c")))).cast("double")
                / 10000.0
            ).alias("sum_disc_price"),
            (
                F.sum(
                    d38(F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c")))
                ).cast("double")
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum("qty_c").cast("double") / n / 100.0).alias("avg_qty"),
            (F.sum("price_c").cast("double") / n / 100.0).alias("avg_price"),
            (F.sum("disc_c").cast("double") / n / 100.0).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty_c)  AS DOUBLE) / 100.0  AS sum_qty,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(qty_c)  AS DOUBLE) / COUNT(*) / 100.0 AS avg_qty,
       CAST(SUM(price_c) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price,
       CAST(SUM(disc_c) AS DOUBLE) / COUNT(*) / 100.0 AS avg_disc,
       COUNT(*) AS count_order
FROM (
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(l_quantity * 100, 0) AS BIGINT)      AS qty_c,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
           CAST(ROUND(l_discount * 100, 0) AS BIGINT)      AS disc_c,
           CAST(ROUND(l_tax * 100, 0) AS BIGINT)           AS tax_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-01-01'
) t
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: one fact (lineitem) joined through orders to
    broadcast dimensions (customer/nation/region).  Only the lineitem⋈orders
    join shuffles; dims ride along broadcast-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # decimal(38,0) accumulator: 25 nation groups each hold ~1/25 of the
    # corpus, so the centi-cents product sum passes int64 (~9.2e18) well
    # before 100 TB with normal prices (see SCALE.md group-size rule)
    revenue_c = F.sum(
        (cents("l_extendedprice") * (100 - cents("l_discount"))).cast("decimal(38,0)")
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            (revenue_c.cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
        .orderBy("r_name", "n_name")
    )


REGIONAL_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0
           AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Join + agg + deterministic top-k (revenue desc, custkey tiebreak).

    Pre-aggregates orders by o_custkey *before* joining customer, so the join
    input is one row per customer, and the dimension join broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return (
        per_cust.join(F.broadcast(customer), per_cust.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "revenue", "order_count")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


def customer_order_ranks(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Windowed ranking (SURVEY.md §2.5 W1): top-k orders per customer.

    Window partitioned by o_custkey — high cardinality, shuffles evenly; the
    rank filter cuts the output before anything else consumes it."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            cents("o_totalprice").alias("total_cents"),
            "rnk",
        )
    )


CUSTOMER_ORDER_RANKS_SQL = """
SELECT o_custkey AS c_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
       rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
    FROM orders
) t
WHERE rnk <= 3
"""


def priority_large_qty(spark: SparkSession, sf_dir: str, min_qty: float = 45.0) -> DataFrame:
    """Left-semi join (EXISTS): orders having any line with quantity >= 45.
    The quantity filter pushes to the lineitem scan; the semi join keeps only
    the key column on the build side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= min_qty)
    hits = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return (
        hits.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


PRIORITY_LARGE_QTY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders, per segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    no_orders = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS customer_count,
       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def part_dollars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cents_to_dollars macro surface (macros/cents_to_dollars.sql:16,
    BigQuery variant): integer cents -> 2-decimal dollars."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        cents("p_retailprice").alias("price_cents"),
        cents_to_dollars(cents("p_retailprice")).alias("price_dollars"),
    )


PART_DOLLARS_SQL = """
SELECT p_partkey, p_name,
       CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
       ROUND(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) / 100, 2) AS price_dollars
FROM part
"""


def events_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event rollup over the stream-shaped table: the batch twin of the
    streaming windowed aggregation (per-week tumbling window)."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return (
        ev.select(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            "event_type",
            "user_id",
            cents("value").alias("value_c"),
        )
        .groupBy("week", "event_type")
        .agg(
            n.alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            (F.sum("value_c").cast("double") / 100.0).alias("total_value"),
            (F.sum("value_c").cast("double") / n / 100.0).alias("avg_value"),
        )
        .orderBy("week", "event_type")
    )


EVENTS_WEEKLY_SQL = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
       COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0 AS avg_value
FROM events
GROUP BY CAST(date_trunc('week', ts) AS DATE), event_type
ORDER BY week, event_type
"""


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type profile incl. exact distinct users and min/max of the raw
    double (min/max of identical doubles are bit-identical cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


EVENT_TYPE_STATS_SQL = """
SELECT event_type, COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS unique_users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def purchasers_vs_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface beyond the reference's UNION ALL (SURVEY.md §2.6
    notes INTERSECT/EXCEPT are absent there; the warehouse provides them, so
    the engine does too): users who click AND purchase (INTERSECT) plus users
    who click but never purchase (EXCEPT), labeled and unioned.  Spark
    ``intersect``/``exceptAll``-free formulation is not needed — the built-in
    set operators compile to aggregate/semi-join plans."""
    ev = load_table(spark, sf_dir, "events")

    def users_of(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select("user_id")

    both = users_of("click").intersect(users_of("purchase"))
    click_only = users_of("click").subtract(users_of("purchase"))
    return (
        both.select("user_id", F.lit("click_and_purchase").alias("cohort"))
        .union(click_only.select("user_id", F.lit("click_only").alias("cohort")))
        .orderBy("cohort", "user_id")
    )


PURCHASERS_VS_CLICKERS_SQL = """
SELECT user_id, 'click_and_purchase' AS cohort FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT user_id, 'click_only' AS cohort FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
ORDER BY cohort, user_id
"""


def weekly_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of weekly order revenue vs weekly event activity.

    The two tables cover disjoint date ranges, so both null sides of the
    full-outer actually occur (a `side` tag records which).  Both inputs are
    pre-aggregated to week grain BEFORE the join — the join then matches at
    most a few thousand weekly rows instead of raw facts, and Spark picks a
    broadcast/SMJ on the tiny aggregates.  Revenue uses the scaled-int cents
    trick so the checked values are exact.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("wk_o"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("order_cents"),
        )
    )
    events = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("week", "ts").cast("date").alias("wk_e"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = orders.join(events, orders["wk_o"] == events["wk_e"], "full_outer")
    return j.select(
        F.coalesce("wk_o", "wk_e").alias("week"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("order_cents", F.lit(0)).cast("bigint").alias("order_cents"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.when(F.col("wk_o").isNull(), "events_only")
        .when(F.col("wk_e").isNull(), "orders_only")
        .otherwise("both")
        .alias("side"),
    ).orderBy("week")


WEEKLY_ACTIVITY_FULL_OUTER_SQL = """
WITH o AS (
    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_o,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS order_cents
    FROM orders GROUP BY 1
),
e AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS wk_e,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
)
SELECT COALESCE(wk_o, wk_e) AS week,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(order_cents, 0) AS BIGINT) AS order_cents,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN wk_o IS NULL THEN 'events_only'
            WHEN wk_e IS NULL THEN 'orders_only'
            ELSE 'both' END AS side
FROM o FULL OUTER JOIN e ON o.wk_o = e.wk_e
ORDER BY week
"""


def window_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions over orders, partitioned by
    priority: ntile quartiles, percent_rank, cume_dist, nth_value.

    The ORDER BY carries a unique tie-break (orderkey) so RANGE-frame peer
    groups are singletons — nth_value/cume_dist then agree bit-for-bit across
    engines.  percent_rank/cume_dist are exact rationals k/n evaluated in
    double identically on both sides (single division), rounded to 6 dp.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("total_cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("total_cents", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "total_cents",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("total_cents", 3).over(w).alias("third_cents"),
    )


WINDOW_DISTRIBUTIONS_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       NTH_VALUE(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 3) OVER w AS third_cents
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), o_orderkey)
"""


def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of order value per
    priority — Spark's exact ``percentile`` aggregate vs ANSI
    ``quantile_cont``; both interpolate lower + (upper-lower)*frac over the
    sorted cents, rounded to 6 dp to absorb last-ulp formula differences.

    Exact percentile sorts per group post-shuffle — fine when groups fit an
    executor; at 100 TB swap in approx_percentile (t-digest) per the
    `q_weekly_unique_users_approx` pattern.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("c")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(c, 0.5)"), 6).alias("p50_cents"),
            F.round(F.expr("percentile(c, 0.9)"), 6).alias("p90_cents"),
            F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99_cents"),
        )
        .orderBy("o_orderpriority")
    )


REVENUE_PERCENTILES_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.5), 6) AS p50_cents,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.9), 6) AS p90_cents,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.99), 6) AS p99_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# Recursive-CTE surface (staged r11): WITH RECURSIVE landed in Spark 4
# (SPARK-24497) — the warehouse-SQL hierarchy/graph idiom (org charts,
# BOM rollups, category trees) expressed ONCE and run VERBATIM on both
# engines, like the correlated-subquery surface below.  The hierarchy is
# a deterministic binary tree over customer keys (parent = floor(k/2),
# root = key 1), so depth = floor(log2(k)) + 1 and the recursion is
# O(log n) iterations — each iteration is one hash join against the
# frontier, exactly the checkpointed-frontier shape the BFS operator
# uses, but planned by the engine.  Money stays BIGINT cents with an
# explicit CAST on the sum (DuckDB widens SUM(BIGINT) to HUGEINT, Spark
# keeps long — the cast pins both to int64; per-depth groups over a
# dimension table stay far from the 9.2e18 edge).
RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE chain AS (
    SELECT c_custkey AS id, 1 AS depth,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
    FROM customer WHERE c_custkey = 1
    UNION ALL
    SELECT c.c_custkey, ch.depth + 1,
           CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
    FROM customer c
    JOIN chain ch ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = ch.id
)
SELECT depth,
       COUNT(*) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       MIN(id) AS min_id,
       MAX(id) AS max_id
FROM chain
GROUP BY depth
ORDER BY depth
"""


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level rollup of a recursive hierarchy — the IDENTICAL
    ``WITH RECURSIVE`` text runs on Spark and on the DuckDB oracle."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(RECURSIVE_HIERARCHY_SQL)


# Correlated-subquery surface: expressed as SQL on purpose — the point is
# Catalyst's decorrelation (RewriteCorrelatedScalarSubquery turns the scalar
# subquery into an aggregate + join; EXISTS/NOT EXISTS become semi/anti
# joins), i.e. the warehouse-SQL surface a dbt model would rely on.  The
# DuckDB oracle runs the IDENTICAL text.
ABOVE_CUSTOMER_AVG_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS total_cents
FROM orders o
WHERE 2 * CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) * (
    SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey
) > (
    SELECT 3 * SUM(CAST(ROUND(i.o_totalprice * 100, 0) AS BIGINT))
    FROM orders i
    WHERE i.o_custkey = o.o_custkey
)
  AND EXISTS (
    SELECT 1 FROM customer c
    WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0
)
ORDER BY o.o_orderkey
"""


def above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders 50% above their customer's average order value, for customers
    in good standing — two correlated scalar subqueries + correlated EXISTS.

    Catalyst decorrelates all three: the scalar subqueries become per-custkey
    aggregates joined back on the correlation key, EXISTS becomes a left-semi
    join — shuffles on o_custkey, no per-row re-execution (the
    warehouse-style nested loop a naive reading implies).  The "1.5 x avg"
    comparison is cross-multiplied into pure int64 arithmetic
    (2*cents*count > 3*sum_cents) so no float boundary can flip between
    engines.
    """
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ABOVE_CUSTOMER_AVG_SQL)


def event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean/variance/stddev of event value — computed FROM EXACT
    INT64 SUMS (Σx, Σx² over cents) with the closed-form sample-variance
    formula, so the doubles come from identical integers on every engine
    (a raw stddev_samp aggregate is float-summation-order dependent and
    can't be hash-checked cross-engine).  The Σx/Σx² ACCUMULATORS are
    decimal(38,0) — per-type groups scale with the corpus, and a long
    cents² accumulator passes 9.2e18 with normal values well before
    100 TB (the DuckDB twin gets the same width from HUGEINT sums).
    """
    ev = load_table(spark, sf_dir, "events")
    c = cents("value")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c.cast("decimal(38,0)")).alias("s1"),
        # the OPERAND widens, not just the sum: c*c in long overflows on a
        # single ~$9e11 row (the largest exactly-representable money)
        F.sum(c.cast("decimal(38,0)") * c).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n / 100.0
    # n=1 group: the sample variance is undefined — NULL, matching the
    # DuckDB oracle's divide-by-zero-is-NULL on (n - 1) = 0 (noop-sweep
    # find, r7: count() had pruned this column in the degenerate twins)
    var = F.when(
        F.col("n") >= 2,
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n)
        / (n - 1)
        / 10_000.0,
    )
    return g.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(mean, 6).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
        F.round(F.sqrt(var), 6).alias("stddev_value"),
    ).orderBy("event_type")


EVENT_VALUE_MOMENTS_SQL = """
WITH g AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s1,
           SUM(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT)
               * CAST(ROUND(value * 100, 0) AS BIGINT)) AS s2
    FROM events GROUP BY event_type
)
SELECT event_type, n AS n_events,
       ROUND(s1 / CAST(n AS DOUBLE) / 100.0, 6) AS mean_value,
       ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1) / 10000.0, 6) AS var_value,
       ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1) / 10000.0), 6) AS stddev_value
FROM g
ORDER BY event_type
"""


def weekday_weekend_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference, duplicate-aware — vs the distinct EXCEPT
    in q_set_ops_cohorts): per-user event-type bags on weekdays minus the
    weekend bag.  Spark ``exceptAll`` plans as a count-annotated anti
    semantics via generate — no distinct collapse."""
    ev = load_table(spark, sf_dir, "events")
    wd = ev.filter(F.dayofweek("ts").isin(2, 3, 4, 5, 6)).select("user_id", "event_type")
    we = ev.filter(F.dayofweek("ts").isin(1, 7)).select("user_id", "event_type")
    return wd.exceptAll(we).orderBy("user_id", "event_type")


WEEKDAY_WEEKEND_EXCEPT_ALL_SQL = """
SELECT user_id, event_type FROM events WHERE dayofweek(ts) BETWEEN 1 AND 5
EXCEPT ALL
SELECT user_id, event_type FROM events WHERE dayofweek(ts) IN (0, 6)
ORDER BY user_id, event_type
"""


def revenue_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of :func:`revenue_percentiles`, DETERMINISTIC form
    (VERDICT r9 #2): exact interpolated percentiles computed WITHOUT a
    per-group row sort, via the value-distribution relation —

    1. collapse rows to per-(priority, cents) COUNTS: a relation bounded
       by the price DOMAIN, not the row count (map-side partial agg does
       the heavy lifting; at 100 TB the shuffle carries distinct values);
    2. one window pass over that tiny relation yields each value's
       cumulative rank;
    3. the p-th percentile is the pair of values straddling rank
       (n-1)*p, interpolated exactly like ``percentile_cont``.

    Bit-identical to the sorting aggregate, so the DuckDB ``quantile_cont``
    oracle value-hashes — replacing the previous ``approx_percentile``
    t-digest formulation whose outputs were engine-specific and could
    never carry a cross-engine oracle (its accuracy demo lives on in
    tests/test_scale_features.py as :func:`revenue_percentiles_tdigest`).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("c")
    )
    per_val = o.groupBy("o_orderpriority", "c").agg(
        F.count(F.lit(1)).alias("n")
    )
    # percentile()/quantile_cont IGNORE NULL values while COUNT(*) counts
    # every row — ranks interpolate over the NON-NULL value distribution
    # (n_nn), n_orders reports the full group size, and an all-NULL group
    # yields NULL percentiles on both engines
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_val.filter(F.col("c").isNotNull()).select(
        "o_orderpriority", "c", F.sum("n").over(w).alias("cum")
    )
    tot = per_val.groupBy("o_orderpriority").agg(
        F.sum("n").alias("n_all"),
        F.sum(F.when(F.col("c").isNotNull(), F.col("n"))).alias("n_nn"),
    )
    j = cum.join(F.broadcast(tot), "o_orderpriority", "right")

    def _lo_hi(p: float, tag: str):
        rn = (F.col("n_nn") - 1).cast("double") * F.lit(p)
        return [
            F.min(
                F.when(F.col("cum") >= F.floor(rn) + 1, F.col("c"))
            ).alias(f"_lo_{tag}"),
            F.min(
                F.when(F.col("cum") >= F.ceil(rn) + 1, F.col("c"))
            ).alias(f"_hi_{tag}"),
        ]

    agg = j.groupBy("o_orderpriority").agg(
        F.max("n_all").alias("n_orders"),
        F.max("n_nn").alias("_n_nn"),
        *_lo_hi(0.5, "p50"),
        *_lo_hi(0.9, "p90"),
        *_lo_hi(0.99, "p99"),
    )

    def _interp(p: float, tag: str):
        rn = (F.col("_n_nn") - 1).cast("double") * F.lit(p)
        frac = rn - F.floor(rn).cast("double")
        lo = F.col(f"_lo_{tag}").cast("double")
        hi = F.col(f"_hi_{tag}").cast("double")
        return F.round(lo + (hi - lo) * frac, 6).alias(f"{tag}_cents")

    return agg.select(
        "o_orderpriority",
        "n_orders",
        _interp(0.5, "p50"),
        _interp(0.9, "p90"),
        _interp(0.99, "p99"),
    ).orderBy("o_orderpriority")


def revenue_percentiles_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-native sketch variant (``approx_percentile``, t-digest
    style, mergeable across partitions — bounded memory, no sort).  Its
    outputs are ENGINE-SPECIFIC, so it carries no cross-engine oracle and
    is a pytest-only demo (accuracy vs the exact percentiles asserted in
    tests/test_scale_features.py); the registered
    ``q_revenue_percentiles_approx`` uses the deterministic
    value-distribution formulation above."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("c")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(c, 0.5, 1000)").alias("p50_cents"),
            F.expr("approx_percentile(c, 0.9, 1000)").alias("p90_cents"),
            F.expr("approx_percentile(c, 0.99, 1000)").alias("p99_cents"),
        )
        .orderBy("o_orderpriority")
    )


REVENUE_PERCENTILES_APPROX_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.5), 6) AS p50_cents,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.9), 6) AS p90_cents,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.99), 6) AS p99_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def shipping_priority(
    spark: SparkSession, sf_dir: str, cutoff: str = "1998-06-15", k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped "unshipped orders" query: revenue of orders placed
    before ``cutoff`` whose items ship after it, top-``k`` by revenue.
    (The testdata's orders table carries ``o_orderpriority`` rather than
    Q3's ``o_shippriority`` — the grouping adapts, the shape doesn't.)

    Plan shape: both fact filters (order date below, ship date above) push
    into the parquet scans BEFORE the one fact-fact shuffle join; revenue
    aggregates in integer basis-point cents (the engine's cross-engine
    determinism idiom); top-k cuts after one groupBy keyed by the
    high-cardinality order key.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    revenue_c = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((revenue_c.cast("double") / 10000.0).alias("revenue"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


SHIPPING_PRIORITY_SQL_TEMPLATE = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT {k}
"""


def returned_item_revenue(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost to returns
    (``l_returnflag = 'R'``) per customer, with the nation dimension
    attached, top-``k`` customers by lost revenue.

    The return-flag filter pushes to the lineitem scan; the per-customer
    rollup happens on the orders side BEFORE the customer/nation broadcast
    joins, so the dimension join input is one row per customer.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue_c = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            (revenue_c.cast("double") / 10000.0).alias("lost_revenue"),
            F.count(F.lit(1)).alias("returned_items"),
        )
    )
    return (
        per_cust.join(F.broadcast(customer), per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "lost_revenue", "returned_items")
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(k)
    )


RETURNED_ITEM_REVENUE_SQL_TEMPLATE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0
           AS lost_revenue,
       COUNT(*) AS returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT {k}
"""


def large_volume_orders(
    spark: SparkSession, sf_dir: str, min_qty: int = 300
) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: orders whose TOTAL
    line-item quantity exceeds ``min_qty``, with customer attached and the
    order's own total re-reported — the HAVING-then-join-back-to-header
    shape (the qualifying set is found by aggregation, then enriched).

    The quantity rollup shuffles once on the high-cardinality order key;
    the qualifying order keys (tiny after HAVING) then semi-drive the
    header join, and customer rides broadcast.  Quantities are integral in
    the data, summed as int64 — exact across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            cents("o_totalprice").alias("o_totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


LARGE_VOLUME_ORDERS_SQL_TEMPLATE = """
WITH qualifying AS (
    SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty}
)
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_cents,
       total_qty
FROM qualifying
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


def order_priority_counts(
    spark: SparkSession,
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders placed in a quarter for
    which at least one line item shipped more than ``late_days`` after the
    order date (the testdata has no commit/receipt dates, so "late" adapts
    to ship-vs-order lag; the EXISTS-then-count shape is Q4's).

    Plan shape: the quarter filter pushes into the orders scan; the EXISTS
    compiles to a LEFT SEMI join on the order key with the lateness
    predicate as join condition (Catalyst keeps the lineitem side filtered
    to the semi probe — no duplicate-order inflation, no distinct needed);
    the final per-priority count is a 5-group hash aggregate.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.timestamp_add("DAY", F.lit(late_days), orders.o_orderdate)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_COUNTS_SQL_TEMPLATE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL {late_days} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer distribution: how many customers placed
    exactly N qualifying orders, including the zero-order bucket (the LEFT
    OUTER join is the point — inner would drop idle customers).  Orders
    with unspecified priority are excluded inside the JOIN CONDITION, not a
    WHERE (a WHERE would turn the outer join back into inner).

    Plan shape: two shuffles, both on shrinking keys — count per customer
    (high cardinality), then histogram over the tiny count domain.  The
    priority predicate reaches the orders parquet scan (pushed below the
    outer join because it references only the null-producing side).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("4-")
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4-%'
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def promo_revenue_share(
    spark: SparkSession, sf_dir: str, month_from: str = "1997-09-01", month_to: str = "1997-10-01"
) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: the fraction of one month's
    revenue that came from PROMO-type parts, in parts-per-million.

    Plan shape: the ship-month filter pushes into the fact scan (one month
    of lineitem read, not all); part rides broadcast; ONE aggregate computes
    both the conditional and total sums (no second pass).  Both sums are
    exact int64 basis-point cents; the ppm ratio divides them as doubles —
    int64→double conversion and one IEEE division are bit-identical across
    engines (numerators stay far below 2^53).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(month_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(month_to).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev_c).otherwise(F.lit(0))).alias(
            "promo_rev_c"
        ),
        F.sum(rev_c).alias("total_rev_c"),
    ).select(
        (F.col("promo_rev_c").cast("double") / 10000.0).alias("promo_revenue"),
        (F.col("total_rev_c").cast("double") / 10000.0).alias("total_revenue"),
        (
            F.col("promo_rev_c").cast("double")
            * 1000000.0
            / F.col("total_rev_c").cast("double")
        ).alias("promo_ppm"),
    )


PROMO_REVENUE_SHARE_SQL_TEMPLATE = """
WITH sums AS (
    SELECT
        SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                 ELSE 0 END) AS promo_rev_c,
        SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS total_rev_c
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{month_from} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{month_to} 00:00:00'
)
SELECT CAST(promo_rev_c AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(total_rev_c AS DOUBLE) / 10000.0 AS total_revenue,
       CAST(promo_rev_c AS DOUBLE) * 1000000.0 / CAST(total_rev_c AS DOUBLE)
           AS promo_ppm
FROM sums
"""


def brand_type_size_suppliers(
    spark: SparkSession, sf_dir: str, excluded_brand: str = "Brand#15"
) -> DataFrame:
    """TPC-H Q16-shaped supplier-count-per-part-class: for each
    (brand, type, size) class — excluding one brand and PROMO parts — how
    many DISTINCT suppliers have ever shipped such a part, never counting
    suppliers flagged by complaints (negative account balance stands in for
    Q16's comment-text scan; the NOT IN → anti-join shape is the point).

    Plan shape: the supplier blocklist is a tiny aggregate broadcast as an
    anti join; part predicates push to its scan and part rides broadcast
    into the fact; (partkey, suppkey) pairs dedup BEFORE the per-class
    distinct count so the wide shuffle carries unique pairs only.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != excluded_brand) & (F.col("p_type") != "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        li.join(complainers, li.l_suppkey == complainers.s_suppkey, "left_anti")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


BRAND_TYPE_SIZE_SUPPLIERS_SQL_TEMPLATE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{excluded_brand}'
  AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    brand/quantity/size conjunction blocks over the part-lineitem join —
    the classic "can the optimizer factor a disjunction" probe.

    Plan shape: the common bounds implied by the disjunction
    (l_quantity <= 30, p_size <= 15) are ALSO stated as standalone
    conjuncts so they push into both parquet scans — Catalyst does not
    factor OR-blocks across a join on its own; restating the hull is the
    documented idiom and cuts the fact scan before the broadcast join.
    The exact OR filter then runs post-join on the survivors.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    block = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    rev_c = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    return j.filter(block).agg(
        (rev_c.cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("matched_items"),
    )


DISJUNCTIVE_BRAND_REVENUE_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
           / 10000.0 AS revenue,
       COUNT(*) AS matched_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1  AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def idle_positive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped global-market opportunity: customers with an
    above-average positive balance who have NEVER ordered, rolled up per
    nation (the testdata has no phone country codes; nation is the
    equivalent grouping and exercises the same NOT EXISTS + scalar-
    subquery shape).

    Cross-engine exactness: "above the average positive balance" compares
    ``bal_cents * n_positive > sum_positive_cents`` — the same int64
    cross-multiplication used by ``above_customer_avg``, so no float
    average enters the predicate.  The scalar aggregate is two int64s
    broadcast as a 1-row crossJoin; never-ordered is a LEFT ANTI join on
    the customer key; the nation rollup is a 25-group aggregate with the
    per-nation balance total reported in exact cents.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    stats = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents("c_acctbal")).alias("sum_pos_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    idle = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).crossJoin(F.broadcast(stats))
    rich_idle = idle.filter(
        (F.col("c_acctbal") > 0.0)
        & (cents("c_acctbal") * F.col("n_pos") > F.col("sum_pos_c"))
    )
    return (
        rich_idle.join(F.broadcast(nation), rich_idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents("c_acctbal")).alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )


IDLE_POSITIVE_CUSTOMERS_SQL = """
WITH stats AS (
    SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sum_pos_c,
           COUNT(*) AS n_pos
    FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer, stats
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 0.0
  AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * n_pos > sum_pos_c
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name
"""


def top_supplier_by_revenue(
    spark: SparkSession, sf_dir: str, q_from: str = "1997-01-01", q_to: str = "1997-04-01"
) -> DataFrame:
    """TPC-H Q15-shaped top supplier: per-supplier revenue for one quarter,
    keeping every supplier whose revenue EQUALS the maximum (the
    view-then-max-then-join-back shape; ties kept, unlike top-1 LIMIT).

    Plan shape: the quarter filter pushes into the fact scan; revenue rolls
    up per supplier (one shuffle); the scalar max is a 1-row aggregate that
    re-joins via broadcast — revenue stays int64 cents through the
    comparison so "equals the max" is exact, and the supplier dim broadcasts
    onto the tiny winner set.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(q_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(q_to).cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_c")
    )
    mx = per_supp.agg(F.max("rev_c").alias("max_rev_c"))
    winners = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("rev_c") == F.col("max_rev_c")
    )
    return (
        winners.join(F.broadcast(supplier), winners.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL_TEMPLATE = """
WITH revenue AS (
    SELECT l_suppkey,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS rev_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{q_from} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{q_to} 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT MAX(rev_c) FROM revenue)
ORDER BY s_suppkey
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-order revenue: total revenue from line items
    whose quantity is below 20% of that part's average quantity — the
    correlated-aggregate-per-group probe.

    Cross-engine exactness: quantities are integral doubles, so the
    predicate ``qty < 0.2 * avg(qty)`` is evaluated as
    ``5 * qty * n_part < sum_qty`` — pure int64, no float average.  Plan
    shape: ONE shuffle on l_partkey computes the per-part (sum, count)
    rollup, which re-joins the fact (AQE picks broadcast when the part
    count is small); revenue divides by 7 years only at the very end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("n_li")
    )
    j = li.join(per_part, "l_partkey")
    small = j.filter(qty * 5 * F.col("n_li") < F.col("sum_qty"))
    return small.agg(
        (F.sum(cents("l_extendedprice")).cast("double") / 100.0 / 7.0).alias(
            "avg_yearly_small_qty_revenue"
        ),
        F.count(F.lit(1)).alias("n_small_items"),
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH per_part AS (
    SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
           COUNT(*) AS n_li
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
           / 100.0 / 7.0 AS avg_yearly_small_qty_revenue,
       COUNT(*) AS n_small_items
FROM lineitem JOIN per_part USING (l_partkey)
WHERE CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty
"""


def forecast_revenue_change(
    spark: SparkSession,
    sf_dir: str,
    year_from: str = "1997-01-01",
    year_to: str = "1998-01-01",
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: how much revenue disappears
    if small-quantity discounts in a window are dropped.

    The whole query is ONE pushdown-filtered scan + one global aggregate: no
    join, no groupBy shuffle beyond the final single-partition combine.  The
    ship-year range and quantity predicates push into the parquet scan
    (``PushedFilters``), so at 100 TB only one year's row groups are read
    and the map-side partial aggregate ships 16 bytes per task.  The
    discount band compares *scaled-int cents* (5..7) rather than raw doubles
    (0.05..0.07 are not exactly representable), keeping the predicate
    engine-exact; revenue = sum(price_c * disc_c) in int64, divided back to
    dollars once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = cents("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(year_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_to).cast("timestamp"))
            & (F.col("l_quantity") < max_qty)
        )
        .filter((disc_c >= disc_lo_c) & (disc_c <= disc_hi_c))
        .agg(
            (F.sum(cents("l_extendedprice") * disc_c).cast("double") / 10000.0).alias(
                "forecast_revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


FORECAST_REVENUE_SQL_TEMPLATE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0
           AS forecast_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year_from} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{year_to} 00:00:00'
  AND l_quantity < {max_qty}
  AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN {disc_lo_c} AND {disc_hi_c}
"""


def nation_trade_volume(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-shaped bilateral shipping volume: revenue shipped between two
    nations (supplier side vs customer side), per direction per ship-year.

    Plan shape: the ONLY shuffle is lineitem⋈orders (fact-fact sort-merge
    under AQE); supplier, customer, and nation are broadcast, and the
    two-nation filter is applied on the broadcast sides *before* the join so
    fact rows for other nations drop at the join, not in a later filter.
    Group-by lands on (supp_nation, cust_nation, year) — 2×|years| groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    pair = {nation_a, nation_b}
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            nation.filter(F.col("n_name").isin(*pair)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .join(
            nation.filter(F.col("n_name").isin(*pair)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    joined = (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    rev_c = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            (rev_c.cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


NATION_TRADE_VOLUME_SQL_TEMPLATE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
           / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('{nation_a}', '{nation_b}')
  AND cn.n_name IN ('{nation_a}', '{nation_b}')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, YEAR(l_shipdate)
ORDER BY supp_nation, cust_nation, ship_year
"""


def market_share(
    spark: SparkSession,
    sf_dir: str,
    target_nation: str = "NATION_3",
    market_region: str = "ASIA",
    part_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q8-shaped market share: the fraction (ppm) of one region's
    revenue in one part type supplied by one nation, per order year.

    Plan shape: the part-type filter prunes the broadcast part dim, which
    prunes the fact at the first join; customer→nation→region collapses to a
    broadcast pre-joined customer list for the market region; the target-
    nation flag is a broadcast supplier-side column folded into SUM(CASE) —
    so numerator and denominator come from ONE aggregate pass, no second
    scan.  All sums are exact int64 basis-point cents; the final ppm ratio
    is one int64→double division (bit-identical cross-engine).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == part_type)
    mkt_cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            region.filter(F.col("r_name") == market_region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(mkt_cust), orders.o_custkey == mkt_cust.c_custkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
    )
    rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == target_nation, rev_c).otherwise(F.lit(0))
            ).alias("target_rev_c"),
            F.sum(rev_c).alias("total_rev_c"),
        )
        .select(
            "order_year",
            (F.col("target_rev_c").cast("double") / 10000.0).alias("target_revenue"),
            (F.col("total_rev_c").cast("double") / 10000.0).alias("total_revenue"),
            F.round(
                F.col("target_rev_c").cast("double")
                * 1000000.0
                / F.col("total_rev_c").cast("double"),
                3,
            ).alias("share_ppm"),
        )
        .orderBy("order_year")
    )


MARKET_SHARE_SQL_TEMPLATE = """
WITH sums AS (
    SELECT YEAR(o_orderdate) AS order_year,
           SUM(CASE WHEN sn.n_name = '{target_nation}'
                    THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                    ELSE 0 END) AS target_rev_c,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS total_rev_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_type = '{part_type}' AND r_name = '{market_region}'
    GROUP BY YEAR(o_orderdate)
)
SELECT CAST(order_year AS BIGINT) AS order_year,
       CAST(target_rev_c AS DOUBLE) / 10000.0 AS target_revenue,
       CAST(total_rev_c AS DOUBLE) / 10000.0 AS total_revenue,
       ROUND(CAST(target_rev_c AS DOUBLE) * 1000000.0
             / CAST(total_rev_c AS DOUBLE), 3) AS share_ppm
FROM sums
ORDER BY order_year
"""


def nation_profit(
    spark: SparkSession, sf_dir: str, name_like: str = "%widget%"
) -> DataFrame:
    """TPC-H Q9-shaped product profit by supplier nation and year, adapted to
    the driver's schema: no ``partsupp``/``ps_supplycost`` table exists, so
    cost is proxied by ``p_retailprice * l_quantity`` (documented deviation;
    the join/aggregate shape — the point of Q9 — is unchanged).

    Plan shape: part is filtered by the name pattern *before* broadcast, so
    the fact prunes at the first join; supplier⋈nation pre-joins on the
    broadcast side; the only shuffle is lineitem⋈orders.  profit_c =
    rev_c − retail_c·qty_c stays in one int64 basis-point-cents unit
    (both terms are price×100 × count×100).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    profit_c = cents("l_extendedprice") * (100 - cents("l_discount")) - cents(
        "p_retailprice"
    ) * cents("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            # decimal(38,0): nation x year groups scale with the corpus, so
            # the basis-point-cents sum overflows int64 before 100 TB
            (F.sum(profit_c.cast("decimal(38,0)")).cast("double") / 10000.0).alias(
                "profit"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", F.col("order_year").desc())
    )


NATION_PROFIT_SQL_TEMPLATE = """
SELECT n_name AS supp_nation,
       CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                - CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '{name_like}'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY supp_nation, order_year DESC
"""


def min_cost_supplier(
    spark: SparkSession, sf_dir: str, size_max: int = 15, region: str = "EUROPE"
) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each small part, the
    supplier in a region offering it cheapest, adapted to the driver's
    schema: no ``partsupp``/``ps_supplycost`` exists, so "cost" is the
    supplier's total shipped cents for the part (observed from lineitem).

    Q2's point is the correlated MIN subquery (cost = (SELECT MIN ...
    WHERE ps_partkey = p_partkey)).  Here it decorrelates into a per-part
    argmin window — ``MIN(STRUCT(cost, suppkey))`` is map-side combinable,
    so the per-(part, supp) aggregate and the argmin ride the SAME shuffle
    keyed on partkey (no second exchange, no sort).  part is filtered by
    size before broadcast; supplier⋈nation⋈region pre-joins on the
    broadcast side so the region prune happens before the fact join.
    Ties break to the lowest suppkey via the struct ordering.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= size_max)
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("supp_nation"))
    )
    per_ps = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "supp_nation")
        .agg(F.sum(cents("l_extendedprice")).alias("cost_c"))
    )
    best = (
        per_ps.groupBy("p_partkey", "p_brand")
        .agg(F.min(F.struct("cost_c", "s_suppkey", "s_name", "s_acctbal", "supp_nation")).alias("m"))
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_brand",
            F.col("m.s_suppkey").alias("suppkey"),
            F.col("m.s_name").alias("supp_name"),
            F.col("m.supp_nation").alias("supp_nation"),
            (F.col("m.cost_c").cast("double") / 100.0).alias("min_cost"),
        )
    )
    return best.orderBy(F.col("min_cost").desc(), "partkey").limit(100)


MIN_COST_SUPPLIER_SQL_TEMPLATE = """
WITH per_ps AS (
    SELECT p_partkey, p_brand, s_suppkey, s_name, n_name AS supp_nation,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= {size_max} AND r_name = '{region}'
    GROUP BY ALL
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY p_partkey ORDER BY cost_c, s_suppkey) AS rn
    FROM per_ps
)
SELECT p_partkey AS partkey, p_brand, s_suppkey AS suppkey,
       s_name AS supp_name, supp_nation,
       CAST(cost_c AS DOUBLE) / 100.0 AS min_cost
FROM ranked WHERE rn = 1
ORDER BY min_cost DESC, partkey
LIMIT 100
"""


def important_parts(
    spark: SparkSession, sf_dir: str, threshold_ppm: int = 800
) -> DataFrame:
    """TPC-H Q11-shaped important stock: parts whose shipped value exceeds a
    fixed fraction of the GLOBAL shipped value (no partsupp table; value is
    observed lineitem revenue cents per part).

    Q11's point is the global-total scalar subquery in HAVING.  The global
    total re-aggregates from the per-part totals (tiny input), lands in a
    1-row relation, and is broadcast-cross-joined back — the fact scans
    once, and the threshold compare is exact int64
    (``part_value_c * 1_000_000 > total_c * threshold_ppm``), so no float
    boundary can flip between engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(cents("l_extendedprice")).alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000000 > F.col("total_c") * threshold_ppm)
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_c").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "partkey")
    )


IMPORTANT_PARTS_SQL_TEMPLATE = """
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS value_c
    FROM lineitem GROUP BY l_partkey
),
total AS (SELECT SUM(value_c) AS total_c FROM per_part)
SELECT l_partkey AS partkey, CAST(value_c AS DOUBLE) / 100.0 AS part_value
FROM per_part, total
WHERE value_c * 1000000 > total_c * {threshold_ppm}
ORDER BY part_value DESC, partkey
"""


def late_shipment_priority(
    spark: SparkSession, sf_dir: str, late_days: int = 90
) -> DataFrame:
    """TPC-H Q12-shaped shipping-delay audit: line counts by delay bucket and
    order-priority class.  The driver's lineitem has no ship mode /
    commit/receipt dates, so Q12's GROUP BY l_shipmode becomes a derived
    delay bucket (ship minus order date), and the CASE-priority split
    (urgent+high vs rest) is kept verbatim.

    One orders⋈lineitem shuffle join (both huge at 100 TB — AQE handles
    skew), then a low-cardinality groupBy that AQE coalesces.  Day math is
    ``datediff`` on midnight timestamps — integer-exact in both engines.
    ``SUM(CASE)`` both classes in ONE pass (Q12's signature) rather than two
    filtered scans.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, F.lit("0-29d"))
        .when(delay < late_days, F.lit("30-89d"))
        .otherwise(F.lit("late"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


LATE_SHIPMENT_PRIORITY_SQL_TEMPLATE = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN '0-29d'
            WHEN date_diff('day', o_orderdate, l_shipdate) < {late_days} THEN '30-89d'
            ELSE 'late' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def dominant_part_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20-shaped excess-availability suppliers: suppliers who shipped
    MORE THAN HALF of some part's total shipped quantity (no partsupp
    availability column; dominance over observed shipments replaces
    ``ps_availqty > 0.5 * sum(l_quantity)``).

    Q20's nested IN-subquery chain becomes: per-(part, supp) quantity sums
    and per-part totals ride the SAME partkey-keyed shuffle (the per-part
    total is a window re-aggregate over the grouped rows — no second
    exchange), the dominance test is exact int64
    (``2*supp_qty_c > part_qty_c``), and the distinct dominant suppkeys
    LEFT-SEMI-join supplier — existence only, no row multiplication.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(cents("l_quantity")).alias("supp_qty_c")
    )
    part_total = F.sum("supp_qty_c").over(Window.partitionBy("l_partkey"))
    dominant = (
        per_ps.withColumn("part_qty_c", part_total)
        .filter(F.col("supp_qty_c") * 2 > F.col("part_qty_c"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
        .orderBy("s_suppkey")
    )


DOMINANT_PART_SUPPLIERS_SQL = """
WITH per_ps AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS supp_qty_c
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
dominant AS (
    SELECT DISTINCT l_suppkey
    FROM (SELECT *, SUM(supp_qty_c) OVER (PARTITION BY l_partkey) AS part_qty_c
          FROM per_ps)
    WHERE supp_qty_c * 2 > part_qty_c
)
SELECT s_suppkey, s_name, n_name AS supp_nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_suppkey
"""


def blocking_suppliers(
    spark: SparkSession, sf_dir: str, top_n: int = 20
) -> DataFrame:
    """TPC-H Q21-shaped waiting-supplier audit: in finished multi-supplier
    orders, the supplier who UNIQUELY shipped last (everyone else waited on
    them), counted per supplier.  (No commit/receipt dates in the driver's
    lineitem; "kept the order waiting" = sole owner of the order's max
    shipdate, preserving Q21's exists/not-exists pair: at least one other
    supplier on the order EXISTS, no other supplier also-late NOT EXISTS.)

    Q21 is the classic quadruple-self-join; here both existence tests
    collapse into window re-aggregates over ONE orderkey-keyed shuffle of
    the per-(order, supp) pre-aggregate: distinct-supplier count, order max
    shipdate, and how many suppliers hit that max all ride the same
    partition.  The final per-supplier count is a second tiny shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_os = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    n_supp = F.count(F.lit(1)).over(w)
    order_last = F.max("supp_last").over(w)
    annotated = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        n_supp.alias("n_supp"),
        order_last.alias("order_last"),
    ).withColumn(
        "n_at_last",
        F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)).over(w),
    )
    blockers = annotated.filter(
        (F.col("n_supp") >= 2)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_at_last") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blockers.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(top_n)
    )


BLOCKING_SUPPLIERS_SQL_TEMPLATE = """
WITH per_os AS (
    SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY l_orderkey, l_suppkey
),
marked AS (
    SELECT *,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           MAX(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
    FROM per_os
),
annotated AS (
    SELECT *,
           CAST(SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_last
    FROM marked
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM annotated JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND supp_last = order_last AND n_at_last = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT {top_n}
"""


def record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution (Fellegi-Sunter shape): match customer
    records against a dirty re-keyed copy of themselves — the B side drops
    every 13th record, appends noise to every 7th name, and nudges every
    3rd balance, simulating a second source with no shared key.

    The scale story is BLOCKING: candidate pairs come only from equality
    on (nationkey, mktsegment) — a bounded equi-join, never all-pairs —
    then pair scoring is integer field agreement (Levenshtein <= 2 on
    name, balance within 100 cents) and each A record keeps its best match
    via a map-side-combinable struct-argmax.  All comparators are
    integer-exact cross-engine (both engines implement standard edit
    distance).  At 100 TB the block key is the shuffle key; skewed blocks
    (big cities) split with AQE or a second blocking pass.
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        cents("c_acctbal").alias("a_bal_c"),
        "c_nationkey",
        "c_mktsegment",
    )
    b = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .select(
            (F.col("c_custkey") + 100000).alias("b_key"),
            F.when(
                F.col("c_custkey") % 7 == 0, F.concat(F.col("c_name"), F.lit("~x"))
            )
            .otherwise(F.col("c_name"))
            .alias("b_name"),
            F.when(F.col("c_custkey") % 3 == 0, cents("c_acctbal") + 50)
            .otherwise(cents("c_acctbal"))
            .alias("b_bal_c"),
            "c_nationkey",
            "c_mktsegment",
        )
    )
    # the block key is the shuffle key (docstring above) — make that literal:
    # without this repartition the small B side broadcasts and ALL pair
    # scoring (1.6M bounded-levenshteins at sf0.1) collapses onto the single
    # scan task of a one-row-group eval file (4.8 s -> ~0.8 s)
    a = a.repartition(
        spark.sparkContext.defaultParallelism, "c_nationkey", "c_mktsegment"
    )
    pairs = a.join(b, ["c_nationkey", "c_mktsegment"])
    # bounded edit distance (threshold arg): early-exits once the distance
    # exceeds 2 (returns -1), O(len*threshold) per pair instead of O(len^2)
    # — the only score contribution needs lev <= 2, so semantics are
    # unchanged and the oracle keeps the unbounded form
    lev = F.levenshtein(F.col("a_name"), F.col("b_name"), 3)
    name_pts = F.when((lev >= 0) & (lev <= 2), 20 - lev * 5).otherwise(0)
    bal_pts = F.when(
        F.abs(F.col("a_bal_c") - F.col("b_bal_c")) <= 100, F.lit(10)
    ).otherwise(0)
    scored = pairs.select(
        "a_key", "b_key", (name_pts + bal_pts).cast("bigint").alias("score")
    ).filter(F.col("score") >= 15)
    best = (
        scored.groupBy("a_key")
        .agg(F.max(F.struct("score", (-F.col("b_key")).alias("nbk"), "b_key")).alias("m"))
        .select("a_key", F.col("m.b_key").alias("b_key"), F.col("m.score").alias("score"))
    )
    return best.orderBy("a_key")


RECORD_LINKAGE_SQL = """
WITH a AS (
    SELECT c_custkey AS a_key, c_name AS a_name,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS a_bal_c,
           c_nationkey, c_mktsegment
    FROM customer
),
b AS (
    SELECT c_custkey + 100000 AS b_key,
           CASE WHEN c_custkey % 7 = 0 THEN c_name || '~x' ELSE c_name END AS b_name,
           CASE WHEN c_custkey % 3 = 0
                THEN CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 50
                ELSE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) END AS b_bal_c,
           c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey % 13 != 0
),
scored AS (
    SELECT a_key, b_key,
           CAST(CASE WHEN levenshtein(a_name, b_name) <= 2
                     THEN 20 - levenshtein(a_name, b_name) * 5 ELSE 0 END
                + CASE WHEN ABS(a_bal_c - b_bal_c) <= 100 THEN 10 ELSE 0 END
                AS BIGINT) AS score
    FROM a JOIN b USING (c_nationkey, c_mktsegment)
),
ranked AS (
    SELECT a_key, b_key, score,
           ROW_NUMBER() OVER (PARTITION BY a_key
                              ORDER BY score DESC, b_key ASC) AS rn
    FROM scored WHERE score >= 15
)
SELECT a_key, b_key, score FROM ranked WHERE rn = 1
ORDER BY a_key
"""


def abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: class A = parts
    covering the first 80% of cumulative revenue, B the next 15%, C the
    tail — the inventory-prioritization classic.  One part-keyed rollup
    of exact cents, one cumsum in revenue-desc total order (tie-break
    partkey), class boundaries by integer cross-multiplication
    (``5·cum ≤ 4·total`` etc. — no percentage float ever materializes).

    The cumsum is two-phase (``bucketed_cumsum`` over $10k revenue bands,
    descending) — the per-part relation is |parts|-scaled, so a
    partition-less ``SUM() OVER (ORDER BY)`` window would funnel it
    through one task; per-part revenue has an SF-independent natural
    range (~30 lineitems/part in TPC-H), so fixed-width bands stay
    balanced at any scale."""
    from .twophase import bucketed_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    # revenue in centi-cents (price_c · (100 − disc_c)) — the engine's
    # canonical no-division exact form (regional_revenue and friends)
    rev = F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
        "bigint"
    )
    per_part = li.groupBy("l_partkey").agg(rev.alias("r"))
    # corpus-scaled accumulators (grand total, cumulative revenue, per-class
    # rollup) are decimal(38,0): the centi-cents sum passes int64 before
    # 100 TB with normal prices.  Per-part r stays int64 (bounded group).
    # The report's revenue_centicents column remains BIGINT by contract —
    # its own width limit is documented in SCALE.md.
    tot = per_part.agg(F.sum(F.col("r").cast("decimal(38,0)")).alias("t"))
    cumsummed = bucketed_cumsum(
        per_part,
        # negated band index: monotone non-decreasing w.r.t. DESC revenue
        F.expr("-(r DIV 100000000)"),
        [F.desc("r"), F.asc("l_partkey")],
        F.col("r").cast("decimal(38,0)"),
        "cum",
        # per_part is a lineitem-wide aggregate: checkpoint once rather
        # than paying the lineitem scan for each two-phase pass
        materialize=True,
    )
    classed = (
        cumsummed.crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.when(5 * F.col("cum") <= 4 * F.col("t"), "A")
            .when(20 * F.col("cum") <= 19 * F.col("t"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("r").cast("decimal(38,0)")).alias("rc"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.col("rc").cast("bigint").alias("revenue_centicents"),
            # divide-first: rc·10⁶ overflows int64 on centi-cent sums at
            # sf0.1+; rc DIV (t DIV 10⁶) is the same ppm ±1 and identical
            # in both engines
            F.expr("rc DIV GREATEST(1, t DIV 1000000)").alias(
                "revenue_share_ppm"
            ),
        )
        .orderBy("abc_class")
    )


ABC_ANALYSIS_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                AS BIGINT) AS r
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t FROM per_part),
classed AS (
    SELECT r,
           CASE WHEN 5 * cum <= 4 * t THEN 'A'
                WHEN 20 * cum <= 19 * t THEN 'B'
                ELSE 'C' END AS abc_class
    FROM (
        SELECT r,
               CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM per_part
    ) c CROSS JOIN tot
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(r) AS BIGINT) AS revenue_centicents,
       CAST(SUM(r) // GREATEST(1, MAX(t) // 1000000) AS BIGINT)
           AS revenue_share_ppm
FROM classed CROSS JOIN tot
GROUP BY abc_class
ORDER BY abc_class
"""


def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship latency percentiles per order priority — the
    operations SLA readout (do urgent orders actually ship faster?).
    One fact-side pre-aggregate (min shipdate per order) before the
    broadcast-priority join; latencies are exact day integers, the
    percentiles exact interpolated values held ×4 (quartile grid) so the
    output is integer like the ABC/IQR family."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    lat = orders.join(
        first_ship, orders["o_orderkey"] == first_ship["l_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(F.col("first_ship"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("CAST(ROUND(percentile(days, 0.5) * 4, 0) AS BIGINT)").alias(
                "p50_days_x4"
            ),
            F.expr("CAST(ROUND(percentile(days, 0.9) * 4, 0) AS BIGINT)").alias(
                "p90_days_x4"
            ),
            F.max("days").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "p50_days_x4",
            "p90_days_x4",
            F.col("max_days").cast("bigint").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


FULFILLMENT_LATENCY_SQL = """
WITH first_ship AS (
    SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
    FROM lineitem GROUP BY l_orderkey
),
lat AS (
    SELECT o.o_orderpriority,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE), f.first_ship)
                AS BIGINT) AS days
    FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(quantile_cont(days, 0.5) * 4, 0) AS BIGINT) AS p50_days_x4,
       CAST(ROUND(quantile_cont(days, 0.9) * 4, 0) AS BIGINT) AS p90_days_x4,
       CAST(MAX(days) AS BIGINT) AS max_days
FROM lat
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def aov_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average order value per customer market segment — the segmentation
    staple: fact pre-aggregated per customer is unnecessary here (order
    grain already), so it's one broadcast dim join + a segment rollup with
    exact cents means."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == cust["c_custkey"],
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("sc"),
        )
        .select(
            "c_mktsegment",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("sc").cast("bigint").alias("total_cents"),
            F.expr("sc DIV n_orders").cast("bigint").alias("aov_cents"),
        )
        .orderBy("c_mktsegment")
    )


AOV_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) // COUNT(*)
            AS BIGINT) AS aov_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


def return_rate_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-line share per ship month (returnflag = 'R') in exact ppm
    of lines AND of revenue cents — the returns dashboard, where the
    count-share vs value-share gap flags whether big orders return more."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = cents("l_extendedprice")
    cells = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_returnflag") == "R").cast("bigint")).alias("n_returned"),
        F.sum(rev).alias("rc"),
        F.sum(F.when(F.col("l_returnflag") == "R", rev).otherwise(0)).alias(
            "rc_ret"
        ),
    )
    return cells.select(
        "month",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_returned").cast("bigint").alias("n_returned"),
        F.expr("n_returned * 1000000 DIV n_lines").alias("return_ppm"),
        # a month whose revenue nets to zero has no defined value share —
        # NULL, not an ANSI DIVIDE_BY_ZERO (degenerate-input sweep); the
        # multiply is decimal(38,0) because monthly cents sums x 1e6 pass
        # int64 at corpus scale
        F.expr(
            "CASE WHEN rc <> 0 THEN "
            "CAST(CAST(rc_ret AS DECIMAL(38,0)) * 1000000 DIV rc AS BIGINT) END"
        ).alias("value_return_ppm"),
    ).orderBy("month")


RETURN_RATE_SQL = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS return_ppm,
       CAST(CASE WHEN SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) <> 0
                 THEN SUM(CAST(CASE WHEN l_returnflag = 'R'
                               THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                               ELSE 0 END AS HUGEINT)) * 1000000
                      // SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
            END AS BIGINT) AS value_return_ppm
FROM lineitem
GROUP BY 1
ORDER BY month
"""
