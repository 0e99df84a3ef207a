"""Skew-mitigation primitives (SURVEY.md §7.8 scale hardening).

AQE's skew-join splitting handles joins automatically, but a *single hot
grouping key* in an aggregation still funnels one partition's worth of rows
to one task.  The classic fix is salting: two-phase aggregation through a
composite (key, salt) shuffle.  These helpers implement it for the
decomposable aggregates the engine uses (count/sum/min/max; avg = sum/count).

Equivalence: partial(key, salt) -> final(key) re-aggregates the partials, so
results are exactly the plain groupBy results (integer aggregates bit-equal;
float sums differ only in summation order, same as any Spark re-partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # counts re-aggregate by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (fn, col) with fn in {count, sum, min, max}.
    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    ``salt_buckets`` tasks; phase 2 merges partials per key (tiny shuffle:
    |keys| x salt_buckets rows).
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unknown)}")

    # deterministic per-row spread: any row-unique value mod buckets works
    salt = (F.monotonically_increasing_id() % salt_buckets).alias("_salt")

    def partial(fn: str, col: str) -> Column:
        if fn == "count":
            return F.count(F.lit(1))
        return getattr(F, fn)(col)

    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[partial(fn, col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](f"_p_{name}").alias(name) for name, (fn, col) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    spread_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side across ``n_salts``
    salt values and spread the big side's hot keys deterministically by
    ``pmod(xxhash64(spread_col), n_salts)`` — each formerly-hot (key)
    shuffle partition becomes n_salts partitions of (key, salt).

    ``spread_col`` must be a column of the big side that varies within a
    key (e.g. the fact's primary key) so the spread is deterministic (no
    rand(): reproducible results, resilient to task retries).  Result is
    row-identical to ``big.join(small, key)`` — equivalence-tested.  Use
    when AQE's skew-join splitting can't kick in (e.g. the skewed side
    feeds an aggregation Spark won't split).
    """
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_rep = small.withColumn("_salt", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).cast("int")
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Shuffle-skew audit for a prospective join/aggregation key: the
    ``top_n`` heaviest key values with their absolute row count, corpus
    share (ppm), and hotness relative to a uniform key distribution
    (``pct_of_mean`` = 100 means perfectly balanced).  The report you run
    BEFORE keying a 100 TB shuffle — a key at 40x mean is the task that
    straggles an entire stage, and the signal to reach for
    :func:`salted_agg` / :func:`salted_join` or AQE skew splitting.

    One map-side-combined count per key plus a two-row broadcast of the
    global (total, n_keys); all ratios are integer ppm/pct (truncating
    div), so the report is value-hash oracle-checkable.  NULL keys profile
    as the string "<null>" — nulls are the most common real-world hot key.
    """
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("<null>"))
    counts = df.select(k.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select(
            "rank",
            "key",
            "n_rows",
            F.expr("n_rows * 1000000 div total").cast("bigint").alias("share_ppm"),
            F.expr("n_rows * 100 * n_keys div total").cast("bigint").alias("pct_of_mean"),
        )
    )


KEY_SKEW_PROFILE_SQL_TEMPLATE = """
WITH counts AS (
    SELECT COALESCE(CAST({key} AS VARCHAR), '<null>') AS key,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM {table} GROUP BY 1
),
tot AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM counts),
ranked AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS BIGINT) AS rank,
           key, n_rows,
           CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(n_rows * 100 * n_keys // total AS BIGINT) AS pct_of_mean
    FROM counts CROSS JOIN tot
)
SELECT rank, key, n_rows, share_ppm, pct_of_mean FROM ranked WHERE rank <= {top_n}
"""
