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

from pyspark.sql import Column, DataFrame
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
