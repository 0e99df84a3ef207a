"""Two-phase (bucketed-offsets) replacements for partition-less global
windows — the house pattern that keeps total-order operators scale-safe.

A ``ROW_NUMBER() OVER (ORDER BY k)`` / ``NTILE(n) OVER (ORDER BY k)`` /
``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` plans as
``Window + Sort + Exchange SinglePartition``: the WHOLE relation funnels
through one task, which is the canonical 100×-scale-up failure mode even
when the answer is correct.  Spark's own escape hatches don't apply when
the rank is consumed downstream (InferWindowGroupLimit needs a literal
``rank <= k`` filter) or when the orderBy is a window (range partitioning
only kicks in for ``df.orderBy``).

The fix, used first by ``token_budget_select`` and the Theil-Sen / KS
rewrites (operators/analytics.py), generalized here:

1. coarsen the leading sort key into a BUCKET — any expression that is
   monotone non-decreasing w.r.t. the global order and has bounded
   cardinality (a fixed-width quantizer, a hash prefix for md5-ordered
   permutations, or the key itself when its domain is bounded);
2. aggregate per-bucket counts/sums — a relation the size of the bucket
   domain, NOT the input;
3. one window pass over that tiny relation produces each bucket's
   starting offset (and, free of charge, the grand total from a
   full-range frame);
4. broadcast the offsets back and run the per-row window PARTITIONED BY
   the bucket — every task sorts only its bucket's rows.

The result is bit-identical to the single-task window (row_number / ntile
/ cumsum are all deterministic given the total order), so oracles stay
plain window SQL.

Caveat (ADVICE r4): a degenerate distribution that lands every row in one
bucket degrades to the pre-fix single-task shape.  Quantizer widths below
are chosen from the key's construction (md5 prefixes are uniform by
definition; milli-logits / int counts have bounded natural ranges), not
from sampled statistics, to keep plans deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucketed_rank", "bucketed_ntile", "bucketed_cumsum", "md5_bucket"]

_BK, _OFF, _CNT, _N = "__tp_bk", "__tp_off", "__tp_cnt", "__tp_n"


def md5_bucket(h: Column, chars: int = 3) -> Column:
    """Bucket key for an md5-hex-ordered total order: the first ``chars``
    hex digits.  A string prefix is monotone w.r.t. the full string's
    lexicographic order, and md5 makes the 16**chars buckets uniform —
    the one quantizer with no degenerate-distribution caveat."""
    return F.substring(h, 1, chars)


def _with_offsets(
    df: DataFrame,
    bucket: Column,
    agg: Column,
    want_total: bool,
    materialize: bool = False,
) -> DataFrame:
    """Attach per-bucket starting offsets (exclusive prefix aggregate over
    buckets in ascending ``bucket`` order) and optionally the grand total,
    via one tiny window over the per-bucket relation + a broadcast join.

    ``materialize`` localCheckpoints the bucketed input first: the two
    phases each scan ``df``, so when it is a DERIVED relation (a classifier
    score, a per-user aggregate, a chained two-phase output) recomputing it
    twice dominates the query.  The checkpoint is the house trade
    (textstats/dedup tf checkpoints): one slim per-row relation held on
    executor storage, released by the caller's session like every other
    checkpoint block.  Leave False for raw column-pruned scans, which are
    cheaper to re-read than to cache."""
    b = df.withColumn(_BK, bucket)
    if materialize:
        b = b.localCheckpoint(eager=True)
    per_b = b.groupBy(_BK).agg(agg.alias(_CNT))
    wc = Window.orderBy(_BK).rowsBetween(Window.unboundedPreceding, 0)
    cols = [
        F.col(_BK),
        (F.sum(_CNT).over(wc) - F.col(_CNT)).alias(_OFF),
    ]
    if want_total:
        wall = Window.orderBy(_BK).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cols.append(F.sum(_CNT).over(wall).alias(_N))
    offsets = per_b.select(*cols)
    return b.join(F.broadcast(offsets), _BK)


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    out: str = "rank",
    materialize: bool = False,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY *order)`` without the single-task
    window.  ``bucket`` must be monotone non-decreasing w.r.t. the total
    order defined by ``order`` (i.e. a coarsening of its leading key).
    Adds column ``out`` (bigint); drops nothing else."""
    wv = Window.partitionBy(_BK).orderBy(*order)
    return (
        _with_offsets(
            df, bucket, F.count(F.lit(1)), want_total=False, materialize=materialize
        )
        .withColumn(out, (F.col(_OFF) + F.row_number().over(wv)).cast("bigint"))
        .drop(_BK, _OFF)
    )


def bucketed_ntile(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    n: int,
    out: str,
    materialize: bool = False,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY *order)`` via the two-phase global rank
    plus the closed-form tile function: with N rows, the first ``N mod n``
    tiles hold ``N div n + 1`` rows and the rest ``N div n`` — so
    ``tile(rank)`` is pure arithmetic once N rides along on the broadcast
    offsets relation (full-range frame, no extra scan)."""
    wv = Window.partitionBy(_BK).orderBy(*order)
    ranked = _with_offsets(
        df, bucket, F.count(F.lit(1)), want_total=True, materialize=materialize
    ).withColumn(
        "__tp_rn", (F.col(_OFF) + F.row_number().over(wv)).cast("bigint")
    )
    # With N = q*n + r: tiles 1..r hold q+1 rows, tiles r+1..n hold q rows.
    # Pure int64 arithmetic (ANSI `/` would detour through double).
    tile = F.expr(
        f"CASE WHEN __tp_rn <= ({_N} % {n}) * ({_N} DIV {n} + 1) "
        f"THEN (__tp_rn - 1) DIV ({_N} DIV {n} + 1) + 1 "
        f"ELSE ({_N} % {n}) "
        f"     + (__tp_rn - ({_N} % {n}) * ({_N} DIV {n} + 1) - 1) "
        f"       DIV GREATEST({_N} DIV {n}, 1) + 1 END"
    ).cast("bigint")
    return ranked.withColumn(out, tile).drop(_BK, _OFF, _N, "__tp_rn")


def bucketed_cumsum(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    val: Column,
    out: str,
    materialize: bool = False,
) -> DataFrame:
    """``SUM(val) OVER (ORDER BY *order ROWS UNBOUNDED PRECEDING)`` — the
    inclusive running total — as per-bucket sums + within-bucket cumsum."""
    v = df.withColumn("__tp_v", val)
    wv = (
        Window.partitionBy(_BK)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        _with_offsets(
            v, bucket, F.sum("__tp_v"), want_total=False, materialize=materialize
        )
        .withColumn(out, F.col(_OFF) + F.sum("__tp_v").over(wv))
        .drop(_BK, _OFF, "__tp_v")
    )
