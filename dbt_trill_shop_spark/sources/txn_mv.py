"""Incrementally-maintained aggregate MATERIALIZED VIEW over a
transaction-logged table, driven by its CHANGE DATA FEED — the payoff
composition of the txn layer: a grouped COUNT/SUM mart over 100 TB stays
fresh by folding each commit's row-level diff (kilobytes-to-megabytes)
instead of re-aggregating the table.

Design (the classic delta-maintenance identity for distributive
aggregates — counts and sums fold under insert(+1)/delete(-1) weights;
the same idea as Delta Live Tables / incremental view maintenance in the
literature, re-expressed on this repo's CDF):

- The MV is ITSELF a txn table: columns = group keys + ``n_rows`` +
  ``sum_<col>`` per requested sum column.  Readers time-travel it, OCC
  protects it, and every sync is one atomic commit.
- Each MV commit records the SOURCE version it folded up to
  (``mv_source_version`` on the entry), so the next sync reads exactly
  the CDF window (last, head] — the watermark read is O(1), the latest
  MV entry carries it.
- The apply is UNION + RE-AGGREGATE, never a join: the old MV rows and
  the per-commit delta rows concatenate and group — map-side combinable,
  NULL group keys group exactly like SQL GROUP BY (a null-unsafe join
  would silently drop them), and groups whose net count reaches zero
  drop out.  Cost per sync ∝ |MV| + |changes|, never |table|.
- EXACTLY-ONCE under crashes and races: the MV commit is a PINNED
  overwrite (TxnConflict if a concurrent sync interleaves), and a replay
  of an already-applied window is a no-op because the watermark re-read
  shows it folded.

Exactness contract: sum columns must be integer/decimal (the CDF's
delete rows carry the exact pre-image, so deltas cancel exactly);
float sums would drift under reordering and are rejected.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txn_table import (
    _list_versions,
    _read_entry,
    read_txn,
    read_txn_changes,
    snapshot,
    write_txn,
)

_EXACT_SUM_TYPES = ("byte", "short", "integer", "long", "decimal")


def mv_source_version(mv_root: str):
    """The source version the MV at ``mv_root`` has folded up to (None if
    the MV does not exist yet).  O(1): every sync commit carries it."""
    versions = _list_versions(mv_root)
    if not versions:
        return None
    e = _read_entry(mv_root, versions[-1])
    if "mv_source_version" not in e:
        raise ValueError(
            f"{mv_root} is not a maintained MV (latest commit carries no "
            "mv_source_version) — sync only into MV roots this maintainer owns"
        )
    return int(e["mv_source_version"])


def _sum_scale(type_str: str) -> int:
    if type_str.startswith("decimal"):
        return int(type_str.rstrip(")").split(",")[1])
    return 0


def _aggregate(df: DataFrame, group_cols: list[str], sum_cols: list[str],
               scales: dict, weight) -> DataFrame:
    """Weighted grouped aggregate with STABLE accumulator types: every
    ``sum_<c>`` is pinned to decimal(38, source scale) — the house wide
    accumulator (overflow-proof past int64 at corpus scale) AND a fixed
    point the re-aggregation of sums can never widen, so the MV's schema
    is identical across syncs (a drifting sum type would make the txn
    table's generations un-unionable)."""
    aggs = [F.sum(weight).cast("bigint").alias("n_rows")] + [
        F.sum(F.col(c).cast(f"decimal(38,{scales[c]})") * weight)
        .cast(f"decimal(38,{scales[c]})")
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def sync_agg_mv(
    spark: SparkSession,
    source_root: str,
    mv_root: str,
    group_cols: list[str],
    sum_cols: list[str] = (),
) -> int:
    """Fold the source's committed-but-unapplied changes into the MV;
    returns the source version the MV now reflects.  First call
    bootstraps the MV with one full aggregation of the current snapshot;
    every later call reads ONLY the CDF window since its watermark.
    No new source commits -> no-op."""
    src = snapshot(source_root)
    schema = {
        f["name"]: f["type"]
        for f in json.loads(src.schema_json)["fields"]
    }
    for c in list(group_cols) + list(sum_cols):
        if c not in schema:
            raise ValueError(f"column {c!r} not in source schema {sorted(schema)}")
    for c in sum_cols:
        t = schema[c] if isinstance(schema[c], str) else str(schema[c])
        if not t.startswith(_EXACT_SUM_TYPES):
            raise ValueError(
                f"sum column {c!r} has type {t}: incremental sums must be "
                "integer/decimal (float deltas drift; pre-scale to cents)"
            )
    scales = {c: _sum_scale(schema[c] if isinstance(schema[c], str) else str(schema[c]))
              for c in sum_cols}
    last = mv_source_version(mv_root)
    if last is None:
        base = _aggregate(
            read_txn(spark, source_root, version=src.version),
            list(group_cols), list(sum_cols), scales, F.lit(1),
        ).filter(F.col("n_rows") > 0)
        write_txn(
            base, mv_root, mode="overwrite",
            extra={"mv_source_version": src.version},
        )
        return src.version
    if last >= src.version:
        return last
    mv = snapshot(mv_root)
    changes = read_txn_changes(
        spark, source_root, from_version=last, to_version=src.version
    )
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = _aggregate(changes, list(group_cols), list(sum_cols), scales, w)
    merged = (
        read_txn(spark, mv_root, version=mv.version)
        .unionByName(delta)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[
                F.sum(f"sum_{c}").cast(f"decimal(38,{scales[c]})").alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col("n_rows") > 0)
    )
    write_txn(
        merged, mv_root, mode="overwrite",
        expected_base_version=mv.version,
        extra={"mv_source_version": src.version},
    )
    return src.version
