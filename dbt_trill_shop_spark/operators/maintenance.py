"""Table maintenance: small-files compaction + clustering (the OPTIMIZE /
CLUSTER BY equivalent for parquet-path tables).

At 100 TB, streaming/incremental sinks accrete thousands of small files per
partition: every scan pays file-open overhead and loses min/max pruning.
``compact_table`` rewrites a table to a bounded file count, range-clustered
on the given columns so each output file covers a narrow value range —
parquet footer min/max statistics then let later scans skip whole files for
selective predicates (the same effect warehouse OPTIMIZE / Z-ORDER targets;
single-dimension range clustering here, which is what
``repartitionByRange`` gives without interleaving bit tricks).

Write-then-swap like Project table sinks: readers pinned to the old file
listing fail fast instead of reading torn state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def _partition_keys(path: str) -> list[str]:
    """Infer the Hive partition-column chain (``key=value`` directory levels)
    of a parquet table path, outermost first; [] for unpartitioned tables."""
    keys: list[str] = []
    cur = path
    while True:
        subs = [
            d
            for d in os.listdir(cur)
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subs:
            return keys
        keys.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


def compact_table(
    spark: SparkSession,
    path: str,
    target_files: int = 8,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
) -> dict:
    """Rewrite the parquet table at ``path`` into ``target_files`` files,
    clustered on ``cluster_by``: linear range clustering by default, or —
    with ``zorder=True`` and 2+ numeric columns — Z-order (bit-interleaved)
    multi-dimensional clustering, so footer min/max pruning works on EVERY
    cluster column, not just the leading one.  Returns
    ``{files_before, files_after, rows}``."""
    from ..core.dag import swap_into_place

    df = spark.read.parquet(path)
    files_before = len(_data_files(path))
    parts = _partition_keys(path)
    if parts:
        # Hive-partitioned table: the rewrite must keep the key=value
        # directory layout (dropping it kills partition pruning and collides
        # with the next dynamic-overwrite write).  Hash-shuffling on the
        # partition keys lands each partition value in exactly one task, so
        # each partition directory compacts to a single file.
        out = df.repartition(target_files, *parts).sortWithinPartitions(
            *parts, *(cluster_by or [])
        )
    elif cluster_by and zorder:
        if len(cluster_by) < 2:
            raise ValueError("zorder needs at least 2 cluster columns")
        z = zorder_value(df, cluster_by)
        out = (
            df.withColumn("__z__", z)
            .repartitionByRange(target_files, "__z__")
            .sortWithinPartitions("__z__")
            .drop("__z__")
        )
    elif cluster_by:
        out = df.repartitionByRange(target_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.coalesce(target_files)
    tmp = path + ".__compact__"
    writer = out.write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(tmp)
    swap_into_place(tmp, path)
    spark.catalog.refreshByPath(path)
    result = spark.read.parquet(path)
    return {
        "files_before": files_before,
        "files_after": len(_data_files(path)),
        "rows": result.count(),
    }


def zorder_value(df, cols: list[str], bits: int = 16):
    """Z-order curve value for ``cols``: each column min/max-scaled to a
    ``bits``-bit integer (one tiny agg for the bounds — no global sort, so
    the scaling pass stays narrow at 100 TB), then bit-interleaved.  Rows
    close on the curve are close in EVERY dimension, which is what bounds
    per-file min/max ranges on all cluster columns (the OPTIMIZE ZORDER BY
    effect; Morton 1966)."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n = len(cols)
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                    "bigint"
                ),
            )
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            # bit b of column i lands at position b*n + i (disjoint -> sum)
            z = z + F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i)
    return z
