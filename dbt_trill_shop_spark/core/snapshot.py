"""dbt-style snapshots: SCD Type-2 change capture over a mutable source.

The reference project ships an empty ``snapshots/`` directory
(`dbt_project.yml:16` points snapshot-paths there), i.e. the capability is
part of the execution model it rides on even though no snapshot is defined.
Semantics implemented here = dbt's **timestamp strategy**:

- first run: every row becomes current (``valid_from = updated_at``,
  ``valid_to = NULL``);
- later runs: a source row with the same ``unique_key`` and a *newer*
  ``updated_at`` closes the open row (``valid_to = new updated_at``) and
  opens a new version; unchanged rows pass through; vanished keys stay open
  (dbt default — no hard deletes).

Scale shape: one shuffle on ``unique_key`` (the full-outer join of open rows
vs source); history rows (already closed) are carried through untouched via
union, not re-joined.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VALID_FROM = "dbt_valid_from"
VALID_TO = "dbt_valid_to"


def snapshot_delta(
    existing: DataFrame | None,
    source: DataFrame,
    unique_key: str,
    updated_at: str,
) -> DataFrame:
    """Pure-DataFrame SCD2 step: returns the new snapshot table state."""
    src = source.withColumn(VALID_FROM, F.col(updated_at)).withColumn(
        VALID_TO, F.lit(None).cast(source.schema[updated_at].dataType)
    )
    if existing is None:
        return src

    open_rows = existing.filter(F.col(VALID_TO).isNull())
    closed_rows = existing.filter(F.col(VALID_TO).isNotNull())

    changes = src.select(
        F.col(unique_key).alias("_k"), F.col(updated_at).alias("_new_ts")
    )
    joined = open_rows.join(
        changes,
        (open_rows[unique_key] == F.col("_k"))
        & (F.col("_new_ts") > open_rows[updated_at]),
        "left",
    )
    # open rows: close the changed ones, keep the rest open
    updated_open = joined.withColumn(
        VALID_TO, F.when(F.col("_new_ts").isNotNull(), F.col("_new_ts")).otherwise(F.col(VALID_TO))
    ).drop("_k", "_new_ts")

    # new versions: source rows that are strictly newer than their open row,
    # or whose key has never been seen
    open_keyed = open_rows.select(
        F.col(unique_key).alias("_k"), F.col(updated_at).alias("_old_ts")
    )
    new_versions = (
        src.join(open_keyed, src[unique_key] == F.col("_k"), "left")
        .filter(F.col("_k").isNull() | (src[updated_at] > F.col("_old_ts")))
        .drop("_k", "_old_ts")
    )
    return closed_rows.unionByName(updated_open).unionByName(new_versions)


class SnapshotStore:
    """Parquet-backed snapshot runner (write-then-swap like Project tables).

    Each ``run()`` returns a fresh reader over the new state; DataFrame
    handles returned by *earlier* runs are invalidated by the swap (their
    pinned file listing points at replaced part files) — re-read instead of
    holding them across runs, exactly like a warehouse reader pinned to a
    dropped table snapshot."""

    def __init__(self, path: str) -> None:
        self.path = path

    def run(
        self, spark: SparkSession, source: DataFrame, unique_key: str, updated_at: str
    ) -> DataFrame:
        existing = (
            spark.read.parquet(self.path) if os.path.exists(self.path) else None
        )
        result = snapshot_delta(existing, source, unique_key, updated_at)
        tmp = self.path + ".__new__"
        result.write.mode("overwrite").parquet(tmp)
        old = self.path + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path):
            os.replace(self.path, old)
        os.replace(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        # drop Spark's cached file listing for the swapped path — without this
        # a reader created before the swap resolves to deleted part files
        spark.catalog.refreshByPath(self.path)
        return spark.read.parquet(self.path)
