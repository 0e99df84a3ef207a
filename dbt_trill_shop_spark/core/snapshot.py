"""dbt-style snapshots: SCD Type-2 change capture over a mutable source.

The reference project ships an empty ``snapshots/`` directory
(`dbt_project.yml:16` points snapshot-paths there), i.e. the capability is
part of the execution model it rides on even though no snapshot is defined.
Both dbt strategies are implemented: **timestamp** (``snapshot_delta``) and
**check** (``snapshot_delta_check`` — compares configured columns when the
source has no reliable ``updated_at``).  Timestamp semantics:

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


def snapshot_delta_check(
    existing: DataFrame | None,
    source: DataFrame,
    unique_key: str,
    snapshot_at,
    check_cols: list[str] | None = None,
) -> DataFrame:
    """dbt's **check** snapshot strategy: a row changed iff any of
    ``check_cols`` (default: every non-key column) differs from the open
    version — for sources without a trustworthy ``updated_at``.

    ``snapshot_at`` is the run's timestamp (dbt uses the invocation time;
    passed explicitly here so runs are deterministic and testable).  Changed
    keys close the open row at ``snapshot_at`` and open a new version from
    it; new keys open; vanished keys stay open (no hard deletes).

    Scale shape: both sides reduce to (key, xxhash64(check_cols)) before the
    single key-shuffle join — the wide row never shuffles twice.
    """
    at = F.lit(snapshot_at).cast("timestamp")
    src = source.withColumn(VALID_FROM, at).withColumn(
        VALID_TO, F.lit(None).cast("timestamp")
    )
    if existing is None:
        return src

    cols = check_cols or [c for c in source.columns if c != unique_key]
    # xxhash64 over the checked columns: one 8-byte comparison per pair
    # instead of N column equalities through the join
    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(unique_key).alias("_k"), F.xxhash64(*[F.col(c) for c in cols]).alias("_fp")
        )

    open_rows = existing.filter(F.col(VALID_TO).isNull())
    closed_rows = existing.filter(F.col(VALID_TO).isNotNull())
    changed_keys = (
        fp(open_rows)
        .join(
            fp(source).withColumnRenamed("_fp", "_fp_new"),
            "_k",
        )
        .filter(F.col("_fp") != F.col("_fp_new"))
        .select("_k")
    )
    open_keys = open_rows.select(F.col(unique_key).alias("_k"))

    # close changed open rows at snapshot_at; others stay open
    updated_open = (
        open_rows.join(
            changed_keys.withColumn("_chg", F.lit(True)),
            open_rows[unique_key] == F.col("_k"),
            "left",
        )
        .withColumn(VALID_TO, F.when(F.col("_chg"), at).otherwise(F.col(VALID_TO)))
        .drop("_k", "_chg")
    )
    # new versions: changed keys + never-seen keys
    new_versions = src.join(
        changed_keys.union(
            src.select(F.col(unique_key).alias("_k")).join(open_keys, "_k", "left_anti")
        ).distinct(),
        src[unique_key] == F.col("_k"),
        "left_semi",
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
        self,
        spark: SparkSession,
        source: DataFrame,
        unique_key: str,
        updated_at: str | None = None,
        *,
        strategy: str = "timestamp",
        snapshot_at=None,
        check_cols: list[str] | None = None,
    ) -> DataFrame:
        existing = (
            spark.read.parquet(self.path) if os.path.exists(self.path) else None
        )
        if strategy == "timestamp":
            if updated_at is None:
                raise ValueError("timestamp strategy needs updated_at")
            result = snapshot_delta(existing, source, unique_key, updated_at)
        elif strategy == "check":
            if snapshot_at is None:
                raise ValueError("check strategy needs snapshot_at")
            result = snapshot_delta_check(
                existing, source, unique_key, snapshot_at, check_cols
            )
        else:
            raise ValueError(f"unknown snapshot strategy {strategy!r}")
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
