"""SparkSession factory.

Reference behavior being mirrored: the dbt project pins
``"dbt_date:time_zone": "America/Los_Angeles"`` (``dbt_project.yml:24-25``).
Our engine keeps the session timezone configurable but defaults to UTC so that
timestamp->date semantics are deterministic and match the ANSI-SQL oracle; the
reference timezone is available as :data:`REFERENCE_TIMEZONE`.

Scale posture (100 TB): AQE on (runtime re-planning, skew-join splitting,
partition coalescing), broadcast threshold left to Spark's default unless
overridden, and shuffle partitions sized from the environment.  On a real
cluster the same factory is used with ``master=None`` (inherit from
spark-submit) and a much larger ``shuffle_partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

REFERENCE_TIMEZONE = "America/Los_Angeles"  # dbt_project.yml:24-25
DEFAULT_TIMEZONE = "UTC"


def get_spark(
    app_name: str = "dbt-trill-shop-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    tz: str = DEFAULT_TIMEZONE,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master=None`` resolves to ``local[$SPARK_GRAFT_CPUS]`` (default 32) so the
    same code runs unchanged under spark-submit on a cluster, where the master
    comes from the environment instead.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # In local mode every executor thread shares the DRIVER heap, and
        # Spark's unconfigured default is 1g — 32 concurrent sort/join tasks
        # in 1 GB OOM long before the data is big (observed: sort-merge join
        # heap exhaustion at sf0.1 on a 128 GiB box).  Size the single JVM
        # like the executor fleet it stands in for; on a real cluster this is
        # spark-submit's --driver-memory / --executor-memory instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )
        .config("spark.sql.session.timeZone", tz)
        # ANSI mode is Spark 4's default, but the engine's int64 scaled-unit
        # arithmetic DEPENDS on it as the loud tripwire for width-contract
        # violations (README "Numeric dynamic range") — without it an
        # overflowing long accumulator WRAPS SILENTLY.  Pin it so a cluster
        # profile that flips the default cannot downgrade trap to wrap.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones, convert sort-merge joins to broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter pushdown: build a bloom filter from the small
        # side of a shuffle join and push it into the big side's scan —
        # row-group-level pruning for selective fact joins at scale.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow for any pandas-UDF path (ext/ operators) — batch transfer,
        # never row-at-a-time pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
