"""Scale levers: bucketed table sinks (shuffle-free co-located joins) and
salted two-phase aggregation (hot-key mitigation)."""

import pytest

from pyspark.sql import functions as F

from dbt_trill_shop_spark.catalog import load_table
from dbt_trill_shop_spark.core import Materialization, Model, Project
from dbt_trill_shop_spark.operators.skew import salted_agg


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Two tables bucketed on the same key must sort-merge join with NO
    shuffle exchange on either side (bucket co-location replaces it)."""
    p = Project("bk")
    p.table_bucket_spec = {
        "orders_b": (8, ["o_custkey"]),
        "customer_b": (8, ["c_custkey"]),
    }
    p.add_model(
        Model(
            "orders_b",
            lambda s, ref: load_table(s, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            ),
            materialization=Materialization.TABLE,
        )
    )
    p.add_model(
        Model(
            "customer_b",
            lambda s, ref: load_table(s, sf_dir, "customer").select(
                "c_custkey", "c_name"
            ),
            materialization=Materialization.TABLE,
        )
    )
    p.build(spark, run_tests=False)
    try:
        joined = (
            p.ref("orders_b")
            .join(
                p.ref("customer_b"),
                p.ref("orders_b").o_custkey == p.ref("customer_b").c_custkey,
            )
            .groupBy("c_custkey")
            .agg(F.sum("o_totalprice").alias("total"))
        )
        # force a non-broadcast join so the test exercises co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert "SortMergeJoin" in plan, plan[:2000]
        # bucket co-location: neither join side shuffles; the only exchange
        # allowed is none at all (agg key == bucket key side too)
        assert n_exchanges == 0, f"expected shuffle-free bucketed join, saw:\n{plan[:3000]}"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


@pytest.mark.parametrize("buckets", [4, 32])
def test_salted_agg_equals_plain_groupby(spark, sf_dir, buckets):
    ev = load_table(spark, sf_dir, "events")
    got = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("count", "event_id"),
            "max_v": ("max", "value"),
            "min_id": ("min", "event_id"),
        },
        salt_buckets=buckets,
    )
    want = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("max_v"),
        F.min("event_id").alias("min_id"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_plain_join(spark, sf_dir):
    from dbt_trill_shop_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = salted_join(
        orders, customer, key="o_custkey", spread_col="o_orderkey", n_salts=8
    ).select("o_orderkey", "o_custkey", "c_name")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The engine-native t-digest demo stays within 2% of exact; the
    REGISTERED scale-path percentile (reformulated r10, VERDICT r9 #2:
    value-distribution two-phase) must be BIT-IDENTICAL to the exact
    sorting aggregate — same interpolation, no sketch."""
    from dbt_trill_shop_spark.operators.relational import (
        revenue_percentiles,
        revenue_percentiles_approx,
        revenue_percentiles_tdigest,
    )

    exact = {r["o_orderpriority"]: r for r in revenue_percentiles(spark, sf_dir).collect()}
    approx = {
        r["o_orderpriority"]: r for r in revenue_percentiles_tdigest(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for key, e in exact.items():
        a = approx[key]
        for col in ("p50_cents", "p90_cents", "p99_cents"):
            # t-digest with accuracy=1000: within 2% relative on this data
            assert abs(a[col] - e[col]) <= 0.02 * e[col] + 1, (key, col, a[col], e[col])
    twophase = {
        r["o_orderpriority"]: r for r in revenue_percentiles_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == twophase.keys()
    for key, e in exact.items():
        t = twophase[key]
        for col in ("n_orders", "p50_cents", "p90_cents", "p99_cents"):
            assert t[col] == e[col], (key, col, t[col], e[col])


def test_defer_resolves_unselected_refs(spark, sf_dir):
    """dbt --defer: a subset build whose dependencies are unselected reads
    them from the deferred (prod) relations instead of rebuilding — the
    slim-CI loop together with select_state_modified."""
    import tempfile

    from dbt_trill_shop_spark.fixtures import register_trends_sources
    from dbt_trill_shop_spark.models import trends_project

    prod = trends_project(target="prod", warehouse_dir=tempfile.mkdtemp(prefix="prod_"))
    prod.add_sources(register_trends_sources(spark, sf_dir))
    prod.build(spark, run_tests=False)

    ci = trends_project(target="dev", warehouse_dir=tempfile.mkdtemp(prefix="ci_"))
    # no sources registered at all: every input must come from defer
    subset = {"weekly_trends_summary"}
    ci.build(
        spark,
        run_tests=False,
        subset=subset,
        defer_relations={n: prod.relations[n] for n in prod.models},
    )
    assert "weekly_trends_summary" in ci.relations
    assert ci.relations["weekly_trends_summary"].count() == prod.relations[
        "weekly_trends_summary"
    ].count()
    # staging was deferred, not rebuilt in CI's warehouse
    import os

    assert not os.path.exists(
        os.path.join(ci.warehouse_dir, "analytics", "stg_top_terms")
    )


def test_compact_table_clusters_and_bounds_files(spark, sf_dir, tmp_path):
    """compact_table: file count drops to the target, rows survive exactly,
    and range clustering makes per-file min/max ranges non-overlapping on
    the cluster column (footer-pruning effectiveness)."""
    from pyspark.sql import functions as F

    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.operators.maintenance import compact_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_frag")
    # simulate small-files accretion: 32 shuffled fragments
    events.repartition(32).write.parquet(path)

    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats = compact_table(spark, path, target_files=4, cluster_by=["event_id"])
    assert stats["files_before"] >= 32
    assert stats["files_after"] <= 4
    after_df = spark.read.parquet(path)
    assert sorted(map(tuple, after_df.collect())) == before

    # per-file event_id ranges must not overlap (range clustering)
    ranges = (
        after_df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"]


def test_compact_table_preserves_hive_partition_layout(spark, sf_dir, tmp_path):
    """Compacting a Hive-partitioned table must keep the key=value directory
    layout (losing it kills partition pruning and collides with the next
    dynamic-overwrite write) and compact each partition to few files."""
    import os

    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.operators.maintenance import compact_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    events.repartition(8).write.partitionBy("event_type").parquet(path)

    before = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "event_type").collect())
    )
    stats = compact_table(spark, path, target_files=8, cluster_by=["event_id"])
    # layout survived: top level is event_type=... directories, no flat files
    entries = [e for e in os.listdir(path) if not e.startswith(("_", "."))]
    assert entries and all(e.startswith("event_type=") for e in entries)
    # each partition directory compacted to a single file
    for e in entries:
        files = [f for f in os.listdir(os.path.join(path, e)) if f.endswith(".parquet")]
        assert len(files) == 1
    after = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "event_type").collect())
    )
    assert after == before and stats["files_after"] < stats["files_before"]


def test_compact_table_zorder_bounds_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering must bound per-file min/max ranges on BOTH cluster
    columns; linear range clustering on (a, b) only bounds the leading one.
    Compare mean per-file span of the SECOND column under each layout."""
    from pyspark.sql import functions as F

    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.operators.maintenance import compact_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    def mean_span(path, col):
        spans = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )
        return float(spans)

    full_span = (
        events.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    )

    linear = str(tmp_path / "linear")
    events.repartition(16).write.parquet(linear)
    compact_table(spark, linear, target_files=16, cluster_by=["event_id", "user_id"])

    zordered = str(tmp_path / "zorder")
    events.repartition(16).write.parquet(zordered)
    compact_table(
        spark, zordered, target_files=16,
        cluster_by=["event_id", "user_id"], zorder=True,
    )

    # rows survive exactly
    assert sorted(map(tuple, spark.read.parquet(zordered).collect())) == sorted(
        map(tuple, events.collect())
    )
    # linear clustering leaves the 2nd column unclustered (~full span per
    # file); z-order cuts it substantially
    assert mean_span(linear, "user_id") > 0.8 * full_span
    assert mean_span(zordered, "user_id") < 0.6 * mean_span(linear, "user_id")


def test_aqe_splits_skewed_join(spark):
    """The session's AQE settings must actually split a skewed sort-merge
    join at runtime (the 100 TB hot-key lever SCALE.md claims): with one
    key holding 90% of the rows, the final adaptive plan marks the join
    skew=true and reads the skewed side through a split AQEShuffleRead."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id")).alias("k"),
            F.lit("x" * 60).alias("pad"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("b")
        )
        j = left.join(right, "k").groupBy().count()
        # AQE finalizes on this DataFrame's own query execution
        # 9/10 of ids hit k=7 (matches once); the rest keep k=id, of which
        # ids 9,19,…,4999 fall inside the right side's 0..4999 key range
        n = j.collect()[0][0]
        assert n == 180_000 + 500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
