"""Registry queries over the transaction-logged table layer
(sources/txn_table.py): the ROUND8_TXN_QUERIES wave registered in round
8, the ROUND9_STAGED wave registered in round 9, plus the
txn-materialized mart time travel (VERDICT r8 #5).

Each query deterministically builds a small txn table under a pid-keyed
tmp root from the driver's own parquet tables, exercises an ACID feature
(time travel, MERGE, data skipping, deletion vectors, RESTORE, Bloom
indexes, CDF-driven MV, streaming log tail), and returns a result that
plain ANSI SQL over the SOURCE tables can reproduce — so the DuckDB
oracle never needs to understand the log format.  Money follows the
width contract (README "Numeric dynamic range"): cents cast to
decimal(38,0) BEFORE corpus-spanning sums, HUGEINT in the DuckDB twins,
reported as rounded dollars.  Local parity coverage: the pooled scenario
in tests/test_txn_table.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..localrel import values_relation
from ..sources.txn_table import (
    delete_txn,
    delete_txn_dv,
    merge_txn,
    read_txn,
    read_txn_changes,
    write_txn,
)


def _tmp_root(tag: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"txn_{tag}_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    return d


def _dollars(cents_col: str):
    """Corpus-spanning cents sum -> rounded dollars (decimal(38,0)
    accumulator per the width contract, double only at the boundary)."""
    return F.round(
        F.sum(F.col(cents_col).cast("decimal(38,0)")).cast("double") / 100.0, 2
    )


def _drain_complete(spark: SparkSession, agg: DataFrame, tag: str) -> DataFrame:
    """Drain a complete-mode streaming aggregate into a memory sink and
    return the sink table.  Bounded retry on exactly "Python worker
    failed to connect back" — a worker-SPAWN infrastructure flake on a
    saturated box (each short-lived stream spawns data-source workers);
    any other failure re-raises immediately.  Shuffle partitions pinned
    low for the tiny stateful aggregate."""
    import uuid

    import time as _time

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    last = None
    try:
        for attempt in range(6):
            if attempt:  # back off: immediate re-spawn hits the same
                _time.sleep(2 * attempt)  # saturation that killed attempt 1
            name = f"{tag}_{uuid.uuid4().hex[:10]}"
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                return spark.table(name)
            except Exception as ex:  # noqa: BLE001 - filtered re-raise below
                last = ex
                # same infrastructure class: a worker OOM-killed under a
                # saturated sitting surfaces as "exited unexpectedly"
                if not any(
                    p in str(ex)
                    for p in (
                        "failed to connect back",
                        "worker exited unexpectedly",
                    )
                ):
                    raise
            finally:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    raise last


_SPLIT = "1995-01-01"
_CDF_SPLIT = "1998-01-01"


def txn_timetravel_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: v0 = orders before _SPLIT, v1 = append the rest,
    v2 = DELETE small orders (cents < 100000, three-valued semantics via
    delete_txn).  Result: one row per version with exact count + rounded
    dollar sum — the audit a warehouse runs after an incident ("what did
    the table say on Tuesday?").  Every commit is derived
    deterministically from the source table, so the whole history is
    SQL-expressible without reading the log."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("timetravel")
    write_txn(orders.filter(F.col("o_orderdate") < F.lit(_SPLIT)), root)
    write_txn(orders.filter(F.col("o_orderdate") >= F.lit(_SPLIT)), root)
    delete_txn(spark, root, "cents < 100000")
    parts = [
        read_txn(spark, root, version=v)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .select(F.lit(v).cast("bigint").alias("version"), "n_orders", "total_dollars")
        for v in (0, 1, 2)
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2]).orderBy("version")


TXN_TIMETRAVEL_SQL = f"""
WITH o AS (
    SELECT o_orderkey, o_orderdate,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
v0 AS (SELECT * FROM o WHERE o_orderdate < TIMESTAMP '{_SPLIT} 00:00:00'),
v2 AS (SELECT * FROM o WHERE NOT COALESCE(cents < 100000, FALSE))
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM v0
UNION ALL
SELECT 1, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) FROM o
UNION ALL
SELECT 2, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) FROM v2
ORDER BY version
"""


def txn_merge_latest_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: the customer table is the target; the "change batch" is
    each customer's LATEST order (by date, then key — deterministic),
    upserting a last-order-cents column.  Result: per-segment counts of
    updated vs never-ordered customers plus the rounded updated-dollar
    sum — the reconciliation query after applying a CDC batch."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("last_order_cents", F.lit(None).cast("bigint"))
    )
    orders = load_table(spark, sf_dir, "orders")
    latest = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(
                    F.col("o_orderdate").alias("d"),
                    F.col("o_orderkey").alias("k"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("bigint")
                    .alias("cents"),
                )
            ).alias("m")
        )
        .select(F.col("o_custkey").alias("c_custkey"), F.col("m.cents").alias("cents"))
    )
    root = _tmp_root("mergecdc")
    write_txn(cust, root)
    source = (
        cust.drop("last_order_cents")
        .join(latest, "c_custkey")
        .select(
            "c_custkey", "c_mktsegment", F.col("cents").alias("last_order_cents")
        )
    )
    merge_txn(spark, source, root, on="c_custkey")
    return (
        read_txn(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count("last_order_cents").alias("n_with_orders"),
            _dollars("last_order_cents").alias("updated_dollars"),
        )
        .orderBy("c_mktsegment")
    )


TXN_MERGE_SQL = """
WITH latest AS (
    SELECT o_custkey AS c_custkey,
           (MAX(ROW(o_orderdate, o_orderkey,
                    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))))[3]
               AS last_order_cents
    FROM orders GROUP BY o_custkey
),
merged AS (
    SELECT c.c_custkey, c.c_mktsegment, latest.last_order_cents
    FROM customer c LEFT JOIN latest USING (c_custkey)
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(last_order_cents) AS n_with_orders,
       ROUND(CAST(SUM(CAST(last_order_cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS updated_dollars
FROM merged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def txn_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping: orders land in the table clustered by order-month
    (a realistic arrival-time ingestion layout), then a one-quarter scan
    proves the log's min/max stats prune the file set before any file
    opens.  Result: the quarter's per-month exact aggregate; the pruning
    itself is plan-asserted in the pytest twin (inputFiles strictly
    shrinks) — the SQL oracle checks values only."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("skipscan")
    # repartitionByRange, not hash repartition: data skipping lives or
    # dies on CLUSTERING — hash spreads every month across every file
    # (each file's [min, max] then spans the calendar and nothing ever
    # prunes), while range partitioning gives contiguous month ranges per
    # file so the quarter predicate excludes most files outright.  The
    # explicit partition count keeps AQE from coalescing the demo to one
    # file at tiny SFs.
    write_txn(orders.repartitionByRange(8, "month"), root)
    q = read_txn(spark, root, prune={"month": ("1996-01", "1996-03")}).filter(
        F.col("month").between("1996-01", "1996-03")
    )
    return (
        q.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("dollars"),
        )
        .orderBy("month")
    )


TXN_SKIPPING_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS dollars
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1996-01' AND '1996-03'
GROUP BY 1
ORDER BY 1
"""

def txn_cdf_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED driving an incremental consumer (VERDICT r7 #3):
    a documents table grows by two append commits, each carrying PLANTED
    exact duplicates (re-keyed copies of earlier docs — doc_id + 10000 /
    + 20000); the consumer syncs from the change feed ONLY (never
    re-reading the table), pushing each commit's inserted rows through
    ``incremental_dedup_store``.  Batch-1 plants (copies of base docs)
    die against the base fingerprint store; batch-2 plants (copies of
    batch-1 docs) die against fingerprints the CONSUMER ITSELF appended
    after batch 1 — proving the store rolls forward commit by commit.
    Result: the surviving (doc_id, fingerprint) per commit.

    This is the 100 TB incremental shape end-to-end: the CDF reads only
    the two commits' files, the dedup ships only (fingerprint, id) pairs,
    and the base corpus is touched once to seed the store."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10).alias("m")
    )
    root = _tmp_root("cdf")
    store = _tmp_root("cdfstore")
    write_txn(docs.filter("m < 6").drop("m"), root)  # v0: base corpus
    b1 = docs.filter("m IN (6, 7)").unionByName(
        docs.filter("m < 2").withColumn("doc_id", F.col("doc_id") + 10000)
    )
    write_txn(b1.drop("m"), root)  # v1: new docs + dups of base
    b2 = docs.filter("m IN (8, 9)").unionByName(
        docs.filter("m = 6").withColumn("doc_id", F.col("doc_id") + 20000)
    )
    write_txn(b2.drop("m"), root)  # v2: new docs + dups of batch 1
    # seed the fingerprint store from the base snapshot (one-time backfill)
    from ..ext.dedup import incremental_dedup_store

    read_txn(spark, root, version=0).select(
        F.md5(F.col("text").cast("binary")).alias("fingerprint")
    ).distinct().write.mode("overwrite").parquet(store)
    inserts = read_txn_changes(spark, root, from_version=0).filter(
        F.col("_change_type") == "insert"
    )
    parts = []
    for v in (1, 2):
        batch = inserts.filter(F.col("_commit_version") == v).select(
            "doc_id", "text"
        )
        kept = incremental_dedup_store(spark, batch, store)
        parts.append(
            kept.withColumn("commit_version", F.lit(v).cast("bigint"))
        )
    return parts[0].unionByName(parts[1]).orderBy("commit_version", "doc_id")


TXN_CDF_DEDUP_SQL = """
WITH fp AS (
    SELECT doc_id, md5(text) AS fingerprint, doc_id % 10 AS m FROM documents
),
base AS (SELECT DISTINCT fingerprint FROM fp WHERE m < 6),
b1 AS (
    SELECT doc_id, fingerprint FROM fp WHERE m IN (6, 7)
    UNION ALL
    SELECT doc_id + 10000, fingerprint FROM fp WHERE m < 2
),
c1 AS (
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS doc_id
    FROM b1 GROUP BY fingerprint
),
s1 AS (
    SELECT c.doc_id, c.fingerprint
    FROM c1 c ANTI JOIN base s ON s.fingerprint = c.fingerprint
),
seen2 AS (
    SELECT fingerprint FROM base
    UNION
    SELECT fingerprint FROM s1
),
b2 AS (
    SELECT doc_id, fingerprint FROM fp WHERE m IN (8, 9)
    UNION ALL
    SELECT doc_id + 20000, fingerprint FROM fp WHERE m = 6
),
c2 AS (
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS doc_id
    FROM b2 GROUP BY fingerprint
),
s2 AS (
    SELECT c.doc_id, c.fingerprint
    FROM c2 c ANTI JOIN seen2 s ON s.fingerprint = c.fingerprint
)
SELECT doc_id, fingerprint, CAST(1 AS BIGINT) AS commit_version FROM s1
UNION ALL
SELECT doc_id, fingerprint, CAST(2 AS BIGINT) AS commit_version FROM s2
ORDER BY commit_version, doc_id
"""

def txn_dv_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors (STAGED for round 9):
    orders land range-clustered; a selective DELETE tombstones rows in a
    kilobyte sidecar with ZERO data files rewritten (the pytest twin
    asserts the file set is byte-identical across the commit), then the
    result reads both sides of the commit — the pre-delete snapshot via
    time travel and the post-delete merge-on-read view.  Every row is
    derived deterministically from the source table, so plain SQL
    reproduces both states without understanding tombstones."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("dvdel")
    write_txn(orders.repartitionByRange(8, "o_orderkey"), root)
    # a predicate matching NOTHING commits nothing and returns the current
    # version (degenerate inputs: empty table, all-NULL cents) — read the
    # RETURNED version for the "after" row rather than assuming v1 exists
    v_after = delete_txn_dv(spark, root, "cents < 15000000")  # under $150k
    parts = [
        read_txn(spark, root, version=v)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .select(
            F.lit(label).cast("bigint").alias("version"),
            "n_orders",
            "total_dollars",
        )
        for label, v in ((0, 0), (1, v_after))
    ]
    return parts[0].unionByName(parts[1]).orderBy("version")


TXN_DV_DELETE_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
kept AS (SELECT * FROM o WHERE NOT COALESCE(cents < 15000000, FALSE))
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM o
UNION ALL
SELECT 1, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
FROM kept
ORDER BY version
"""

def stream_txn_tail_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Txn table AS a streaming SOURCE (STAGED for round 9): three append
    commits land in a txn table; a Structured Streaming query tails the
    commit log (``sources/txn_stream.py`` — offsets are log versions, one
    input partition per added file, Arrow-batch reads) and drains into a
    per-priority rollup.  Micro-batch boundaries cannot change a sum, so
    the drained aggregate equals plain SQL over the source table — and
    together with ``txn_stream_sink`` this closes the loop: one pipeline
    commits, downstream pipelines tail."""
    from ..sources.txn_stream import stream_txn_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("streamtail")
    for m in (0, 1, 2):  # three commits = three tailed micro-batch sources
        write_txn(orders.filter(F.col("o_orderkey") % 3 == m), root)
    src = stream_txn_table(spark, root)
    agg = src.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dollars("cents").alias("total_dollars"),
    )
    return _drain_complete(spark, agg, "txn_tail").orderBy("o_orderpriority")


STREAM_TXN_TAIL_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# Staged for the round-9 window (the round-8 window is frozen at 50):
# parity-tested alongside the registered queries by the pooled scenario.
# r9 wiring data (all plan scale-audit CLEAN, sf0.1 oracle-green on
# local[32] at ambient ~1.0): q_txn_dv_delete warm 2.3 s (cold 5.5),
# q_txn_restore warm 0.9 s (cold 3.0), s_stream_txn_tail warm 2.7 s
# (cold 8.1 — stream machinery spin-up dominates), q_txn_dv_update
# warm 1.6 s (cold 2.9), q_txn_bloom_lookup warm 2.1 s (cold 2.8),
# q_txn_incremental_mv warm 2.6 s (cold 9.3 — three syncs inherent to
# the story); x_rerank_bridge (ext/textstats.rerank_bridge_topk) warm
# 2.0 s (cold 10.5, Arrow worker spin-up).
def txn_restore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE (STAGED for round 9): v0 = full orders table, v1 = a
    fat-fingered DELETE, v2 = `restore_txn` back to v0 — one metadata-only
    commit, instant at any table size.  Result: one row per version; the
    restored state equals the original exactly while the mistake stays
    reachable in history (time travel to v1)."""
    from ..sources.txn_table import restore_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("restore")
    write_txn(orders, root)                          # v0
    delete_txn(spark, root, "cents >= 10000000")     # v1: oops — $100k+ gone
    restore_txn(root, 0)                             # v2: instant rollback
    parts = [
        read_txn(spark, root, version=v)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .select(F.lit(v).cast("bigint").alias("version"), "n_orders", "total_dollars")
        for v in (0, 1, 2)
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2]).orderBy("version")


TXN_RESTORE_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
v1 AS (SELECT * FROM o WHERE NOT COALESCE(cents >= 10000000, FALSE))
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM o
UNION ALL
SELECT 1, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) FROM v1
UNION ALL
SELECT 2, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) FROM o
ORDER BY version
"""

def txn_dv_update_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE via deletion vectors (STAGED for round 9):
    orders land range-clustered; a selective repricing (a flat $10,000
    credit to every $450k+ order — integer cents math, so exact) runs as
    ``update_txn_dv``: tombstones + the updated rows only, untouched
    files byte-identical (plan-asserted in the pytest twin).  The result
    reads both sides — the pre-update snapshot via time travel and the
    post-update merge-on-read view; plain SQL reproduces both without
    understanding tombstones."""
    from ..sources.txn_table import update_txn_dv

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("dvupd")
    write_txn(orders.repartitionByRange(8, "o_orderkey"), root)
    v_after = update_txn_dv(
        spark, root, "cents >= 45000000", {"cents": "cents - 1000000"}
    )
    parts = [
        read_txn(spark, root, version=v)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .select(
            F.lit(label).cast("bigint").alias("version"),
            "n_orders",
            "total_dollars",
        )
        for label, v in ((0, 0), (1, v_after))
    ]
    return parts[0].unionByName(parts[1]).orderBy("version")


TXN_DV_UPDATE_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
repriced AS (
    SELECT o_orderkey,
           CASE WHEN COALESCE(cents >= 45000000, FALSE)
                THEN cents - 1000000 ELSE cents END AS cents
    FROM o
)
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM o
UNION ALL
SELECT 1, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
FROM repriced
ORDER BY version
"""


def txn_bloom_point_lookups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER data skipping (STAGED for round 9): orders land
    hash-scattered across files — the realistic ingest layout where every
    file's [min, max] for a high-cardinality key spans the whole domain
    and interval stats can never prune — then ``set_bloom_txn`` indexes
    ``o_orderkey`` and five point lookups (the five largest orders, keys
    chosen deterministically from the source) each open only the file(s)
    whose bloom admits the key.  The pruning itself is plan-asserted in
    the pytest twin (inputFiles strictly shrinks per lookup); the SQL
    oracle checks the returned rows.  m sized ~10 bits per distinct key
    per file at sf0.1 (README bloom sizing note)."""
    from ..sources.txn_table import set_bloom_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    # NULL keys/amounts cannot be looked up (degenerate-twin contract):
    # exclude them from the key pick on BOTH engines
    keys = [
        int(r.o_orderkey)
        for r in orders.where(
            F.col("o_orderkey").isNotNull() & F.col("cents").isNotNull()
        )
        .orderBy(F.desc("cents"), "o_orderkey")
        .limit(5)
        .collect()
    ]
    root = _tmp_root("bloomlkp")
    write_txn(orders.repartition(8), root)
    set_bloom_txn(spark, root, {"o_orderkey": 1 << 18})  # 32 KiB/file bitset
    lookup = read_txn(spark, root).select(
        "o_orderkey",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("dollars"),
    )
    parts = [
        read_txn(spark, root, where=f"o_orderkey = {k}").select(
            "o_orderkey",
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("dollars"),
        )
        for k in keys
    ]
    if not parts:  # empty/all-NULL source: no keys to look up
        return lookup.limit(0).orderBy("o_orderkey")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("o_orderkey")


TXN_BLOOM_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
keys AS (
    SELECT o_orderkey FROM o
    WHERE o_orderkey IS NOT NULL AND cents IS NOT NULL
    ORDER BY cents DESC, o_orderkey LIMIT 5
)
SELECT o.o_orderkey,
       ROUND(CAST(o.cents AS DOUBLE) / 100.0, 2) AS dollars
FROM o JOIN keys USING (o_orderkey)
ORDER BY o.o_orderkey
"""


def txn_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate MV (STAGED for round 9): a
    per-priority revenue mart over an orders txn table stays fresh by
    folding each commit's CHANGE-DATA-FEED diff — bootstrap after the
    first load, then one delta-sync per commit (an append, then a
    selective deletion-vector delete).  The final MV must equal a full
    GROUP BY of the final table state (the DuckDB oracle); the
    incrementality itself (watermarks advance, sync cost ∝ changes) is
    pytest-asserted."""
    from ..sources.txn_mv import sync_agg_mv

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("mvsrc")
    mv = _tmp_root("mvagg")
    write_txn(orders.filter(F.col("o_orderkey") % 3 < 2), root)     # v0
    sync_agg_mv(spark, root, mv, ["o_orderpriority"], ["cents"])    # bootstrap
    write_txn(orders.filter(F.col("o_orderkey") % 3 == 2), root)    # v1
    sync_agg_mv(spark, root, mv, ["o_orderpriority"], ["cents"])    # delta
    delete_txn_dv(spark, root, "cents < 10000000")                  # v2: < $100k
    sync_agg_mv(spark, root, mv, ["o_orderpriority"], ["cents"])    # delta
    return (
        read_txn(spark, mv)
        .select(
            "o_orderpriority",
            "n_rows",
            F.round(F.col("sum_cents").cast("double") / 100.0, 2).alias(
                "total_dollars"
            ),
        )
        .orderBy("o_orderpriority")
    )


TXN_INCREMENTAL_MV_SQL = """
WITH o AS (
    SELECT o_orderpriority,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
kept AS (SELECT * FROM o WHERE NOT COALESCE(cents < 10000000, FALSE))
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS total_dollars
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def txn_mart_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``weekly_trends_summary`` mart materialized as a
    TXN TABLE through the pipeline (``core/dag.py`` ``TXN_TABLE`` path —
    the dbt semantics sitting on the ACID layer, VERDICT r8 #5): build #1
    commits the true mart; build #2 commits a CORRUPTED rebuild (the
    international half missing — a bad upstream refresh); the query
    time-travels one build back (``ref_at(version=0)``) and returns the
    mart exactly as it stood before the bad run — so it must match the
    mart's own DuckDB oracle even though the table's HEAD differs.

    Reference parity: models/marts/weekly_trends_summary.sql:1-110 for
    the mart semantics; the materialization is the engine-side extension
    (each dbt build = one atomic log commit, time travel across runs)."""
    from ..core import Materialization, Model, Project
    from ..models.trends import build_trends_relations

    mart = build_trends_relations(spark, sf_dir)["weekly_trends_summary"]
    root = _tmp_root("martv")
    p = Project("txn_mart", warehouse_dir=root)
    state = {"good": True}

    def builder(s, ref):
        if state["good"]:
            return mart
        return mart.filter(F.col("market_scope") == F.lit("US Market"))

    p.add_model(
        Model(
            "weekly_trends_summary",
            builder,
            materialization=Materialization.TXN_TABLE,
        )
    )
    p.build(spark, run_tests=False)   # v0: the true mart (one atomic commit)
    state["good"] = False
    p.build(spark, run_tests=False)   # v1: truncated rebuild at head
    return p.ref_at(spark, "weekly_trends_summary", version=0)


def txn_clone_what_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE (STAGED for round 10): the zero-copy what-if fork —
    clone the orders table (``clone_txn``: the clone's v0 references the
    source's files, no data bytes move), MERGE a re-pricing batch into
    the CLONE only, and report (side, n_orders, total_dollars) for both.
    The source aggregate equals plain SQL over orders (untouched); the
    clone diverges by exactly the merged rows.  At 100 TB this is how a
    backfill rehearsal starts in milliseconds instead of a day of
    copying."""
    from ..sources.txn_table import clone_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    src_root = _tmp_root("clonesrc")
    write_txn(orders, src_root)
    dst_root = _tmp_root("clonedst")
    clone_txn(src_root, dst_root)
    batch = orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        "o_orderkey", (F.col("cents") * 2).alias("cents")
    )
    merge_txn(spark, batch, dst_root, on="o_orderkey")

    def agg(root: str, side: str) -> DataFrame:
        return (
            read_txn(spark, root)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                _dollars("cents").alias("total_dollars"),
            )
            .select(F.lit(side).alias("side"), "n_orders", "total_dollars")
        )

    return agg(dst_root, "clone_repriced").unionByName(
        agg(src_root, "source_untouched")
    ).orderBy("side")


TXN_CLONE_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
repriced AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 1000 = 0 THEN cents * 2 ELSE cents END AS cents
    FROM o
)
SELECT 'clone_repriced' AS side, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM repriced
UNION ALL
SELECT 'source_untouched', COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
FROM o
ORDER BY side
"""


def stream_txn_cdf_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CHANGE DATA FEED (STAGED for round 10): v0 = orders
    before _SPLIT, v1 = append the rest, v2 = DV-delete the small orders
    (merge-on-read — data files untouched); ``stream_txn_changes`` tails
    the log and drains into a per-(commit, change-type) rollup.  The
    stream and the batch CDF consume the same ``_changes_plan`` walk, so
    the drained aggregate is derivable by plain SQL over orders."""
    from ..sources.txn_stream import stream_txn_changes
    from ..sources.txn_table import delete_txn_dv

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("cdfstream")
    write_txn(orders.filter(F.col("o_orderdate") < F.lit(_CDF_SPLIT)), root)
    write_txn(orders.filter(F.col("o_orderdate") >= F.lit(_CDF_SPLIT)), root)
    delete_txn_dv(spark, root, "cents >= 10000000")
    src = stream_txn_changes(spark, root)
    agg = src.groupBy("_commit_version", "_change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dollars("cents").alias("total_dollars"),
    )
    return _drain_complete(spark, agg, "txn_cdf").orderBy(
        "_commit_version", "_change_type"
    )


STREAM_TXN_CDF_SQL = f"""
WITH o AS (
    SELECT o_orderdate,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
)
SELECT CAST(0 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
       COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM o WHERE o_orderdate < TIMESTAMP '{_CDF_SPLIT} 00:00:00'
UNION ALL
SELECT 2, 'delete', COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
FROM o WHERE cents >= 10000000
UNION ALL
SELECT 1, 'insert', COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
FROM o WHERE o_orderdate >= TIMESTAMP '{_CDF_SPLIT} 00:00:00'
ORDER BY _commit_version, _change_type
"""


def txn_cdf_reembed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh end-to-end (STAGED for round 10): the
    documents corpus lives in a txn table; an upstream refresh MERGEs
    edited texts (file-pruned rewrite); the embedding consumer reads the
    CHANGE FEED, re-embeds ONLY the rewritten rows through the
    Arrow-batched bridge, and splices them over its v0 state.  The
    result must equal embedding the FINAL corpus from scratch — while
    the consumer's work was proportional to the changed files, never the
    corpus.  This is the maintenance loop a 100 TB training-data
    pipeline actually runs: nobody re-embeds a petabyte because 0.1%% of
    documents changed.

    Long-formed (doc_id, dim_idx, unit_weight) like ``x_embed_bridge``
    so the driver's value-hash oracle applies bit-exactly."""
    from ..ext.textstats import embed_bridge_longform

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _tmp_root("cdfreembed")
    # key-clustered layout (range, not hash): the refresh below edits a
    # CONTIGUOUS id range, so the merge's interval pruning rewrites a
    # strict subset of files — the property the whole story rests on
    write_txn(docs.repartitionByRange(8, "doc_id"), root)   # v0: corpus
    batch = docs.filter(F.col("doc_id") < 40).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" refreshed corpus update")).alias("text"),
    )
    merge_txn(spark, batch, root, on="doc_id")              # v1: refresh
    changes = read_txn_changes(spark, root, from_version=0)
    # the rewritten files' rows (upserts AND co-located survivors — both
    # carry their final text, so re-embedding the superset is exact);
    # unkeyed rows cannot be merge-matched and keep their v0 embedding
    fresh_docs = changes.filter(
        "_change_type = 'insert' AND doc_id IS NOT NULL"
    ).select("doc_id", "text")
    base_docs = read_txn(spark, root, version=0).join(
        fresh_docs.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    out = embed_bridge_longform(base_docs, dim=16).unionByName(
        embed_bridge_longform(fresh_docs, dim=16)
    )
    return out.orderBy("doc_id", "dim_idx")


def _cdf_reembed_sql() -> str:
    from ..ext.textstats import _HASHED_EMB_CTE, EMBED_BRIDGE_SQL_TEMPLATE

    tail = EMBED_BRIDGE_SQL_TEMPLATE.split(",\nnorms AS", 1)[1]
    return (
        "WITH moddocs AS (\n"
        "    SELECT doc_id,\n"
        "           CASE WHEN doc_id < 40\n"
        "                THEN text || ' refreshed corpus update'\n"
        "                ELSE text END AS text\n"
        "    FROM documents\n"
        "), "
        + _HASHED_EMB_CTE.replace("FROM documents", "FROM moddocs").lstrip()
        + ",\nnorms AS"
        + tail
    ).format(dim=16)


TXN_CDF_REEMBED_SQL = _cdf_reembed_sql()


def _parent_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.textstats import parent_doc_retrieval

    return parent_doc_retrieval(load_table(spark, sf_dir, "documents"))


def _parent_retrieval_sql() -> str:
    from ..ext.textstats import PARENT_RETRIEVAL_SQL_TEMPLATE

    return PARENT_RETRIEVAL_SQL_TEMPLATE.format(
        num_queries=3, dim=32, window=32, stride=24, k_chunks=20, k_parents=5
    )


def txn_replace_where_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic predicate-scoped overwrite — Delta's ``replaceWhere``, the
    dbt ``insert_overwrite`` backfill (STAGED for round 10): orders land
    range-clustered by month, then the 1995 band is RECOMPUTED (a flat
    12,345-cent audit adjustment per order — integer cents, exact) and
    swapped in with ONE ``replace_where_txn`` commit.  Files outside the
    band are neither read nor rewritten (the scenario plan-asserts the
    untouched files survive by path; fully-covered files drop by
    metadata-only remove; only boundary files get DV tombstones), and a
    reader never observes the gap between the delete and the insert —
    the property separate DELETE + append commits cannot give at 100 TB.
    Result: pre/post totals plus the in-band total, all SQL-expressible
    from the source table."""
    from ..sources.txn_table import replace_where_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("replwhere")
    # range-clustered: the band predicate then PRUNES most files outright
    # (hash layout would span every month in every file — see
    # txn_skipping_scan's note)
    write_txn(orders.repartitionByRange(8, "month"), root)
    band = "month >= '1995-01' AND month < '1996-01'"
    batch = orders.filter(F.expr(band)).withColumn(
        "cents", (F.col("cents") + F.lit(12345)).cast("bigint")
    )
    v1 = replace_where_txn(spark, root, band, batch)
    in_band = F.col("month").between("1995-01", "1995-12")
    parts = [
        read_txn(spark, root, version=v)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
            F.round(
                F.sum(
                    F.when(in_band, F.col("cents"))
                    .otherwise(F.lit(0))
                    .cast("decimal(38,0)")
                ).cast("double")
                / 100.0,
                2,
            ).alias("band_dollars"),
        )
        .select(
            F.lit(label).cast("bigint").alias("version"),
            "n_orders",
            "total_dollars",
            "band_dollars",
        )
        for label, v in ((0, 0), (1, v1))
    ]
    return parts[0].unionByName(parts[1]).orderBy("version")


TXN_REPLACE_WHERE_SQL = """
WITH o AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
a AS (
    SELECT month,
           CASE WHEN month >= '1995-01' AND month < '1996-01'
                THEN cents + 12345 ELSE cents END AS cents
    FROM o
)
SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS total_dollars,
       ROUND(CAST(SUM(CASE WHEN month BETWEEN '1995-01' AND '1995-12'
                           THEN CAST(cents AS HUGEINT) ELSE 0 END)
                  AS DOUBLE) / 100.0, 2) AS band_dollars
FROM o
UNION ALL
SELECT 1, COUNT(*),
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2),
       ROUND(CAST(SUM(CASE WHEN month BETWEEN '1995-01' AND '1995-12'
                           THEN CAST(cents AS HUGEINT) ELSE 0 END)
                  AS DOUBLE) / 100.0, 2)
FROM a
ORDER BY version
"""


def txn_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering compaction (STAGED for round 10): orders land
    hash-scattered (realistic multi-writer ingest — every file spans the
    whole key domain, nothing prunes), then ``compact_txn(...,
    zorder=True)`` rewrites them clustered on the Morton interleave of
    (month index, customer bucket) so the log's min/max stats prune a
    2-D BOX predicate on EITHER dimension — the layout lexicographic
    clustering cannot give (its second dimension never prunes; the
    pytest scenario plan-asserts both dims shrink the file set).  Result:
    the 1995 × low-bucket box per-month aggregate, SQL-expressible from
    the source — Z-order changes LAYOUT, never values."""
    from ..sources.txn_table import compact_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            (F.year("o_orderdate") - F.lit(1992)) * 12
            + F.month("o_orderdate")
            - 1
        ).cast("bigint").alias("mx"),
        (F.col("o_custkey") % 256).cast("bigint").alias("cb"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("zorder")
    write_txn(orders.repartition(8), root)
    compact_txn(spark, root, target_files=16, cluster_by=["mx", "cb"], zorder=True)
    q = read_txn(spark, root, where="mx >= 36 AND mx < 48 AND cb < 32")
    return (
        q.groupBy("mx")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("dollars"),
        )
        .orderBy("mx")
    )


TXN_ZORDER_SQL = """
WITH o AS (
    SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mx,
           CAST(o_custkey % 256 AS BIGINT) AS cb,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
)
SELECT mx, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS dollars
FROM o
WHERE mx >= 36 AND mx < 48 AND cb < 32
GROUP BY mx
ORDER BY mx
"""


def txn_vacuum_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM after DML + compaction (STAGED for round 10): a rewrite
    DELETE and a small-file compaction leave two generations of
    unreferenced files on disk; ``vacuum_txn`` sweeps them under the
    retention floor while every file the retained snapshot references
    stays readable — the result re-reads the table AFTER the sweep, so a
    vacuum that deleted a live file would fail the oracle, not just a
    file count.  ``swept_any`` is structurally deterministic (the
    pre-delete and pre-compaction generations are always unreferenced at
    retain_versions=1), so plain SQL can assert it."""
    from ..sources.txn_table import vacuum_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("vacuum")
    write_txn(orders.repartition(8), root)           # v0: 8-file ingest
    delete_txn(spark, root, "cents < 5000000")       # v1: rewrite delete
    from ..sources.txn_table import compact_txn

    compact_txn(spark, root, target_files=2)         # v2: maintenance
    swept = vacuum_txn(root, retain_versions=1, min_age_sec=0.0)
    return read_txn(spark, root).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dollars("cents").alias("total_dollars"),
        F.lit(bool(swept)).alias("swept_any"),
    )


TXN_VACUUM_SQL = """
SELECT COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS total_dollars,
       TRUE AS swept_any
FROM orders
WHERE NOT COALESCE(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) < 5000000,
                   FALSE)
"""


def txn_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED COLUMNS (Delta's ``GENERATED ALWAYS AS``, staged r11):
    build an events txn table whose ``event_date`` is declared generated
    from ``CAST(ts AS DATE)``, append a second batch that OMITS the
    column entirely (computed in-pass by ``_apply_generated``), and roll
    up per generated date.  The oracle reproduces the rollup from the raw
    events table with the same expression — matching values prove the
    computed column equals the declared expression on every row of both
    batches.  The staged-but-validated side (a batch SUPPLYING a wrong
    value fails the implicit CHECK) is covered by the pooled scenario."""
    from ..sources.txn_table import set_generated_txn

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("gencols")
    base = ev.withColumn("event_date", F.col("ts").cast("date"))
    write_txn(base.filter("event_id % 2 = 0").repartition(4), root)  # v0
    set_generated_txn(spark, root, {"event_date": "CAST(ts AS DATE)"})  # v1
    # v2: the second half of the corpus arrives WITHOUT event_date —
    # the write path computes it from the declaration
    write_txn(ev.filter("event_id % 2 = 1").coalesce(1), root)
    return (
        read_txn(spark, root)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dollars("cents").alias("total_value"),
        )
        .orderBy("event_date")
    )


TXN_GENERATED_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT))
                  AS DOUBLE) / 100.0, 2) AS total_value
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
"""


def txn_ndv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RESIDENT NDV STATISTICS (staged r11): declare KMV bottom-k
    sketches on two columns, backfill the live files, append a second
    batch whose sketches compute in-pass, then estimate table-level
    distinct counts FROM THE LOG ALONE (``ndv_estimate_txn`` opens zero
    data files).  The KMV union property makes the merged estimate equal
    the single-pass estimate over the raw data — which is exactly what
    the DuckDB oracle computes with the same md5-prefix hash and the
    same integer-exact bottom-k formula, so the log arithmetic is
    value-hash verified.  Row split across commits is irrelevant by
    construction (bottom-k of a union of per-file bottom-k's == global
    bottom-k), which the scenario also asserts under compaction."""
    from ..sources.txn_table import ndv_estimate_txn, set_ndv_txn

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    root = _tmp_root("ndv")
    write_txn(ev.filter("event_id % 3 != 2").repartition(4), root)  # v0
    set_ndv_txn(spark, root, {"user_id": 64, "event_type": 64})     # v1
    write_txn(ev.filter("event_id % 3 = 2").coalesce(2), root)      # v2
    est = ndv_estimate_txn(root)
    return values_relation(
        spark, sorted(est.items()), "column_name string, est_ndv long"
    ).orderBy("column_name")


TXN_NDV_SQL = """
WITH hu AS (
    SELECT DISTINCT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                         AS BIGINT) AS h
    FROM events WHERE user_id IS NOT NULL
), ru AS (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hu
), ht AS (
    SELECT DISTINCT CAST('0x' || substring(md5(CAST(event_type AS VARCHAR)), 1, 8)
                         AS BIGINT) AS h
    FROM events WHERE event_type IS NOT NULL
), rt AS (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ht
)
SELECT * FROM (
    SELECT 'event_type' AS column_name,
           CAST(COALESCE((63 * 4294967296) // (MAX(CASE WHEN rn = 64 THEN h END) + 1),
                         COUNT(*)) AS BIGINT) AS est_ndv
    FROM rt
    UNION ALL
    SELECT 'user_id' AS column_name,
           CAST(COALESCE((63 * 4294967296) // (MAX(CASE WHEN rn = 64 THEN h END) + 1),
                         COUNT(*)) AS BIGINT) AS est_ndv
    FROM ru
)
ORDER BY column_name
"""


# the overlap demo's orders band: ONE data year (order dates start
# 1995-01-01), so each customer holds ~1.5 orders in-band and the
# band-vs-dimension key overlap is genuinely partial (~78%), not 0 or 1
_OVERLAP_BAND = "1996-01-01"


def txn_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY OVERLAP from log sketches (staged r11): two txn tables
    (orders keyed o_custkey, customer keyed c_custkey) each carry KMV NDV
    sketches; ``ndv_overlap_estimate_txn`` estimates their key overlap —
    union NDV, intersection NDV, Jaccard — from the LOGS ALONE (zero data
    file opens on either side), the statistic a planner needs to pick a
    join strategy at 100 TB.  The oracle reproduces the identical KMV set
    arithmetic from the raw tables (the sketch-union property makes the
    merged log sketch equal the direct bottom-k), so the planner numbers
    are value-hash verified.  TPC-H shape makes the estimate meaningful:
    every order's custkey exists in customer, but only ~2/3 of customers
    have orders."""
    from ..sources.txn_table import ndv_overlap_estimate_txn, set_ndv_txn

    # the orders side is one date band (a backfill-scoped table) so the
    # overlap question is non-trivial: which fraction of the customer
    # dimension does this band touch?
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(_OVERLAP_BAND))
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ra, rb = _tmp_root("ovl_a"), _tmp_root("ovl_b")
    write_txn(orders.repartition(4), ra)
    set_ndv_txn(spark, ra, {"o_custkey": 64})
    write_txn(cust.repartition(2), rb)
    set_ndv_txn(spark, rb, {"c_custkey": 64})
    est = ndv_overlap_estimate_txn(ra, "o_custkey", rb, "c_custkey")
    return values_relation(
        spark,
        [(est["union_ndv"], est["intersection_ndv"], est["jaccard_ppm"])],
        "union_ndv long, intersection_ndv long, jaccard_ppm long",
    )


TXN_SKETCH_OVERLAP_SQL = f"""
WITH ha AS (
    SELECT DISTINCT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                         AS BIGINT) AS h
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_orderdate < TIMESTAMP '{_OVERLAP_BAND} 00:00:00'
),
a AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ha)
      WHERE rn <= 64),
hb AS (
    SELECT DISTINCT CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                         AS BIGINT) AS h
    FROM customer WHERE c_custkey IS NOT NULL
),
b AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hb)
      WHERE rn <= 64),
su AS (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)),
s AS (SELECT h, rn FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM su)
      WHERE rn <= 64),
m AS (
    SELECT COUNT(*) AS n_s,
           MAX(CASE WHEN rn = 64 THEN h END) AS h_k,
           SUM(CASE WHEN h IN (SELECT h FROM a)
                     AND h IN (SELECT h FROM b) THEN 1 ELSE 0 END) AS matches
    FROM s
),
u AS (
    SELECT n_s, matches,
           CASE WHEN n_s < 64 THEN n_s
                ELSE (63 * 4294967296) // (h_k + 1) END AS union_ndv
    FROM m
)
SELECT CAST(COALESCE(union_ndv, 0) AS BIGINT) AS union_ndv,
       CAST(COALESCE(matches * union_ndv // NULLIF(n_s, 0), 0) AS BIGINT)
           AS intersection_ndv,
       CAST(COALESCE(matches * 1000000 // NULLIF(n_s, 0), 0) AS BIGINT)
           AS jaccard_ppm
FROM u
"""


def txn_merge_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL MERGE grammar (staged r11): one statement applies a CDC batch
    to the customer txn table — matched 'D' rows hard-delete, matched 'U'
    rows update (balance += the customer's 1996+ order cents), unmatched
    source rows would insert (none here: FK), and targets NOT matched by
    source purge when their balance is negative (the full-sync clause,
    which forces the honest table-wide rewrite — see merge_when_txn).
    The oracle reproduces the exact clause semantics with a LEFT JOIN +
    two NOT filters, so every branch of the grammar is value-hash
    verified."""
    from ..sources.txn_table import merge_when_txn

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_OVERLAP_BAND))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("ord_cents")
        )
        .withColumn(
            "op",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
    )
    root = _tmp_root("mergewhen")
    write_txn(cust.repartition(4), root)
    merge_when_txn(
        spark, src, root, on="c_custkey",
        matched_update={"cents": "t.cents + s.ord_cents"},
        matched_delete="s.op = 'D'",
        not_matched_by_source_delete="t.cents < 0",
    )
    return (
        read_txn(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dollars("cents").alias("total_dollars"),
        )
        .orderBy("c_mktsegment")
    )


TXN_MERGE_WHEN_SQL = f"""
WITH src AS (
    SELECT o_custkey AS k,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS ord_cents,
           CASE WHEN o_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{{band}} 00:00:00'
    GROUP BY o_custkey
),
tgt AS (
    SELECT c_custkey AS k, c_mktsegment,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
    FROM customer
),
m AS (
    SELECT t.c_mktsegment,
           CASE WHEN s.k IS NOT NULL THEN t.cents + s.ord_cents
                ELSE t.cents END AS cents
    FROM tgt t LEFT JOIN src s ON t.k = s.k
    WHERE NOT COALESCE(s.op = 'D', FALSE)
      AND NOT (s.k IS NULL AND COALESCE(t.cents < 0, FALSE))
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS total_dollars
FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment
""".replace("{band}", _OVERLAP_BAND)


def _x_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.textstats import maxsim_rerank

    return maxsim_rerank(load_table(spark, sf_dir, "documents"))


def _x_semihard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.textstats import semihard_negative_mining

    return semihard_negative_mining(load_table(spark, sf_dir, "documents"))


def _maxsim_sql() -> str:
    from ..ext.textstats import MAXSIM_RERANK_SQL_TEMPLATE

    return MAXSIM_RERANK_SQL_TEMPLATE.format(
        num_queries=3, k_retrieve=8, max_tokens=16, dim=32
    )


def _s_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import stream_kmv_users

    return stream_kmv_users(spark, sf_dir)


def _stream_kmv_sql() -> str:
    # the bounded-state stream drain must equal the registered BATCH KMV
    # estimator exactly (same hash, same k, same formula)
    from ..operators.analytics import WEEKLY_UNIQUE_USERS_APPROX_SQL

    return WEEKLY_UNIQUE_USERS_APPROX_SQL


def _x_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytics import psi_drift

    return psi_drift(spark, sf_dir)


def _psi_sql() -> str:
    from .analytics import PSI_DRIFT_SQL

    return PSI_DRIFT_SQL


def _s_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import stream_purchase_attribution_outer

    return stream_purchase_attribution_outer(spark, sf_dir)


def _stream_outer_sql() -> str:
    from ..streaming.events import STREAM_ATTRIBUTION_OUTER_SQL

    return STREAM_ATTRIBUTION_OUTER_SQL


def _q_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import recursive_hierarchy

    return recursive_hierarchy(spark, sf_dir)


def _recursive_sql() -> str:
    from .relational import RECURSIVE_HIERARCHY_SQL

    return RECURSIVE_HIERARCHY_SQL


def _x_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.textstats import prf_expanded_search

    return prf_expanded_search(load_table(spark, sf_dir, "documents"))


def _prf_sql() -> str:
    from ..ext.textstats import PRF_EXPANDED_SEARCH_SQL_TEMPLATE

    return PRF_EXPANDED_SEARCH_SQL_TEMPLATE.format(
        n_queries=3, q_terms=5, f_docs=5, e_terms=3, k=10, k1=1.2, b=0.75
    )


def _semihard_negatives_sql() -> str:
    from ..ext.textstats import SEMIHARD_NEGATIVES_SQL_TEMPLATE

    return SEMIHARD_NEGATIVES_SQL_TEMPLATE.format(num_anchors=8, k_negatives=5, dim=32)


def txn_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style PARTITIONED txn table (staged r12): orders land
    PARTITIONED BY order year — partition tuples live in the LOG (flat
    uuid file names, the Delta add.partitionValues design), so the
    ``o_year >= 1996`` scan prunes every other year's files from pure log
    arithmetic before any I/O, including the NULL partition (two injected
    NULL-year rows land under ``__HIVE_DEFAULT_PARTITION__`` and are
    provably excluded by any interval).  The pooled scenario plan-asserts
    the strict-subset inputFiles contract; this query returns the
    partition-banded aggregate plain SQL reproduces."""
    from ..sources.txn_table import snapshot as _snap

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    nulls = values_relation(
        spark, [(-1, None, 0), (-2, None, 100)],
        "o_orderkey long, o_year int, cents long",
    )
    root = _tmp_root("partprune")
    # 2 pre-split tasks x 8 year-partitions: enough files to observe
    # pruning without paying 32 per-file stat footers at build time
    write_txn(
        orders.unionByName(nulls).repartition(2), root, partition_by=["o_year"]
    )
    # every live file must carry its partition tuple in the log
    # (explicit raise, not assert: the gate must survive `python -O`)
    if not all("__pv" in st for st in _snap(root).file_stats):
        raise RuntimeError("partition tuples missing from the log")
    got = read_txn(spark, root, where="o_year >= 1996")
    return (
        got.groupBy(F.col("o_year").cast("bigint").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .orderBy("o_year")
    )


TXN_PARTITIONED_SQL = """
WITH src AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
)
SELECT o_year, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM src
WHERE o_year >= 1996
GROUP BY o_year
ORDER BY o_year
"""


def txn_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE (staged r12): events land PARTITIONED
    BY event_type; ONE ``overwrite_partitions`` commit then replaces
    exactly the partitions present in the batch — the recomputed
    ``purchase`` partition (cents doubled) swaps atomically, a brand-new
    ``synthetic`` partition lands, and every other event type's files
    survive BY PATH (metadata-only removes for the replaced partition;
    the pooled scenario asserts the survivor paths).  This is the daily
    recompute-one-day-and-swap at 100 TB: cost ∝ the recomputed
    partition, never the table."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        # partition-key hygiene: '' is indistinguishable from NULL in the
        # hive dir encoding, and the engine rejects it loudly — normalize
        # to the NULL partition like a real ingest would
        F.nullif(F.col("event_type"), F.lit("")).alias("event_type"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("dynover")
    write_txn(ev.repartition(4), root, partition_by=["event_type"])
    batch = (
        ev.filter("event_type = 'purchase'")
        .withColumn("cents", (F.col("cents") * 2).cast("bigint"))
        .unionByName(
            values_relation(
                spark,
                [(-1, "synthetic", 12345)],
                "event_id long, event_type string, cents long",
            )
        )
    )
    write_txn(batch, root, mode="overwrite_partitions")
    return (
        read_txn(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dollars("cents").alias("total_dollars"),
        )
        .orderBy("event_type")
    )


TXN_DYNAMIC_OVERWRITE_SQL = """
WITH src AS (
    SELECT NULLIF(event_type, '') AS event_type,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
    FROM events
),
final AS (
    -- IS DISTINCT FROM, not <>: the engine keeps the NULL partition by
    -- path (dynamic overwrite replaces only the batch's partitions), so
    -- NULL event_type rows must survive here too — 3VL <> would drop
    -- them and the first ''/NULL event in the data would diverge the
    -- parity check (ADVICE r12 medium)
    SELECT event_type, cents FROM src WHERE event_type IS DISTINCT FROM 'purchase'
    UNION ALL
    SELECT event_type, cents * 2 FROM src WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'synthetic', 12345
)
SELECT event_type, COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM final
GROUP BY event_type
ORDER BY event_type
"""


def txn_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition statistics from the LOG ALONE (staged r12): row
    counts per order-year partition derived purely from the committed
    add-actions' ``__pv`` (partition tuple) and ``__nulls`` (per-column
    [null, total] counts) stats — ZERO data-file opens, the
    SHOW PARTITIONS / partition-level ANALYZE a planner wants at 100 TB
    for O(files) metadata instead of a table scan.  The driver-side loop
    is over file STATS (metadata-sized by construction), never rows; the
    oracle recomputes the same counts the slow way, by scanning."""
    from collections import Counter

    from ..sources.txn_table import snapshot as _snap

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    root = _tmp_root("partstats")
    write_txn(orders.repartition(4), root, partition_by=["o_year"])
    counts: Counter = Counter()
    for st in _snap(root).file_stats:
        raw = st["__pv"]["o_year"]  # None = the NULL partition
        nulls = st.get("__nulls") or {}
        n_rows = max((t for _n, t in nulls.values()), default=0)
        counts[None if raw is None else int(raw)] += n_rows
    return values_relation(
        spark,
        sorted(counts.items(), key=lambda kv: (kv[0] is None, kv[0] or 0)),
        "o_year bigint, n_orders bigint",
    ).orderBy("o_year")


TXN_PARTITION_STATS_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_year
ORDER BY o_year
"""


def txn_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY RENAME COLUMN (staged r12): half the orders land as
    ``cents``, the column renames to ``price_cents`` (one commit, zero
    data bytes moved — old files keep their physical name and reads remap
    through the ordered rename chain), the other half lands natively
    under the new name, and a DELETE then filters under it — mixed
    physical generations behave as ONE logical column.  The result is the
    per-status aggregate plain SQL reproduces from the source table."""
    from ..sources.txn_table import delete_txn, rename_column_txn

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("renamecol")
    write_txn(orders.filter("o_orderkey % 2 = 0").coalesce(2), root)
    rename_column_txn(root, "cents", "price_cents")
    write_txn(
        orders.filter("o_orderkey % 2 = 1")
        .withColumnRenamed("cents", "price_cents")
        .coalesce(2),
        root,
    )
    delete_txn(spark, root, "price_cents < 1000000")  # drop orders under $10k
    return (
        read_txn(spark, root)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("price_cents").alias("total_dollars"),
        )
        .orderBy("status")
    )


TXN_RENAME_COLUMN_SQL = """
WITH src AS (
    SELECT o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM orders
)
SELECT status, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(price_cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM src
WHERE price_cents >= 1000000
GROUP BY status
ORDER BY status
"""


# Staged for the round-12 window (the round-11 registry freezes at 320):
# the table-layout wave — creation-time PARTITIONED BY with log-resident
# partition tuples, exact pruning, dynamic partition overwrite, zero-I/O
# partition statistics, and metadata-only column rename.
def txn_identity_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY (staged r12): customers land in two
    batches on a table whose ``row_id`` the LOG assigns — a backfill
    rewrite ranks the first batch by the declared unique key
    (two-phase bucketed rank, no single-task window), the second batch
    continues the high watermark the commit log carries forward, and a
    DELETE preserves assigned ids without moving it.  Deterministic by
    the order_by contract, so plain ROW_NUMBER SQL reproduces every id."""
    from ..sources.txn_table import delete_txn, set_identity_txn

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_cents"),
    )
    root = _tmp_root("identity")
    write_txn(cust.filter("c_custkey % 2 = 0").repartition(4), root)
    set_identity_txn(spark, root, "row_id", order_by="c_custkey", start=1000, step=2)
    write_txn(cust.filter("c_custkey % 2 = 1").repartition(4), root)
    delete_txn(spark, root, "bal_cents < 0")
    return (
        read_txn(spark, root)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("row_id").cast("decimal(38,0)"))
            .cast("double").alias("row_id_sum"),
            F.min("row_id").alias("row_id_min"),
            F.max("row_id").alias("row_id_max"),
        )
        .orderBy("segment")
    )


TXN_IDENTITY_SQL = """
WITH src AS (
    SELECT c_custkey, c_mktsegment AS segment,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
    FROM customer
),
ids AS (
    SELECT segment, bal_cents,
           1000 + 2 * (ROW_NUMBER() OVER (ORDER BY c_custkey) - 1) AS row_id
    FROM src WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT segment, bal_cents,
           1000 + 2 * ((SELECT COUNT(*) FROM src WHERE c_custkey % 2 = 0)
                       + ROW_NUMBER() OVER (ORDER BY c_custkey) - 1) AS row_id
    FROM src WHERE c_custkey % 2 = 1
)
SELECT segment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(row_id AS HUGEINT)) AS DOUBLE) AS row_id_sum,
       MIN(row_id) AS row_id_min, MAX(row_id) AS row_id_max
FROM ids
WHERE bal_cents >= 0
GROUP BY segment
ORDER BY segment
"""


def stream_partitioned_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over a PARTITIONED txn table (staged r12): events
    land PARTITIONED BY event_type in two commits; the stream tails the
    log and the executor-side Arrow reader reattaches the
    metadata-resident partition column as a CONSTANT column per file —
    before the r11 fix it surfaced NULL, silently corrupting any
    downstream keyed on it.  The drained per-type rollup equals plain
    SQL over the source table."""
    from ..sources.txn_stream import stream_txn_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        # same partition-key hygiene as txn_dynamic_overwrite: '' -> NULL
        F.nullif(F.col("event_type"), F.lit("")).alias("event_type"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("streamparttail")
    # one file per partition tuple per commit (coalesce(1) pre-split):
    # the stream plans one input partition per FILE, so the build keeps
    # the file count at (commits x live types), not (tasks x types)
    write_txn(
        ev.filter("event_id % 2 = 0").coalesce(1), root,
        partition_by=["event_type"],
    )
    write_txn(ev.filter("event_id % 2 = 1").coalesce(1), root)
    src = stream_txn_table(spark, root)
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dollars("cents").alias("total_dollars"),
    )
    return _drain_complete(spark, agg, "part_tail").orderBy("event_type")


STREAM_PARTITIONED_TAIL_SQL = """
SELECT NULLIF(event_type, '') AS event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                           AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM events
GROUP BY NULLIF(event_type, '')
ORDER BY event_type
"""


def _x_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import preference_pairs

    return preference_pairs(load_table(spark, sf_dir, "documents"))


def _preference_pairs_sql() -> str:
    from ..ext.sampling import PREFERENCE_PAIRS_SQL

    return PREFERENCE_PAIRS_SQL


def _x_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import span_corruption_plan

    return span_corruption_plan(load_table(spark, sf_dir, "documents"))


def _span_corruption_sql() -> str:
    from ..ext.sampling import SPAN_CORRUPTION_SQL_TEMPLATE

    return SPAN_CORRUPTION_SQL_TEMPLATE.format(span_len=4, rate=5)


def txn_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED CLUSTERING KEYS on a PARTITIONED table (VERDICT r11 #3 —
    liquid-clustering lite, end to end): orders land PARTITIONED BY order
    year with each partition's files hash-scattered (nothing inside a
    partition prunes), ``set_cluster_txn`` declares (month, customer
    bucket) as the clustering keys — a METADATA-ONLY commit — and the
    next ROUTINE ``compact_txn`` (no explicit cluster args) picks the
    declaration up and Z-orders WITHIN each partition, since a data file
    never spans two partitions.  The box scan then composes all three
    pruning layers from pure log arithmetic: the partition tuple drops
    every other year, and the Morton layout's tight per-file [min, max]
    rectangles drop intra-partition files on EITHER box dimension.  The
    inline assertion pins the physical claim the registry lacked — the
    box scan opens a STRICT SUBSET of the partition's files, i.e. the
    declaration actually changed what gets read, not just the layout.
    This is Delta's CLUSTER BY + OPTIMIZE composition (Armbrust et al.,
    VLDB 2020 §4.2's data-skipping design; reference parity:
    models/docs/google_trends_docs.md:39 declares partition pruning as
    the table's one physical hint — this extends it to in-partition
    clustering)."""
    from ..sources.txn_table import compact_txn, set_cluster_txn

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            (F.col("o_custkey") % 256).cast("bigint").alias("cb"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .filter("o_year BETWEEN 1995 AND 1997")
    )
    root = _tmp_root("clusterprune")
    # 2 pre-split tasks x 3 year-partitions = 6 ingest files, each
    # spanning the full (mo, cb) domain — the realistic no-prune start
    write_txn(orders.repartition(2), root, partition_by=["o_year"])
    set_cluster_txn(root, ["mo", "cb"])           # declaration only
    compact_txn(spark, root, target_files=4)      # routine maintenance
    year_scan = read_txn(spark, root, where="o_year = 1995")
    box = "o_year = 1995 AND mo BETWEEN 4 AND 6 AND cb < 64"
    got = read_txn(spark, root, where=box)
    # stats check (plan-level, zero jobs): pruned files never open.
    # Explicit raises, not asserts — the physical-behavior gate must
    # survive `python -O` (ADVICE r12).
    year_files = set(year_scan.inputFiles())
    box_files = set(got.inputFiles())
    if not box_files <= year_files:
        raise RuntimeError("box scan escaped its partition")
    if len(year_files) >= 4 and not len(box_files) < len(year_files):
        # < 4 files means degenerate inputs: nothing to prune
        raise RuntimeError(
            "declared clustering keys failed to prune the box scan "
            f"({len(box_files)} of {len(year_files)} partition files open)"
        )
    return (
        got.groupBy("mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .orderBy("mo")
    )


TXN_CLUSTER_PRUNE_SQL = """
WITH src AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
           CAST(o_custkey % 256 AS BIGINT) AS cb,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
)
SELECT mo, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM src
WHERE o_year = 1995 AND mo BETWEEN 4 AND 6 AND cb < 64
GROUP BY mo
ORDER BY mo
"""


ROUND12_STAGED: dict = {
    "q_txn_partitioned_prune": (txn_partitioned_prune, TXN_PARTITIONED_SQL),
    "q_txn_dynamic_overwrite": (txn_dynamic_overwrite, TXN_DYNAMIC_OVERWRITE_SQL),
    "q_txn_partition_stats": (txn_partition_stats, TXN_PARTITION_STATS_SQL),
    "q_txn_rename_col": (txn_rename_column, TXN_RENAME_COLUMN_SQL),
    "q_txn_identity": (txn_identity_column, TXN_IDENTITY_SQL),
    "s_stream_partitioned_tail": (
        stream_partitioned_tail, STREAM_PARTITIONED_TAIL_SQL
    ),
    "x_preference_pairs": (_x_preference_pairs, _preference_pairs_sql()),
    "x_span_corruption": (_x_span_corruption, _span_corruption_sql()),
    # VERDICT r11 #3: the declare -> compact -> box-scan-prune composition
    # that turns the set_cluster_txn declaration into driver-verified
    # physical behavior
    "q_txn_cluster_prune": (txn_cluster_prune, TXN_CLUSTER_PRUNE_SQL),
}


def txn_mv_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven incremental MV over a PARTITIONED source (r13
    shortlist): the two r11/r12 capabilities composed — the change feed
    of a partitioned table reattaches METADATA-RESIDENT partition values
    (they are not in the data bytes), and a DYNAMIC PARTITION OVERWRITE
    emits exactly the replaced partition's delete/insert pairs — so an
    aggregate mart GROUPED BY THE PARTITION COLUMN stays fresh by
    folding per-commit diffs whose cost is ∝ the replaced partition,
    never the table.  Sequence: partitioned ingest -> MV bootstrap ->
    dynamic overwrite (purchase partition recomputed ×2 cents + a new
    synthetic partition) -> delta-sync -> plain append -> delta-sync.
    The final MV must equal a full GROUP BY of the final table state
    (the oracle); NULL partition groups survive (the sync's union+
    re-aggregate treats NULL keys like SQL GROUP BY, and the oracle's
    IS DISTINCT FROM mirrors the engine keeping the NULL partition by
    path)."""
    from ..sources.txn_mv import sync_agg_mv

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("")).alias("event_type"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("mvpart")
    mv = _tmp_root("mvpartagg")
    write_txn(ev.repartition(4), root, partition_by=["event_type"])   # v0
    sync_agg_mv(spark, root, mv, ["event_type"], ["cents"])           # bootstrap
    batch = (
        ev.filter("event_type = 'purchase'")
        .withColumn("cents", (F.col("cents") * 2).cast("bigint"))
        .unionByName(
            values_relation(
                spark,
                [(-1, "synthetic", 12345)],
                "event_id long, event_type string, cents long",
            )
        )
    )
    write_txn(batch, root, mode="overwrite_partitions")               # v1
    sync_agg_mv(spark, root, mv, ["event_type"], ["cents"])           # swap diff
    write_txn(
        values_relation(
            spark, [(-2, "click", 777)],
            "event_id long, event_type string, cents long",
        ),
        root,
    )                                                                 # v2
    sync_agg_mv(spark, root, mv, ["event_type"], ["cents"])           # append diff
    return (
        read_txn(spark, mv)
        .select(
            "event_type",
            "n_rows",
            F.round(F.col("sum_cents").cast("double") / 100.0, 2).alias(
                "total_dollars"
            ),
        )
        .orderBy("event_type")
    )


TXN_MV_PARTITIONED_SQL = """
WITH src AS (
    SELECT NULLIF(event_type, '') AS event_type,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
    FROM events
),
final AS (
    SELECT event_type, cents FROM src WHERE event_type IS DISTINCT FROM 'purchase'
    UNION ALL
    SELECT event_type, cents * 2 FROM src WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'synthetic', 12345
    UNION ALL
    SELECT 'click', 777
)
SELECT event_type, COUNT(*) AS n_rows,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
           AS total_dollars
FROM final
GROUP BY event_type
ORDER BY event_type
"""


def _x_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import knn_label_propagation

    return knn_label_propagation(
        load_table(spark, sf_dir, "embeddings"), k=5, n_iters=4
    )


def _label_prop_sql() -> str:
    from ..ext.similarity import knn_label_propagation_sql

    return knn_label_propagation_sql(k=5, n_iters=4)


# Staged for the round-13 window (VERDICT r11 #6: the r13-shortlist
# operator started early): label-propagation communities over the mutual
# kNN graph — deterministic synchronous updates with total tie-breaks,
# oracle via iterated SQL CTEs.  Parity-tested by the pooled scenario and
# degenerate-swept by the empty-sweep sibling, like every staged wave.
def _x_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.textstats import kneser_ney_bigram

    return kneser_ney_bigram(load_table(spark, sf_dir, "documents"))


def _kn_bigram_sql() -> str:
    from ..ext.textstats import KNESER_NEY_BIGRAM_SQL

    return KNESER_NEY_BIGRAM_SQL


def _x_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.bpe import unigram_lm_em

    return unigram_lm_em(load_table(spark, sf_dir, "documents"))


def _unigram_em_sql() -> str:
    from ..ext.bpe import unigram_lm_em_sql

    return unigram_lm_em_sql()


def _x_unigram_fert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.bpe import unigram_fertility

    return unigram_fertility(load_table(spark, sf_dir, "documents"))


def _x_unigram_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.bpe import unigram_lm_em

    return unigram_lm_em(load_table(spark, sf_dir, "documents"), keep_pieces=96)


def _unigram_pruned_sql() -> str:
    from ..ext.bpe import unigram_lm_em_sql

    return unigram_lm_em_sql(keep_pieces=96)


def _x_group_adv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import group_advantages

    return group_advantages(load_table(spark, sf_dir, "documents"))


def _group_adv_sql() -> str:
    from ..ext.sampling import GROUP_ADVANTAGES_SQL

    return GROUP_ADVANTAGES_SQL


def _x_traj_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import trajectory_neardup

    return trajectory_neardup(load_table(spark, sf_dir, "events"))


def _traj_neardup_sql() -> str:
    from ..ext.dedup import trajectory_neardup_sql

    return trajectory_neardup_sql()


def _unigram_fert_sql() -> str:
    from ..ext.bpe import unigram_fertility_sql

    return unigram_fertility_sql()


def txn_recluster_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIQUID RE-CLUSTERING ON A LIVE PARTITIONED TABLE (r14 shortlist,
    VERDICT r12 #5): the composition that makes clustering keys genuinely
    MUTABLE at scale.  A 100 TB table cannot adopt new clustering by full
    rewrite; the only deployable path is partition-at-a-time maintenance
    — Delta's ``OPTIMIZE tbl WHERE <partition>`` applied under whatever
    keys are CURRENTLY declared — so partitions compacted under different
    declarations coexist, and correctness must come from per-file stats,
    not a table-level layout assumption.

    The demo drives exactly that life-cycle on one table:

    1. ingest orders PARTITIONED BY o_year (1995-1997), 2 pre-split
       tasks per partition spanning the full (mo, cb, cents) domain —
       the realistic no-layout start;
    2. declare CLUSTER BY (mo, cb); scoped-compact ONLY partition 1995
       — it adopts the (mo, cb) Z-order (Morton rectangles per file);
    3. RE-declare CLUSTER BY (cb, cents) — metadata-only, instant;
       scoped-compact ONLY partition 1996 — it adopts the NEW keys
       while 1995 keeps the old layout and 1997 keeps raw ingest;
    4. physical gates (explicit raises, python -O safe): a (mo, cb) box
       on 1995 and a (cb, cents) box on 1996 each open a strict subset
       of their partition's files, and partition 1997's file set is
       byte-identical to ingest — the two scoped rewrites provably never
       touched it.

    The returned aggregate unions the two box scans, so the value-hash
    oracle checks the MIXED-layout read path end to end; pruning is
    per-file Morton-rectangle arithmetic from the log, zero data I/O.
    Reference parity: the reference's one physical hint is partitioning
    (models/docs/google_trends_docs.md:39); this extends the declared-
    clustering surface (q_txn_cluster_prune) to the mutable,
    incrementally-adopted form Delta ships as liquid clustering."""
    from ..sources.txn_table import compact_txn, read_txn, set_cluster_txn

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            (F.col("o_custkey") % 256).cast("bigint").alias("cb"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        # half the keyspace: the demo proves layout behavior, and every
        # gate is count-based — ingest mass is pure cost here
        .filter("o_year BETWEEN 1995 AND 1997 AND o_orderkey % 2 = 0")
    )
    root = _tmp_root("recluster")
    write_txn(orders.repartition(2), root, partition_by=["o_year"])
    ingest_97 = set(read_txn(spark, root, where="o_year = 1997").inputFiles())

    set_cluster_txn(root, ["mo", "cb"])           # declaration #1
    compact_txn(spark, root, target_files=4, where="o_year = 1995")
    set_cluster_txn(root, ["cb", "cents"])        # re-declaration: instant
    compact_txn(spark, root, target_files=4, where="o_year = 1996")

    def _gate(year: int, box: str) -> DataFrame:
        part_files = set(
            read_txn(spark, root, where=f"o_year = {year}").inputFiles()
        )
        scan = read_txn(spark, root, where=box)
        box_files = set(scan.inputFiles())
        if not box_files <= part_files:
            raise RuntimeError(f"box scan escaped partition {year}")
        if len(part_files) >= 4 and not len(box_files) < len(part_files):
            # < 4 files means degenerate inputs: nothing to prune
            raise RuntimeError(
                f"clustering keys failed to prune partition {year}'s box "
                f"scan ({len(box_files)} of {len(part_files)} files open)"
            )
        return scan

    got95 = _gate(1995, "o_year = 1995 AND mo BETWEEN 4 AND 6 AND cb < 64")
    got96 = _gate(1996, "o_year = 1996 AND cb < 64 AND cents < 5000000")
    final_97 = set(read_txn(spark, root, where="o_year = 1997").inputFiles())
    if final_97 != ingest_97:
        raise RuntimeError(
            "scoped compaction leaked outside its partition scope: "
            "partition 1997's file set changed"
        )
    return (
        got95.unionByName(got96)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dollars("cents").alias("total_dollars"),
        )
        .orderBy("o_year")
    )


def stream_trajectory_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING BEHAVIORAL DEDUP AGAINST THE PERSISTED BAND STORE (r14
    shortlist, VERDICT r12 #6): crawl-style continuous rollout data —
    agent sessions landing commit-by-commit in a txn table — dedups
    trajectory-wise as it arrives, so downstream training never
    re-ingests a behavior it already holds.

    Two producer commits land whole users (the even-user half of the
    corpus, split ``(user_id % 4) // 2`` — whole users per commit, so
    gap-sessionization commutes with the batch split); after each commit
    ONE incremental drain of the txn streaming tail (checkpointed
    offsets: each drain sees exactly the new commit) runs the composed
    pipeline ``trajectory_relation -> incremental_neardup_store``
    (:func:`...ext.dedup.trajectory_dedup_store`): the batch's events
    sessionize into trajectory docs, band keys probe the persisted
    store, colliding trajectories drop, survivors' bands append.  Output
    is the per-commit ingestion ledger (batch_no, n_kept).

    Scale shape: per batch the sessionize windows shuffle BATCH events
    only; the store probe exchanges 16-byte band keys, never event text;
    store growth is bands-per-kept-trajectory, independent of event
    volume.  The worker-spawn retry envelope (house pattern) fires only
    before any compute starts, so a retried drain re-runs its store
    append whole — and a torn append surfaces as a loud failure, never
    silent drift."""
    import time as _time

    from ..ext.dedup import trajectory_dedup_store
    from ..sources.txn_stream import stream_txn_table

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    root = _tmp_root("trajstream")
    store = root + "_bands"
    ckpt = root + "_ckpt"
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    ledger: list[tuple[int, int]] = []

    for m in (0, 1):
        write_txn(events.filter(F.col("user_id") % 4 == 2 * m), root)

        def drain(batch: DataFrame, _bid: int, m: int = m) -> None:
            kept = trajectory_dedup_store(spark, batch, store)
            ledger.append((m, kept.select("doc_id").distinct().count()))

        last: Exception | None = None
        for attempt in range(6):
            if attempt:
                _time.sleep(2 * attempt)
            q = (
                stream_txn_table(spark, root)
                .writeStream.foreachBatch(drain)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                break
            except Exception as ex:  # noqa: BLE001 - filtered re-raise
                last = ex
                q.stop()
                if not any(
                    s in str(ex)
                    for s in (
                        "failed to connect back",
                        "worker exited unexpectedly",
                    )
                ):
                    raise
        else:
            raise last
        if not any(row[0] == m for row in ledger):
            ledger.append((m, 0))  # empty commit: no micro-batch fires

    return values_relation(
        spark, sorted(ledger), "batch_no bigint, n_kept bigint"
    ).orderBy("batch_no")


def txn_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RESIDENT QUANTILE STATISTICS (r14 shortlist, VERDICT r12
    final note): the NDV/Bloom pattern applied to quantiles — per-file
    DDSketch-style histograms (Masson et al., VLDB 2019) with the float
    log replaced by EXACT integer bucket arithmetic
    (``_qh_bucket_sql``), declared once and then maintained IN-PASS by
    every write, so table-level quantile estimates need ZERO data I/O:
    merging is per-bucket count summation, sound under any file layout
    (appends, compaction, partitioning) because the bucket of a value
    never depends on which file holds it — the same
    layout-invariance that makes the estimate DuckDB-oracle-checkable
    with no knowledge of file boundaries.

    Story: half of orders lands (3 files) -> ``set_quantile_txn``
    backfills their histograms (one column-pruned scan, metadata-only
    commit) -> the other half appends (its files sketch in-pass) ->
    ``quantile_estimate_txn`` reads p25/p50/p75/p95 of the cents column
    from the log alone.  A physical gate (explicit raise) proves every
    live file carries its histogram.  At 100 TB this is the ANALYZE
    loop a planner or drift monitor runs per table per hour — cost
    O(files x ~500 ints), not O(rows)."""
    from ..sources.txn_table import (
        _QH_KEY,
        quantile_estimate_txn,
        set_quantile_txn,
    )
    from ..sources.txn_table import snapshot as _snap

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("quantstats")
    write_txn(orders.filter("o_orderkey % 2 = 0").repartition(3), root)
    set_quantile_txn(spark, root, ["cents"])        # declare + backfill
    write_txn(                                       # sketches in-pass
        orders.filter("o_orderkey % 2 = 1").repartition(2), root, mode="append"
    )
    snap = _snap(root)
    # key presence, not non-emptiness: an all-NULL file legitimately
    # records an EMPTY histogram (degenerate-input contract)
    if snap.files and not all(
        "cents" in (st.get(_QH_KEY) or {}) for st in snap.file_stats
    ):
        raise RuntimeError(
            "a live file is missing its quantile histogram: backfill or "
            "in-pass sketching failed"
        )
    qs = [0.25, 0.5, 0.75, 0.95]
    n, est = quantile_estimate_txn(root, "cents", qs)
    rows = [(int(q * 100), int(est[q]), int(n)) for q in qs if q in est]
    return values_relation(
        spark, sorted(rows), "q_pct bigint, est_cents bigint, n bigint"
    ).orderBy("q_pct")


# The oracle replays the IDENTICAL integer bucket algebra over the source
# rows (LENGTH(bin(v)) is the msb count in DuckDB too) and the identical
# rank convention — layout-invariance means it needs no file knowledge.
TXN_QUANTILE_STATS_SQL = """
WITH src AS (
    SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders
),
b AS (
    SELECT CASE WHEN v <= 15 THEN v
           ELSE 8 * LENGTH(bin(v))
                + (v >> (LENGTH(bin(v)) - 4)) - 32 END AS bkt
    FROM src WHERE v IS NOT NULL
),
h AS (SELECT bkt, COUNT(*) AS cnt FROM b GROUP BY bkt),
c AS (
    SELECT bkt, SUM(cnt) OVER (ORDER BY bkt) AS cum,
           (SELECT COUNT(*) FROM b) AS n
    FROM h
),
qs AS (SELECT * FROM (VALUES (25), (50), (75), (95)) t(qp)),
pick AS (
    SELECT qp,
           (SELECT MIN(bkt) FROM c
            WHERE cum >= GREATEST((qp * n + 99) // 100, 1)) AS bkt,
           n
    FROM qs CROSS JOIN (SELECT DISTINCT n FROM c) tn
)
SELECT CAST(qp AS BIGINT) AS q_pct,
       CAST(CASE WHEN bkt <= 15 THEN bkt
            ELSE (8 + (bkt + 32) % 8) << ((bkt + 32) // 8 - 5) END
            AS BIGINT) AS est_cents,
       CAST(n AS BIGINT) AS n
FROM pick
WHERE n > 0
ORDER BY q_pct
"""


def txn_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-COMMIT DISTRIBUTION DRIFT FROM THE LOG ALONE (r14 staged):
    the quantile-histogram layer turned into a data-quality monitor.
    Every ingestion commit's add-actions already summarize their files'
    value distribution (per-bucket counts, sketched in-pass), so drift
    detection against the base table is pure integer arithmetic over
    ~500-entry maps — ``quantile_commit_hists`` walks the log, and the
    score is the exact total-variation distance in ppm:

        drift_ppm = Σ_b |c_m[b]·N₀ − c₀[b]·N_m| · 10⁶ // (2·N_m·N₀)

    computed in arbitrary-precision Python ints (the maps are
    driver-sized by design), bit-identical to the oracle's HUGEINT
    replay.  Story: base = quarter of orders (declared + backfilled);
    append #1 = a same-distribution quarter (drift ≈ 0); append #2 = a
    quarter with cents×4 (two octaves up — large drift).  At 100 TB
    this is the per-producer-commit quality gate that needs NO scan:
    the stats rode the write."""
    from ..sources.txn_table import (
        quantile_commit_hists,
        set_quantile_txn,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 4).alias("m"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    root = _tmp_root("quantdrift")
    write_txn(orders.filter("m = 0").select("o_orderkey", "cents"), root)
    set_quantile_txn(spark, root, ["cents"])          # declare + backfill
    v1 = write_txn(                                    # same distribution
        orders.filter("m = 1").select("o_orderkey", "cents"), root
    )
    v2 = write_txn(                                    # two octaves up
        orders.filter("m = 2")
        .select("o_orderkey", (F.col("cents") * 4).alias("cents")),
        root,
    )
    batch_of = {v1: 1, v2: 2}  # version -> batch, robust to empty slices
    hists = quantile_commit_hists(root, "cents")
    base = next((h for _v, mode, h in hists if mode == "set_quantile"), {})
    n0 = sum(base.values())
    rows = []
    for v, mode, h in hists:
        if mode != "append" or v not in batch_of:
            continue
        nm = sum(h.values())
        if n0 == 0 or nm == 0:
            continue  # degenerate inputs: drift vs/of nothing is undefined
        s = sum(
            abs(h.get(b, 0) * n0 - base.get(b, 0) * nm)
            for b in set(base) | set(h)
        )
        rows.append((batch_of[v], nm, (s * 1_000_000) // (2 * nm * n0)))
    return values_relation(
        spark, sorted(rows), "batch_no bigint, n_rows bigint, drift_ppm bigint"
    ).orderBy("batch_no")


# The oracle replays the identical bucket algebra and TV arithmetic over
# the source rows in HUGEINT — layout- and file-free by construction.
TXN_QUANTILE_DRIFT_SQL = """
WITH src AS (
    SELECT o_orderkey % 4 AS m,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey % 4 <= 2
),
vals AS (
    SELECT m, CASE WHEN m = 2 THEN cents * 4 ELSE cents END AS v FROM src
),
b AS (
    SELECT m,
           CASE WHEN v <= 15 THEN v
           ELSE 8 * LENGTH(bin(v))
                + (v >> (LENGTH(bin(v)) - 4)) - 32 END AS bkt
    FROM vals WHERE v IS NOT NULL
),
h AS (SELECT m, bkt, COUNT(*) AS cnt FROM b GROUP BY m, bkt),
n AS (SELECT m, COUNT(*) AS nn FROM b GROUP BY m),
allb AS (
    SELECT tm.m, d.bkt
    FROM (SELECT DISTINCT bkt FROM h) d
    CROSS JOIN (SELECT * FROM (VALUES (1), (2)) t(m)) tm
),
j AS (
    SELECT a.m, a.bkt,
           COALESCE(c.cnt, 0) AS cm, COALESCE(bs.cnt, 0) AS c0
    FROM allb a
    LEFT JOIN h c ON c.m = a.m AND c.bkt = a.bkt
    LEFT JOIN (SELECT bkt, cnt FROM h WHERE m = 0) bs ON bs.bkt = a.bkt
)
SELECT CAST(j.m AS BIGINT) AS batch_no,
       CAST(nm.nn AS BIGINT) AS n_rows,
       CAST(SUM(ABS(CAST(j.cm AS HUGEINT) * n0.nn
                    - CAST(j.c0 AS HUGEINT) * nm.nn)) * 1000000
            // (2 * CAST(nm.nn AS HUGEINT) * n0.nn) AS BIGINT) AS drift_ppm
FROM j
JOIN n nm ON nm.m = j.m
JOIN (SELECT nn FROM n WHERE m = 0) n0 ON TRUE
WHERE nm.nn > 0 AND n0.nn > 0
GROUP BY j.m, nm.nn, n0.nn
ORDER BY batch_no
"""


def _stream_traj_dedup_sql() -> str:
    from ..ext.dedup import stream_trajectory_dedup_sql

    return stream_trajectory_dedup_sql(n_batches=2)


def dedup_store_gc_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-DRIVEN DEDUP-STORE GARBAGE COLLECTION (r14 staged): retention
    and right-to-be-forgotten deletes must propagate to DERIVED data —
    a document purged from the corpus must stop blocking re-ingestion
    of its near-duplicates, and its fingerprint rows are themselves
    subject to the deletion obligation.  The composition closes that
    loop with change-proportional cost:

    1. the corpus lands in a txn table; the persisted MinHash band
       store ingests it (``incremental_neardup_store``);
    2. a retention DELETE tombstones a slice merge-on-read
       (``delete_txn_dv`` — data files untouched);
    3. the CHANGE DATA FEED (pure log arithmetic) yields exactly the
       deleted doc ids, which drive ``dedup_store_gc`` — an anti-join
       rewrite of the store with an atomic two-rename swap;
    4. re-ingested COPIES of the deleted docs now survive UNLESS a
       surviving twin still emits their band keys (GC deletes BY DOC,
       collisions probe BY KEY — the correct asymmetry for exact-dup
       families), while copies of never-deleted docs stay fully
       blocked by their own live fingerprints.

    Output: the four-phase ledger (band_rows_removed, deleted_docs,
    readmitted, control_readmitted), each count reproduced by the
    oracle from the shared md5 band chain with zero knowledge of the
    store layout."""
    from ..ext.dedup import dedup_store_gc, incremental_neardup_store

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _tmp_root("storegc")
    store = root + "_bands"
    shutil.rmtree(store, ignore_errors=True)
    write_txn(docs, root)                               # v0: the corpus
    incremental_neardup_store(spark, read_txn(spark, root), store)
    delete_txn_dv(spark, root, "doc_id % 7 = 3")        # v1: retention
    deleted = (
        read_txn_changes(spark, root, from_version=0)
        .filter("_change_type = 'delete'")
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds GC and the count
    )
    removed = dedup_store_gc(spark, store, deleted)
    n_deleted = deleted.count()
    copies = docs.filter("doc_id % 7 = 3").withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    kept = incremental_neardup_store(spark, copies, store)
    readmitted = kept.select("doc_id").distinct().count()
    ctrl = docs.filter("doc_id % 7 = 1").withColumn(
        "doc_id", F.col("doc_id") + 20_000_000
    )
    kept2 = incremental_neardup_store(spark, ctrl, store)
    ctrl_readmitted = kept2.select("doc_id").distinct().count()
    rows = [
        ("band_rows_removed", removed),
        ("control_readmitted", ctrl_readmitted),
        ("deleted_docs", n_deleted),
        ("readmitted", readmitted),
    ]
    return values_relation(
        spark, rows, "phase string, n bigint"
    ).orderBy("phase")


def _dedup_store_gc_sql() -> str:
    from ..ext.dedup import _minhash_md5_band_sql

    base = _minhash_md5_band_sql(8, 4, 3, source="src")
    return rf"""
WITH src AS (SELECT doc_id, text FROM documents),
{base},
d AS (SELECT doc_id FROM src WHERE doc_id % 7 = 3),
remaining AS (
    SELECT DISTINCT bidx, bk FROM banded
    WHERE doc_id NOT IN (SELECT doc_id FROM d)
),
copies AS (
    SELECT DISTINCT doc_id FROM banded
    WHERE doc_id IN (SELECT doc_id FROM d)
),
hits AS (
    SELECT DISTINCT b.doc_id
    FROM banded b
    JOIN remaining r ON r.bidx = b.bidx AND r.bk = b.bk
    WHERE b.doc_id IN (SELECT doc_id FROM d)
),
readmit_ids AS (
    SELECT c.doc_id FROM copies c ANTI JOIN hits h ON h.doc_id = c.doc_id
),
store2 AS (
    SELECT bidx, bk FROM remaining
    UNION
    SELECT b.bidx, b.bk FROM banded b
    JOIN readmit_ids s ON s.doc_id = b.doc_id
),
ctrl AS (SELECT DISTINCT doc_id FROM banded WHERE doc_id % 7 = 1),
ctrl_hits AS (
    SELECT DISTINCT b.doc_id
    FROM banded b
    JOIN store2 r ON r.bidx = b.bidx AND r.bk = b.bk
    WHERE b.doc_id IN (SELECT doc_id FROM ctrl)
),
ctrl_readmit AS (
    SELECT COUNT(*) AS n
    FROM ctrl c ANTI JOIN ctrl_hits h ON h.doc_id = c.doc_id
)
SELECT 'band_rows_removed' AS phase,
       CAST((SELECT COUNT(*) FROM banded
             WHERE doc_id IN (SELECT doc_id FROM d)) AS BIGINT) AS n
UNION ALL
SELECT 'control_readmitted', CAST((SELECT n FROM ctrl_readmit) AS BIGINT)
UNION ALL
SELECT 'deleted_docs', CAST((SELECT COUNT(*) FROM d) AS BIGINT)
UNION ALL
SELECT 'readmitted', CAST((SELECT COUNT(*) FROM readmit_ids) AS BIGINT)
ORDER BY phase
"""


def txn_partition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-PARTITION DISTRIBUTION PROFILE FROM THE LOG ALONE (r14
    staged): the two metadata layers composed — partition tuples ride
    add-action stats (``__pv``, r12) and quantile histograms ride them
    too (``__qh``, this round), so partition-level skew and
    distribution shift need ZERO data I/O: group per-file histograms by
    partition tuple, sum per bucket, walk each partition's histogram.
    This is the report a 100 TB maintenance planner reads hourly —
    which partitions are heavy (compact/split candidates), where the
    value distribution moved (stale-stats candidates) — at O(files ×
    ~500 ints).

    Story: orders (3 years, partitioned by o_year) lands partitioned;
    the cents histogram is declared + backfilled; one more year appends
    with in-pass sketches; the profile reports per-year row count,
    row-share in ppm, and the p50 cents estimate — all reproduced by
    the oracle from source rows with the identical integer bucket walk
    and no knowledge of files or partitions-as-layout."""
    from ..sources.txn_table import (
        quantile_partition_profile,
        set_quantile_txn,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .filter("o_year BETWEEN 1994 AND 1997")
    )
    root = _tmp_root("partprofile")
    write_txn(
        orders.filter("o_year <= 1996").repartition(2),
        root,
        partition_by=["o_year"],
    )
    set_quantile_txn(spark, root, ["cents"])        # declare + backfill
    write_txn(orders.filter("o_year = 1997").repartition(2), root)  # in-pass
    prof = quantile_partition_profile(root, "cents", [0.5])
    total = sum(n for _pv, n, _e in prof)
    rows = [
        (int(pv["o_year"]), n, (n * 1_000_000) // total, ests[0.5])
        for pv, n, ests in prof
        if n > 0 and pv.get("o_year") is not None
    ]
    return values_relation(
        spark,
        sorted(rows),
        "o_year int, n_rows bigint, share_ppm bigint, p50_cents bigint",
    ).orderBy("o_year")


TXN_PARTITION_PROFILE_SQL = """
WITH src AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1994 AND 1997
),
b AS (
    SELECT o_year,
           CASE WHEN v <= 15 THEN v
           ELSE 8 * LENGTH(bin(v))
                + (v >> (LENGTH(bin(v)) - 4)) - 32 END AS bkt
    FROM src WHERE v IS NOT NULL
),
h AS (SELECT o_year, bkt, COUNT(*) AS cnt FROM b GROUP BY o_year, bkt),
c AS (
    SELECT o_year, bkt,
           SUM(cnt) OVER (PARTITION BY o_year ORDER BY bkt) AS cum,
           SUM(cnt) OVER (PARTITION BY o_year) AS n
    FROM h
),
p50 AS (
    SELECT o_year, MIN(bkt) AS bkt, MIN(n) AS n
    FROM c WHERE cum >= (n + 1) // 2 GROUP BY o_year
),
tot AS (SELECT COUNT(*) AS t FROM b)
SELECT o_year,
       CAST(n AS BIGINT) AS n_rows,
       CAST(n * 1000000 // (SELECT t FROM tot) AS BIGINT) AS share_ppm,
       CAST(CASE WHEN bkt <= 15 THEN bkt
            ELSE (8 + (bkt + 32) % 8) << ((bkt + 32) // 8 - 5) END
            AS BIGINT) AS p50_cents
FROM p50
WHERE n > 0
ORDER BY o_year
"""


def _x_doremi_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import doremi_mix

    return doremi_mix(load_table(spark, sf_dir, "documents"))


def _doremi_mix_sql() -> str:
    from ..ext.sampling import doremi_mix_sql

    return doremi_mix_sql()


TXN_RECLUSTER_LIVE_SQL = """
WITH src AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
           CAST(o_custkey % 256 AS BIGINT) AS cb,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey % 2 = 0
)
SELECT o_year, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_dollars
FROM src
WHERE (o_year = 1995 AND mo BETWEEN 4 AND 6 AND cb < 64)
   OR (o_year = 1996 AND cb < 64 AND cents < 5000000)
GROUP BY o_year
ORDER BY o_year
"""


ROUND13_STAGED: dict = {
    "x_label_propagation": (_x_label_prop, _label_prop_sql()),
    "x_kneser_ney_ppl": (_x_kn_bigram, _kn_bigram_sql()),
    "q_txn_mv_partitioned": (txn_mv_partitioned, TXN_MV_PARTITIONED_SQL),
    "x_unigram_lm_em": (_x_unigram_em, _unigram_em_sql()),
    "x_unigram_fertility": (_x_unigram_fert, _unigram_fert_sql()),
    "x_trajectory_neardup": (_x_traj_neardup, _traj_neardup_sql()),
    "x_group_advantages": (_x_group_adv, _group_adv_sql()),
    # SentencePiece pruning round: live vocab shrinks to the top pieces
    # by usage (+ the single-char feasibility floor) after every E-step
    "x_unigram_pruned": (_x_unigram_pruned, _unigram_pruned_sql()),
}


# Staged for the round-14 window (the round-13 registry is frozen at 337):
# parity-tested alongside the registered queries by the pooled scenario,
# degenerate-swept by the empty-sweep sibling.
ROUND14_STAGED: dict = {
    # VERDICT r12 #5: liquid re-clustering on a live partitioned table —
    # declare -> scoped-compact 1995 -> RE-declare -> scoped-compact 1996
    # -> mixed-layout box scans prune per partition, 1997 untouched
    "q_txn_recluster_live": (txn_recluster_live, TXN_RECLUSTER_LIVE_SQL),
    # VERDICT r12 #6: commit-by-commit behavioral dedup — the txn
    # streaming tail drives trajectory_relation -> persisted band store
    "s_stream_trajectory_dedup": (
        stream_trajectory_dedup, _stream_traj_dedup_sql()
    ),
    # VERDICT r12 final-note shortlist: mergeable log-resident quantile
    # histograms (exact-integer DDSketch buckets; ANALYZE with zero I/O)
    "q_txn_quantile_stats": (txn_quantile_stats, TXN_QUANTILE_STATS_SQL),
    # the histogram layer as a data-quality monitor: per-commit
    # total-variation drift vs the base table, pure log arithmetic
    "q_txn_quantile_drift": (txn_quantile_drift, TXN_QUANTILE_DRIFT_SQL),
    # DoReMi-style excess-loss mixture reweighting (exact-integer
    # multiplicative weights; Xie et al. 2023)
    "x_doremi_mix": (_x_doremi_mix, _doremi_mix_sql()),
    # retention deletes propagate to derived data: CDF -> band-store GC
    "x_dedup_store_gc": (dedup_store_gc_demo, _dedup_store_gc_sql()),
    # __pv x __qh composed: per-partition skew/distribution report with
    # zero data I/O
    "q_txn_partition_profile": (
        txn_partition_profile, TXN_PARTITION_PROFILE_SQL
    ),
}


def _x_unigram_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.bpe import unigram_transfer_fertility

    return unigram_transfer_fertility(load_table(spark, sf_dir, "documents"))


def _unigram_transfer_sql() -> str:
    from ..ext.bpe import unigram_fertility_sql

    return unigram_fertility_sql(
        train_where="source <= 'src0'", transfer_delta=True
    )


# Staged for the round-15 window (the r14 wave above is frozen at 7):
# parity-tested alongside the registered queries by the pooled scenario,
# degenerate-swept by the empty-sweep sibling.
ROUND15_STAGED: dict = {
    # tokenizer transfer: vocab trained on ONE source slice, applied
    # corpus-wide; per-source fertility + gap to the corpus-wide rate
    "x_unigram_transfer": (_x_unigram_transfer, _unigram_transfer_sql()),
}


# Staged for the round-11 window (the round-10 registry is frozen at 309):
# parity-tested alongside the registered queries by the pooled scenario,
# degenerate-swept by the empty-sweep sibling.
ROUND11_STAGED: dict = {
    "q_txn_generated_cols": (txn_generated_columns, TXN_GENERATED_SQL),
    "q_txn_ndv_stats": (txn_ndv_stats, TXN_NDV_SQL),
    "q_txn_sketch_overlap": (txn_sketch_overlap, TXN_SKETCH_OVERLAP_SQL),
    "x_maxsim_rerank": (_x_maxsim, _maxsim_sql()),
    "x_semihard_negatives": (_x_semihard_negatives, _semihard_negatives_sql()),
    "s_stream_kmv_users": (_s_stream_kmv, _stream_kmv_sql()),
    "x_prf_expansion": (_x_prf, _prf_sql()),
    "q_recursive_hierarchy": (_q_recursive, _recursive_sql()),
    "s_stream_attribution_outer": (_s_stream_outer, _stream_outer_sql()),
    "x_psi_drift": (_x_psi, _psi_sql()),
    "q_txn_merge_when": (txn_merge_when, TXN_MERGE_WHEN_SQL),
}

# REGISTERED in round 10 (harness.py round-10 additions — VERDICT r9 #1);
# kept as a named wave for the pooled parity scenario's coverage.
ROUND10_STAGED = {
    "q_txn_replace_where": (txn_replace_where_backfill, TXN_REPLACE_WHERE_SQL),
    "q_txn_zorder_box": (txn_zorder_box_scan, TXN_ZORDER_SQL),
    "q_txn_vacuum": (txn_vacuum_lifecycle, TXN_VACUUM_SQL),
    "q_txn_clone": (txn_clone_what_if, TXN_CLONE_SQL),
    "s_stream_txn_cdf": (stream_txn_cdf_rollup, STREAM_TXN_CDF_SQL),
    "x_cdf_reembed": (txn_cdf_reembed, TXN_CDF_REEMBED_SQL),
    "x_parent_retrieval": (_parent_retrieval, _parent_retrieval_sql()),
}

ROUND9_STAGED = {
    "q_txn_dv_delete": (txn_dv_delete_orders, TXN_DV_DELETE_SQL),
    "q_txn_dv_update": (txn_dv_update_orders, TXN_DV_UPDATE_SQL),
    "q_txn_restore": (txn_restore_orders, TXN_RESTORE_SQL),
    "q_txn_bloom_lookup": (txn_bloom_point_lookups, TXN_BLOOM_SQL),
    "q_txn_incremental_mv": (txn_incremental_mv, TXN_INCREMENTAL_MV_SQL),
    "s_stream_txn_tail": (stream_txn_tail_rollup, STREAM_TXN_TAIL_SQL),
}

ROUND8_TXN_QUERIES = {
    "q_txn_timetravel": (txn_timetravel_orders, TXN_TIMETRAVEL_SQL),
    "q_txn_merge_cdc": (txn_merge_latest_balance, TXN_MERGE_SQL),
    "q_txn_skipping_scan": (txn_skipping_scan, TXN_SKIPPING_SQL),
    "q_txn_cdf_dedup": (txn_cdf_incremental_dedup, TXN_CDF_DEDUP_SQL),
}
