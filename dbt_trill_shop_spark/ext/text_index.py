"""Persisted BM25 inverted index: build once, search many.

:func:`textstats.bm25_search` computes tf/df/dl inside every query plan —
right for a one-shot job, wasteful for a serving corpus searched repeatedly.
This module materializes the index as parquet tables:

- ``postings/``  (term, doc_id, tf, df) **partitioned by term_bucket**
  (``md5(term) % n_buckets``) — a search collects its query terms' buckets
  into a literal IN filter, so the scan prunes to those partition
  directories and never reads the rest (the text twin of the vector
  index's cell-partitioned postings).  df is denormalized onto the posting
  row so search needs no second term-level join.
- ``doclens/``   (doc_id, dl) — per-document token counts.
- ``meta.json``  (n_docs, avgdl, n_buckets).

At 100 TB the postings are (term, id, two ints) — a fraction of the corpus
bytes — the build cost amortizes across every later search, and per-search
I/O is |query-term buckets| / n_buckets of the postings.  Lucene's segment
layout, expressed as parquet + partition pruning.

Determinism matches :func:`bm25_search` exactly (identical scoring
expression tree, int64 micro partials), so searching a built index returns
identical rows and the harness query shares the one-plan composition's
DuckDB oracle verbatim.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..localrel import values_relation


def _term_bucket(col, n_buckets: int):
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the BM25 inverted index for ``docs`` under ``path``."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, "doclens"))

    # df (per-term doc count) as a window over the SAME exchange the bucket
    # layout already needs: hashpartitioning(term_bucket) satisfies the
    # window's (term_bucket, term) clustering (term_bucket is a pure function
    # of term, so every term's rows co-locate), and the window's
    # (term_bucket, term) sort IS the write-side ordering — one exchange +
    # one sort of the corpus-sized tf relation total, vs the former per-term
    # groupBy exchange + join back (guide §2.4: two operations keyed the
    # same way share one exchange).  Measured at sf0.1: postings plan 6
    # Exchanges + SortMergeJoin -> 1 Exchange, identical rows/schema/meta.
    w = Window.partitionBy("term_bucket", "term")
    postings = (
        tf.withColumn("term_bucket", _term_bucket(F.col("term"), n_buckets))
        .repartition("term_bucket")
        .withColumn("df", F.count(F.lit(1)).over(w))
        .select("term_bucket", "term", "doc_id", "tf", "df")
    )
    (
        postings.sortWithinPartitions("term_bucket", "term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )

    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    ).collect()[0]
    # Persist the table schemas too: search reads with an explicit schema,
    # which (a) skips the footer-sampling inference job over what at corpus
    # scale is thousands of posting files, and (b) keeps an EMPTY index
    # (zero-row build corpus writes no parquet parts) searchable — reading
    # a part-less directory without a schema is an AnalysisException.
    meta = {
        "n_docs": stats.n_docs,
        "avgdl": stats.avgdl if stats.avgdl is not None else 0.0,
        "n_buckets": n_buckets,
        "postings_schema": postings.schema.json(),
        "doclens_schema": dl.schema.json(),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def search_text_index(
    spark: SparkSession,
    path: str,
    query_terms: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Answer (query_id, term) batches from a built index.

    The query terms are driver-side literals (a search request, not a
    dataset), so their buckets become a literal IN partition filter — the
    postings scan touches only those directories (``PartitionFilters`` in
    the plan, guarded in tests).  Scoring is the exact
    :func:`textstats.bm25_search` expression tree over the pruned postings.
    """
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    n_docs, avgdl, n_buckets = meta["n_docs"], meta["avgdl"], meta["n_buckets"]
    postings_schema = StructType.fromJson(json.loads(meta["postings_schema"]))
    doclens_schema = StructType.fromJson(json.loads(meta["doclens_schema"]))

    import hashlib

    def bucket_of(term: str) -> int:
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets

    buckets = sorted({bucket_of(t) for _, t in query_terms})
    # Explicit schema: an empty query batch (drained upstream filter, empty
    # corpus at build time) must return an empty result, not crash schema
    # inference — the one failure the empty-input sweep found (SCALE.md).
    qdf = values_relation(
        spark, query_terms, "query_id bigint, term string"
    ).distinct()

    postings = (
        spark.read.schema(postings_schema)
        .parquet(os.path.join(path, "postings"))
        .filter(F.col("term_bucket").isin(buckets))
    )
    dl = spark.read.schema(doclens_schema).parquet(os.path.join(path, "doclens"))

    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    part = F.round(idf * tf_norm * 1_000_000, 0).cast("bigint")
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .select("query_id", F.col("doc_id").alias("hit_id"), part.alias("s_micro"))
        .groupBy("query_id", "hit_id")
        .agg(F.sum("s_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("hit_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "hit_id", "rank", "score_micro")
    )
