"""Deduplication operators for LLM-training-data pipelines (SURVEY.md §2.9).

- exact dedup: hash-groupBy on a content fingerprint (md5).  At 100 TB the
  groupBy shuffles only (fingerprint, doc_id) — 48 bytes/row — never the text.
- near-dup (MinHash + LSH): word-shingle sets -> HashingTF sparse vectors ->
  MinHashLSH banded similarity join with a Jaccard-distance threshold.
  Spark ML's approxSimilarityJoin is the banded-join formulation of
  Broder's MinHash scheme: candidate pairs come from LSH bucket joins, then
  exact MinHash-estimated distance filters them — no O(n^2) cross join.
- SimHash: 64-bit fingerprint from token hashes; near-dups = pairs whose
  fingerprints match on at least one of 4 16-bit bands (Hamming<=3-ish
  recall), joined band-wise — again no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts by md5 fingerprint; keep the smallest id as
    canonical.  Exact, deterministic, SQL-expressible (oracle-checkable)."""
    return (
        docs.select(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("bigint").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


EXACT_DUPLICATES_SQL = """
SELECT md5(text) AS fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       COUNT(*) AS dup_count
FROM documents
GROUP BY md5(text)
"""


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return docs with exact-duplicate texts removed (canonical = min id).

    Implemented as groupBy-min + semi join rather than dropDuplicates so the
    kept row is deterministic (dropDuplicates keeps an arbitrary row)."""
    keep = (
        docs.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 3,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (id_a < id_b, est. Jaccard distance).

    Word-level ``shingle_len``-gram shingles -> binarized HashingTF ->
    MinHashLSH.approxSimilarityJoin.  ``num_hash_tables`` trades recall for
    shuffle volume; at 100 TB keep vectors (not text) in the join and bump
    tables to ~16 for thresholds near 0.8.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    tokens = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), r"\s+").alias("tokens"),
    )
    # word n-gram shingles via sliding window over the token array (pure
    # Column expr — no Python UDF): shingle i = tokens[i..i+n-1] joined.
    n = shingle_len
    shingled = tokens.select(
        id_col,
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("tokens") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("tokens", i + 1, n)),
            ),
            lambda s: s != "",
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document from word-level xxhash64 token hashes.

    Pure Column expressions: for each of 64 bits, sum +-1 over token hashes'
    bit values, then sign -> bit.  Deterministic (xxhash64 seed fixed by Spark).
    """
    # signed-64 bit masks: bit 63 is the sign bit, so its mask is -(2^63)
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    toks = docs.select(id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
    hashed = toks.select(id_col, F.xxhash64("tok").alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(masks[i])) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = bit_sums.select(
        F.col(id_col),
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(masks[i])).otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim


def simhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs whose SimHash matches on >=1 of ``bands``
    16-bit bands — a self-join per band on the band value (shuffle on a short
    key), unioned and de-duplicated.  Verify candidates downstream with exact
    Hamming distance (cheap: popcount of xor)."""
    sim = simhash(docs, text_col, id_col)
    width = 64 // bands
    mask = (1 << width) - 1
    pairs = None
    for b in range(bands):
        band_col = F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
        banded = sim.select(F.col(id_col), F.col("simhash"), band_col.alias("band"))
        left = banded.alias("l")
        right = banded.alias("r")
        cand = left.join(right, on="band").filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        cand = cand.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        pairs = cand if pairs is None else pairs.union(cand)
    assert pairs is not None
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .drop("sim_a", "sim_b")
    )
