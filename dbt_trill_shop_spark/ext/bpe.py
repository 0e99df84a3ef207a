"""BPE tokenizer induction over the corpus (Sennrich et al. 2016) —
the tokenizer-training step of an LLM data pipeline, run as Spark jobs.

Classic BPE trains on the *distinct-word frequency table*, not the corpus:
one corpus pass builds (word, freq), and every merge iteration then touches
only vocab-bounded data.  That is exactly the shape that survives 100 TB —
the corpus-sized work is a single tokenize + groupBy(word) (shuffle keyed on
the word, combiner-aggregated map-side), after which ``max_vocab`` rows ride
through the merge loop.  Per iteration: one vocab-sized pair-count aggregate
(adjacent-pair explode -> groupBy -> sum(freq)) and ONE driver-side collect
of a single row (the argmax pair) — bounded at any corpus size, the same
"tiny argmax to the driver" idiom as ``kmeans_refine``.

Symbol sequences are kept as STRINGS, each token wrapped in a sentinel
(``\\x1f`` + token + ``\\x1f``), so a merge is one ``replace()`` of
``\\x1fl\\x1f\\x1fr\\x1f`` with ``\\x1flr\\x1f``.  The per-token wrapping makes
consecutive matches share no characters, so the engine's leftmost
non-overlapping ``replace`` merges a run ``a a a a`` into ``aa aa`` exactly
like the reference greedy fold — and DuckDB's ``replace`` has the same
semantics, which is what makes the chained-CTE oracle bit-exact.

Reference scope: the dbt reference (Muizzkolapo/dbt-trill-shop) has no
tokenizer surface — this is driver-north-star extension territory
(SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: never produced by the [a-z]+ tokenizer

_WORD_SPLIT = "[^a-z]+"


def word_frequencies(docs: DataFrame, max_vocab: int, text_col: str = "text") -> DataFrame:
    """Top-``max_vocab`` (word, freq) from the corpus — the ONE corpus-sized
    pass.  Total order (freq desc, word asc) makes the cut deterministic."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(max_vocab)
    )


def _encoded(words: DataFrame) -> DataFrame:
    """Wrap every character of ``w`` as ``SEP + c + SEP`` (initial symbols)."""
    return words.select(
        F.regexp_replace("w", "(.)", SEP + "$1" + SEP).alias("s"), "freq"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    toks = F.filter(F.split("s", SEP), lambda x: x != F.lit(""))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    max_vocab: int = 2000,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, lhs, rhs, pair_count), rank-ordered.

    Ties break (count desc, lhs asc, rhs asc) — binary string comparison in
    both engines, so the learned merge table is engine-exact.
    """
    spark = docs.sparkSession
    words = _encoded(word_frequencies(docs, max_vocab, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["pair_count"])
        merges.append((rank, lhs, rhs, cnt))
        # checkpoint the merge result each iteration: the replace literals
        # change per merge, so left lazy they splice into the pair-count
        # plan and force a fresh whole-stage-codegen compile of the big
        # zip_with/slice expression EVERY iteration (~1 s x n_merges cold).
        # Materialized, the pair-count plan is byte-identical across
        # iterations (scan of a checkpointed relation) and compiles once;
        # the vocab relation is max_vocab rows, so the checkpoint is free.
        words = words.withColumn(
            "s",
            F.replace(
                "s",
                F.lit(SEP + lhs + SEP + SEP + rhs + SEP),
                F.lit(SEP + lhs + rhs + SEP),
            ),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "merge_rank BIGINT, lhs STRING, rhs STRING, pair_count BIGINT"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: per document, the BPE
    token count and the segmented first word (smoke surface for serving).
    Merges apply in rank order as chained ``replace`` — a narrow,
    shuffle-free projection however large the corpus."""
    enc = F.regexp_replace(
        F.lower(F.col(text_col)), "(" + _WORD_SPLIT + ")|(.)", SEP + "$2" + SEP
    )
    col = enc
    for lhs, rhs in merges:
        col = F.replace(
            col,
            F.lit(SEP + lhs + SEP + SEP + rhs + SEP),
            F.lit(SEP + lhs + rhs + SEP),
        )
    toks = F.filter(F.split(col, SEP), lambda x: x != F.lit(""))
    return docs.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("n_bpe_tokens")
    )


def bpe_merges_sql(n_merges: int = 8, max_vocab: int = 2000) -> str:
    """DuckDB oracle: the identical algorithm as chained CTEs — per
    iteration a pair-count aggregate, a 1-row argmax, and a cross-join
    replace — UNION'd into the rank-ordered merge table."""
    parts = [
        f"""
WITH words AS (
    SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '{_WORD_SPLIT}')) AS w
        FROM documents
    ) WHERE w <> ''
    GROUP BY w ORDER BY freq DESC, w ASC LIMIT {max_vocab}
),
w0 AS (
    SELECT regexp_replace(w, '(.)', chr(31)||'\\1'||chr(31), 'g') AS s, freq
    FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
p{i} AS (
    SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM (
        SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:])) AS pr, freq
        FROM (
            SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS toks,
                   freq
            FROM w{i - 1}
        )
    )
    GROUP BY 1, 2
),
t{i} AS (SELECT lhs, rhs, pair_count FROM p{i}
         ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
w{i} AS (
    SELECT replace(w{i - 1}.s,
                   chr(31)||t{i}.lhs||chr(31)||chr(31)||t{i}.rhs||chr(31),
                   chr(31)||t{i}.lhs||t{i}.rhs||chr(31)) AS s,
           freq
    FROM w{i - 1}, t{i}
)"""
        )
    unions = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"\nSELECT * FROM (\n    {unions}\n) ORDER BY merge_rank")
    return "".join(parts)


def bpe_segment_sql(merges: list[tuple[str, str]]) -> str:
    """DuckDB oracle for :func:`bpe_segment` with a *given* merge table."""
    col = f"regexp_replace(lower(text), '({_WORD_SPLIT})|(.)', chr(31)||'\\2'||chr(31), 'g')"
    for lhs, rhs in merges:
        col = (
            f"replace({col}, chr(31)||'{lhs}'||chr(31)||chr(31)||'{rhs}'||chr(31),"
            f" chr(31)||'{lhs}{rhs}'||chr(31))"
        )
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split({col}, chr(31)), x -> x <> '')) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""
