"""Text-analysis operators (SURVEY.md §2.9): token/char stats, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in Column expressions (JVM-side, codegen'd) — no
Python UDFs in the hot path.  The oracle-checkable parts use only arithmetic
that is bit-identical across engines (integer counts, single-division ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# crude stopword set for quality scoring (public/ubiquitous English list)
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with as at by",
)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document char/token stats.  Single-space-tokenized to stay
    bit-identical with the ANSI oracle (str_split on ' ')."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        (n_unique.cast("double") / n_tokens).alias("unique_ratio"),
        ((n_chars - (n_tokens - 1)).cast("double") / n_tokens).alias("avg_token_len"),
    )


TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
       CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(LEN(LIST_DISTINCT(STR_SPLIT(text, ' '))) AS BIGINT) AS n_unique_tokens,
       CAST(LEN(LIST_DISTINCT(STR_SPLIT(text, ' '))) AS DOUBLE)
           / CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS unique_ratio,
       CAST(CAST(LENGTH(text) AS BIGINT)
            - (CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) - 1) AS DOUBLE)
           / CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS avg_token_len
FROM documents
"""


def language_profile(docs: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Corpus profile per language tag: doc counts, char volume, source
    spread — the shape of a pre-training language-mix report."""
    n = F.count(F.lit(1))
    return (
        docs.groupBy(lang_col)
        .agg(
            n.alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / n).alias("avg_chars"),
            F.countDistinct("source").alias("unique_sources"),
        )
        .orderBy(lang_col)
    )


LANGUAGE_PROFILE_SQL = """
SELECT lang,
       COUNT(*) AS doc_count,
       SUM(n_chars) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       COUNT(DISTINCT source) AS unique_sources
FROM documents
GROUP BY lang
ORDER BY lang
"""


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style filters, public recipes):
    length band, mean word length band, alpha ratio, stopword presence.
    Returns per-doc signals + a 0..4 integer score (deterministic)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    mean_wl = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS[0].split()])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("bigint")
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast("bigint")
    alpha_ratio = alpha_chars.cast("double") / n_chars

    sig_len = (n_tokens >= 10) & (n_tokens <= 100000)
    sig_wl = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    sig_alpha = alpha_ratio >= 0.6
    sig_stop = stop_hits >= 1

    def b(c: Column) -> Column:
        return F.when(c, 1).otherwise(0).cast("bigint")

    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stopword_hits"),
        (b(sig_len) + b(sig_wl) + b(sig_alpha) + b(sig_stop)).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-n-gram language-ID heuristic (cld-style, tiny): scores a few
    high-frequency function words / character patterns per language and picks
    the argmax.  A placeholder for a real fastText-style model (the model
    weights would ship as a broadcast dict + pandas UDF); deterministic and
    fully JVM-side."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def count_of(pat: str) -> Column:
        # occurrences of a literal token with word boundaries (spaces)
        return (F.length(t) - F.length(F.regexp_replace(t, pat, ""))) / max(len(pat) - 4, 1)

    scores = {
        "en": count_of(r" the ") + count_of(r" and ") + count_of(r" is "),
        "es": count_of(r" el ") + count_of(r" la ") + count_of(r" de ") + count_of(r" que "),
        "fr": count_of(r" le ") + count_of(r" la ") + count_of(r" et ") + count_of(r" des "),
        "de": count_of(r" der ") + count_of(r" die ") + count_of(r" und "),
    }
    pairs = F.array(
        *[F.struct(s.cast("double").alias("score"), F.lit(k).alias("lang")) for k, s in scores.items()]
    )
    best = F.array_max(pairs)
    return docs.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable document fingerprints: md5 (cross-engine checkable) and
    xxhash64 (cheap 64-bit, Spark-native) of the raw text."""
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("binary")).alias("md5_fingerprint"),
        F.xxhash64(text_col).alias("xxhash64_fingerprint"),
    )
