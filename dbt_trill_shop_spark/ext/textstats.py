"""Text-analysis operators (SURVEY.md §2.9): token/char stats, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in Column expressions (JVM-side, codegen'd) — no
Python UDFs in the hot path.  The oracle-checkable parts use only arithmetic
that is bit-identical across engines (integer counts, single-division ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
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
    # empty doc: NULL ratio (DuckDB divide-by-zero semantics), alpha
    # signal falls to 0 via the WHEN/otherwise (noop-sweep find, r7)
    alpha_ratio = alpha_chars.cast("double") / F.nullif(n_chars, F.lit(0))

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
        # non-overlapping occurrences of a literal token with space word
        # boundaries; regexp_count keeps the expression tree small (the
        # length-minus-replaced formulation doubled every regexp and blew up
        # codegen size)
        return F.regexp_count(t, F.lit(pat)).cast("double")

    scores = {
        lang: sum((count_of(p) for p in pats), F.lit(0.0))
        for lang, pats in _LANG_PATTERNS.items()
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


# Polynomial rolling-hash parameters (Rabin-Karp style).  base*mod fits in
# int64 (mod < 2^30, base 31 -> max intermediate ~ 2^35), so the fold is
# exact integer arithmetic and bit-identical across engines.
_ROLL_MOD = 1_000_000_007


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rabin-Karp polynomial rolling hash over the character codepoints:
    ``h = (h*31 + code) mod 1e9+7`` folded left-to-right.  Pure Column
    higher-order functions (split -> transform(ascii) -> aggregate) — no UDF,
    whole-stage codegen'd, and exactly reproducible in ANSI SQL."""
    codes = F.transform(F.split(F.col(text_col), ""), F.ascii)
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c.cast("long")) % _ROLL_MOD,
    )
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("binary")).alias("md5_fingerprint"),
        h.alias("rolling_hash"),
    )


ROLLING_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(text) AS md5_fingerprint,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007
       ) AS rolling_hash
FROM documents
"""


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the shape of the GPT-2 pretokenizer regex, simplified to a subset with
# identical semantics in Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts under a BPE-ish regex pre-tokenizer plus
    whitespace tokenization — the two standard "how many tokens is this
    corpus" estimators for training-data sizing."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    ws = F.split(F.col(text_col), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).cast("bigint").alias("n_distinct_bpe_tokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
    )


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
           AS n_bpe_tokens,
       CAST(LEN(LIST_DISTINCT(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS n_distinct_bpe_tokens,
       CAST(LEN(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens
FROM documents
"""


_STOPWORD_LIST = STOPWORDS[0].split()

QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       n_tokens,
       mean_word_len,
       alpha_ratio,
       stopword_hits,
       (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1 ELSE 0 END
        + CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 1 ELSE 0 END
        + CASE WHEN alpha_ratio >= 0.6 THEN 1 ELSE 0 END
        + CASE WHEN stopword_hits >= 1 THEN 1 ELSE 0 END) AS quality_score
FROM (
    SELECT doc_id,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(CAST(LENGTH(text) AS BIGINT)
                - (CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) - 1) AS DOUBLE)
               / CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS mean_word_len,
           CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS BIGINT) AS alpha_ratio,
           CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(STR_SPLIT(text, ' ')),
                                   {_STOPWORD_LIST!r})) AS BIGINT) AS stopword_hits
    FROM documents
) t
"""


# Mirrors language_id()'s scoring exactly: per-language non-overlapping
# function-word occurrence counts, argmax tie-broken by the lexicographically
# greatest lang tag (Spark's array_max over (score, lang) structs).
_LANG_PATTERNS = {
    "en": [" the ", " and ", " is "],
    "es": [" el ", " la ", " de ", " que "],
    "fr": [" le ", " la ", " et ", " des "],
    "de": [" der ", " die ", " und "],
}


def _lang_score_sql(pats: list[str]) -> str:
    return " + ".join(f"LEN(regexp_extract_all(t, '{p}'))" for p in pats)


LANGUAGE_ID_SQL = f"""
WITH padded AS (
    SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents
),
scored AS (
    SELECT doc_id, lang, score FROM (
        SELECT doc_id,
               unnest(['en','es','fr','de']) AS lang,
               unnest([
                   CAST({_lang_score_sql(_LANG_PATTERNS['en'])} AS DOUBLE),
                   CAST({_lang_score_sql(_LANG_PATTERNS['es'])} AS DOUBLE),
                   CAST({_lang_score_sql(_LANG_PATTERNS['fr'])} AS DOUBLE),
                   CAST({_lang_score_sql(_LANG_PATTERNS['de'])} AS DOUBLE)
               ]) AS score
        FROM padded
    ) u
),
best AS (
    SELECT doc_id, lang, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang DESC) AS rn
    FROM scored
)
SELECT doc_id,
       CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       score AS lang_score
FROM best WHERE rn = 1
"""


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k TF-IDF terms (single-space tokens, exact counts).

    Built from explode/groupBy/window — no HashingTF, so scores are exact and
    the whole thing is ANSI-SQL expressible.  idf = ln((N+1)/(df+1)) with N a
    1-row aggregate cross-joined in (broadcast, keeps the plan fully lazy).
    Scores rounded to 6 dp before ranking; ties broken by term asc.
    """
    toks = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    # tf feeds BOTH the doc-frequency aggregate and the score join —
    # materialize once so the explode+groupBy doesn't run twice
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tfidf", F.col("rn").alias("rank"))
    )


TFIDF_TOP_TERMS_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * LN(CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf,
       CAST(rn AS BIGINT) AS rank
FROM (
    SELECT doc_id, term, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
    FROM scored
) t
WHERE rn <= {k}
"""


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A.1.1), token-level
    variant for single-line docs:

    - ``dup_word_frac``     1 - distinct/total tokens;
    - ``top_bigram_frac``   tokens covered by the most frequent bigram
                            (2 * max bigram count / n_tokens);
    - ``dup_trigram_frac``  fraction of trigram occurrences whose trigram
                            appears more than once;
    - ``repetitive``        flag: dup_word_frac > 0.9 OR top_bigram_frac > 0.2.

    All ratios are exact-int divisions rounded to 6 dp (cross-engine safe).
    Two map-side-combinable groupBys keyed by (doc, gram) then doc — at scale
    this partial-aggregates before the shuffle and never materializes a
    per-document gram list on the driver.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("t"))

    def grams(k: int):
        parts = ", ' ', ".join(f"t[i + {j}]" for j in range(k))
        return F.expr(
            f"transform(sequence(0, size(t) - {k}), i -> concat({parts}))"
        )

    def gram_counts(k: int, out_top: bool):
        g = (
            base.filter(F.size("t") >= k)
            .select(id_col, F.explode(grams(k)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        aggs = [F.sum("c").alias(f"n_{k}g")]
        if out_top:
            aggs.append(F.max("c").alias("top_c"))
        else:
            aggs.append(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_c")
            )
        return g.groupBy(id_col).agg(*aggs)

    stats = base.select(
        id_col,
        F.size("t").cast("bigint").alias("n"),
        F.size(F.array_distinct("t")).cast("bigint").alias("nd"),
    )
    bi = gram_counts(2, out_top=True)
    tri = gram_counts(3, out_top=False)
    joined = stats.join(bi, id_col, "left").join(tri, id_col, "left")
    dup_word = F.round(F.lit(1.0) - F.col("nd").cast("double") / F.col("n"), 6)
    top_bg = F.round(
        F.lit(2.0) * F.coalesce(F.col("top_c"), F.lit(0)) / F.col("n"), 6
    )
    dup_tri = F.round(
        F.coalesce(
            F.col("dup_c").cast("double") / F.col("n_3g"), F.lit(0.0)
        ),
        6,
    )
    return joined.select(
        F.col(id_col),
        dup_word.alias("dup_word_frac"),
        top_bg.alias("top_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
        ((dup_word > 0.9) | (top_bg > 0.2)).alias("repetitive"),
    )


REPETITION_SIGNALS_SQL = """
WITH toks AS (
    SELECT doc_id, STR_SPLIT(text, ' ') AS t FROM documents
),
stats AS (
    SELECT doc_id, CAST(LEN(t) AS BIGINT) AS n,
           CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS nd
    FROM toks
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(0, LEN(t) - 1),
                                 i -> t[i + 1] || ' ' || t[i + 2])) AS g
    FROM toks WHERE LEN(t) >= 2
),
bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
bga AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_2g FROM bgc GROUP BY doc_id),
tg AS (
    SELECT doc_id,
           unnest(list_transform(range(0, LEN(t) - 2),
                                 i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS g
    FROM toks WHERE LEN(t) >= 3
),
tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
tga AS (
    SELECT doc_id,
           SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
           SUM(c) AS n_3g
    FROM tgc GROUP BY doc_id
),
joined AS (
    SELECT s.doc_id, s.n, s.nd, b.top_c, t.dup_c, t.n_3g
    FROM stats s
    LEFT JOIN bga b ON s.doc_id = b.doc_id
    LEFT JOIN tga t ON s.doc_id = t.doc_id
)
SELECT doc_id,
       ROUND(1.0 - CAST(nd AS DOUBLE) / n, 6) AS dup_word_frac,
       ROUND(2.0 * COALESCE(top_c, 0) / n, 6) AS top_bigram_frac,
       ROUND(COALESCE(CAST(dup_c AS DOUBLE) / n_3g, 0.0), 6) AS dup_trigram_frac,
       (ROUND(1.0 - CAST(nd AS DOUBLE) / n, 6) > 0.9
        OR ROUND(2.0 * COALESCE(top_c, 0) / n, 6) > 0.2) AS repetitive
FROM joined
"""


# PII scrub rules, applied IN ORDER (specific before general so e.g. an IP
# isn't first mangled by the bare-number rule).  Patterns restricted to the
# regex intersection of Java (Spark) and RE2 (DuckDB): no lookaround.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
]


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact PII-ish spans (emails, IPs, phones, bare numbers) from
    ``text_col``; returns (id, scrubbed, n_redacted).

    Sequential regexp_replace chain — counts are taken on the intermediate
    text so a span consumed by an earlier rule is never double-counted.
    Pure codegen'd string expressions: scrubbing is a narrow map stage, no
    shuffle, safe to fuse into any scan.
    """
    cur = F.col(text_col)
    counts = []
    for _, pat, repl in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return df.select(
        F.col(id_col),
        cur.alias("scrubbed"),
        total.cast("bigint").alias("n_redacted"),
    )


def _pii_sql_steps(source_sql: str, id_col: str, text_col: str) -> str:
    steps = [f"s0 AS (SELECT {id_col}, {text_col} AS t0, 0 AS c0 FROM {source_sql})"]
    prev = 0
    for i, (_, pat, repl) in enumerate(PII_RULES, start=1):
        steps.append(
            f"s{i} AS (SELECT {id_col}, "
            f"regexp_replace(t{prev}, '{pat}', '{repl}', 'g') AS t{i}, "
            f"c{prev} + LEN(regexp_extract_all(t{prev}, '{pat}')) AS c{i} "
            f"FROM s{prev})"
        )
        prev = i
    return (
        "WITH " + ",\n".join(steps)
        + f"\nSELECT {id_col}, t{prev} AS scrubbed, CAST(c{prev} AS BIGINT) AS n_redacted FROM s{prev}"
    )


PII_SCRUB_EVENTS_SQL = _pii_sql_steps("events", "event_id", "props")


def _unigram_doc_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shared per-doc unigram-LM evidence for :func:`unigram_logprob` and
    :func:`ppl_buckets`: (id, n_tokens, sum_ln_micro, n_total) with
    ``sum_ln_micro`` the int64 micro-nat sum of per-token ln(count)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    # one explode+aggregate pass; global term counts derive algebraically
    # from tf (sum of per-doc counts) instead of re-exploding the corpus
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True)
    freq = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n_total"))
    scaled_ln = F.round(F.log(F.col("cnt")) * 1_000_000, 0).cast("bigint")
    per_doc = (
        tf.join(freq, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * scaled_ln).alias("sum_ln_micro"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total))


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style pseudo-perplexity filter: score each document by the mean
    negative log-probability of its tokens under the corpus's own unigram
    model (high = unusual token mix; the classic LM-based quality cut,
    Wenzek et al. 2020).

    avg_neg_logp = ln(N_total) - mean(ln(count(token)))

    Determinism: per-token ``ln(count)`` is scaled to micro-nats and SUMMED
    AS INT64 (float summation order varies across engines; integer sums
    don't) — the only float ops are one ln + one division at the end, both
    rounded to 6 dp.  Two shuffles, both map-side combinable: term counts
    keyed by term, then per-doc sums keyed by doc.
    """
    return (
        _unigram_doc_scores(docs, text_col, id_col)
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(
                F.log(F.col("n_total").cast("double"))
                - (F.col("sum_ln_micro").cast("double") / 1_000_000.0)
                / F.col("n_tokens"),
                6,
            ).alias("avg_neg_logp"),
        )
    )


UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(STR_SPLIT(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT SUM(cnt) AS n_total FROM freq),
per_doc AS (
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           SUM(tf.tf * CAST(ROUND(LN(freq.cnt) * 1000000, 0) AS BIGINT)) AS sum_ln_micro
    FROM tf JOIN freq USING (term)
    GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens,
       ROUND(LN(CAST(n_total AS DOUBLE))
             - (CAST(sum_ln_micro AS DOUBLE) / 1000000.0) / n_tokens,
             6) AS avg_neg_logp
FROM per_doc CROSS JOIN total
"""


def token_histogram(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bucket: int = 16
) -> DataFrame:
    """Corpus length-distribution report: document counts and token volume
    per token-count bucket (width ``bucket``) — the one-glance shape check
    before choosing pack/chunk parameters.  One map-side-combinable
    aggregation on a derived low-cardinality key."""
    n = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    b = F.floor(n / bucket).cast("bigint")
    return (
        docs.select(b.alias("bucket_id"), n.alias("n"))
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
        .select(
            "bucket_id",
            (F.col("bucket_id") * bucket).alias("bucket_lo"),
            "n_docs",
            "total_tokens",
            "min_tokens",
            "max_tokens",
        )
        .orderBy("bucket_id")
    )


TOKEN_HISTOGRAM_SQL_TEMPLATE = """
WITH n AS (
    SELECT CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n FROM documents
)
SELECT CAST(FLOOR(n / {bucket}) AS BIGINT) AS bucket_id,
       CAST(FLOOR(n / {bucket}) * {bucket} AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       MIN(n) AS min_tokens,
       MAX(n) AS max_tokens
FROM n
GROUP BY FLOOR(n / {bucket})
ORDER BY bucket_id
"""


def corpus_ngram_counts(
    docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Global n-gram frequency table, top-``k`` with deterministic
    tie-breaks — the corpus-statistics pass behind tokenizer and LM
    vocabulary design.  Explode → one map-side-combinable count keyed by the
    n-gram → global top-k (rank window over ONE ordered partition of only
    the aggregated counts, not the raw corpus)."""
    parts = ", ' ', ".join(f"t[i + {j}]" for j in range(n))
    grams = F.expr(f"transform(sequence(0, size(t) - {n}), i -> concat({parts}))")
    counts = (
        docs.select(F.split(F.col(text_col), " ").alias("t"))
        .filter(F.size("t") >= n)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # global sort+limit FIRST (TakeOrderedAndProject — per-partition top-k,
    # no full sort shuffle); the rank window then sees only k rows, so the
    # single-partition window is k-sized, never vocabulary-sized
    top = counts.orderBy(F.desc("freq"), F.asc("gram")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("gram"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "rank", "gram", "freq"
    )


CORPUS_NGRAM_COUNTS_SQL_TEMPLATE = """
WITH toks AS (SELECT STR_SPLIT(text, ' ') AS t FROM documents),
grams AS (
    SELECT unnest(list_transform(range(0, LEN(t) - {n} + 1),
                                 i -> {concat_expr})) AS gram
    FROM toks WHERE LEN(t) >= {n}
),
counts AS (SELECT gram, COUNT(*) AS freq FROM grams GROUP BY gram)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, gram ASC) AS BIGINT) AS rank,
       gram, freq
FROM counts
ORDER BY freq DESC, gram ASC
LIMIT {k}
"""


def vocab_coverage(
    docs: DataFrame, vocab_sizes: tuple[int, ...] = (8, 16, 32), text_col: str = "text"
) -> DataFrame:
    """Tokenizer-design stat: for each candidate vocabulary size N, the
    fraction of all token OCCURRENCES covered by the N most frequent types
    (deterministic ties: count desc, token asc).  Exact int sums; one
    aggregation + a tiny ranked-vocab cumulative window."""
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # cut to the largest vocab size via sort+limit (TakeOrderedAndProject)
    # BEFORE the cumulative window — the single-partition window then runs
    # over max(vocab_sizes) rows, not the whole vocabulary
    top = counts.orderBy(F.desc("freq"), F.asc("tok")).limit(max(vocab_sizes))
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.select(
        F.row_number().over(w).alias("rank"),
        F.sum("freq").over(cum).alias("cum_freq"),
    )
    total = counts.agg(F.sum("freq").alias("total"))
    # literal-array explode -> LocalRelation (a createDataFrame from a
    # Python list would plan as Scan ExistingRDD and spin Python workers)
    sdf = docs.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(s) for s in vocab_sizes])).alias("vocab_size")
    )
    at = ranked.join(F.broadcast(sdf), ranked.rank == sdf.vocab_size).crossJoin(
        F.broadcast(total)
    )
    return at.select(
        F.col("vocab_size").cast("bigint").alias("vocab_size"),
        F.col("cum_freq").cast("bigint").alias("covered_tokens"),
        F.col("total").cast("bigint").alias("total_tokens"),
        F.round(F.col("cum_freq").cast("double") / F.col("total"), 6).alias("coverage"),
    ).orderBy("vocab_size")


VOCAB_COVERAGE_SQL_TEMPLATE = """
WITH counts AS (
    SELECT tok, COUNT(*) AS freq
    FROM (SELECT unnest(STR_SPLIT(text, ' ')) AS tok FROM documents) t
    GROUP BY tok
),
ranked AS (
    SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS rank,
           SUM(freq) OVER (ORDER BY freq DESC, tok ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_freq
    FROM counts
),
total AS (SELECT SUM(freq) AS total FROM counts)
SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
       CAST(r.cum_freq AS BIGINT) AS covered_tokens,
       CAST(t.total AS BIGINT) AS total_tokens,
       ROUND(CAST(r.cum_freq AS DOUBLE) / t.total, 6) AS coverage
FROM (VALUES {vocab_values}) AS v(vocab_size)
JOIN ranked r ON r.rank = v.vocab_size
CROSS JOIN total t
ORDER BY vocab_size
"""

# Frozen linear-probe weights for quality_classifier (integer milli-logit
# units — in production these come from a trained fastText-style probe;
# inference needs only the frozen literals).
_QC_BIAS_MILLI = -3000
_QC_W_ALPHA = 4  # per alpha per-mille of chars
_QC_W_STOP = 12  # per stopword-hit per-mille of tokens
_QC_W_LEN = 2  # per token, capped at 500
_QC_W_WL = 1  # per per-mille deviation of mean word length from 5.0 (halved)
_QC_KEEP_MILLI = 500


def quality_classifier(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Linear quality classifier — the serving shape of a trained
    fastText/logistic probe (Joulin et al. 2016; the CCNet/RefinedWeb
    quality-filter stage): engineered features x frozen weights -> logit ->
    keep flag.

    All arithmetic is exact integer (per-mille feature ratios via integer
    division, milli-logit weights), so scoring is deterministic across
    engines — and the whole op is JVM-side codegen'd Column expressions:
    one per-row narrow stage, no UDF, no shuffle, linear at 100 TB.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
        .cast("bigint")
        .alias("alpha_chars"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(w) for w in _STOPWORD_LIST])
            )
        )
        .cast("bigint")
        .alias("stop_hits"),
    )
    feats = base.select(
        id_col,
        # greatest(n_chars, 1): an EMPTY document is legal corpus input
        # (n_tokens is >= 1 by split semantics, but n_chars is 0) and must
        # score as garbage, not raise ANSI DIVIDE_BY_ZERO — the
        # degenerate-input sweep hit this through every caller of the
        # classifier (quality_auc, curriculum, curation v2, canonical pick)
        F.expr("alpha_chars * 1000 div greatest(n_chars, 1)").alias("alpha_pm"),
        F.expr("stop_hits * 1000 div n_tokens").alias("stop_pm"),
        F.expr("least(n_tokens, 500)").alias("len_cap"),
        # mean word length in milli-chars: (chars - separators) / tokens
        F.expr("abs((n_chars - (n_tokens - 1)) * 1000 div n_tokens - 5000) div 2").alias(
            "wl_dev"
        ),
    )
    logit = F.expr(
        f"{_QC_BIAS_MILLI} + {_QC_W_ALPHA} * alpha_pm + {_QC_W_STOP} * stop_pm "
        f"+ {_QC_W_LEN} * len_cap - {_QC_W_WL} * wl_dev"
    ).cast("bigint")
    return feats.select(
        id_col,
        F.col("alpha_pm").cast("bigint").alias("alpha_pm"),
        F.col("stop_pm").cast("bigint").alias("stop_pm"),
        logit.alias("logit_milli"),
        (logit >= _QC_KEEP_MILLI).cast("boolean").alias("keep"),
    )


QUALITY_CLASSIFIER_SQL = f"""
WITH base AS (
    SELECT doc_id,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS alpha_chars,
           CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(STR_SPLIT(text, ' ')),
                                   {_STOPWORD_LIST!r})) AS BIGINT) AS stop_hits
    FROM documents
),
feats AS (
    SELECT doc_id,
           alpha_chars * 1000 // GREATEST(n_chars, 1) AS alpha_pm,
           stop_hits * 1000 // n_tokens AS stop_pm,
           LEAST(n_tokens, 500) AS len_cap,
           ABS((n_chars - (n_tokens - 1)) * 1000 // n_tokens - 5000) // 2 AS wl_dev
    FROM base
)
SELECT doc_id,
       CAST(alpha_pm AS BIGINT) AS alpha_pm,
       CAST(stop_pm AS BIGINT) AS stop_pm,
       CAST({_QC_BIAS_MILLI} + {_QC_W_ALPHA} * alpha_pm + {_QC_W_STOP} * stop_pm
            + {_QC_W_LEN} * len_cap - {_QC_W_WL} * wl_dev AS BIGINT) AS logit_milli,
       ({_QC_BIAS_MILLI} + {_QC_W_ALPHA} * alpha_pm + {_QC_W_STOP} * stop_pm
        + {_QC_W_LEN} * len_cap - {_QC_W_WL} * wl_dev) >= {_QC_KEEP_MILLI} AS keep
FROM feats
"""


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam_tenths: int = 9,
) -> DataFrame:
    """Interpolated bigram LM pseudo-perplexity (the CCNet/Wenzek et al. 2020
    quality cut one order up from :func:`unigram_logprob`): score each
    document by the mean negative log-probability of its token bigrams under
    the corpus's own interpolated model

        P(w_i | w_{i-1}) = lam * c(w_{i-1} w_i) / c(w_{i-1} .)
                         + (1 - lam) * c(. w_i) / N

    with all counts taken over the corpus bigram relation (context marginal
    ``c(prev .)``, continuation marginal ``c(. cur)``, total ``N``), so the
    model is self-consistent and every probability is the exact rational

        p = (lam10 * cb * N + (10 - lam10) * cu * cp) / (10 * cp * N)

    in int64 (``lam = lam_tenths / 10``).  Only ``ln`` of those exact
    integers crosses into float; per-bigram ``ln`` is scaled to micro-nats,
    rounded once, and per-doc totals are INTEGER sums — the same
    cross-engine determinism recipe as the unigram operator.

    Distributed shape: bigrams come from a narrow array transform (no
    positional self-join); the per-doc bigram counts are shuffled ONCE and
    reused (checkpoint) for the model marginals — context/continuation
    marginals and N are algebraic rollups of the bigram counts, never a
    re-explode.  At 100 TB the (prev, cur) string keys would ride as
    xxhash64 pairs; strings are kept here for oracle transparency.
    """
    # Materialize the token array in its own projection BEFORE the lambda:
    # split() inside a higher-order-function body is re-evaluated per element
    # (Catalyst CSE cannot hoist out of a LambdaFunction), turning tokenize
    # into O(len^2) per document.  With `_toks` as a bound column the lambda
    # only does O(1) array indexing.
    tokenized = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    pairs = F.when(
        F.size("_toks") >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> struct(_toks[i-1] AS prev, _toks[i] AS cur))"
        ),
    ).otherwise(F.expr("array()"))
    big = tokenized.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )
    tf2 = (
        big.groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    cb = tf2.groupBy("prev", "cur").agg(F.sum("tf").alias("cb"))
    cp = cb.groupBy("prev").agg(F.sum("cb").alias("cp"))
    cu = cb.groupBy("cur").agg(F.sum("cb").alias("cu"))
    tot = cb.agg(F.sum("cb").alias("n"))
    num = (
        F.lit(lam_tenths) * F.col("cb") * F.col("n")
        + F.lit(10 - lam_tenths) * F.col("cu") * F.col("cp")
    ).cast("bigint")
    den = (F.lit(10) * F.col("cp") * F.col("n")).cast("bigint")
    scored = (
        cb.join(cp, "prev")
        .join(cu, "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "cur",
            F.round(
                (F.log(den.cast("double")) - F.log(num.cast("double"))) * 1_000_000, 0
            )
            .cast("bigint")
            .alias("neglogp_micro"),
        )
    )
    per_doc = tf2.join(scored, ["prev", "cur"]).groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("neglogp_micro")).alias("s_micro"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.round(
            (F.col("s_micro").cast("double") / 1_000_000.0) / F.col("n_bigrams"), 6
        ).alias("avg_neg_logp2"),
    )


BIGRAM_LOGPROB_SQL_TEMPLATE = """
WITH t AS (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents),
big AS (
    SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur
    FROM t, UNNEST(range(1, LEN(toks))) AS r(i)
),
tf2 AS (SELECT doc_id, prev, cur, COUNT(*) AS tf FROM big GROUP BY doc_id, prev, cur),
cb AS (SELECT prev, cur, SUM(tf) AS cb FROM tf2 GROUP BY prev, cur),
cp AS (SELECT prev, SUM(cb) AS cp FROM cb GROUP BY prev),
cu AS (SELECT cur, SUM(cb) AS cu FROM cb GROUP BY cur),
tot AS (SELECT SUM(cb) AS n FROM cb),
scored AS (
    SELECT cb.prev, cb.cur,
           CAST(ROUND((LN(CAST(CAST(10 * cp.cp * tot.n AS BIGINT) AS DOUBLE))
                       - LN(CAST(CAST({lam10} * cb.cb * tot.n
                                      + {inv10} * cu.cu * cp.cp AS BIGINT) AS DOUBLE)))
                      * 1000000, 0) AS BIGINT) AS neglogp_micro
    FROM cb JOIN cp ON cb.prev = cp.prev
            JOIN cu ON cb.cur = cu.cur
            CROSS JOIN tot
),
per_doc AS (
    SELECT tf2.doc_id,
           CAST(SUM(tf2.tf) AS BIGINT) AS n_bigrams,
           SUM(tf2.tf * scored.neglogp_micro) AS s_micro
    FROM tf2 JOIN scored ON tf2.prev = scored.prev AND tf2.cur = scored.cur
    GROUP BY tf2.doc_id
)
SELECT doc_id, n_bigrams,
       ROUND((CAST(s_micro AS DOUBLE) / 1000000.0) / n_bigrams, 6) AS avg_neg_logp2
FROM per_doc
"""


def kneser_ney_bigram(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kneser-Ney-smoothed bigram pseudo-perplexity (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form) — the stronger LM quality
    cut one rung above :func:`bigram_logprob`'s simple interpolation:
    the lower-order distribution is the CONTINUATION count (how many
    distinct contexts a word follows), not the raw unigram, so stock
    phrases ("san francisco") stop inflating their parts.

        P_KN(cur | prev) = max(c(prev,cur) − D, 0) / c(prev·)
                         + D·N1+(prev·)/c(prev·) · N1+(·cur)/N1+(··)

    with the absolute discount estimated from the corpus's own
    counts-of-counts, D = n1/(n1 + 2·n2) (Ney et al. 1994).  Every
    probability is the exact rational

        p = [max(cb·d − n1, 0)·T + n1·k(prev)·m(cur)] / (d·cp·T)

    where d = n1 + 2·n2 (floored at 1: no singleton/doubleton types
    means no discount and the formula degrades to the ML estimate),
    k(prev) = N1+(prev·), m(cur) = N1+(·cur), T = N1+(··) — all int64
    counts, numerator and denominator accumulated in decimal(38,0)
    (HUGEINT in the oracle) so no product overflows, with only the final
    ``ln`` of those exact integers crossing into float, rounded once to
    micro-nats; per-doc totals are INTEGER sums (the house cross-engine
    determinism recipe).

    Distributed shape: identical to :func:`bigram_logprob` — bigrams
    from a narrow array transform, per-doc counts shuffled once and
    checkpointed, the bigram-type relation checkpointed once and reused
    by FIVE algebraic rollups (context marginal, continuation counts,
    type total, counts-of-counts), scalars ride one broadcast row.
    At 100 TB the (prev, cur) keys ride as xxhash64 pairs; strings are
    kept here for oracle transparency."""
    tokenized = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    pairs = F.when(
        F.size("_toks") >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> struct(_toks[i-1] AS prev, _toks[i] AS cur))"
        ),
    ).otherwise(F.expr("array()"))
    big = tokenized.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )
    tf2 = (
        big.groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    cb = (
        tf2.groupBy("prev", "cur")
        .agg(F.sum("tf").cast("bigint").alias("cb"))
        .localCheckpoint(eager=True)
    )
    cp = cb.groupBy("prev").agg(
        F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("kprev")
    )
    mc = cb.groupBy("cur").agg(F.count(F.lit(1)).alias("mcur"))
    consts = cb.agg(
        F.count(F.lit(1)).alias("t_types"),
        F.sum((F.col("cb") == 1).cast("bigint")).alias("n1"),
        F.greatest(
            F.sum((F.col("cb") == 1).cast("bigint"))
            + 2 * F.sum((F.col("cb") == 2).cast("bigint")),
            F.lit(1).cast("bigint"),
        ).alias("d"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    num = (
        F.greatest(
            dec(F.col("cb")) * dec(F.col("d")) - dec(F.col("n1")),
            F.lit(0).cast("decimal(38,0)"),
        )
        * dec(F.col("t_types"))
        + dec(F.col("n1")) * dec(F.col("kprev")) * dec(F.col("mcur"))
    )
    den = dec(F.col("d")) * dec(F.col("cp")) * dec(F.col("t_types"))
    scored = (
        cb.join(cp, "prev")
        .join(mc, "cur")
        .crossJoin(F.broadcast(consts))
        .select(
            "prev",
            "cur",
            F.round(
                (F.log(den.cast("double")) - F.log(num.cast("double")))
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("neglogp_micro"),
        )
    )
    per_doc = tf2.join(scored, ["prev", "cur"]).groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("neglogp_micro")).alias("s_micro"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.round(
            (F.col("s_micro").cast("double") / 1_000_000.0) / F.col("n_bigrams"), 6
        ).alias("avg_neg_logp_kn"),
    )


KNESER_NEY_BIGRAM_SQL = """
WITH t AS (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents),
big AS (
    SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur
    FROM t, UNNEST(range(1, LEN(toks))) AS r(i)
),
tf2 AS (SELECT doc_id, prev, cur, COUNT(*) AS tf FROM big GROUP BY doc_id, prev, cur),
cb AS (SELECT prev, cur, CAST(SUM(tf) AS BIGINT) AS cb FROM tf2 GROUP BY prev, cur),
cp AS (SELECT prev, SUM(cb) AS cp, COUNT(*) AS kprev FROM cb GROUP BY prev),
mc AS (SELECT cur, COUNT(*) AS mcur FROM cb GROUP BY cur),
consts AS (
    SELECT COUNT(*) AS t_types,
           SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS n1,
           GREATEST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END)
                    + 2 * SUM(CASE WHEN cb = 2 THEN 1 ELSE 0 END), 1) AS d
    FROM cb
),
scored AS (
    SELECT cb.prev, cb.cur,
           CAST(ROUND((LN(CAST(CAST(consts.d AS HUGEINT) * cp.cp
                               * consts.t_types AS DOUBLE))
                       - LN(CAST(GREATEST(CAST(cb.cb AS HUGEINT) * consts.d
                                          - consts.n1, 0) * consts.t_types
                                 + CAST(consts.n1 AS HUGEINT) * cp.kprev
                                   * mc.mcur AS DOUBLE)))
                      * 1000000, 0) AS BIGINT) AS neglogp_micro
    FROM cb JOIN cp ON cb.prev = cp.prev
            JOIN mc ON cb.cur = mc.cur
            CROSS JOIN consts
),
per_doc AS (
    SELECT tf2.doc_id,
           CAST(SUM(tf2.tf) AS BIGINT) AS n_bigrams,
           SUM(tf2.tf * scored.neglogp_micro) AS s_micro
    FROM tf2 JOIN scored ON tf2.prev = scored.prev AND tf2.cur = scored.cur
    GROUP BY tf2.doc_id
)
SELECT doc_id, n_bigrams,
       ROUND((CAST(s_micro AS DOUBLE) / 1000000.0) / n_bigrams, 6)
           AS avg_neg_logp_kn
FROM per_doc
"""


def importance_weights(
    docs: DataFrame,
    target_lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023): score
    every document by the log-likelihood ratio of its tokens under a
    TARGET-domain unigram LM (here: the ``target_lang`` slice) vs the RAW
    corpus LM — positive means "looks like the target domain"; select by
    thresholding/top-k downstream.

    Both LMs are Laplace-smoothed over the SHARED corpus vocabulary V:

        w(d) = sum_t tf_t * [ ln(c_tgt(t)+1) - ln(c_raw(t)+1) ]
             + n_d * [ ln(N_raw + V) - ln(N_tgt + V) ]

    Determinism: every ln is a ln-of-integer rounded to int64 micro-nats
    BEFORE summation (float sum order never enters); the scalar normalizer
    rides a broadcast 1-row cross join.  Plan: the tf relation is computed
    once (checkpointed) and feeds target counts, raw counts, and the
    per-doc rollup — three map-side-combinable aggregates, no corpus
    re-explode.  At 100 TB: shuffles are keyed on term / doc only, text
    never rides; the LMs are vocabulary-sized.
    """
    toks = docs.select(
        F.col(id_col),
        (F.col("lang") == target_lang).alias("is_tgt"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy(id_col, "is_tgt", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True)
    freq = tf.groupBy("term").agg(
        F.sum("tf").alias("c_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("tf")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    micro = lambda c: F.round(F.log(c.cast("double")) * 1_000_000, 0).cast("bigint")  # noqa: E731
    term_w = freq.select(
        "term",
        (micro(F.col("c_tgt") + 1) - micro(F.col("c_raw") + 1)).alias("w_micro"),
    )
    norm = freq.agg(
        (
            micro(F.sum("c_raw") + F.count(F.lit(1)))
            - micro(F.sum("c_tgt") + F.count(F.lit(1)))
        ).alias("norm_micro")
    )
    per_doc = (
        tf.join(term_w, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("sum_w_micro"),
        )
    )
    return per_doc.crossJoin(F.broadcast(norm)).select(
        F.col(id_col),
        "n_tokens",
        (F.col("sum_w_micro") + F.col("n_tokens") * F.col("norm_micro")).alias(
            "importance_micro"
        ),
    )


IMPORTANCE_WEIGHTS_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, lang = '{target_lang}' AS is_tgt,
           unnest(STR_SPLIT(text, ' ')) AS term
    FROM documents
),
tf AS (SELECT doc_id, is_tgt, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
freq AS (
    SELECT term, CAST(SUM(tf) AS BIGINT) AS c_raw,
           CAST(SUM(CASE WHEN is_tgt THEN tf ELSE 0 END) AS BIGINT) AS c_tgt
    FROM tf GROUP BY term
),
term_w AS (
    SELECT term,
           CAST(ROUND(LN(c_tgt + 1) * 1000000, 0) AS BIGINT)
           - CAST(ROUND(LN(c_raw + 1) * 1000000, 0) AS BIGINT) AS w_micro
    FROM freq
),
norm AS (
    SELECT CAST(ROUND(LN(SUM(c_raw) + COUNT(*)) * 1000000, 0) AS BIGINT)
           - CAST(ROUND(LN(SUM(c_tgt) + COUNT(*)) * 1000000, 0) AS BIGINT)
               AS norm_micro
    FROM freq
),
per_doc AS (
    SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * term_w.w_micro) AS BIGINT) AS sum_w_micro
    FROM tf JOIN term_w USING (term)
    GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens,
       CAST(sum_w_micro + n_tokens * norm_micro AS BIGINT) AS importance_micro
FROM per_doc, norm
"""


def hashed_embedding(
    docs: DataFrame, dim: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-hashed (hashing-trick) document vectors, long form
    (doc_id, dim_idx, weight) — Weinberger et al. 2009: every token hashes
    to a bucket ``md5[0:8] % dim`` and votes ``±1`` by an independent hash
    bit (``md5[8:16] % 2``), so the signed collision noise is zero-mean.
    The model-free featurizer that bridges the text corpus into the vector
    family (kNN / IVF / dedup) with NO trained embedding model.

    Exactness: both hashes are md5 hex slices (identical in DuckDB), and the
    weights are integer sums — every row is value-hash oracle-checkable.
    Scale: one token explode into ONE map-side-combinable groupBy keyed
    (doc, bucket); output rows ≤ docs × dim, shuffle never carries text.
    Reference scope: driver north star (SURVEY.md §2.9), not the dbt
    reference.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    hb = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
    hs = F.conv(F.substring(F.md5(F.col("w")), 9, 8), 16, 10).cast("bigint")
    sgn = F.when(hs % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), (hb % dim).alias("dim_idx"), sgn.alias("sgn"))
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
    )


_HASHED_EMB_CTE = """
toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
),
e AS (
    SELECT doc_id,
           CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim} AS dim_idx,
           CAST(SUM(CASE WHEN CAST('0x' || substring(md5(w), 9, 8) AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM toks
    GROUP BY doc_id, CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim}
)"""

HASHED_EMBEDDING_SQL_TEMPLATE = (
    "WITH " + _HASHED_EMB_CTE + "\nSELECT doc_id, dim_idx, weight FROM e"
)


def embed_documents_bridge(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedding-GENERATION bridge (VERDICT r6 #6 candidate): the
    Arrow-batched ``mapInPandas`` shape a production pipeline uses to call
    a model server / local ONNX session per batch — the encoder receives a
    pandas frame per Arrow batch, returns (id, array<float>) rows, and
    the ~1000-row batches amortize transfer + inference setup exactly the
    way the multimodal decode path does.

    The encoder HERE is the deterministic hashing-trick featurizer, the
    same arithmetic as :func:`hashed_embedding` followed by L2
    normalization — a real deployment swaps ONLY the ``encode`` closure
    for the model call; the Spark-side deliverables (schema with a
    NULLABLE passthrough id — see the r7 FEATURE_SCHEMA lesson — batch
    iteration, dense float32 output, zero-vector contract for token-less
    docs) are what the equality test pins against the JVM-side long-form
    twin.  Corpus posture: one narrow projection rides the Arrow channel
    (id + text), output is docs x dim floats, no shuffle at all —
    embedding generation is embarrassingly parallel and stays that way.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("vec", ArrayType(FloatType(), False), False),
        ]
    )

    def encode(texts) -> list[list[float]]:
        vecs = []
        for text in texts:
            v = np.zeros(dim, dtype=np.float64)
            for tok in _re.split("[^a-z]+", (text or "").lower()):
                if not tok:
                    continue
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                v[int(h[:8], 16) % dim] += 1 if int(h[8:16], 16) % 2 == 0 else -1
            n = float(np.linalg.norm(v))
            vecs.append((v / n if n > 0 else v).astype(np.float32).tolist())
        return vecs

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col], "vec": encode(pdf[text_col])})

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def embed_bridge_longform(
    docs: DataFrame, dim: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Registry-ready realization of :func:`embed_documents_bridge`
    (STAGED for round 8): the dense unit vectors long-formed to
    (doc_id, dim_idx, unit_weight ROUND 6) so the driver's value-hash
    oracle applies — float arrays hash fragilely, but one
    int-sum / sqrt / division / ROUND(,6) chain is bit-identical
    cross-engine (the house one-division-then-round pattern).  Zero
    components are dropped (long form), token-less docs contribute no
    rows; the pytest twin covers the dense/zero-vector contract."""
    from pyspark.sql import functions as F

    dense = embed_documents_bridge(docs, dim=dim, text_col=text_col, id_col=id_col)
    return (
        dense.select(id_col, F.posexplode("vec").alias("dim_idx", "w"))
        .filter(F.col("w") != 0.0)
        .select(
            id_col,
            F.col("dim_idx").cast("bigint").alias("dim_idx"),
            F.round(F.col("w").cast("double"), 6).alias("unit_weight"),
        )
    )


EMBED_BRIDGE_SQL_TEMPLATE = (
    "WITH "
    + _HASHED_EMB_CTE
    + """,
norms AS (
    SELECT doc_id, SQRT(CAST(SUM(weight * weight) AS DOUBLE)) AS nrm
    FROM e GROUP BY doc_id
)
-- the FLOAT cast replicates the bridge's float32 vector element exactly
-- (float64 divide -> IEEE float32 truncate -> float64 for ROUND); norms
-- are exact (int sum of squares < 2^53 is exact in float64, any order)
SELECT e.doc_id, e.dim_idx,
       ROUND(CAST(CAST(CAST(e.weight AS DOUBLE) / norms.nrm AS FLOAT) AS DOUBLE),
             6) AS unit_weight
FROM e JOIN norms USING (doc_id)
WHERE e.weight <> 0 AND norms.nrm > 0
"""
)


def parent_doc_retrieval(
    docs: DataFrame,
    k_chunks: int = 20,
    k_parents: int = 5,
    num_queries: int = 3,
    dim: int = 32,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PARENT-DOCUMENT retrieval (STAGED for round 10) — the RAG pattern
    where small chunks do the matching but whole documents come back:
    chunk the corpus (overlapping token windows), score chunks against
    each query by exact int64 hashed-sparse dot product, take the top
    ``k_chunks`` chunks per query, then roll them up to their parent
    documents ranked by best-chunk score with hit-chunk counts.

    Plan shape: chunking is one narrow codegen'd stage (no shuffle); the
    query vectors BROADCAST into the inverted-index join on ``dim_idx``
    so the chunk corpus never shuffles by text; the only exchanges carry
    (query, chunk-key, int) triples.  Chunk keys are ``doc_id * 10000 +
    chunk_id`` (chunks beyond 10k/doc are dropped — loud in the WHERE,
    mirrored by the oracle) so parent recovery is integer division, not
    a join back through the corpus.  Scores are exact int64, so ranks
    are value-hash checkable."""
    from .sampling import chunk_documents

    corpus = docs.filter(F.col(id_col) >= num_queries)
    chunks = (
        chunk_documents(
            corpus, window=window, stride=stride,
            text_col=text_col, id_col=id_col,
        )
        .filter(F.col("chunk_id") < 10000)
        .select(
            (F.col(id_col) * 10000 + F.col("chunk_id")).alias("ckey"),
            "chunk_text",
        )
    )
    ce = hashed_embedding(chunks, dim=dim, text_col="chunk_text", id_col="ckey")
    qe = hashed_embedding(
        docs.filter(F.col(id_col) < num_queries),
        dim=dim, text_col=text_col, id_col=id_col,
    ).select(
        F.col(id_col).alias("query_id"), "dim_idx", F.col("weight").alias("qw")
    )
    dots = (
        ce.join(F.broadcast(qe), "dim_idx")
        .groupBy("query_id", "ckey")
        .agg(F.sum(F.col("weight") * F.col("qw")).cast("bigint").alias("dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("ckey"))
    topc = dots.withColumn("crnk", F.row_number().over(wc)).filter(
        F.col("crnk") <= k_chunks
    )
    parents = topc.groupBy(
        "query_id", F.expr("ckey DIV 10000").alias("parent_doc")
    ).agg(
        F.max("dot").alias("best_dot"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit_chunks"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("best_dot"), F.asc("parent_doc")
    )
    return (
        parents.withColumn("parent_rank", F.row_number().over(wp).cast("bigint"))
        .filter(F.col("parent_rank") <= k_parents)
        .orderBy("query_id", "parent_rank")
    )


_CHUNK_EMB_CTE = """
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= {num_queries}),
ctoks0 AS (SELECT doc_id, STR_SPLIT(text, ' ') AS t FROM corpus),
cstarts AS (
    SELECT doc_id, t, unnest(range(0, GREATEST(LEN(t), 1), {stride})) AS start
    FROM ctoks0
),
chunkdocs AS (
    SELECT doc_id * 10000 + (start // {stride}) AS ckey,
           array_to_string(t[start + 1 : start + {window}], ' ') AS text
    FROM cstarts WHERE (start // {stride}) < 10000
),
ctoks AS (
    SELECT ckey, w FROM (
        SELECT ckey, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM chunkdocs
    ) WHERE w <> ''
),
ce AS (
    SELECT ckey,
           CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim} AS dim_idx,
           CAST(SUM(CASE WHEN CAST('0x' || substring(md5(w), 9, 8) AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM ctoks
    GROUP BY ckey, CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim}
),
qdocs AS (SELECT doc_id, text FROM documents WHERE doc_id < {num_queries}),
qtoks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM qdocs
    ) WHERE w <> ''
),
qe AS (
    SELECT doc_id AS query_id,
           CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim} AS dim_idx,
           CAST(SUM(CASE WHEN CAST('0x' || substring(md5(w), 9, 8) AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS qw
    FROM qtoks
    GROUP BY doc_id, CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim}
)"""

PARENT_RETRIEVAL_SQL_TEMPLATE = (
    "WITH "
    + _CHUNK_EMB_CTE
    + """,
dots AS (
    SELECT qe.query_id, ce.ckey, CAST(SUM(ce.weight * qe.qw) AS BIGINT) AS dot
    FROM ce JOIN qe USING (dim_idx)
    GROUP BY qe.query_id, ce.ckey
),
topc AS (
    SELECT query_id, ckey, dot FROM (
        SELECT query_id, ckey, dot,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, ckey ASC) AS crnk
        FROM dots
    ) WHERE crnk <= {k_chunks}
),
parents AS (
    SELECT query_id, ckey // 10000 AS parent_doc,
           MAX(dot) AS best_dot, CAST(COUNT(*) AS BIGINT) AS n_hit_chunks
    FROM topc GROUP BY query_id, ckey // 10000
)
SELECT query_id, parent_doc, best_dot, n_hit_chunks,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY best_dot DESC, parent_doc ASC)
            AS BIGINT) AS parent_rank
FROM parents
QUALIFY parent_rank <= {k_parents}
ORDER BY query_id, parent_rank
"""
)


def hashed_doc_knn(
    docs: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse dot-product top-k over :func:`hashed_embedding` vectors —
    text-to-text similarity search with no model and EXACT int64 scores
    (so ranks are value-hash checkable, unlike float-cosine rank oracles).

    Plan shape = sparse retrieval's inverted-index join: the query-side
    vectors (num_queries × dim rows) broadcast, the corpus side joins on
    ``dim_idx`` — the corpus never shuffles; the (query, cand) partial dots
    combine map-side.  Candidates are docs sharing ≥1 nonzero bucket with
    the query (exactly the inverted-index candidate set).
    """
    emb = hashed_embedding(docs, dim=dim, text_col=text_col, id_col=id_col)
    q = (
        emb.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            "dim_idx",
            F.col("weight").alias("qw"),
        )
    )
    dots = (
        emb.join(F.broadcast(q), "dim_idx")
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum(F.col("qw") * F.col("weight")).cast("bigint").alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


HASHED_DOC_KNN_SQL_TEMPLATE = (
    "WITH "
    + _HASHED_EMB_CTE
    + """,
q AS (SELECT doc_id AS query_id, dim_idx, weight AS qw FROM e WHERE doc_id < {num_queries}),
dots AS (
    SELECT q.query_id, e.doc_id AS neighbor_id,
           CAST(SUM(q.qw * e.weight) AS BIGINT) AS dot
    FROM e JOIN q USING (dim_idx)
    WHERE e.doc_id <> q.query_id
    GROUP BY q.query_id, e.doc_id
),
ranked AS (
    SELECT query_id, neighbor_id, dot,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
    FROM dots
)
SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {k}
"""
)


def maxsim_rerank(
    docs: DataFrame,
    num_queries: int = 3,
    k_retrieve: int = 8,
    max_tokens: int = 16,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LATE-INTERACTION (MaxSim) reranking — the ColBERT scoring shape
    (Khattab & Zaharia, SIGIR 2020) staged for round 11: stage 1 retrieves
    ``k_retrieve`` candidates per query by whole-document hashed dot
    product; stage 2 re-scores each (query, candidate) pair at TOKEN
    granularity,

        maxsim(q, d) = Σ_{t∈tok(q)} max(0, max_{u∈tok(d)} <v_t, v_u>)

    where each token's vector is the hashing-trick embedding of its
    CHARACTER 3-GRAMS (subword granularity, so morphological variants
    score > 0 against each other).  The clamp-at-zero is the standard
    ReLU'd MaxSim variant and also makes absent token pairs (no shared
    gram bucket → no joined row) exactly representable.  All scores are
    exact int64 sums of ±1 gram votes, so ranks are value-hash
    oracle-checkable cross-engine.

    Scale shape: the token-pair interaction — the expensive part of late
    interaction — is bounded by candidates × max_tokens², NEVER corpus ×
    corpus (stage 1 bounds it, like the cross-encoder bridge); per-doc
    token selection is the ``max_tokens`` alphabetically-first distinct
    tokens (deterministic, no RNG); the candidate list and the query-side
    gram vectors BROADCAST, so the corpus-side gram relation shuffles only
    (id, token, bucket, int) rows and only for candidate documents.

    The ONLY full-corpus pass is stage 1's hashed embedding: the
    candidate list materializes once (``localCheckpoint``, num_queries ×
    k_retrieve rows — it feeds three consumers, and recomputing stage 1
    per consumer tripled the work), and the token/gram pipeline runs
    over the query ∪ candidate documents ONLY — per-doc token selection
    commutes with the document filter, so restricting the input changes
    nothing semantically while dropping the corpus-wide
    distinct+window+groupBy chain that dominated the plan (and its
    first-execution codegen warm-up, the source of the r10/r11 bench
    variance — VERDICT r11 #2 'What's wrong')."""
    # stage 1 first: it needs only the whole-document hashed embedding,
    # and its output bounds every token-level relation below
    emb = hashed_embedding(docs, dim=dim, text_col=text_col, id_col=id_col)
    qe = emb.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), "dim_idx", F.col("weight").alias("qw")
    )
    dots = (
        emb.filter(F.col(id_col) >= num_queries)
        .join(F.broadcast(qe), "dim_idx")
        .groupBy("query_id", F.col(id_col).alias("cand_id"))
        .agg(F.sum(F.col("qw") * F.col("weight")).cast("bigint").alias("stage1_dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("stage1_dot"), F.asc("cand_id")
    )
    cand = (
        dots.withColumn("rnk", F.row_number().over(wc))
        .filter(F.col("rnk") <= k_retrieve)
        .drop("rnk")
        .localCheckpoint(eager=True)  # num_queries × k_retrieve rows
    )
    keep = (
        cand.select(F.col("cand_id").alias(id_col))
        .union(
            docs.select(F.col(id_col)).filter(F.col(id_col) < num_queries)
        )
        .distinct()
    )
    stage2_docs = docs.join(F.broadcast(keep), id_col, "left_semi")
    toks = stage2_docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "").distinct()
    wt = Window.partitionBy(id_col).orderBy("w")
    sel = (
        toks.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= max_tokens)
        .drop("rn")
    )
    grams = sel.select(
        F.col(id_col),
        F.col("w"),
        F.explode(
            F.expr(
                "CASE WHEN length(w) < 3 THEN array(w) "
                "ELSE transform(sequence(1, length(w) - 2), "
                "i -> substring(w, i, 3)) END"
            )
        ).alias("g"),
    )
    hb = F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("bigint")
    hs = F.conv(F.substring(F.md5(F.col("g")), 9, 8), 16, 10).cast("bigint")
    gvec = (
        grams.select(
            F.col(id_col),
            F.col("w"),
            (hb % dim).alias("dim_idx"),
            F.when(hs % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
        )
        .groupBy(id_col, "w", "dim_idx")
        .agg(F.sum("sgn").cast("bigint").alias("wgt"))
    )
    # stage 2: token-level interaction for candidate pairs only
    qg = gvec.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("w").alias("qt"),
        "dim_idx",
        F.col("wgt").alias("qwgt"),
    )
    # gvec is already restricted to query ∪ candidate docs, so dropping
    # the query ids leaves exactly the candidates — no re-filter needed
    dg = gvec.filter(F.col(id_col) >= num_queries).select(
        F.col(id_col).alias("cand_id"),
        F.col("w").alias("dt"),
        "dim_idx",
        F.col("wgt").alias("dwgt"),
    )
    pairdots = (
        dg.join(F.broadcast(qg), "dim_idx")
        .join(
            F.broadcast(cand.select("query_id", "cand_id")),
            ["query_id", "cand_id"],
            "left_semi",
        )
        .groupBy("query_id", "cand_id", "qt", "dt")
        .agg(F.sum(F.col("qwgt") * F.col("dwgt")).cast("bigint").alias("tdot"))
    )
    best = pairdots.groupBy("query_id", "cand_id", "qt").agg(
        F.greatest(F.max("tdot"), F.lit(0).cast("bigint")).alias("contrib")
    )
    msim = best.groupBy("query_id", "cand_id").agg(
        F.sum("contrib").cast("bigint").alias("maxsim")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("cand_id"))
    return (
        cand.join(msim, ["query_id", "cand_id"], "left")
        .select(
            "query_id",
            "cand_id",
            "stage1_dot",
            F.coalesce(F.col("maxsim"), F.lit(0).cast("bigint")).alias("maxsim"),
        )
        .withColumn("rerank", F.row_number().over(wr).cast("bigint"))
        .orderBy("query_id", "rerank")
    )


_MAXSIM_GRAMS_CTE = """
alltoks AS (
    SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
),
sel AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, w,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS rn
        FROM alltoks
    ) WHERE rn <= {max_tokens}
),
gexp AS (
    SELECT doc_id, w, unnest(
        CASE WHEN LEN(w) < 3 THEN [w]
             ELSE [substring(w, CAST(i AS INT), 3) FOR i IN range(1, LEN(w) - 1)]
        END) AS g
    FROM sel
),
gvec AS (
    SELECT doc_id, w,
           CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) % {dim} AS dim_idx,
           CAST(SUM(CASE WHEN CAST('0x' || substring(md5(g), 9, 8) AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS wgt
    FROM gexp
    GROUP BY doc_id, w, CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) % {dim}
)"""

MAXSIM_RERANK_SQL_TEMPLATE = (
    "WITH "
    + _HASHED_EMB_CTE
    + ","
    + _MAXSIM_GRAMS_CTE
    + """,
qe AS (SELECT doc_id AS query_id, dim_idx, weight AS qw FROM e
       WHERE doc_id < {num_queries}),
s1 AS (
    SELECT qe.query_id, e.doc_id AS cand_id,
           CAST(SUM(qe.qw * e.weight) AS BIGINT) AS stage1_dot
    FROM e JOIN qe USING (dim_idx)
    WHERE e.doc_id >= {num_queries}
    GROUP BY qe.query_id, e.doc_id
),
cand AS (
    SELECT query_id, cand_id, stage1_dot FROM (
        SELECT query_id, cand_id, stage1_dot,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY stage1_dot DESC, cand_id ASC) AS rnk
        FROM s1
    ) WHERE rnk <= {k_retrieve}
),
qg AS (SELECT doc_id AS query_id, w AS qt, dim_idx, wgt AS qwgt FROM gvec
       WHERE doc_id < {num_queries}),
dg AS (SELECT doc_id AS cand_id, w AS dt, dim_idx, wgt AS dwgt FROM gvec
       WHERE doc_id >= {num_queries}),
pairdots AS (
    SELECT c.query_id, c.cand_id, qg.qt, dg.dt,
           CAST(SUM(qg.qwgt * dg.dwgt) AS BIGINT) AS tdot
    FROM cand c
    JOIN qg ON qg.query_id = c.query_id
    JOIN dg ON dg.cand_id = c.cand_id AND dg.dim_idx = qg.dim_idx
    GROUP BY c.query_id, c.cand_id, qg.qt, dg.dt
),
best AS (
    SELECT query_id, cand_id, qt, GREATEST(MAX(tdot), 0) AS contrib
    FROM pairdots GROUP BY query_id, cand_id, qt
),
msim AS (
    SELECT query_id, cand_id, CAST(SUM(contrib) AS BIGINT) AS maxsim
    FROM best GROUP BY query_id, cand_id
)
SELECT c.query_id, c.cand_id, c.stage1_dot,
       COALESCE(m.maxsim, 0) AS maxsim,
       CAST(ROW_NUMBER() OVER (PARTITION BY c.query_id
                               ORDER BY COALESCE(m.maxsim, 0) DESC,
                                        c.cand_id ASC) AS BIGINT) AS rerank
FROM cand c LEFT JOIN msim m USING (query_id, cand_id)
ORDER BY query_id, rerank
"""
)


def semihard_negative_mining(
    docs: DataFrame,
    num_anchors: int = 8,
    k_negatives: int = 5,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SEMI-HARD NEGATIVE mining for contrastive/embedding training
    (staged for round 11; complements :func:`hard_negative_mining`, the
    BM25 cross-source miner — this one is the EMBEDDING-space triplet
    recipe with an explicit positive and a margin band) — the
    training-data op that turns a raw corpus into (anchor, positive,
    negative) triplets: for each anchor, the positive is its nearest
    neighbor by similarity, and the informative negatives are the
    SEMI-HARD band (Schroff et al., FaceNet CVPR 2015):
    similar enough to be confusable, but strictly less similar than the
    positive —

        pos_dot/2 <= neg_dot < pos_dot      (integer cross-multiplied)

    Random negatives are trivially separable (gradient ≈ 0) and the very
    hardest can be label noise; the semi-hard band is what trains a
    retrieval model.  Similarity is the exact int64 hashed-embedding dot
    (:func:`hashed_embedding`), so the mined triplets are value-hash
    oracle-checkable.  Anchors whose positive dot is <= 0 mine nothing
    (no meaningful neighborhood).

    Scale shape: anchor vectors BROADCAST into one inverted-index join on
    ``dim_idx`` (the corpus never shuffles text; candidates are docs
    sharing >=1 bucket); the per-anchor top-1 positive and the per-anchor
    negative ranking are windows over anchor-keyed candidate rows,
    bounded by the candidate set, not the corpus."""
    emb = hashed_embedding(docs, dim=dim, text_col=text_col, id_col=id_col)
    a = emb.filter(F.col(id_col) < num_anchors).select(
        F.col(id_col).alias("anchor_id"), "dim_idx", F.col("weight").alias("aw")
    )
    dots = (
        emb.join(F.broadcast(a), "dim_idx")
        .filter(F.col("anchor_id") != F.col(id_col))
        .groupBy("anchor_id", F.col(id_col).alias("cand_id"))
        .agg(F.sum(F.col("aw") * F.col("weight")).cast("bigint").alias("dot"))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("dot"), F.asc("cand_id"))
    ranked = dots.withColumn("rn", F.row_number().over(w))
    pos = ranked.filter((F.col("rn") == 1) & (F.col("dot") > 0)).select(
        "anchor_id",
        F.col("cand_id").alias("positive_id"),
        F.col("dot").alias("pos_dot"),
    )
    negs = (
        ranked.filter(F.col("rn") > 1)
        .join(F.broadcast(pos), "anchor_id")
        .filter(
            (F.col("dot") < F.col("pos_dot"))
            & (F.col("dot") * 2 >= F.col("pos_dot"))
        )
    )
    wn = Window.partitionBy("anchor_id").orderBy(F.desc("dot"), F.asc("cand_id"))
    return (
        negs.withColumn("neg_rank", F.row_number().over(wn).cast("bigint"))
        .filter(F.col("neg_rank") <= k_negatives)
        .select(
            "anchor_id",
            "positive_id",
            F.col("cand_id").alias("negative_id"),
            "pos_dot",
            F.col("dot").alias("neg_dot"),
            "neg_rank",
        )
        .orderBy("anchor_id", "neg_rank")
    )


SEMIHARD_NEGATIVES_SQL_TEMPLATE = (
    "WITH "
    + _HASHED_EMB_CTE
    + """,
a AS (SELECT doc_id AS anchor_id, dim_idx, weight AS aw FROM e
      WHERE doc_id < {num_anchors}),
dots AS (
    SELECT a.anchor_id, e.doc_id AS cand_id,
           CAST(SUM(a.aw * e.weight) AS BIGINT) AS dot
    FROM e JOIN a USING (dim_idx)
    WHERE e.doc_id <> a.anchor_id
    GROUP BY a.anchor_id, e.doc_id
),
ranked AS (
    SELECT anchor_id, cand_id, dot,
           ROW_NUMBER() OVER (PARTITION BY anchor_id
                              ORDER BY dot DESC, cand_id ASC) AS rn
    FROM dots
),
pos AS (
    SELECT anchor_id, cand_id AS positive_id, dot AS pos_dot
    FROM ranked WHERE rn = 1 AND dot > 0
)
SELECT r.anchor_id, p.positive_id, r.cand_id AS negative_id,
       p.pos_dot, r.dot AS neg_dot,
       CAST(ROW_NUMBER() OVER (PARTITION BY r.anchor_id
                               ORDER BY r.dot DESC, r.cand_id ASC)
            AS BIGINT) AS neg_rank
FROM ranked r JOIN pos p USING (anchor_id)
WHERE r.rn > 1 AND r.dot < p.pos_dot AND r.dot * 2 >= p.pos_dot
QUALIFY neg_rank <= {k_negatives}
ORDER BY r.anchor_id, neg_rank
"""
)


def rerank_pairs_bridge(
    pairs: DataFrame,
    q_col: str = "q_text",
    d_col: str = "d_text",
    qid_col: str = "query_id",
    did_col: str = "neighbor_id",
    passthrough: tuple = ("dot",),
) -> DataFrame:
    """Cross-encoder RERANK bridge — the second stage of the two-stage
    retrieval stack (cheap retriever -> top-N candidates -> a pair model
    scores (query, document) TEXT PAIRS and reorders).  This is the
    Arrow-batched ``mapInPandas`` shape a production pipeline uses to
    call the cross-encoder per batch, exactly like the embedding bridge
    (:func:`embed_documents_bridge`): a deployment swaps ONLY the
    scoring closure for the model call; the Spark-side deliverables —
    pair schema with NULLABLE passthrough ids (the r7 FEATURE_SCHEMA
    lesson), batch iteration, integer score components — are what the
    pytest twin pins against a JVM-side plan.

    The scoring stub is deterministic distinct-token CONTAINMENT:
    ``n_overlap`` = |tokens(q) ∩ tokens(d)| and ``n_q`` = |tokens(q)|,
    both integers, so the downstream score (ONE division, ROUND 6 —
    the house pattern) is value-hash oracle-checkable.  Corpus posture:
    pairs are queries × N_candidates rows (bounded by the retriever,
    never corpus-sized); each pair rides the Arrow channel once; output
    is two ints per pair; no shuffle inside the bridge."""
    import re as _re

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField(qid_col, LongType(), True), StructField(did_col, LongType(), True)]
        + [StructField(c, LongType(), True) for c in passthrough]
        + [
            StructField("n_overlap", LongType(), False),
            StructField("n_q", LongType(), False),
        ]
    )

    def toks(s) -> set:
        return {t for t in _re.split("[^a-z]+", (s or "").lower()) if t}

    def run(batches):
        for pdf in batches:
            n_ov, n_q = [], []
            for q, d in zip(pdf[q_col], pdf[d_col]):
                qt = toks(q)
                n_ov.append(len(qt & toks(d)))
                n_q.append(len(qt))
            out = {qid_col: pdf[qid_col], did_col: pdf[did_col]}
            for c in passthrough:
                out[c] = pdf[c]
            out["n_overlap"] = n_ov
            out["n_q"] = n_q
            yield pd.DataFrame(out)

    cols = [qid_col, did_col, *passthrough, q_col, d_col]
    return pairs.select(*cols).mapInPandas(run, schema=out_schema)


def rerank_bridge_topk(
    docs: DataFrame,
    k_retrieve: int = 10,
    k_final: int = 5,
    num_queries: int = 4,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Registry-ready two-stage retrieval with the rerank bridge (STAGED
    for round 9): stage 1 = :func:`hashed_doc_knn` (exact int64 sparse
    dots, the bi-encoder stand-in), stage 2 = :func:`rerank_pairs_bridge`
    over the candidates' (query, doc) texts, final order by the rerank
    score with (first-stage dot, id) tie-breaks.  Score = NULL when the
    query has no tokens (house NULL-on-zero rule), else
    ROUND(n_overlap / n_q, 6).

    Plan shape: candidates (queries × k rows) BROADCAST into both text
    joins, so the corpus text never rides an exchange; the rerank window
    partitions by query_id over ≤ queries × k rows."""
    from pyspark.sql import Window

    cands = hashed_doc_knn(
        docs, k=k_retrieve, num_queries=num_queries, dim=dim,
        text_col=text_col, id_col=id_col,
    )
    q_texts = docs.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(text_col).alias("q_text")
    )
    with_q = cands.join(F.broadcast(q_texts), "query_id")
    pairs = docs.select(
        F.col(id_col).alias("neighbor_id"), F.col(text_col).alias("d_text")
    ).join(F.broadcast(with_q), "neighbor_id")
    scored = rerank_pairs_bridge(pairs)
    score = F.when(
        F.col("n_q") > 0,
        F.round(F.col("n_overlap").cast("double") / F.col("n_q"), 6),
    ).alias("rerank_score")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", "dot", score)
        .withColumn("rerank_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rerank_rank") <= k_final)
        .orderBy("query_id", "rerank_rank")
    )


RERANK_BRIDGE_SQL_TEMPLATE = (
    "WITH "
    + _HASHED_EMB_CTE
    + """,
q AS (SELECT doc_id AS query_id, dim_idx, weight AS qw FROM e WHERE doc_id < {num_queries}),
dots AS (
    SELECT q.query_id, e.doc_id AS neighbor_id,
           CAST(SUM(q.qw * e.weight) AS BIGINT) AS dot
    FROM e JOIN q USING (dim_idx)
    WHERE e.doc_id <> q.query_id
    GROUP BY q.query_id, e.doc_id
),
cands AS (
    SELECT query_id, neighbor_id, dot FROM (
        SELECT query_id, neighbor_id, dot,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, neighbor_id ASC) AS rnk
        FROM dots
    ) WHERE rnk <= {k_retrieve}
),
dtok AS (SELECT DISTINCT doc_id, w FROM toks),
nq AS (
    SELECT doc_id AS query_id, COUNT(*) AS n_q
    FROM dtok WHERE doc_id < {num_queries} GROUP BY doc_id
),
ov AS (
    SELECT c.query_id, c.neighbor_id, COUNT(*) AS n_overlap
    FROM cands c
    JOIN dtok qt ON qt.doc_id = c.query_id
    JOIN dtok dt ON dt.doc_id = c.neighbor_id AND dt.w = qt.w
    GROUP BY c.query_id, c.neighbor_id
),
scored AS (
    SELECT c.query_id, c.neighbor_id, c.dot,
           CASE WHEN COALESCE(nq.n_q, 0) > 0
                THEN ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / nq.n_q, 6)
           END AS rerank_score
    FROM cands c
    LEFT JOIN nq USING (query_id)
    LEFT JOIN ov ON ov.query_id = c.query_id AND ov.neighbor_id = c.neighbor_id
)
SELECT query_id, neighbor_id, dot, rerank_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rerank_score DESC, dot DESC,
                                        neighbor_id ASC) AS BIGINT) AS rerank_rank
FROM scored
QUALIFY rerank_rank <= {k_final}
ORDER BY query_id, rerank_rank
"""
)


def countmin_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for the corpus's top-``k`` tokens, next to their true counts.

    The sketch is the mergeable fixed-size (depth × width) counter grid that
    replaces an unbounded exact token→count map at 100 TB: every partition
    builds its grid map-side and grids ADD — the shuffle carries depth×width
    int64 cells per partition regardless of vocabulary size.  Estimate =
    min over rows of the hashed cell; guaranteed ≥ true count (one-sided).

    Here the grid is built from the exact per-token counts (the corpus pass
    both paths share); row hashes are md5 slices, so every cell — and every
    estimate — is integer-exact and value-hash oracle-checkable.  Output
    rows: (token, true_count, est_count, overestimate), top-k by true count.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint()

    def bucket(r: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{r}:"), F.col("w"))), 1, 8), 16, 10
            ).cast("bigint")
            % width
        )

    rows = F.array(
        *[F.struct(F.lit(r).alias("r"), bucket(r).alias("b")) for r in range(depth)]
    )
    hashed = counts.select("w", "cnt", F.explode(rows).alias("rb")).select(
        "w", "cnt", F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    )
    cells = hashed.groupBy("r", "b").agg(F.sum("cnt").alias("cell"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("w"))
        .limit(k)
        .select("w", "cnt", F.explode(rows).alias("rb"))
        .select("w", "cnt", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    )
    return (
        top.join(cells, ["r", "b"])
        .groupBy("w", "cnt")
        .agg(F.min("cell").alias("est"))
        .select(
            F.col("w").alias("token"),
            F.col("cnt").cast("bigint").alias("true_count"),
            F.col("est").cast("bigint").alias("est_count"),
            (F.col("est") - F.col("cnt")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("true_count"), F.asc("token"))
    )


COUNTMIN_HEAVY_SQL_TEMPLATE = """
WITH toks AS (
    SELECT w FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
),
counts AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
hashed AS (
    SELECT w, cnt, r,
           CAST('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || w), 1, 8) AS BIGINT)
               % {width} AS b
    FROM counts CROSS JOIN (SELECT unnest(generate_series(0, {depth} - 1)) AS r)
),
cells AS (SELECT r, b, CAST(SUM(cnt) AS BIGINT) AS cell FROM hashed GROUP BY r, b),
top AS (SELECT w, cnt FROM counts ORDER BY cnt DESC, w ASC LIMIT {k})
SELECT t.w AS token,
       CAST(t.cnt AS BIGINT) AS true_count,
       CAST(MIN(c.cell) AS BIGINT) AS est_count,
       CAST(MIN(c.cell) - t.cnt AS BIGINT) AS overestimate
FROM top t
JOIN hashed h ON h.w = t.w
JOIN cells c ON c.r = h.r AND c.b = h.b
GROUP BY t.w, t.cnt
ORDER BY true_count DESC, token ASC
"""


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    document by its unigram pseudo-perplexity, cut the corpus into
    ``n_buckets`` equal-count deciles, and label head/middle/tail segments —
    the standard stratification before keeping only the "middle" band
    (head = boilerplate-ish low-ppl, tail = noise).

    Determinism across engines: the rank key is
    ``sum_ln_micro / n_tokens`` — ONE IEEE division of identical int64
    operands (bit-equal in any engine), ties broken by doc id, so NTILE
    buckets are identical everywhere.  The doc-score input reuses
    :func:`_unigram_doc_scores` (micro-nat int sums).  The NTILE is a single
    total-order window — fine at corpus scale because it runs over the
    per-DOC score relation (orders of magnitude smaller than the token
    stream) — and it is two-phase (``bucketed_ntile`` over 10k-micro-nat
    score bands), so even the doc relation never funnels through a
    single-task window at 100 TB of docs.
    """
    # n_tokens > 0 guard (ADVICE r5): a degenerate zero-token doc would make
    # score = 0/0 = NaN (not NULL) — DESC-sorted first while
    # CAST(NaN AS BIGINT) = 0 lands it in the wrong two-phase bucket, a
    # silent rank corruption.  Exclude such docs deterministically (the
    # oracle carries the same WHERE).
    scores = (
        _unigram_doc_scores(docs, text_col, id_col)
        .where(F.col("n_tokens") > 0)
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("sum_ln_micro").cast("double") / F.col("n_tokens")).alias(
                "score"
            ),
            F.round(
                F.log(F.col("n_total").cast("double"))
                - (F.col("sum_ln_micro").cast("double") / 1_000_000.0)
                / F.col("n_tokens"),
                6,
            ).alias("avg_neg_logp"),
        )
    )
    from ..operators.twophase import bucketed_ntile

    third = max(n_buckets // 3, 1)
    bucketed = bucketed_ntile(
        scores,
        F.expr("CAST(-score AS BIGINT) DIV 10000"),
        [F.desc("score"), F.asc(id_col)],
        n_buckets,
        "bucket",
        # scores = the full unigram tokenize+tf+freq pipeline: checkpoint
        # it once instead of recomputing it for each two-phase pass
        materialize=True,
    )
    segment = (
        F.when(F.col("bucket") <= third, F.lit("head"))
        .when(F.col("bucket") > n_buckets - third, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("avg_neg_logp").alias("min_avg_neg_logp"),
            F.max("avg_neg_logp").alias("max_avg_neg_logp"),
        )
        .withColumn("segment", segment)
        .orderBy("bucket")
    )


PPL_BUCKETS_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, unnest(STR_SPLIT(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT SUM(cnt) AS n_total FROM freq),
per_doc AS (
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * CAST(ROUND(LN(freq.cnt) * 1000000, 0) AS BIGINT))
                AS BIGINT) AS sum_ln_micro
    FROM tf JOIN freq USING (term)
    GROUP BY tf.doc_id
),
scored AS (
    SELECT doc_id, n_tokens,
           CAST(sum_ln_micro AS DOUBLE) / n_tokens AS score,
           ROUND(LN(CAST(n_total AS DOUBLE))
                 - (CAST(sum_ln_micro AS DOUBLE) / 1000000.0) / n_tokens,
                 6) AS avg_neg_logp
    FROM per_doc CROSS JOIN total
    WHERE n_tokens > 0
),
bucketed AS (
    SELECT *, CAST(NTILE({n_buckets}) OVER (ORDER BY score DESC, doc_id ASC)
                   AS BIGINT) AS bucket
    FROM scored
)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(avg_neg_logp) AS min_avg_neg_logp,
       MAX(avg_neg_logp) AS max_avg_neg_logp,
       CASE WHEN bucket <= {third} THEN 'head'
            WHEN bucket > {n_buckets} - {third} THEN 'tail'
            ELSE 'middle' END AS segment
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    algorithm): hash every k-token shingle, slide a window of ``w``
    consecutive hashes, and keep the window's minimum (rightmost on ties).
    Guarantees at least one shared fingerprint for any match of length
    >= w + k - 1 tokens while storing only ~2/(w+1) of the hashes — the
    local-document-fingerprint scheme plagiarism/overlap detection uses
    where MinHash's whole-document signature is too coarse.

    Entirely per-row array expressions (no shuffle until the final
    distinct): shingle hashes bind once per doc, each window position picks
    (rightmost argmin, min) packed into ONE int64
    (``pos << 32 | hash32``) so window dedup is a plain
    ``array_distinct`` — no struct plumbing cross-engine.  Hashes are md5
    slices (32-bit) for engine parity; at scale swap in xxhash64 Spark-side.
    """
    base = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    hs = base.select(
        id_col,
        F.expr(
            f"CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(1, size(t) - {k} + 1), "
            f"p -> cast(conv(substring(md5(cast("
            f"array_join(slice(t, p, {k}), ' ') as binary)), 1, 8), 16, 10) "
            f"as bigint)) ELSE array() END"
        ).alias("hs"),
    )
    packed = hs.select(
        id_col,
        F.explode(
            F.expr(
                f"array_distinct(CASE WHEN size(hs) >= {w} THEN "
                f"transform(sequence(1, size(hs) - {w} + 1), q -> "
                f"(q + {w} - array_position(reverse(slice(hs, q, {w})), "
                f"array_min(slice(hs, q, {w})))) * 4294967296 "
                f"+ array_min(slice(hs, q, {w}))) ELSE array() END)"
            )
        ).alias("enc"),
    )
    return packed.select(
        id_col,
        # integer unpack (float division of the packed int64 would round
        # past 2^53 for very large documents)
        F.expr("enc div 4294967296").alias("pos"),
        (F.col("enc") % 4294967296).alias("fingerprint"),
    ).orderBy(id_col, "pos")


WINNOWING_SQL_TEMPLATE = """
WITH t AS (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents),
h AS (
    SELECT doc_id,
           CASE WHEN LEN(toks) >= {k} THEN
               list_transform(range(1, LEN(toks) - {k} + 2),
                   p -> CAST('0x' || substring(
                            md5(array_to_string(toks[p : p + {k} - 1], ' ')),
                            1, 8) AS BIGINT))
           ELSE [] END AS hs
    FROM t
),
packed AS (
    SELECT doc_id,
           unnest(list_distinct(
               CASE WHEN LEN(hs) >= {w} THEN
                   list_transform(range(1, LEN(hs) - {w} + 2), q ->
                       (q + {w} - list_position(
                            list_reverse(hs[q : q + {w} - 1]),
                            list_min(hs[q : q + {w} - 1])))
                       * 4294967296
                       + list_min(hs[q : q + {w} - 1]))
               ELSE [] END)) AS enc
    FROM h
)
SELECT doc_id,
       CAST(enc // 4294967296 AS BIGINT) AS pos,
       CAST(enc % 4294967296 AS BIGINT) AS fingerprint
FROM packed
ORDER BY doc_id, pos
"""


def bm25_search(
    docs: DataFrame,
    n_queries: int = 3,
    q_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical retrieval (Robertson & Zaragoza 2009, Lucene idf form):
    score documents against term queries with the ranking function every
    search engine defaults to.  Queries are the first ``q_terms`` distinct
    tokens of the first ``n_queries`` documents (deterministic, self-
    contained).

    Plan = the inverted-index shape: one explode+tf aggregation (df derives
    from tf, the corpus is never re-exploded), query terms broadcast onto
    the term-keyed tf relation — so per query only postings of its terms
    are touched, the corpus text never shuffles — then a per-(query, doc)
    sum and a top-k window.  Cross-engine exactness: every per-(term, doc)
    partial score is computed by the IDENTICAL expression tree in both
    engines (same literals, same operation order) and rounded to int64
    micro-units BEFORE summing, so ranks and scores hash-match exactly.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        docs.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(F.slice(F.split(F.col(text_col), " "), 1, q_terms)).alias(
                "term"
            ),
        )
        .distinct()
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    part = F.round(idf * tf_norm * 1_000_000, 0).cast("bigint")
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_rel), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("query_id", F.col(id_col).alias("hit_id"), part.alias("s_micro"))
        .groupBy("query_id", "hit_id")
        .agg(F.sum("s_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("hit_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "hit_id", "rank", "score_micro")
    )


BM25_SEARCH_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, unnest(STR_SPLIT(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, unnest(STR_SPLIT(text, ' ')[1 : {q_terms}]) AS term
    FROM documents WHERE doc_id < {n_queries}
),
scored AS (
    SELECT q.query_id, tf.doc_id AS hit_id,
           CAST(SUM(CAST(ROUND(
               LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * ((tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)))
               * 1000000, 0) AS BIGINT)) AS BIGINT) AS score_micro
    FROM tf
    JOIN qterms q USING (term)
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, hit_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score_micro DESC, hit_id ASC) AS BIGINT)
           AS rank,
       score_micro
FROM scored
QUALIFY rank <= {k}
"""


def prf_expanded_search(
    docs: DataFrame,
    n_queries: int = 3,
    q_terms: int = 5,
    f_docs: int = 5,
    e_terms: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio / RM3-lite,
    staged r11): run BM25, assume the top ``f_docs`` hits are relevant,
    mine the ``e_terms`` highest-weight NEW terms from them (weight = the
    same BM25 term partial, summed over the feedback docs), append them
    to the query, and re-search — the classic recall-recovery loop of
    every production search stack, here as one lazy plan.

    Determinism/exactness: both passes use :func:`bm25_search`'s
    expression tree with int64 micro-unit rounding per (term, doc)
    partial, expansion-term ties break on the term string, so final
    ranks value-hash cross-engine.  Scale shape: same inverted-index
    posture as BM25 (tf checkpointed ONCE and reused by both passes and
    the mining step; query/feedback relations broadcast; the corpus text
    never shuffles) — the second pass touches only postings of the
    expanded term set."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=True)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        docs.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(F.slice(F.split(F.col(text_col), " "), 1, q_terms)).alias(
                "term"
            ),
        )
        .distinct()
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    part = F.round(idf * tf_norm * 1_000_000, 0).cast("bigint")

    def score(terms: DataFrame) -> DataFrame:
        return (
            tf.join(F.broadcast(terms), "term")
            .join(F.broadcast(df_rel), "term")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .select(
                "query_id", F.col(id_col).alias("hit_id"), part.alias("s_micro")
            )
            .groupBy("query_id", "hit_id")
            .agg(F.sum("s_micro").alias("score_micro"))
        )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("hit_id")
    )
    fb = (
        score(qterms)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= f_docs)
        .select("query_id", F.col("hit_id").alias(id_col))
    )
    # mine expansion terms: the same BM25 partial, summed over the
    # feedback docs, minus the original query terms
    mined = (
        tf.join(F.broadcast(fb), id_col)
        .join(F.broadcast(df_rel), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("query_id", "term", part.alias("w_micro"))
        .groupBy("query_id", "term")
        .agg(F.sum("w_micro").alias("w_micro"))
        .join(qterms, ["query_id", "term"], "left_anti")
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("w_micro"), F.asc("term"))
    expansion = (
        mined.withColumn("r", F.row_number().over(we))
        .filter(F.col("r") <= e_terms)
        .select("query_id", "term")
    )
    expanded = qterms.unionByName(expansion).distinct()
    return (
        score(expanded)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "hit_id", "rank", "score_micro")
    )


PRF_EXPANDED_SEARCH_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, unnest(STR_SPLIT(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, unnest(STR_SPLIT(text, ' ')[1 : {q_terms}]) AS term
    FROM documents WHERE doc_id < {n_queries}
),
scored1 AS (
    SELECT q.query_id, tf.doc_id AS hit_id,
           CAST(SUM(CAST(ROUND(
               LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * ((tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)))
               * 1000000, 0) AS BIGINT)) AS BIGINT) AS score_micro
    FROM tf
    JOIN qterms q USING (term)
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.doc_id
),
fb AS (
    SELECT query_id, hit_id AS doc_id FROM (
        SELECT query_id, hit_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, hit_id ASC) AS r
        FROM scored1
    ) WHERE r <= {f_docs}
),
mined AS (
    SELECT f.query_id, tf.term,
           CAST(SUM(CAST(ROUND(
               LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * ((tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)))
               * 1000000, 0) AS BIGINT)) AS BIGINT) AS w_micro
    FROM tf
    JOIN fb f ON f.doc_id = tf.doc_id
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    WHERE NOT EXISTS (
        SELECT 1 FROM qterms q
        WHERE q.query_id = f.query_id AND q.term = tf.term
    )
    GROUP BY f.query_id, tf.term
),
expansion AS (
    SELECT query_id, term FROM (
        SELECT query_id, term,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY w_micro DESC, term ASC) AS r
        FROM mined
    ) WHERE r <= {e_terms}
),
expanded AS (
    SELECT DISTINCT query_id, term FROM (
        SELECT query_id, term FROM qterms
        UNION ALL
        SELECT query_id, term FROM expansion
    )
),
scored2 AS (
    SELECT q.query_id, tf.doc_id AS hit_id,
           CAST(SUM(CAST(ROUND(
               LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * ((tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)))
               * 1000000, 0) AS BIGINT)) AS BIGINT) AS score_micro
    FROM tf
    JOIN expanded q USING (term)
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, hit_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score_micro DESC, hit_id ASC) AS BIGINT)
           AS rank,
       score_micro
FROM scored2
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def search_snippets(
    docs: DataFrame,
    hits: DataFrame,
    window_chars: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippet extraction: for each (query_id, hit, term-set)
    result row, locate the first occurrence of any of the query's terms in
    the hit document and cut a +-``window_chars`` character window around
    it — what a result page renders under each link.

    ``hits`` is (query_id, hit_id, rank, terms array<string>).  The
    position scan is a per-row fold over the (tiny, broadcast-size) term
    array with JVM ``instr`` — min positive position wins, earliest term
    index breaks ties.  The docs join is keyed on the high-cardinality doc
    id and only the k-per-query hit rows ever fetch text — snippets never
    touch non-result documents.
    """
    joined = hits.join(
        docs.select(F.col(id_col).alias("hit_id"), F.col(text_col).alias("t")),
        "hit_id",
    )
    # fold: smallest positive instr() position (packed with term index as
    # tie-break); 0 => no term present
    pos = F.expr(
        "aggregate(terms, cast(0 as bigint), (acc, tm) -> "
        "CASE WHEN instr(t, tm) > 0 AND (acc = 0 OR instr(t, tm) < acc) "
        "THEN cast(instr(t, tm) as bigint) ELSE acc END)"
    )
    with_pos = joined.withColumn("pos", pos)
    snippet = F.when(F.col("pos") > 0, F.expr(f"substring(t, cast(greatest(1, pos - {window_chars}) as int), {2 * window_chars})")).otherwise(
        F.expr(f"substring(t, 1, {2 * window_chars})")
    )
    return with_pos.select(
        "query_id",
        "hit_id",
        "rank",
        F.col("pos").alias("match_pos"),
        snippet.alias("snippet"),
    ).orderBy("query_id", "rank")


SEARCH_SNIPPETS_SQL_TEMPLATE = """
WITH hits AS ({bm25}),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, unnest(STR_SPLIT(text, ' ')[1 : {q_terms}]) AS term
    FROM documents WHERE doc_id < {n_queries}
),
qsets AS (SELECT query_id, list(term ORDER BY term) AS terms FROM qterms GROUP BY query_id),
joined AS (
    SELECT h.query_id, h.hit_id, h.rank, q.terms, d.text AS t
    FROM hits h
    JOIN qsets q USING (query_id)
    JOIN documents d ON d.doc_id = h.hit_id
),
with_pos AS (
    -- unnest + MIN, not list_transform(tm -> POSITION(tm IN t)): a lambda
    -- that captures the outer row's t misaligns t across vector chunks in
    -- DuckDB 1.0 under join-heavy plans (found by the r6 unicode parity
    -- sweep: positions computed against the WRONG document's text)
    SELECT query_id, hit_id, rank,
           COALESCE(MIN(CASE WHEN p > 0 THEN p END), 0) AS pos,
           t
    FROM (
        SELECT query_id, hit_id, rank, t,
               CAST(POSITION(u.term IN t) AS BIGINT) AS p
        FROM joined, UNNEST(terms) AS u(term)
    )
    GROUP BY query_id, hit_id, rank, t
)
SELECT query_id, hit_id, rank, pos AS match_pos,
       CASE WHEN pos > 0
            THEN substring(t, CAST(GREATEST(1, pos - {w}) AS INT), {w2})
            ELSE substring(t, 1, {w2}) END AS snippet
FROM with_pos
ORDER BY query_id, rank
"""


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Classifier evaluation report: confusion matrix of the language-ID
    heuristic's predictions against the table's labeled ``lang`` column,
    with per-cell counts and row-relative ppm — the quality-dashboard
    artifact any production classifier ships with.  Composes
    :func:`language_id` (per-row codegen scoring) with one low-cardinality
    |langs|² aggregation; the corpus scans once.
    """
    preds = language_id(docs)
    joined = docs.select("doc_id", F.col("lang").alias("lang_true")).join(
        preds.select("doc_id", "lang_pred"), "doc_id"
    )
    cells = joined.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_n = F.sum("n").over(Window.partitionBy("lang_true"))
    return (
        cells.withColumn("row_ppm", F.expr("n * 1000000 DIV sum(n) over (partition by lang_true)"))
        .withColumn("row_total", row_n.cast("bigint"))
        .select("lang_true", "lang_pred", "n", "row_total", "row_ppm")
        .orderBy("lang_true", "lang_pred")
    )


LANGID_CONFUSION_SQL_TEMPLATE = """
WITH preds AS ({language_id}),
joined AS (
    SELECT d.lang AS lang_true, p.lang_pred
    FROM documents d JOIN preds p USING (doc_id)
),
cells AS (
    SELECT lang_true, lang_pred, COUNT(*) AS n
    FROM joined GROUP BY lang_true, lang_pred
)
SELECT lang_true, lang_pred, CAST(n AS BIGINT) AS n,
       CAST(SUM(n) OVER (PARTITION BY lang_true) AS BIGINT) AS row_total,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang_true) AS BIGINT)
           AS row_ppm
FROM cells
ORDER BY lang_true, lang_pred
"""


def pmi_collocations(
    docs: DataFrame,
    min_pair: int = 5,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    ``PMI(a,b) = ln( N · c(ab) / (c(a)·c(b)) )`` over adjacent token pairs
    — the classic collocation/phrase-mining statistic (Church & Hanks
    1990; word2vec's phrase pass uses the same ratio).

    One explode pass produces both unigram and bigram counts (the bigram
    relation derives from the SAME tokenized rows); the PMI numerator and
    denominator stay int64 and the single ln of an identical rational is
    engine-exact, rounded to 6 dp.  ``min_pair`` drops noise pairs (and
    bounds the ranked relation).
    """
    toks = docs.select(F.split(F.col(text_col), " ").alias("t"))
    bound = toks.select(
        "t", F.expr("arrays_zip(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1))").alias("bg")
    )
    pairs = bound.select(F.explode("bg").alias("p")).select(
        F.col("p.0").alias("a"), F.col("p.1").alias("b")
    )
    pair_counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n_tokens"))
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    scored = (
        pair_counts.filter(F.col("c_ab") >= min_pair)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "c_ab",
            # decimal(38,0) products: corpus token total x pair count
            # (~1e29 at 100 TB) passes int64 long before the double cast;
            # HUGEINT in the twin
            F.round(
                F.log(
                    (F.col("n_tokens").cast("decimal(38,0)") * F.col("c_ab")).cast("double")
                    / (F.col("c_a").cast("decimal(38,0)") * F.col("c_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("rank", "a", "b", "c_ab", "pmi")
    )


PMI_COLLOCATIONS_SQL_TEMPLATE = """
WITH t AS (SELECT STR_SPLIT(text, ' ') AS toks FROM documents),
pairs AS (
    SELECT toks[i] AS a, toks[i + 1] AS b
    FROM t, UNNEST(range(1, LEN(toks))) AS u(i)
),
pair_counts AS (
    SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY a, b HAVING COUNT(*) >= {min_pair}
),
uni AS (
    SELECT unnest(STR_SPLIT(text, ' ')) AS w FROM documents
),
uni_counts AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni_counts),
scored AS (
    SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(LN(CAST(CAST(n_tokens AS HUGEINT) * c_ab AS DOUBLE)
                    / CAST(CAST(ua.c AS HUGEINT) * ub.c AS DOUBLE)), 6) AS pmi
    FROM pair_counts
    JOIN uni_counts ua ON ua.w = a
    JOIN uni_counts ub ON ub.w = b
    CROSS JOIN total
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS BIGINT)
           AS rank,
       a, b, c_ab, pmi
FROM scored
QUALIFY rank <= {k}
"""


def source_divergence(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source distribution drift: KL(source token distribution ||
    corpus token distribution) in micro-nats — the domain-shift screen a
    training-mix dashboard tracks (which sources look least like the
    blend), the corpus-level sibling of per-document DSIR importance
    weights.

    One explode+count pass; per-source and corpus term counts ride the same
    term-keyed shuffle.  Laplace-smoothed (+1 on the source side over the
    corpus vocab) via the CLOSED FORM, never a dense |sources|x|vocab| grid
    (VERDICT r4 #4): with n_st = c+1 and d_s = sn+V,

        KL(s) = (Σ_t n·ln n)/d_s − ln d_s − (Σ_t n·ln q_t)/d_s

    where unseen terms contribute ln 1 = 0 to the first sum and exactly
    (SL − Σ_seen ln q_t) to the last (SL = Σ_vocab ln q_t, ONE corpus
    scalar).  So KL(s) = [Σ_seen (c+1)ln(c+1) − Σ_seen c·L_t − SL]/d_s
    − ln d_s, touching only SEEN (src, term) pairs.  Per-term quantities
    are micro-nat int64 (L_t = round(ln q_t·1e6) is source-independent;
    the (c+1)ln(c+1) energy rounds per pair), so summation order cannot
    drift the statistic cross-engine; the two closing float ops (one
    divide, one ln) act on identical integer-derived operands everywhere.
    """
    toks = docs.select(
        F.col(source_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    st = toks.groupBy("src", "term").agg(F.count(F.lit(1)).alias("c"))
    st = st.localCheckpoint(eager=True)
    corpus = st.groupBy("term").agg(F.sum("c").alias("cc"))
    tot = corpus.agg(
        F.sum("cc").alias("tn"), F.count(F.lit(1)).alias("v")
    )
    lt = corpus.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(F.log(F.col("cc").cast("double") / F.col("tn")) * 1_000_000, 0)
        .cast("bigint")
        .alias("l"),
    )
    lt = lt.localCheckpoint(eager=True)
    sl = lt.agg(F.sum("l").alias("sl"))
    seen = (
        st.join(lt, "term")
        .groupBy("src")
        .agg(
            F.sum(
                F.round(
                    (F.col("c") + 1).cast("double")
                    * F.log((F.col("c") + 1).cast("double"))
                    * 1_000_000,
                    0,
                ).cast("bigint")
            ).alias("s1"),
            F.sum(F.col("c") * F.col("l")).alias("s2"),
            F.sum("c").alias("sn"),
        )
    )
    return (
        seen.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sl))
        .select(
            F.col("src").alias("source"),
            F.col("sn").cast("bigint").alias("n_tokens"),
            F.round(
                (F.col("s1") - F.col("s2") - F.col("sl")).cast("double")
                / (F.col("sn") + F.col("v")).cast("double")
                / 1_000_000.0
                - F.log((F.col("sn") + F.col("v")).cast("double")),
                4,
            ).alias("kl_nats"),
        )
        .orderBy(F.desc("kl_nats"), "source")
    )


SOURCE_DIVERGENCE_SQL = """
WITH toks AS (
    SELECT source AS src, unnest(STR_SPLIT(text, ' ')) AS term FROM documents
),
st AS (SELECT src, term, COUNT(*) AS c FROM toks GROUP BY src, term),
corpus AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cc FROM st GROUP BY term),
tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS tn, CAST(COUNT(*) AS BIGINT) AS v
        FROM corpus),
lt AS (
    SELECT term,
           CAST(ROUND(LN(CAST(cc AS DOUBLE) / tn) * 1000000, 0) AS BIGINT) AS l
    FROM corpus CROSS JOIN tot
),
sl AS (SELECT CAST(SUM(l) AS BIGINT) AS sl FROM lt),
seen AS (
    SELECT st.src,
           CAST(SUM(CAST(ROUND(CAST(c + 1 AS DOUBLE)
                                * LN(CAST(c + 1 AS DOUBLE)) * 1000000, 0)
                         AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(c * l) AS BIGINT) AS s2,
           CAST(SUM(c) AS BIGINT) AS sn
    FROM st JOIN lt USING (term)
    GROUP BY st.src
)
SELECT src AS source, sn AS n_tokens,
       ROUND(CAST(s1 - s2 - sl AS DOUBLE) / CAST(sn + v AS DOUBLE) / 1000000.0
             - LN(CAST(sn + v AS DOUBLE)), 4) AS kl_nats
FROM seen CROSS JOIN tot CROSS JOIN sl
ORDER BY kl_nats DESC, source
"""


def quality_auc(docs: DataFrame) -> DataFrame:
    """ROC-AUC of the frozen quality classifier's logit as a ranker for
    "document is English" — the eval metric every production quality
    filter ships with (does the score actually separate the populations
    it was tuned on?).  Composes :func:`quality_classifier` (per-row
    codegen scoring, int milli-logits) with the rank-free pairwise AUC:

        AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)

    built from the per-distinct-score relation exactly like the
    Mann-Whitney operator — ``auc_x2 = Σ_s pos(s)·(2·neg_below(s) +
    neg(s))`` is exact int64 (doubling absorbs the tie halves), and the
    single final division is the only float op.  The below-cumsum is
    two-phase (``bucketed_cumsum`` over 64-wide milli-logit bands, the
    curriculum quantizer): the per-distinct-logit relation is usually
    small but its domain is the feature lattice, not a fixed constant,
    so no partition-less window ever touches it.
    """
    from ..operators.twophase import bucketed_cumsum

    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    lab = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("bigint").alias("pos")),
        "doc_id",
    )
    per_s = lab.groupBy("logit_milli").agg(
        F.sum("pos").alias("tp"), F.sum(1 - F.col("pos")).alias("tn")
    )
    cum = bucketed_cumsum(
        per_s,
        F.expr("logit_milli DIV 64"),
        [F.asc("logit_milli")],
        F.col("tn"),
        "cni",
        # per_s is a full classifier+join pipeline: checkpoint the slim
        # per-score relation once rather than re-deriving it per pass
        materialize=True,
    ).select("tp", "tn", (F.col("cni") - F.col("tn")).alias("cnb"))
    # decimal(38,0): cnb is a corpus-scaled cumulative count, so the AUC
    # pair-count a2 ~ n_pos·n_neg passes int64 near 3e9 docs (HUGEINT in
    # the twin); the auc_x2 REPORT column stays BIGINT by contract
    stats = cum.agg(
        F.sum("tp").alias("np"),
        F.sum("tn").alias("nn"),
        F.sum(
            F.col("tp").cast("decimal(38,0)") * (2 * F.col("cnb") + F.col("tn"))
        ).alias("a2"),
    )
    return stats.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.col("a2").cast("bigint").alias("auc_x2"),
        F.expr(
            "ROUND(CAST(a2 AS DOUBLE) / nullif(2.0 * (CAST(np AS DOUBLE) * nn), 0.0), 6)"
        ).alias("auc"),
    )


QUALITY_AUC_SQL = f"""
WITH scored AS ({QUALITY_CLASSIFIER_SQL}),
lab AS (
    SELECT s.logit_milli,
           CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM scored s JOIN documents d USING (doc_id)
),
per_s AS (
    SELECT logit_milli, CAST(SUM(pos) AS BIGINT) AS tp,
           CAST(SUM(1 - pos) AS BIGINT) AS tn
    FROM lab GROUP BY logit_milli
),
cum AS (
    SELECT tp, tn,
           CAST(COALESCE(SUM(tn) OVER (ORDER BY logit_milli
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cnb
    FROM per_s
),
stats AS (
    SELECT CAST(SUM(tp) AS BIGINT) AS np, CAST(SUM(tn) AS BIGINT) AS nn,
           SUM(CAST(tp AS HUGEINT) * (2 * cnb + tn)) AS a2
    FROM cum
)
SELECT np AS n_pos, nn AS n_neg, CAST(a2 AS BIGINT) AS auc_x2,
       ROUND(CAST(a2 AS DOUBLE) / (2.0 * (CAST(np AS DOUBLE) * nn)), 6) AS auc
FROM stats
"""


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility report: subword tokens per
    whitespace word and bytes per subword token under the BPE-ish regex
    pre-tokenizer — the standard multilingual-tokenizer equity audit
    (languages with milli-fertility ≫ 1000 pay more compute per word).

    One corpus scan (per-row array sizes, codegen'd) into one
    |langs|-row aggregate; ratios are exact integer milli divisions.
    """
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    ws = F.split(F.col("text"), r"\s+")
    per_doc = docs.select(
        "lang",
        F.size(bpe).cast("bigint").alias("nb"),
        F.size(ws).cast("bigint").alias("nw"),
        F.length("text").cast("bigint").alias("nc"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("bpe_tokens"),
        F.sum("nw").alias("ws_tokens"),
        F.sum("nc").alias("chars"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("bpe_tokens").cast("bigint").alias("bpe_tokens"),
        F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.expr("bpe_tokens * 1000 DIV ws_tokens").alias("fertility_milli"),
        F.expr("chars * 1000 DIV nullif(bpe_tokens, 0)").alias("chars_per_token_milli"),
    ).orderBy("lang")


TOKENIZER_FERTILITY_SQL = r"""
WITH per_doc AS (
    SELECT lang,
           CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS BIGINT) AS nb,
           CAST(LEN(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nw,
           CAST(LENGTH(text) AS BIGINT) AS nc
    FROM documents
),
agg AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nb) AS BIGINT) AS bpe_tokens,
           CAST(SUM(nw) AS BIGINT) AS ws_tokens,
           CAST(SUM(nc) AS BIGINT) AS chars
    FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, bpe_tokens, ws_tokens,
       bpe_tokens * 1000 // ws_tokens AS fertility_milli,
       chars * 1000 // bpe_tokens AS chars_per_token_milli
FROM agg
ORDER BY lang
"""


def zipf_slope(docs: DataFrame, top_r: int = 100) -> DataFrame:
    """Zipf's-law fit of the corpus: OLS slope of log-frequency against
    log-rank over the top ``top_r`` token types — natural language sits
    near −1, and strong deviation flags synthetic, templated, or
    boilerplate-heavy corpora (a quick distribution-health audit next to
    the quality filters).

    Each point's ln() is rounded to int64 micro-nats BEFORE the sufficient
    sums (the cross-engine float-determinism recipe shared with the
    unigram/bigram LMs), so the regression inputs are exact integers and
    the slope/R² divisions are single IEEE ops.  Frequencies aggregate in
    one token-keyed shuffle; the rank window sorts only the top-r rows.
    """
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.desc("f"), F.asc("tok"))
    pts = (
        freq.withColumn("r", F.row_number().over(w).cast("bigint"))
        .filter(F.col("r") <= top_r)
        .select(
            F.expr("CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT)").alias(
                "x"
            ),
            F.expr("CAST(ROUND(LN(CAST(f AS DOUBLE)) * 1000000, 0) AS BIGINT)").alias(
                "y"
            ),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6)"
        ).alias("slope"),
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy) / "
            "(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6)"
        ).alias("r2"),
    )


ZIPF_SLOPE_SQL_TEMPLATE = """
WITH toks AS (
    SELECT UNNEST(STR_SPLIT(text, ' ')) AS tok FROM documents
),
freq AS (
    SELECT tok, COUNT(*) AS f FROM toks WHERE tok != '' GROUP BY tok
),
pts AS (
    SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x,
           CAST(ROUND(LN(CAST(f AS DOUBLE)) * 1000000, 0) AS BIGINT) AS y
    FROM (
        SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS r FROM freq
    ) ranked
    WHERE r <= {top_r}
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM pts
)
SELECT n AS n_points,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy) /
             (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


def source_entropy(docs: DataFrame) -> DataFrame:
    """Per-source Shannon token entropy (nats, 6 dp) — the
    lexical-diversity audit next to the Zipf fit: templated or boilerplate
    sources score far below open text of the same volume.  Uses
    H = ln N − (Σ c·ln c)/N so only per-TYPE ln values cross into float,
    each rounded to micro-nats before the int64 dot with its count — the
    LM-family determinism recipe.  One token-keyed shuffle, |sources|
    output rows."""
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("types"),
        F.sum(
            F.col("c")
            * F.expr("CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT)")
        ).alias("clnc_micro"),
    )
    return agg.select(
        "source",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("types").cast("bigint").alias("n_types"),
        F.expr(
            "ROUND(LN(CAST(n AS DOUBLE)) "
            "- CAST(clnc_micro AS DOUBLE) / 1000000.0 / n, 6)"
        ).alias("entropy_nats"),
    ).orderBy("source")


SOURCE_ENTROPY_SQL = """
WITH toks AS (
    SELECT source, UNNEST(STR_SPLIT(text, ' ')) AS tok FROM documents
),
freq AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks WHERE tok != '' GROUP BY 1, 2
),
agg AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS types,
           CAST(SUM(c * CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT))
                AS BIGINT) AS clnc_micro
    FROM freq GROUP BY source
)
SELECT source, n AS n_tokens, types AS n_types,
       ROUND(LN(CAST(n AS DOUBLE))
             - CAST(clnc_micro AS DOUBLE) / 1000000.0 / n, 6) AS entropy_nats
FROM agg
ORDER BY source
"""


def classifier_calibration(docs: DataFrame, n_bins: int = 8) -> DataFrame:
    """Reliability diagram for the frozen quality classifier: logits bucket
    into equal-width milli-logit bins, and each bin reports its empirical
    English rate vs the bin's mean logit — the calibration companion to
    :func:`quality_auc` (a well-calibrated score's positive rate rises
    monotonically with the bin).  Bin edges come from one tiny min/max
    aggregate broadcast back; all rates are exact ppm."""
    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    lab = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("bigint").alias("pos")),
        "doc_id",
    )
    bounds = lab.agg(
        F.min("logit_milli").alias("lo"), F.max("logit_milli").alias("hi")
    )
    binned = lab.crossJoin(F.broadcast(bounds)).select(
        "pos",
        "lo",
        # shifted to non-negative so truncating (Spark DIV) and flooring
        # (DuckDB //) integer division agree on the bin AND the mean
        F.col("logit_milli").alias("logit_milli"),
        F.expr(
            f"LEAST({n_bins} - 1, (logit_milli - lo) * {n_bins} "
            "DIV GREATEST(hi - lo + 1, 1))"
        ).cast("bigint").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").alias("n_pos"),
            F.sum(F.col("logit_milli") - F.col("lo")).alias("sshift"),
            F.min("lo").alias("lo"),
        )
        .select(
            "bin",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.expr("lo + sshift DIV n_docs").cast("bigint").alias(
                "mean_logit_milli"
            ),
            F.expr("n_pos * 1000000 DIV n_docs").alias("pos_rate_ppm"),
        )
        .orderBy("bin")
    )


CLASSIFIER_CALIBRATION_SQL_TEMPLATE = f"""
WITH scored AS ({QUALITY_CLASSIFIER_SQL}),
lab AS (
    SELECT s.logit_milli,
           CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM scored s JOIN documents d USING (doc_id)
),
bounds AS (
    SELECT MIN(logit_milli) AS lo, MAX(logit_milli) AS hi FROM lab
),
binned AS (
    SELECT pos, logit_milli, lo,
           LEAST({{n_bins}} - 1, (logit_milli - lo) * {{n_bins}}
                 // GREATEST(hi - lo + 1, 1)) AS bin
    FROM lab CROSS JOIN bounds
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(MIN(lo) + SUM(logit_milli - lo) // COUNT(*) AS BIGINT)
           AS mean_logit_milli,
       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm
FROM binned
GROUP BY bin
ORDER BY bin
"""


def text_tiling(
    docs: DataFrame,
    block_tokens: int = 20,
    dim: int = 64,
    threshold_centi: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997): consecutive
    ``block_tokens``-token windows are compared by hashed-bag cosine, and a
    topic boundary fires where similarity drops below the threshold — the
    document-structure pass a chunking pipeline runs so chunk edges land on
    topic shifts instead of mid-thought.

    Exactness: block vectors are integer token counts over md5 buckets
    (the :func:`hashed_embedding` convention, unsigned so every term is
    non-negative), the boundary test is the division/sqrt-free integer
    comparison ``10⁴·dot² < thr²·‖l‖²·‖r‖²``, and the reported cosine is
    one sqrt+divide of exact int64s (6 dp).  Shuffles carry only
    (doc, block, bucket, count) rows; adjacent-block pairs join on the
    per-block norm relation so blocks sharing no bucket still emit a row.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
            )
        ).alias("pos", "w"),
    )
    hb = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
    vecs = (
        toks.select(
            F.col(id_col),
            (F.col("pos") / block_tokens).cast("bigint").alias("b"),
            (hb % dim).alias("bucket"),
        )
        .groupBy(id_col, "b", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    norms = vecs.groupBy(id_col, "b").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    dots = (
        vecs.alias("l")
        .join(
            vecs.alias("r"),
            (F.col(f"l.{id_col}") == F.col(f"r.{id_col}"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("r.b") == F.col("l.b") + 1),
        )
        .groupBy(F.col(f"l.{id_col}").alias(id_col), F.col("r.b").alias("b"))
        .agg(F.sum(F.col("l.c") * F.col("r.c")).alias("dot"))
    )
    ln = norms.select(
        F.col(id_col), (F.col("b") + 1).alias("b"), F.col("n2").alias("nl")
    )
    rn = norms.select(F.col(id_col), "b", F.col("n2").alias("nr"))
    thr2 = threshold_centi * threshold_centi
    return (
        ln.join(rn, [id_col, "b"])
        .join(dots, [id_col, "b"], "left")
        .select(
            F.col(id_col),
            F.col("b").cast("bigint").alias("block_id"),
            F.coalesce(F.col("dot"), F.lit(0)).cast("bigint").alias("dot"),
            F.col("nl").cast("bigint").alias("norm2_left"),
            F.col("nr").cast("bigint").alias("norm2_right"),
            F.expr(
                "CAST(ROUND(COALESCE(dot, 0) / "
                "SQRT(CAST(nl AS DOUBLE) * nr) * 1000000, 0) AS BIGINT)"
            ).alias("cos_micro"),
            F.expr(
                f"10000 * COALESCE(dot, 0) * COALESCE(dot, 0) "
                f"< {thr2} * nl * nr"
            ).alias("is_boundary"),
        )
        .orderBy(id_col, "block_id")
    )


TEXT_TILING_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, i - 1 AS pos, w FROM (
        SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
              FROM documents)
    )
),
vecs AS (
    SELECT doc_id, pos // {block_tokens} AS b,
           CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % {dim} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM toks GROUP BY 1, 2, 3
),
norms AS (
    SELECT doc_id, b, CAST(SUM(c * c) AS BIGINT) AS n2 FROM vecs GROUP BY 1, 2
),
dots AS (
    SELECT l.doc_id, r.b, CAST(SUM(l.c * r.c) AS BIGINT) AS dot
    FROM vecs l JOIN vecs r
      ON l.doc_id = r.doc_id AND l.bucket = r.bucket AND r.b = l.b + 1
    GROUP BY 1, 2
)
SELECT ln.doc_id, CAST(ln.b AS BIGINT) AS block_id,
       CAST(COALESCE(d.dot, 0) AS BIGINT) AS dot,
       ln.n2 AS norm2_left, rn.n2 AS norm2_right,
       CAST(ROUND(COALESCE(d.dot, 0) /
                  SQRT(CAST(ln.n2 AS DOUBLE) * rn.n2) * 1000000, 0) AS BIGINT)
           AS cos_micro,
       10000 * COALESCE(d.dot, 0) * COALESCE(d.dot, 0)
           < {thr2} * ln.n2 * rn.n2 AS is_boundary
FROM (SELECT doc_id, b + 1 AS b, n2 FROM norms) ln
JOIN norms rn ON ln.doc_id = rn.doc_id AND ln.b = rn.b
LEFT JOIN dots d ON ln.doc_id = d.doc_id AND ln.b = d.b
ORDER BY ln.doc_id, block_id
"""


def adaptive_quality_cut(docs: DataFrame, keep_quantile: float = 0.25) -> DataFrame:
    """Per-language adaptive quality thresholds (the CCNet policy): instead
    of one global cutoff — which silently deletes whole low-resource
    languages whose score distribution sits lower — each language keeps its
    own top (1−q) by classifier logit.  Reports the per-language threshold
    and the kept/dropped split.

    The threshold is the exact interpolated q-quantile of int milli-logits;
    quartile interpolation lands on .25 steps, so thresholds are held ×4
    (``thr4``) and the keep test ``4·logit > thr4`` is pure int64 — the
    whole adaptive policy is value-hash checkable.  One |langs|-row
    quantile aggregate broadcast back over the scored scan.
    """
    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    lab = scored.join(docs.select("doc_id", "lang"), "doc_id")
    thr = lab.groupBy("lang").agg(
        F.expr(
            f"CAST(ROUND(percentile(logit_milli, {keep_quantile}) * 4, 0) "
            "AS BIGINT)"
        ).alias("thr4")
    )
    flagged = lab.join(F.broadcast(thr), "lang").select(
        "lang",
        "thr4",
        (4 * F.col("logit_milli") > F.col("thr4")).cast("bigint").alias("keep"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.min("thr4").alias("threshold_x4"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
        )
        .select(
            "lang",
            F.col("threshold_x4").cast("bigint").alias("threshold_x4"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.expr("n_kept * 1000000 DIV n_docs").alias("kept_ppm"),
        )
        .orderBy("lang")
    )


ADAPTIVE_QUALITY_SQL_TEMPLATE = f"""
WITH scored AS ({QUALITY_CLASSIFIER_SQL}),
lab AS (
    SELECT s.doc_id, s.logit_milli, d.lang
    FROM scored s JOIN documents d USING (doc_id)
),
thr AS (
    SELECT lang,
           CAST(ROUND(quantile_cont(logit_milli, {{keep_quantile}}) * 4, 0)
                AS BIGINT) AS thr4
    FROM lab GROUP BY lang
)
SELECT l.lang, MIN(t.thr4) AS threshold_x4,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN 4 * l.logit_milli > t.thr4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN 4 * l.logit_milli > t.thr4 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm
FROM lab l JOIN thr t USING (lang)
GROUP BY l.lang
ORDER BY l.lang
"""


_BLOCKLIST = {
    "profanity": ["damn", "hell", "crap"],
    "spam": ["viagra", "casino", "lottery", "jackpot"],
    "boilerplate": ["click here", "subscribe now", "cookie policy"],
}


def blocklist_filter(docs: DataFrame) -> DataFrame:
    """C4-style blocklist screen: per document, non-overlapping occurrence
    counts for each lexicon category (word-ish boundary match on the
    lowercased text) and the keep flag (zero hits anywhere) — the cheap
    lexical gate that runs before any model-based quality scoring.

    Pure JVM regexp_count per category over one scan (the PII-scrub
    pattern); lexicons are frozen literals so the filter is deterministic
    and oracle-checkable.  Swap `_BLOCKLIST` for the production lists —
    the plan shape (codegen'd narrow stage) is what matters at 100 TB.
    """
    low = F.lower(F.col("text"))
    counts = {
        cat: sum(
            F.regexp_count(low, F.lit(rf"\b{w}\b")) for w in words
        ).cast("bigint")
        for cat, words in _BLOCKLIST.items()
    }
    total = sum(counts.values())
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{cat}") for cat, c in counts.items()],
        total.alias("n_total_hits"),
        (total == 0).alias("keep"),
    ).orderBy("doc_id")


def _blocklist_sql_counts(cat: str) -> str:
    words = _BLOCKLIST[cat]
    return " + ".join(
        rf"LEN(regexp_extract_all(lower(text), '\b{w}\b'))" for w in words
    )


BLOCKLIST_FILTER_SQL = rf"""
SELECT doc_id, n_profanity, n_spam, n_boilerplate,
       CAST(n_profanity + n_spam + n_boilerplate AS BIGINT) AS n_total_hits,
       (n_profanity + n_spam + n_boilerplate) = 0 AS keep
FROM (
    SELECT doc_id,
           CAST({_blocklist_sql_counts("profanity")} AS BIGINT) AS n_profanity,
           CAST({_blocklist_sql_counts("spam")} AS BIGINT) AS n_spam,
           CAST({_blocklist_sql_counts("boilerplate")} AS BIGINT) AS n_boilerplate
    FROM documents
) t
ORDER BY doc_id
"""


def stopword_discovery(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus-driven stopword discovery: the ``top_k`` token types with the
    highest document frequency — how the stop-shingle/stop-bucket lists
    the dedup family depends on are actually BUILT (hand lists don't
    transfer across domains or languages).  Reports df, df_ppm and mean
    within-doc tf (milli) per candidate.

    One explode → (token, doc) distinct → two rollups; the ranking window
    sorts only the type relation.  Exact integers end-to-end.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    n_docs_rel = docs.agg(F.count(F.lit(1)).alias("nd"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    per_type = tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )
    w_rank = Window.orderBy(F.desc("df"), F.asc("w"))
    return (
        per_type.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= top_k)
        .crossJoin(F.broadcast(n_docs_rel))
        .select(
            F.col("rn").cast("bigint").alias("rank"),
            F.col("w").alias("token"),
            F.col("df").cast("bigint").alias("df"),
            F.expr("df * 1000000 DIV nd").alias("df_ppm"),
            F.expr("ttf * 1000 DIV df").alias("mean_tf_milli"),
        )
        .orderBy("rank")
    )


STOPWORD_DISCOVERY_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
per_type AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS ttf
    FROM tf GROUP BY w
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, w ASC) AS rn FROM per_type
)
SELECT CAST(rn AS BIGINT) AS rank, w AS token, df,
       CAST(df * 1000000 // nd AS BIGINT) AS df_ppm,
       CAST(ttf * 1000 // df AS BIGINT) AS mean_tf_milli
FROM ranked CROSS JOIN nd
WHERE rn <= {top_k}
ORDER BY rank
"""


def bm25_source_precision(
    docs: DataFrame, n_queries: int = 3, q_terms: int = 5, k: int = 10
) -> DataFrame:
    """Precision@k of BM25 under source-match pseudo-relevance: a hit is
    relevant when it comes from the SAME source as the query document —
    the zero-annotation IR eval (same trick as ``x_retrieval_ndcg``'s
    label relevance, applied to the lexical stack).  Per query: hits,
    relevant hits, precision ppm, and the corpus base rate of the query's
    source for lift context.  Composes the one-plan BM25; the eval itself
    touches only k rows per query plus one tiny source rollup."""
    hits = bm25_search(docs, n_queries=n_queries, q_terms=q_terms, k=k)
    src = docs.select("doc_id", "source")
    q_src = src.select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("q_source")
    )
    h_src = src.select(
        F.col("doc_id").alias("hit_id"), F.col("source").alias("h_source")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    src_sizes = src.groupBy("source").agg(F.count(F.lit(1)).alias("ss"))
    scored = (
        hits.join(F.broadcast(q_src), "query_id")
        .join(F.broadcast(h_src), "hit_id")
        .groupBy("query_id", "q_source")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum(
                (F.col("q_source") == F.col("h_source")).cast("bigint")
            ).alias("n_relevant"),
        )
    )
    return (
        scored.join(
            F.broadcast(src_sizes.withColumnRenamed("source", "q_source")),
            "q_source",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "query_id",
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.col("n_relevant").cast("bigint").alias("n_relevant"),
            F.expr("n_relevant * 1000000 DIV n_hits").alias("precision_ppm"),
            F.expr("ss * 1000000 DIV nd").alias("base_rate_ppm"),
        )
        .orderBy("query_id")
    )


def bm25_source_precision_sql(
    n_queries: int = 3, q_terms: int = 5, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    base = BM25_SEARCH_SQL_TEMPLATE.format(
        n_queries=n_queries, q_terms=q_terms, k=k, k1=k1, b=b
    )
    return f"""
WITH hits AS ({base}),
srcs AS (SELECT doc_id, source FROM documents),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
ssz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ss FROM srcs GROUP BY source),
scored AS (
    SELECT h.query_id, q.source AS q_source,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN q.source = d.source THEN 1 ELSE 0 END) AS BIGINT)
               AS n_relevant
    FROM hits h
    JOIN srcs q ON h.query_id = q.doc_id
    JOIN srcs d ON h.hit_id = d.doc_id
    GROUP BY h.query_id, q.source
)
SELECT s.query_id, s.n_hits, s.n_relevant,
       CAST(s.n_relevant * 1000000 // s.n_hits AS BIGINT) AS precision_ppm,
       CAST(z.ss * 1000000 // nd.nd AS BIGINT) AS base_rate_ppm
FROM scored s JOIN ssz z ON s.q_source = z.source CROSS JOIN nd
ORDER BY s.query_id
"""


def prefix_templates(docs: DataFrame, prefix_tokens: int = 5, min_docs: int = 2) -> DataFrame:
    """Template discovery by shared document PREFIXES: documents opening
    with the same first ``prefix_tokens`` tokens are almost always
    boilerplate instantiations (mirrored headers, scraped nav chrome) —
    the cheap scan that seeds :func:`boilerplate_strip`'s block lists and
    explains suspicious dup-cluster histograms.  One narrow prefix
    projection, one groupBy; reports each template's doc count and corpus
    share ppm."""
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.col("text"), r"\s+"), 1, prefix_tokens)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    return (
        docs.select(prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "prefix",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.expr("n_docs * 1000000 DIV nd").alias("share_ppm"),
        )
        .orderBy(F.desc("n_docs"), F.asc("prefix"))
    )


PREFIX_TEMPLATES_SQL_TEMPLATE = r"""
WITH pre AS (
    SELECT array_to_string(regexp_split_to_array(text, '\s+')[1 : {prefix_tokens}], ' ')
               AS prefix
    FROM documents
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) * 1000000 // MAX(nd.nd) AS BIGINT) AS share_ppm
FROM pre CROSS JOIN nd
GROUP BY prefix
HAVING COUNT(*) >= {min_docs}
ORDER BY n_docs DESC, prefix ASC
"""


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character entropy (nats, 6 dp) — the gibberish/binary
    detector (random bytes ≈ ln 256, English prose ≈ 2.9-3.2 nats;
    base64/hex blobs and keyboard mashing land in between with telltale
    flatness).  Same H = ln n − (Σ c·ln c)/n micro-nat recipe as the
    source-level audit, per document: one char explode into a
    (doc, char)-keyed aggregate, then a per-doc rollup."""
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("alphabet"),
        F.sum(
            F.col("c")
            * F.expr("CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT)")
        ).alias("clnc_micro"),
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.col("alphabet").cast("bigint").alias("alphabet_size"),
        F.expr(
            "ROUND(LN(CAST(n AS DOUBLE)) "
            "- CAST(clnc_micro AS DOUBLE) / 1000000.0 / n, 6)"
        ).alias("entropy_nats"),
    ).orderBy("doc_id")


CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, UNNEST(STR_SPLIT(text, '')) AS ch FROM documents
),
freq AS (
    SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
    FROM chars WHERE ch != '' GROUP BY doc_id, ch
),
agg AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS alphabet,
           CAST(SUM(c * CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT))
                AS BIGINT) AS clnc_micro
    FROM freq GROUP BY doc_id
)
SELECT doc_id, n AS n_chars, alphabet AS alphabet_size,
       ROUND(LN(CAST(n AS DOUBLE))
             - CAST(clnc_micro AS DOUBLE) / 1000000.0 / n, 6) AS entropy_nats
FROM agg
ORDER BY doc_id
"""


def hard_negative_mining(
    docs: DataFrame, n_queries: int = 3, q_terms: int = 5, k: int = 10,
    n_neg: int = 3,
) -> DataFrame:
    """Hard-negative mining for retrieval training: per query, the top
    lexically-similar hits (BM25) that do NOT share the query's source
    pseudo-label — the pairs a dual-encoder learns most from (BM25-hard
    negatives are the standard recipe: random negatives are too easy,
    same-source positives too correlated).  Composes the one-plan BM25;
    negatives keep their lexical rank so the miner's difficulty ordering
    is preserved.  Output: (query_id, negative_id, bm25_rank, neg_rank).
    """
    hits = bm25_search(docs, n_queries=n_queries, q_terms=q_terms, k=k)
    src = docs.select("doc_id", "source")
    labeled = (
        hits.join(
            F.broadcast(
                src.select(
                    F.col("doc_id").alias("query_id"),
                    F.col("source").alias("q_source"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                src.select(
                    F.col("doc_id").alias("hit_id"),
                    F.col("source").alias("h_source"),
                )
            ),
            "hit_id",
        )
        .filter(F.col("q_source") != F.col("h_source"))
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    return (
        labeled.withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= n_neg)
        .select(
            "query_id",
            F.col("hit_id").alias("negative_id"),
            F.col("rank").cast("bigint").alias("bm25_rank"),
            "neg_rank",
        )
        .orderBy("query_id", "neg_rank")
    )


def hard_negative_mining_sql(
    n_queries: int = 3, q_terms: int = 5, k: int = 10, n_neg: int = 3,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    base = BM25_SEARCH_SQL_TEMPLATE.format(
        n_queries=n_queries, q_terms=q_terms, k=k, k1=k1, b=b
    )
    return f"""
WITH hits AS ({base}),
labeled AS (
    SELECT h.query_id, h.hit_id, h.rank
    FROM hits h
    JOIN documents q ON h.query_id = q.doc_id
    JOIN documents d ON h.hit_id = d.doc_id
    WHERE q.source != d.source
),
ranked AS (
    SELECT query_id, hit_id, rank,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank) AS neg_rank
    FROM labeled
)
SELECT query_id, hit_id AS negative_id, CAST(rank AS BIGINT) AS bm25_rank,
       CAST(neg_rank AS BIGINT) AS neg_rank
FROM ranked WHERE neg_rank <= {n_neg}
ORDER BY query_id, neg_rank
"""


def vocab_growth_curve(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct token types as the
    corpus accumulates in doc_id order, reported at doc-decile
    checkpoints — sublinear growth is healthy natural text; a
    near-linear curve flags synthetic or ID-riddled content (every doc
    minting new "types").  Each type attributes to the FIRST doc that
    contains it (one min-aggregate keyed by token), then types roll up
    by the first-doc's decile and cumulate over 10 rows."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    firsts = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    bucket = F.expr(
        f"LEAST({n_buckets} - 1, (first_doc - lo) * {n_buckets} "
        "DIV GREATEST(hi - lo + 1, 1))"
    )
    per_bucket = (
        firsts.crossJoin(F.broadcast(bounds))
        .select(bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        F.col("new_types").cast("bigint").alias("new_types"),
        F.sum("new_types").over(w).cast("bigint").alias("cumulative_types"),
    ).orderBy("bucket")


VOCAB_GROWTH_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
),
firsts AS (SELECT w, MIN(doc_id) AS first_doc FROM toks GROUP BY w),
bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
per_bucket AS (
    SELECT LEAST({n_buckets} - 1, (first_doc - lo) * {n_buckets}
                 // GREATEST(hi - lo + 1, 1)) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS new_types
    FROM firsts CROSS JOIN bounds
    GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket, new_types,
       CAST(SUM(new_types) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_types
FROM per_bucket
ORDER BY bucket
"""


def ttr_by_source(docs: DataFrame) -> DataFrame:
    """Type-token ratio per source (lexical diversity): distinct types per
    1000 tokens — the normalized TTR that, unlike raw TTR, is comparable
    across sources of different sizes only approximately; both the raw
    ratio and volumes ship so the reader can judge.  One token-keyed
    aggregate per source."""
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    agg = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr("n_types * 1000 DIV n_tokens").alias("ttr_milli"),
    ).orderBy("source")


TTR_BY_SOURCE_SQL = """
WITH toks AS (
    SELECT source, w FROM (
        SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ) WHERE w <> ''
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT w) * 1000 // COUNT(*) AS BIGINT) AS ttr_milli
FROM toks
GROUP BY source
ORDER BY source
"""


def length_quality_bias(docs: DataFrame, n_buckets: int = 5) -> DataFrame:
    """Length-bias audit of the quality classifier: mean logit per
    token-length quintile — a score that just proxies length is a trap
    (the Gopher papers' warning), and this is the two-minute check.
    Quintiles by NTILE over (length, doc_id) total order — two-phase over
    16-token length bands, so the doc relation never crosses a single-task
    window; means via the shifted-nonneg integer trick."""
    from ..operators.twophase import bucketed_ntile

    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    lens = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nt")
    )
    j = lens.join(scored, "doc_id")
    # materialize: j embeds the classifier pipeline (two phases would run it
    # twice); the checkpoint below covers the ntile output's two consumers
    # (lo_rel scan + the final rollup) so the window itself runs once too.
    bucketed = (
        bucketed_ntile(
            j,
            F.expr("nt DIV 16"),
            [F.asc("nt"), F.asc("doc_id")],
            n_buckets,
            "length_quintile",
            materialize=True,
        )
        .select("logit_milli", "nt", "length_quintile")
        .localCheckpoint(eager=True)
    )
    lo_rel = bucketed.agg(F.min("logit_milli").alias("lo"))
    return (
        bucketed.crossJoin(F.broadcast(lo_rel))
        .groupBy("length_quintile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("st"),
            F.sum(F.col("logit_milli") - F.col("lo")).alias("ss"),
            F.min("lo").alias("lo"),
        )
        .select(
            "length_quintile",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.expr("st DIV n_docs").cast("bigint").alias("mean_tokens"),
            F.expr("lo + ss DIV n_docs").cast("bigint").alias("mean_logit_milli"),
        )
        .orderBy("length_quintile")
    )


LENGTH_QUALITY_BIAS_SQL_TEMPLATE = f"""
WITH scored AS ({QUALITY_CLASSIFIER_SQL}),
j AS (
    SELECT d.doc_id, CAST(LEN(STR_SPLIT(d.text, ' ')) AS BIGINT) AS nt,
           s.logit_milli
    FROM documents d JOIN scored s USING (doc_id)
),
bucketed AS (
    SELECT logit_milli, nt,
           CAST(NTILE({{n_buckets}}) OVER (ORDER BY nt, doc_id) AS BIGINT)
               AS length_quintile
    FROM j
),
lo_rel AS (SELECT MIN(logit_milli) AS lo FROM bucketed)
SELECT length_quintile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) // COUNT(*) AS BIGINT) AS mean_tokens,
       CAST(MIN(lo) + SUM(logit_milli - lo) // COUNT(*) AS BIGINT)
           AS mean_logit_milli
FROM bucketed CROSS JOIN lo_rel
GROUP BY length_quintile
ORDER BY length_quintile
"""
