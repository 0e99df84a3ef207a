"""Corpus sampling & packing operators for training-data pipelines.

- **Stratified sampling** (`stratified_sample`): per-stratum Bernoulli
  sampling via `DataFrame.sampleBy` — seeded, executor-local (no shuffle),
  the standard way to hit a language/source mix at 100 TB.
- **Mixture planning** (`mixture_fractions`): given target proportions and
  the current per-stratum counts, compute the per-stratum keep-fractions
  that realize the target mix without upsampling (the largest feasible
  subset).  Driver-side arithmetic on a tiny aggregate.
- **Sequence packing** (`pack_documents`): assign documents to fixed-capacity
  context-window bins via a running token-count window — the deterministic,
  shuffle-light approximation of greedy bin packing used by pretraining
  pipelines (documents are packed in a stable order; each bin holds
  consecutive documents whose cumulative token count fits).  Bins are
  per-partition-key (e.g. source) so the window never funnels the corpus
  into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..localrel import values_relation


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Seeded per-stratum Bernoulli sample (`sampleBy`): executor-local
    filtering, no shuffle; deterministic for a fixed seed and partitioning."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def mixture_fractions(
    counts: dict[str, int], target_weights: dict[str, float]
) -> dict[str, float]:
    """Keep-fractions realizing ``target_weights`` as the *largest feasible*
    downsampled mixture: scale so the most-constrained stratum keeps 100%.

    counts: rows per stratum; target_weights: desired output proportions
    (normalized internally).  Returns fraction per stratum in [0, 1].
    """
    total_w = sum(target_weights.values())
    w = {k: v / total_w for k, v in target_weights.items()}
    # feasible total T satisfies T * w_k <= counts_k for all k
    t = min(counts[k] / w[k] for k in w if w[k] > 0)
    return {k: (t * w[k]) / counts[k] if counts[k] else 0.0 for k in w}


def pack_documents(
    docs: DataFrame,
    capacity: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    part_col: str | None = None,
) -> DataFrame:
    """Assign each document to a context-window bin of ``capacity`` tokens.

    Deterministic start-offset binning in ``id_col`` order: each document is
    capped at ``capacity`` tokens, and its bin is the capacity-window its
    FIRST token falls in (``bin = floor(prefix_sum / capacity)``).  A
    document straddling a boundary stays in its start bin, so a bin holds at
    most ``2*capacity - 2`` tokens; documents at/above capacity align
    exactly (one per bin).  Exact SQL-window equivalent -> oracle-checkable.

    (True next-fit — straddlers open a new bin — needs a running *bin
    remainder*, which is not expressible as a fixed-frame window; this
    one-pass variant is the streaming-friendly choice.)
    """
    capped = F.least(F.col(token_col), F.lit(capacity))
    w = (
        Window.partitionBy(*( [part_col] if part_col else [] ))
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(capped).over(w)
    # bin = floor((cumsum - capped_tokens) / capacity) over the capped sizes:
    # next-fit boundaries at capacity multiples
    out_cols = [F.col(id_col)]
    if part_col:
        out_cols.append(F.col(part_col))
    return docs.select(
        *out_cols,
        capped.cast("bigint").alias("packed_tokens"),
        F.floor((cum - capped) / capacity).cast("bigint").alias("bin_id"),
    )


PACK_DOCUMENTS_SQL_TEMPLATE = """
SELECT doc_id,
       source,
       CAST(LEAST(n_tokens, {capacity}) AS BIGINT) AS packed_tokens,
       CAST(FLOOR((SUM(LEAST(n_tokens, {capacity})) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - LEAST(n_tokens, {capacity})) / {capacity}) AS BIGINT) AS bin_id
FROM (
    SELECT doc_id, source,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
) t
"""


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token chunks (window/stride), the
    standard pre-embedding chunking step.  Returns
    (doc_id, chunk_id, chunk_text, n_chunk_tokens), chunk_id dense from 0.

    Pure per-row array expressions (sequence + posexplode + slice): no
    shuffle at all — chunking N docs is one narrow codegen'd stage, and the
    output inherits the input's partitioning.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("t"))
    starts = F.expr(f"sequence(0, greatest(size(t) - 1, 0), {stride})")
    exploded = base.select(id_col, "t", F.posexplode(starts).alias("chunk_id", "start"))
    chunk = F.slice(F.col("t"), F.col("start") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )


CHUNK_DOCUMENTS_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, STR_SPLIT(text, ' ') AS t FROM documents
),
starts AS (
    SELECT doc_id, t, unnest(range(0, GREATEST(LEN(t), 1), {stride})) AS start
    FROM toks
)
SELECT doc_id,
       CAST(start // {stride} AS BIGINT) AS chunk_id,
       array_to_string(t[start + 1 : start + {window}], ' ') AS chunk_text,
       CAST(LEN(t[start + 1 : start + {window}]) AS BIGINT) AS n_chunk_tokens
FROM starts
"""


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic content-hash sampling: keep a row iff the first 16 bits
    of md5(key || salt) fall under ``fraction`` (1/65536 granularity).

    Unlike seeded Bernoulli sampling (``sampleBy``), the decision is a pure
    function of the key — reproducible across engines, runs, partitionings,
    and cluster sizes, and consistent for the same key in different tables
    (join-compatible samples).  Executor-local filter, no shuffle; change
    ``salt`` to draw an independent sample.
    """
    if fraction >= 1.0:
        # int(1.0 * 65536) formats as the 5-char string "10000", and the
        # lexicographic `h4 < thr` would then keep only hashes starting with
        # "0" (~6.25% of rows) — silent data loss, so short-circuit instead.
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    thr = format(int(fraction * 65536), "04x")
    h4 = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)).cast("binary")), 1, 4
    )
    return df.filter(h4 < F.lit(thr))


HASH_SAMPLE_SQL_TEMPLATE = """
SELECT * FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 4) < '{thr}'
"""


def mixture_plan(
    docs: DataFrame, target_weights: dict[str, int], strata_col: str = "source"
) -> DataFrame:
    """Distributed mixture planning — :func:`mixture_fractions` as ONE plan
    over the corpus (no driver-side counts dict): given relative integer
    ``target_weights`` per stratum, compute the largest feasible downsampled
    mixture realizing those proportions and each stratum's keep rate.

    All arithmetic is integer (ppm scale, both engines truncate division
    toward zero), so the plan is oracle-checkable: ``t = min(n_rows * 1e6
    div w)`` is the feasible mixture size in ppm-of-weight units;
    ``planned = t * w div 1e6`` never exceeds ``n_rows``.  The stratum
    count aggregate is the only shuffle (map-side combined to one row per
    stratum); weights ride as a broadcast VALUES literal.  Returns
    (stratum, n_rows, weight, planned_rows, keep_ppm).

    Weights are small relative integers; ppm scaling bounds n_rows at
    ~9e12 per stratum before int64 overflow — repartition the scale if a
    single stratum exceeds that.
    """
    spark = docs.sparkSession
    vals = ", ".join(f"('{k}', {int(v)})" for k, v in sorted(target_weights.items()))
    w = spark.sql(
        f"SELECT stratum, CAST(weight AS BIGINT) weight "
        f"FROM VALUES {vals} AS t(stratum, weight)"
    )
    counts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    j = counts.join(F.broadcast(w), "stratum")
    t = j.select(F.expr("n_rows * 1000000 div weight").alias("t")).agg(
        F.min("t").alias("t_min")
    )
    return j.crossJoin(F.broadcast(t)).select(
        "stratum",
        "n_rows",
        "weight",
        F.expr("t_min * weight div 1000000").cast("bigint").alias("planned_rows"),
        F.expr("(t_min * weight div 1000000) * 1000000 div n_rows")
        .cast("bigint")
        .alias("keep_ppm"),
    )


MIXTURE_PLAN_SQL_TEMPLATE = """
WITH w(stratum, weight) AS (VALUES {values}),
counts AS (
    SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents GROUP BY source
),
j AS (
    SELECT c.stratum, c.n_rows, CAST(w.weight AS BIGINT) AS weight
    FROM counts c JOIN w ON w.stratum = c.stratum
),
t AS (SELECT MIN(n_rows * 1000000 // weight) AS t_min FROM j)
SELECT j.stratum, j.n_rows, j.weight,
       CAST(t.t_min * j.weight // 1000000 AS BIGINT) AS planned_rows,
       CAST((t.t_min * j.weight // 1000000) * 1000000 // j.n_rows AS BIGINT) AS keep_ppm
FROM j CROSS JOIN t
"""


def source_caps(
    docs: DataFrame,
    cap: int,
    strata_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document quota (RefinedWeb/CCNet-style domain caps): keep at
    most ``cap`` documents per stratum, preferring larger ``order_col`` (a
    quality proxy), ties broken by ``id_col``.

    Caps are how web-scale corpora stop a handful of template-heavy domains
    from dominating the mix.  The ranking window runs on a SLIM projection
    (stratum, order, id) — the shuffle never carries document text; callers
    re-attach payload columns by semi-joining the returned ids.  Stratum is
    the partition key, so skew is bounded by the largest single domain (salt
    the stratum if one domain exceeds an executor's share).
    """
    w = Window.partitionBy(strata_col).orderBy(F.desc(order_col), F.asc(id_col))
    slim = docs.select(id_col, strata_col, order_col)
    return (
        slim.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= cap)
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col(order_col).cast("bigint").alias(order_col),
            "rk",
        )
    )


SOURCE_CAPS_SQL_TEMPLATE = """
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rk
    FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= {cap}
"""


def token_budget_select(
    docs: DataFrame,
    budget: int,
    token_col_expr: str = "size(split(text, ' '))",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the highest-scoring documents whose cumulative token count fits a
    corpus budget — WITHOUT a global sort.

    Semantically: order by (score DESC, id), keep every doc whose running
    token total (including itself) is <= ``budget``.  A naive global window
    funnels the corpus through one task; this is the two-phase shape that
    holds at 100 TB:

    1. aggregate (n_docs, sum_tokens) per score value — a relation the size
       of the score's cardinality (bounded: scores are bucketed ints), then a
       window cumsum over THAT tiny relation finds each score group's
       starting offset;
    2. score groups that fit wholly are kept with a broadcast join; only the
       single boundary score group runs a per-doc cumsum window, partitioned
       by its (constant) score — a partition of one group, not the corpus.

    The output (doc_id, score, n_tokens, cum_tokens) is bit-identical to the
    naive global-window SQL, so the oracle stays a plain window query.
    """
    slim = docs.selectExpr(
        f"{id_col} AS doc_id",
        f"CAST({score_col} AS BIGINT) AS score",
        f"CAST({token_col_expr} AS BIGINT) AS n_tokens",
    )
    per_score = slim.groupBy("score").agg(F.sum("n_tokens").alias("g_tokens"))
    # tiny relation (|distinct scores|): global window here is deliberate
    wc = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    offsets = per_score.select(
        "score",
        (F.sum("g_tokens").over(wc) - F.col("g_tokens")).alias("cum_before"),
        (F.sum("g_tokens").over(wc)).alias("cum_through"),
    )
    joined = slim.join(F.broadcast(offsets), "score")
    whole = joined.filter(F.col("cum_through") <= budget).select(
        "doc_id",
        "score",
        "n_tokens",
        (
            F.col("cum_before")
            + F.sum("n_tokens").over(
                Window.partitionBy("score")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("cum_tokens"),
    )
    boundary = (
        joined.filter((F.col("cum_before") < budget) & (F.col("cum_through") > budget))
        .withColumn(
            "cum_tokens",
            F.col("cum_before")
            + F.sum("n_tokens").over(
                Window.partitionBy("score")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )
    return whole.unionAll(boundary)


TOKEN_BUDGET_SELECT_SQL_TEMPLATE = """
WITH t AS (
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS score,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, score, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM t
)
SELECT doc_id, score, n_tokens, cum_tokens
FROM c
WHERE cum_tokens <= {budget}
"""


def stratified_exact_n(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``n`` rows per stratum (or all of a smaller stratum), drawn by
    deterministic content-hash order — the reproducible twin of per-stratum
    reservoir sampling.

    ``stratified_sample`` (Bernoulli) only hits ``n`` in expectation; exact
    quotas need a rank.  Ranking by ``md5(id || salt)`` instead of a random
    number keeps the draw a pure function of the key: stable across runs,
    partitionings, and engines (the DuckDB oracle reproduces it bit-for-bit),
    and a different ``salt`` yields an independent draw.  Like
    :func:`source_caps` the window ranks a slim (id, stratum, hash)
    projection — one shuffle keyed on the stratum, no payload columns.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary"))
    w = Window.partitionBy(strata_col).orderBy("h4", id_col)
    return (
        df.select(F.col(id_col), F.col(strata_col), h.alias("h4"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= n_per_stratum)
        .select(id_col, strata_col, "rk")
    )


STRATIFIED_EXACT_N_SQL_TEMPLATE = """
WITH hashed AS (
    SELECT doc_id, source,
           md5(CAST(doc_id AS VARCHAR) || '{salt}') AS h4
    FROM documents
),
ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h4, doc_id) AS rk
    FROM hashed
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= {n}
"""


def temperature_mixture(
    docs: DataFrame, budget: int, strata_col: str = "source"
) -> DataFrame:
    """Temperature-flattened sampling mixture (the multilingual-training
    alpha-sampling rule, alpha = 0.5): sampling weight per stratum is
    ``sqrt(count)`` instead of ``count``, boosting low-resource strata
    relative to head domains, then a document ``budget`` is apportioned by
    the normalized weights and clamped to availability.

    alpha = 0.5 specifically because ``sqrt`` is IEEE correctly-rounded in
    both engines (general ``pow`` is not), so one ``ROUND(sqrt(c)*1000)``
    per stratum is the single float step — everything after is int64 ppm
    arithmetic with truncating division, oracle-exact.  Other temperatures
    would chain sqrt (alpha = 0.25) or swap in pow at the cost of the
    value-hash guarantee.

    One map-side-combined count shuffle (rows = #strata); the normalization
    total rides back as a broadcast.  Returns
    (stratum, n_rows, w_milli, p_ppm, planned_rows).
    """
    counts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    w = counts.select(
        "stratum",
        "n_rows",
        F.round(F.sqrt(F.col("n_rows").cast("double")) * 1000, 0)
        .cast("bigint")
        .alias("w_milli"),
    )
    tot = w.agg(F.sum("w_milli").alias("tw"))
    p = w.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "w_milli",
        F.expr("(w_milli * 1000000) div tw").cast("bigint").alias("p_ppm"),
    )
    return p.select(
        "stratum",
        "n_rows",
        "w_milli",
        "p_ppm",
        F.least(F.col("n_rows"), F.expr(f"(p_ppm * {int(budget)}) div 1000000"))
        .cast("bigint")
        .alias("planned_rows"),
    )


TEMPERATURE_MIXTURE_SQL_TEMPLATE = """
WITH counts AS (
    SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents GROUP BY source
),
w AS (
    SELECT stratum, n_rows,
           CAST(ROUND(SQRT(CAST(n_rows AS DOUBLE)) * 1000, 0) AS BIGINT) AS w_milli
    FROM counts
),
tot AS (SELECT SUM(w_milli) AS tw FROM w),
p AS (
    SELECT stratum, n_rows, w_milli,
           CAST((w_milli * 1000000) // tw AS BIGINT) AS p_ppm
    FROM w CROSS JOIN tot
)
SELECT stratum, n_rows, w_milli, p_ppm,
       CAST(LEAST(n_rows, (p_ppm * {budget}) // 1000000) AS BIGINT) AS planned_rows
FROM p
"""


def hash_split(
    df: DataFrame,
    key_col: str,
    val_ppm: int = 50_000,
    test_ppm: int = 50_000,
    salt: str = "",
    strata_col: str = "source",
) -> DataFrame:
    """Deterministic train/val/test assignment + per-(split, stratum) audit.

    The split is a pure function of ``md5(key || salt)`` — stable across
    engines, runs, partitionings, and REGROWING corpora (a document keeps
    its split when new data arrives; no reshuffling of held-out sets, the
    property seeded randomSplit cannot give).  The first 24 hash bits map
    to [0, 16^6) and route: ``< val`` -> val, ``< val+test`` -> test, else
    train.  Executor-local assignment (no shuffle); the audit rollup is one
    tiny aggregate.  Returns (split, stratum, n_docs, n_chars).
    """
    h6 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)).cast("binary")),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    scale = 16**6
    val_thr = val_ppm * scale // 1_000_000
    test_thr = (val_ppm + test_ppm) * scale // 1_000_000
    split = (
        F.when(h6 < val_thr, F.lit("val"))
        .when(h6 < test_thr, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        df.select(
            split.alias("split"),
            F.col(strata_col).alias("stratum"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .groupBy("split", "stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "stratum")
    )


HASH_SPLIT_SQL_TEMPLATE = """
WITH assigned AS (
    SELECT source AS stratum, n_chars,
           CASE WHEN h6 < {val_thr} THEN 'val'
                WHEN h6 < {test_thr} THEN 'test'
                ELSE 'train' END AS split
    FROM (
        SELECT *, CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 6) AS BIGINT) AS h6
        FROM documents
    )
)
SELECT split, stratum, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY split, stratum
ORDER BY split, stratum
"""


def training_order(
    df: DataFrame, key_col: str, epoch: int = 0, id_out: str = "doc_id"
) -> DataFrame:
    """Deterministic global training-data permutation for one epoch: rank
    every document by ``md5(key || epoch)`` (ties by key).  Epoch-salted, so
    each epoch is an independent reshuffle reproducible on any cluster.

    The rank is two-phase (``bucketed_rank``), NOT a global window — a
    ``row_number() OVER (ORDER BY h)`` would plan as
    ``Window + Exchange SinglePartition`` and funnel the whole corpus
    through one task.  The md5 hex prefix is the bucket key (4096 uniform
    buckets by construction), so each task ranks ~1/4096 of the corpus and
    the only single-partition work is the 4096-row offsets relation.
    Output carries (rank, key) only — the 16-byte-per-row shuffle; writers
    join text back by key or write per-bucket ``sortWithinPartitions``
    files.
    """
    from ..operators.twophase import bucketed_rank, md5_bucket

    h = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#e{epoch}")).cast("binary")
    )
    slim = df.select(F.col(key_col).alias(id_out), h.alias("h"))
    return bucketed_rank(
        slim, md5_bucket(F.col("h"), 3), [F.col("h"), F.col(id_out)]
    ).select("rank", id_out)


TRAINING_ORDER_SQL_TEMPLATE = """
SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '#e{epoch}'), doc_id
       ) AS BIGINT) AS rank,
       doc_id
FROM documents
"""


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (FastCDC/Rabin style, token granularity): a
    chunk boundary opens wherever the token's own hash starts with a zero
    nibble (P=1/16 -> ~16-token expected chunks), so an insertion early in a
    document shifts only the chunk it lands in — every later boundary
    re-anchors on content, unlike fixed-stride chunking where one edit
    re-chunks the whole tail.  The dedup-friendly chunking for storage and
    embedding caches.

    Returns (doc_id, chunk_id, chunk_text, n_chunk_tokens), chunk_id dense
    from 1.  Plan: pure per-row array expressions — boundary positions via
    ``filter`` over the position sequence, chunk extents by zipping each
    boundary with its successor, one ``posexplode``.  No shuffle, no window:
    a running chunk counter would need per-doc state, but pairing each
    boundary with the NEXT boundary gives the same extents statelessly.
    Token array and boundary list are bound in their own projections
    (higher-order-function bodies are interpreted per element — an inline
    ``split`` would re-tokenize per position).
    """
    base = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    bounded = base.select(
        id_col,
        "t",
        F.expr(
            "filter(sequence(1, size(t)), "
            "p -> p = 1 OR substring(md5(cast(element_at(t, p) as binary)), 1, 1) = '0')"
        ).alias("bs"),
    )
    spans = bounded.select(
        id_col,
        "t",
        F.expr(
            "arrays_zip(bs, concat(slice(bs, 2, size(bs) - 1), "
            "array(size(t) + 1)))"
        ).alias("spans"),
    )
    exploded = spans.select(
        id_col, "t", F.posexplode("spans").alias("i", "span")
    )
    start = F.col("span.bs").cast("int")
    n_toks = (F.col("span.1") - F.col("span.bs")).cast("int")
    return exploded.select(
        F.col(id_col),
        (F.col("i") + 1).cast("bigint").alias("chunk_id"),
        F.array_join(F.slice("t", start, n_toks), " ").alias("chunk_text"),
        n_toks.cast("bigint").alias("n_chunk_tokens"),
    )


CDC_CHUNKS_SQL = """
WITH t AS (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents),
b AS (
    SELECT doc_id, toks,
           list_filter(range(1, LEN(toks) + 1),
                       p -> p = 1 OR substr(md5(toks[p]), 1, 1) = '0') AS bs
    FROM t
),
z AS (
    SELECT doc_id, toks, bs,
           list_concat(bs[2:], [CAST(LEN(toks) + 1 AS BIGINT)]) AS ns,
           unnest(range(1, LEN(bs) + 1)) AS i
    FROM b
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       array_to_string(toks[bs[i] : ns[i] - 1], ' ') AS chunk_text,
       CAST(ns[i] - bs[i] AS BIGINT) AS n_chunk_tokens
FROM z
"""


def pack_positions(
    docs: DataFrame,
    capacity: int = 256,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Packed-sequence POSITION layout: extend :func:`pack_documents`'s bin
    assignment with each document's start offset inside its bin — the
    numbers a training loader needs to build attention-mask boundaries and
    position ids for packed batches.

    One additional window keyed on (source, bin) over the already-slim
    pack relation: start = running token sum within the bin minus own
    length.  All integer arithmetic.
    """
    packed = pack_documents(
        docs, capacity=capacity, token_col=token_col, id_col=id_col, part_col=part_col
    )
    w = (
        Window.partitionBy(part_col, "bin_id")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return packed.select(
        id_col,
        part_col,
        "bin_id",
        "packed_tokens",
        (F.sum("packed_tokens").over(w) - F.col("packed_tokens"))
        .cast("bigint")
        .alias("start_pos"),
    ).orderBy(part_col, "bin_id", id_col)


PACK_POSITIONS_SQL_TEMPLATE = """
WITH packed AS ({pack})
SELECT doc_id, source, bin_id, packed_tokens,
       CAST(SUM(packed_tokens) OVER (
                PARTITION BY source, bin_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - packed_tokens AS BIGINT) AS start_pos
FROM packed
ORDER BY source, bin_id, doc_id
"""


def weighted_sample(
    docs: DataFrame,
    n: int = 50,
    weight_expr: str = "size(split(text, ' '))",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
    each item draws priority ``ln(u) / w`` from a content-hash uniform
    ``u`` and the top-``n`` priorities win — inclusion probability
    proportional to weight, one pass, fully parallel, and reproducible
    (the draw is a pure function of the key, like :func:`hash_sample`).
    The standard size-proportional corpus draw (longer documents more
    likely, no source ever certain).

    Exactness: ``u`` is an md5-derived integer mapped through ONE division,
    and the priority is one ln + one division of identical operands — same
    IEEE result in any engine, so the selected set and ranking hash-match.
    The top-n is a single global window over (priority, id) pairs — slim at
    any corpus size; at extreme scale pre-filter with a per-partition
    top-n before the global one.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    w_col = F.expr(weight_expr).cast("bigint")
    scored = docs.select(
        F.col(id_col),
        w_col.alias("weight"),
        (F.log(u) / w_col).alias("priority"),
    )
    win = Window.orderBy(F.desc("priority"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= n)
        .select("rank", id_col, "weight")
    )


WEIGHTED_SAMPLE_SQL_TEMPLATE = """
WITH scored AS (
    SELECT doc_id,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS weight,
           LN((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'),
                                      1, 8) AS BIGINT) + 1) / 4294967296.0)
               / CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS priority
    FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS BIGINT)
           AS rank,
       doc_id, weight
FROM scored
QUALIFY rank <= {n}
"""


def curriculum_order(docs: DataFrame, n_buckets: int = 4) -> DataFrame:
    """Curriculum training order: documents ranked easy→hard by quality
    bucket (frozen classifier logit quartiles — NTILE with doc_id
    tie-break, deterministic), shuffled WITHIN each bucket by content hash
    (so each difficulty stage is internally order-free but the stage
    sequence is fixed) — the standard curriculum-learning data layout.

    Output ships (rank, doc_id, bucket) only; payloads re-attach by join at
    write time.  NTILE quartile 1 = highest logits (easiest) so rank 1
    starts the curriculum.

    Both total orders are two-phase (no partition-less window over the doc
    relation): the NTILE rides a quantized-logit bucket (milli-logits, 64-
    wide bands — bounded domain by the classifier's construction), and the
    final rank rides (bucket, md5-prefix) — 256 uniform sub-buckets per
    curriculum stage.
    """
    from ..ext.textstats import quality_classifier
    from ..operators.twophase import bucketed_ntile, bucketed_rank

    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    # materialize both passes: the classifier pipeline (ntile input) and the
    # ntile output (rank input — rescanning it would re-run the first
    # window) are each checkpointed once as slim per-doc relations.
    bucketed = bucketed_ntile(
        scored,
        F.expr("-logit_milli DIV 64"),
        [F.desc("logit_milli"), F.asc("doc_id")],
        n_buckets,
        "bucket",
        materialize=True,
    ).select("doc_id", "bucket")
    h = F.md5(F.concat(F.lit("curriculum:"), F.col("doc_id").cast("string")))
    with_h = bucketed.withColumn("h", h)
    # zero-padded stage + hash prefix: lexicographic == (bucket, h) order.
    # Pad width sized from n_buckets — Spark's lpad TRUNCATES strings longer
    # than the width, so a fixed 2 would fold tile '100' into '10' and
    # silently corrupt the order for n_buckets >= 100 (ADVICE r5).
    pad = len(str(n_buckets))
    bk = F.concat(
        F.lpad(F.col("bucket").cast("string"), pad, "0"), F.substring("h", 1, 2)
    )
    return (
        bucketed_rank(
            with_h,
            bk,
            [F.asc("bucket"), F.asc("h"), F.asc("doc_id")],
            materialize=True,
        )
        .select("rank", "doc_id", "bucket")
        .orderBy("rank")
    )


CURRICULUM_ORDER_SQL_TEMPLATE = """
WITH scored AS ({quality_sql}),
bucketed AS (
    SELECT doc_id,
           CAST(NTILE({n_buckets}) OVER (ORDER BY logit_milli DESC, doc_id ASC)
                AS BIGINT) AS bucket
    FROM scored
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bucket ASC,
                               md5('curriculum:' || CAST(doc_id AS VARCHAR)) ASC,
                               doc_id ASC) AS BIGINT) AS rank,
       doc_id, bucket
FROM bucketed
ORDER BY rank
"""


def pack_efficiency(
    docs: DataFrame, capacity: int, token_col: str = "n_tokens",
    id_col: str = "doc_id", part_col: str | None = "source",
) -> DataFrame:
    """Packing-efficiency audit of :func:`pack_documents`: bins bucketed by
    utilization decile (fill/capacity) with bin/doc/token mass per bucket —
    the number that decides whether the one-pass start-offset binning is
    good enough or a sort-by-length pre-pass is worth its shuffle (low
    fill = padding waste = wasted FLOPs at training time)."""
    packed = pack_documents(docs, capacity, token_col, id_col, part_col)
    keys = ["bin_id"] + ([part_col] if part_col else [])
    per_bin = packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("packed_tokens").alias("fill"),
    )
    util = F.expr(f"LEAST(9, fill * 10 DIV {capacity})")
    return (
        per_bin.groupBy(util.cast("bigint").alias("util_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("fill").alias("tokens"),
        )
        .select(
            "util_decile",
            F.col("n_bins").cast("bigint").alias("n_bins"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("tokens").cast("bigint").alias("tokens"),
        )
        .orderBy("util_decile")
    )


PACK_EFFICIENCY_SQL_TEMPLATE = """
WITH packed AS ({pack_sql}),
per_bin AS (
    SELECT source, bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(packed_tokens) AS BIGINT) AS fill
    FROM packed GROUP BY source, bin_id
)
SELECT CAST(LEAST(9, fill * 10 // {capacity}) AS BIGINT) AS util_decile,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(fill) AS BIGINT) AS tokens
FROM per_bin
GROUP BY 1 ORDER BY util_decile
"""


def upsample_realize(
    docs: DataFrame,
    copies_ppm: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Realize an UPSAMPLING plan: each stratum's docs replicate
    ``copies_ppm/10⁶`` times in expectation — integer copies for everyone
    plus one extra copy gated on a content hash for the fractional part
    (epoch-stable: the same doc always gets the same extra-copy decision).
    The other half of mixture planning: downsampling keeps a subset,
    UPsampling replicates underrepresented domains (data-mixing recipes
    express both as per-domain multipliers).

    Output (doc_id, copy_id) — a narrow sequence explode, no shuffle; at
    write time copies materialize as repeated rows (or a weight column if
    the trainer supports it — :func:`soft_dedup_weights`' inverse).
    """
    whole = {k: v // 1_000_000 for k, v in copies_ppm.items()}
    frac = {k: v % 1_000_000 for k, v in copies_ppm.items()}
    whole_case = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(w))
            for k, w in whole.items()
        ],
        F.lit(0),
    )
    frac_case = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(fv))
            for k, fv in frac.items()
        ],
        F.lit(0),
    )
    h6 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("upsample:"), F.col(id_col).cast("string"))), 1, 6
        ),
        16,
        10,
    ).cast("bigint")
    # extra-copy gate fully in the integer hash domain:
    # h6 < frac·16⁶/10⁶  (both engines floor the threshold identically)
    n_copies = whole_case.cast("bigint") + (
        h6 * F.lit(1_000_000) < frac_case.cast("bigint") * F.lit(16**6)
    ).cast("bigint")
    base = docs.select(
        id_col,
        F.col(strata_col),
        n_copies.cast("int").alias("nc"),
    ).filter(F.col("nc") > 0)
    return base.select(
        id_col,
        F.explode(F.expr("sequence(1, nc)")).alias("copy_id"),
    ).select(
        id_col, F.col("copy_id").cast("bigint").alias("copy_id")
    ).orderBy(id_col, "copy_id")


def upsample_realize_sql(copies_ppm: dict[str, int]) -> str:
    """DuckDB oracle for :func:`upsample_realize` (same integer hash gate)."""
    whole_case = "CASE source " + " ".join(
        f"WHEN '{k}' THEN {v // 1_000_000}" for k, v in copies_ppm.items()
    ) + " ELSE 0 END"
    frac_case = "CASE source " + " ".join(
        f"WHEN '{k}' THEN {v % 1_000_000}" for k, v in copies_ppm.items()
    ) + " ELSE 0 END"
    return f"""
WITH base AS (
    SELECT doc_id,
           ({whole_case})
           + CASE WHEN CAST('0x' || substring(
                     md5('upsample:' || CAST(doc_id AS VARCHAR)), 1, 6)
                     AS BIGINT) * 1000000
                  < CAST(({frac_case}) AS BIGINT) * 16777216
                  THEN 1 ELSE 0 END AS nc
    FROM documents
)
SELECT doc_id, CAST(u.i AS BIGINT) AS copy_id
FROM base, UNNEST(range(1, nc + 1)) AS u(i)
WHERE nc > 0
ORDER BY doc_id, copy_id
"""


def sample_bias_audit(
    docs: DataFrame, fraction: float = 0.25, strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sampler-neutrality audit: the stratum mix of a hash sample vs the
    full corpus, with the ppm delta — a content-hash sampler must NOT
    skew composition (a skew here means the hash and the stratum are
    correlated, i.e. someone sampled on a non-uniform key).  Two tiny
    rollups over one scan + the sample's rescan."""
    full = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_full"))
    samp = hash_sample(docs, id_col, fraction).groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_samp")
    )
    tf = full.agg(F.sum("n_full").alias("tf"))
    ts = samp.agg(F.sum("n_samp").alias("ts"))
    return (
        full.join(samp, strata_col, "left")
        .crossJoin(F.broadcast(tf))
        .crossJoin(F.broadcast(ts))
        .select(
            strata_col,
            F.col("n_full").cast("bigint").alias("n_full"),
            F.coalesce(F.col("n_samp"), F.lit(0)).cast("bigint").alias("n_samp"),
            F.expr("n_full * 1000000 DIV tf").alias("full_ppm"),
            F.expr(
                "COALESCE(n_samp, 0) * 1000000 DIV GREATEST(1, ts)"
            ).alias("sample_ppm"),
            F.expr(
                "ABS(COALESCE(n_samp, 0) * 1000000 DIV GREATEST(1, ts) "
                "- n_full * 1000000 DIV tf)"
            ).cast("bigint").alias("skew_ppm"),
        )
        .orderBy(strata_col)
    )


SAMPLE_BIAS_SQL_TEMPLATE = """
WITH samp_docs AS (
    SELECT * FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR) || ''), 1, 4) < '{thr}'
),
full_mix AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_full FROM documents
    GROUP BY source
),
samp_mix AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_samp FROM samp_docs
    GROUP BY source
),
tf AS (SELECT CAST(SUM(n_full) AS BIGINT) AS tf FROM full_mix),
ts AS (SELECT CAST(SUM(n_samp) AS BIGINT) AS ts FROM samp_mix)
SELECT f.source, f.n_full,
       CAST(COALESCE(s.n_samp, 0) AS BIGINT) AS n_samp,
       CAST(f.n_full * 1000000 // tf.tf AS BIGINT) AS full_ppm,
       CAST(COALESCE(s.n_samp, 0) * 1000000 // GREATEST(1, ts.ts) AS BIGINT)
           AS sample_ppm,
       CAST(ABS(COALESCE(s.n_samp, 0) * 1000000 // GREATEST(1, ts.ts)
                - f.n_full * 1000000 // tf.tf) AS BIGINT) AS skew_ppm
FROM full_mix f
LEFT JOIN samp_mix s USING (source)
CROSS JOIN tf CROSS JOIN ts
ORDER BY f.source
"""


def chunk_inflation_report(
    docs: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Overlap-inflation accounting for sliding-window chunking: total
    chunk tokens vs original tokens (the storage/compute multiplier every
    overlapping chunker silently buys — window/stride of 64/48 costs
    ~1.33× and this query shows the EXACT factor on this corpus, where
    short docs chunk without overlap and dilute it).  One narrow chunk
    pass, one corpus-level row."""
    from .sampling import chunk_documents  # self-import safe at call time

    chunks = chunk_documents(docs, window=window, stride=stride)
    c = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("chunk_tokens"),
    )
    # token grain matches the chunker's single-space split exactly
    d = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nt")
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("doc_tokens"))
    return (
        c.crossJoin(d)
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.col("doc_tokens").cast("bigint").alias("doc_tokens"),
            F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
            F.expr("chunk_tokens * 1000000 DIV doc_tokens").alias(
                "inflation_ppm"
            ),
        )
    )


CHUNK_INFLATION_SQL_TEMPLATE = """
WITH chunks AS ({chunk_sql}),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS chunk_tokens
    FROM chunks
),
d AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STR_SPLIT(text, ' '))) AS BIGINT) AS doc_tokens
    FROM documents
)
SELECT n_docs, n_chunks, doc_tokens, chunk_tokens,
       CAST(chunk_tokens * 1000000 // doc_tokens AS BIGINT) AS inflation_ppm
FROM c CROSS JOIN d
"""


def preference_pairs(docs: DataFrame) -> DataFrame:
    """DPO/RLHF PREFERENCE-PAIR MINING (staged r12): within each prompt
    group — here (source, lang), the grouping a real pipeline would key
    by prompt id — pick the highest- and lowest-scoring responses as the
    (chosen, rejected) pair, with a deterministic total order so the
    pairs are reproducible run-to-run and engine-to-engine: score =
    alphabetic character count (integer, cross-engine bit-identical),
    ties broken by doc_id.  Groups with fewer than two documents or zero
    margin yield no pair (a tie teaches the reward model nothing).

    Scale shape: one hash shuffle on the group key, two windowed
    rank-1 picks inside each group, no self-join and no text movement —
    at 100 TB the shuffle carries (group, score, id), and text is only
    read in the scoring projection.  This is the construction step for
    DPO datasets (Rafailov et al., 2023) over scored candidate pools."""
    scored = docs.select(
        "source", "lang", "doc_id",
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).alias(
            "score"
        ),
    )
    w_best = Window.partitionBy("source", "lang").orderBy(
        F.col("score").desc(), F.col("doc_id").desc()
    )
    w_worst = Window.partitionBy("source", "lang").orderBy(
        F.col("score").asc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "*",
        F.row_number().over(w_best).alias("__rb"),
        F.row_number().over(w_worst).alias("__rw"),
        F.count(F.lit(1)).over(
            Window.partitionBy("source", "lang")
        ).alias("n_candidates"),
    )
    best = ranked.filter("__rb = 1").select(
        "source", "lang",
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
    )
    worst = ranked.filter("__rw = 1").select(
        "source", "lang",
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, ["source", "lang"])
        .filter("n_candidates >= 2 AND chosen_score > rejected_score")
        .select(
            "source", "lang", "chosen_id", "rejected_id",
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("bigint").alias("margin"),
            "n_candidates",
        )
        .orderBy("source", "lang")
    )


PREFERENCE_PAIRS_SQL = """
WITH scored AS (
    SELECT source, lang, doc_id,
           CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS score
    FROM documents
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY source, lang
                              ORDER BY score DESC, doc_id DESC) AS rb,
           ROW_NUMBER() OVER (PARTITION BY source, lang
                              ORDER BY score ASC, doc_id ASC) AS rw,
           COUNT(*) OVER (PARTITION BY source, lang) AS n_candidates
    FROM scored
)
SELECT b.source, b.lang,
       b.doc_id AS chosen_id, w.doc_id AS rejected_id,
       CAST(b.score - w.score AS BIGINT) AS margin,
       CAST(b.n_candidates AS BIGINT) AS n_candidates
FROM (SELECT * FROM ranked WHERE rb = 1) b
JOIN (SELECT * FROM ranked WHERE rw = 1) w
  ON b.source = w.source AND b.lang = w.lang
WHERE b.n_candidates >= 2 AND b.score > w.score
ORDER BY b.source, b.lang
"""


def span_corruption_plan(
    docs: DataFrame, span_len: int = 4, rate: int = 5
) -> DataFrame:
    """T5-style SPAN-CORRUPTION planning (staged r12): per source, how
    many tokens a span-corruption pretraining objective would mask —
    spans are ``span_len``-token blocks selected DETERMINISTICALLY by the
    md5-prefix hash of (doc_id, block) mod ``rate`` (expected corruption
    1/rate), so the plan is reproducible run-to-run and engine-to-engine
    (no RNG; the same hash-as-randomness discipline as the hash split).

    Scale shape: the explode is over BLOCK indices (n_tokens / span_len
    per doc), never tokens or text; the only shuffle is the per-source
    aggregation of integer counts.  Output: per-source doc/token/span/
    masked counts plus corruption_ppm (integer micro-units)."""
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n"),
    )
    n_blocks = F.floor((F.col("n") + span_len - 1) / span_len).cast("long")
    blocks = toks.select(
        "doc_id",
        "source",
        "n",
        F.explode(F.sequence(F.lit(0), n_blocks - 1)).alias("blk"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("blk").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    masked = blocks.filter(F.pmod(h, F.lit(rate)) == 0).select(
        "source",
        F.least(F.lit(span_len), F.col("n") - F.col("blk") * span_len).alias("m"),
    )
    base = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    )
    ms = masked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("m").cast("bigint").alias("masked_tokens"),
    )
    return (
        base.join(ms, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce(F.col("masked_tokens"), F.lit(0))
            .cast("bigint").alias("masked_tokens"),
            F.expr(
                "coalesce(masked_tokens, 0) * 1000000 DIV total_tokens"
            ).alias("corruption_ppm"),
        )
        .orderBy("source")
    )


SPAN_CORRUPTION_SQL_TEMPLATE = """
WITH toks AS (
    SELECT doc_id, source,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n
    FROM documents
),
blocks AS (
    SELECT doc_id, source, n,
           unnest(range(0, (n + {span_len} - 1) // {span_len})) AS blk
    FROM toks
),
masked AS (
    SELECT source, LEAST({span_len}, n - blk * {span_len}) AS m
    FROM blocks
    WHERE CAST('0x' || substring(
              md5(CAST(doc_id AS VARCHAR) || ':' || CAST(blk AS VARCHAR)),
              1, 8) AS BIGINT) % {rate} = 0
),
base AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM toks GROUP BY source
),
ms AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(m) AS BIGINT) AS masked_tokens
    FROM masked GROUP BY source
)
SELECT base.source, n_docs, total_tokens,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(masked_tokens, 0) AS masked_tokens,
       CAST(COALESCE(masked_tokens, 0) * 1000000 // total_tokens AS BIGINT)
           AS corruption_ppm
FROM base LEFT JOIN ms ON base.source = ms.source
ORDER BY base.source
"""


# The GRPO advantage quotient over pre-aggregated group stats (n bigint,
# s = Σr and q = Σr² as decimal(38,0), score int/bigint).  Module-level so
# the overflow-widening test can drive it with hand-built near-int64-max
# stats without re-deriving the algebra (ADVICE r12: the int64 form
# silently wrapped where the oracle's HUGEINT did not).
_ADV_PPM_EXPR = (
    "CAST((CAST(n AS DECIMAL(38,0)) * score - s) * 1000000 DIV "
    "GREATEST(CAST(FLOOR(SQRT(CAST(CAST(n AS DECIMAL(38,0)) * q "
    "- s * s AS DOUBLE))) AS BIGINT), 1) AS BIGINT)"
)


def group_advantages(docs: DataFrame) -> DataFrame:
    """GRPO-style GROUP-RELATIVE ADVANTAGES (Shao et al. 2024's
    group-relative policy optimization, the critic-free normalization):
    within each prompt group — the same (source, lang) grouping and
    deterministic integer score as :func:`preference_pairs`, so the two
    ops describe the same candidate pools — every response's advantage is
    its score centered and scaled by the GROUP's own statistics:

        adv_ppm = (n·r_i − Σr) · 10^6  DIV  max(⌊√(n·Σr² − (Σr)²)⌋, 1)

    i.e. (r_i − mean)/σ in parts-per-million, kept EXACT-integer end to
    end: Σr, Σr² and every product ride decimal(38,0) (HUGEINT in the
    oracle — the kneser_ney accumulator recipe, so no group size or
    score magnitude can wrap int64), n·Σr² − (Σr)² is n²·σ² exactly,
    and the single float touch is IEEE-correctly-rounded ``sqrt`` of
    that integer, floored — bit-identical across engines (the same
    discipline as the micro-nat ln recipe).  The quotient itself is
    |r−mean|/σ·10⁶ ≲ √n·10⁶, comfortably int64.  Groups of one
    yield no row (σ undefined, the advantage teaches nothing); an
    all-equal group's σ floor of 1 sends every advantage to 0 rather
    than dividing by zero.

    Scale shape: one hash shuffle on the group key; every statistic is a
    window aggregate over it; the output carries (group, id, ints) —
    text is read only in the scoring projection, and nothing is ever
    corpus × corpus."""
    scored = docs.select(
        "source", "lang", "doc_id",
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).alias(
            "score"
        ),
    )
    g = Window.partitionBy("source", "lang")
    stats = scored.select(
        "*",
        F.count(F.lit(1)).over(g).alias("n"),
        F.sum(F.col("score").cast("decimal(38,0)")).over(g).alias("s"),
        F.sum(
            F.col("score").cast("decimal(38,0)") * F.col("score")
        ).over(g).alias("q"),
    ).filter(F.col("n") >= 2)
    return stats.select(
        "source", "lang", "doc_id",
        F.col("score").cast("bigint").alias("score"),
        F.expr(_ADV_PPM_EXPR).alias("adv_ppm"),
    ).orderBy("source", "lang", "doc_id")


GROUP_ADVANTAGES_SQL = """
WITH scored AS (
    SELECT source, lang, doc_id,
           CAST(LEN(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS score
    FROM documents
),
stats AS (
    SELECT source, lang, doc_id, score,
           COUNT(*) OVER g AS n,
           SUM(score) OVER g AS s,
           SUM(score * score) OVER g AS q
    FROM scored
    WINDOW g AS (PARTITION BY source, lang)
)
SELECT source, lang, doc_id, score,
       CAST((n * score - s) * 1000000 //
            GREATEST(CAST(FLOOR(SQRT(CAST(n * q - s * s AS DOUBLE)))
                     AS BIGINT), 1) AS BIGINT) AS adv_ppm
FROM stats
WHERE n >= 2
ORDER BY source, lang, doc_id
"""


def doremi_mix(
    docs: DataFrame,
    eta_ppm: int = 500_000,
    smoothing_ppm: int = 100_000,
    iterations: int = 3,
) -> DataFrame:
    """DOMAIN MIXTURE REWEIGHTING, DoReMi-style (Xie et al. 2023's
    group-DRO recipe: upweight domains with EXCESS loss over a
    reference, then smooth toward uniform) — the step between
    :func:`mixture_plan`'s hand-set weights and a trained proxy model.
    The published algorithm's per-round proxy loss is replaced by a
    deterministic noisiness proxy (non-alpha character rate — the same
    class of cheap quality signal the filter funnel uses), so the op is
    the exact multiplicative-weights fold on a fixed payoff:

        f_s   = (10^12 + eta·excess_s) // 10^6          (always > 0)
        w'_s  = w_s · f_s // 10^6,  then renormalize to Σ = 10^6
        final = ((10^6 − sm)·w_T + sm·uniform) // 10^6

    with loss_s = ⌊10^6·Σ nonalpha / Σ chars⌋, excess_s = loss_s −
    corpus baseline.  EVERY quantity is an integer in ppm; products
    ride Python arbitrary-precision on a SOURCES-sized collect (the
    vocab/centroid-sized driver-loop budget) and HUGEINT in the oracle;
    numerators are kept provably non-negative so floor and truncating
    division agree across engines (DuckDB ``//`` truncates toward zero,
    Python ``//`` floors — they differ BELOW zero only).

    Scale shape: one hash aggregation over (source) — two decimal(38,0)
    sums and a count per source, full codegen, text never shuffles; the
    iteration itself is O(sources × T) driver arithmetic.  Output: one
    row per source (n_docs, loss_ppm, excess_ppm, weight_ppm)."""
    per = (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.length(
                    F.regexp_replace(F.col("text"), "[a-zA-Z]", "")
                ).cast("decimal(38,0)")
            ).alias("na"),
            F.sum(F.length("text").cast("decimal(38,0)")).alias("ch"),
        )
        .collect()
    )
    if not per:
        return values_relation(
            docs.sparkSession,
            [], "source string, n_docs bigint, loss_ppm bigint, "
                "excess_ppm bigint, weight_ppm bigint"
        )
    stats = {
        r["source"]: (int(r["n_docs"]), int(r["na"]), int(r["ch"]))
        for r in per
    }
    tot_na = sum(na for _n, na, _c in stats.values())
    tot_ch = sum(c for _n, _na, c in stats.values())
    base = (tot_na * 1_000_000) // tot_ch
    loss = {s: (na * 1_000_000) // c for s, (_n, na, c) in stats.items()}
    excess = {s: loss[s] - base for s in stats}
    n = len(stats)
    w = {s: 1_000_000 // n for s in stats}
    for _t in range(int(iterations)):
        raw = {
            s: w[s] * ((10**12 + int(eta_ppm) * excess[s]) // 1_000_000)
            // 1_000_000
            for s in stats
        }
        tot = sum(raw.values())
        w = {s: (raw[s] * 1_000_000) // tot for s in stats}
    uni = 1_000_000 // n
    sm = int(smoothing_ppm)
    final = {
        s: ((1_000_000 - sm) * w[s] + sm * uni) // 1_000_000 for s in stats
    }
    rows = [
        (s, stats[s][0], loss[s], excess[s], final[s])
        for s in sorted(stats)
    ]
    return values_relation(
        docs.sparkSession,
        rows,
        "source string, n_docs bigint, loss_ppm bigint, "
        "excess_ppm bigint, weight_ppm bigint",
    ).orderBy("source")


def doremi_mix_sql(
    eta_ppm: int = 500_000,
    smoothing_ppm: int = 100_000,
    iterations: int = 3,
) -> str:
    """DuckDB oracle for :func:`doremi_mix`: the identical integer
    algebra with the multiplicative-weights rounds unrolled as CTEs
    (w0 -> w1 -> ... -> wT), HUGEINT products throughout."""
    chain = [
        "w0 AS (SELECT source, CAST(1000000 // (SELECT COUNT(*) FROM per) "
        "AS HUGEINT) AS w FROM per)"
    ]
    for t in range(1, int(iterations) + 1):
        chain.append(
            f"r{t} AS (SELECT p.source, w{t - 1}.w * "
            f"((1000000000000 + {int(eta_ppm)} * p.excess_ppm) // 1000000) "
            f"// 1000000 AS raw FROM per p JOIN w{t - 1} ON w{t - 1}.source "
            f"= p.source)"
        )
        chain.append(
            f"w{t} AS (SELECT source, raw * 1000000 // "
            f"(SELECT SUM(raw) FROM r{t}) AS w FROM r{t})"
        )
    chain_sql = ",\n".join(chain)
    T = int(iterations)
    sm = int(smoothing_ppm)
    return rf"""
WITH per0 AS (
    SELECT source, COUNT(*) AS n_docs,
           SUM(CAST(LEN(regexp_replace(text, '[a-zA-Z]', '', 'g'))
               AS HUGEINT)) AS na,
           SUM(CAST(LEN(text) AS HUGEINT)) AS ch
    FROM documents
    WHERE text IS NOT NULL AND LEN(text) > 0
    GROUP BY source
),
tot AS (SELECT SUM(na) AS tna, SUM(ch) AS tch FROM per0),
per AS (
    SELECT source, n_docs,
           na * 1000000 // ch AS loss_ppm,
           na * 1000000 // ch - (SELECT tna * 1000000 // tch FROM tot)
               AS excess_ppm
    FROM per0
),
{chain_sql}
SELECT p.source,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.loss_ppm AS BIGINT) AS loss_ppm,
       CAST(p.excess_ppm AS BIGINT) AS excess_ppm,
       CAST(((1000000 - {sm}) * w{T}.w
             + {sm} * (1000000 // (SELECT COUNT(*) FROM per)))
            // 1000000 AS BIGINT) AS weight_ppm
FROM per p JOIN w{T} ON w{T}.source = p.source
ORDER BY p.source
"""
