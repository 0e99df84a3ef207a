"""End-to-end training-data preparation pipeline — the composition the
individual ext/ operators exist for, as ONE lazy DataFrame (Catalyst sees the
whole plan and pipelines the stages):

    exact dedup (keep min-id per text)
      -> quality filter (Gopher/C4-style signals, keep score >= min_quality)
      -> benchmark decontamination (n-gram overlap anti-join)
      -> context-window packing (start-offset running-sum bins)

Every stage is deterministic and ANSI-expressible, so the WHOLE pipeline is
oracle-checked end-to-end (not just per-stage).

Scale notes: stage order matters — dedup and quality run before
decontamination so the expensive shingle join sees only surviving docs; the
final pack windows over (source) partitions, never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dedup_exact, decontaminate
from .sampling import pack_documents
from .textstats import _STOPWORD_LIST, quality_score


def training_data_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    min_quality: int = 3,
    capacity: int = 512,
    shingle_len: int = 3,
) -> DataFrame:
    """Returns (doc_id, source, packed_tokens, bin_id) for every surviving
    document, packed per source."""
    deduped = dedup_exact(docs)
    q = quality_score(deduped).filter(F.col("quality_score") >= min_quality).select("doc_id")
    quality_docs = deduped.join(q, "doc_id", "left_semi")
    clean = decontaminate(quality_docs, benchmark, shingle_len=shingle_len)
    sized = clean.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return pack_documents(sized, capacity=capacity, part_col="source").orderBy("doc_id")


TRAINING_PIPELINE_SQL_TEMPLATE = r"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id >= {split_id}),
bench AS (SELECT * FROM documents WHERE doc_id < {split_id}),
deduped AS (
    SELECT d.* FROM corpus d
    JOIN (SELECT text, MIN(doc_id) AS doc_id FROM corpus GROUP BY text) k
      ON d.doc_id = k.doc_id
),
quality AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(CAST(LENGTH(text) AS BIGINT)
                    - (CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) - 1) AS DOUBLE)
                   / CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS mean_word_len,
               CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                   / CAST(LENGTH(text) AS BIGINT) AS alpha_ratio,
               CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(STR_SPLIT(text, ' ')),
                                       {stopwords})) AS BIGINT) AS stopword_hits
        FROM deduped
    ) t
    WHERE (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1 ELSE 0 END
         + CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 1 ELSE 0 END
         + CASE WHEN alpha_ratio >= 0.6 THEN 1 ELSE 0 END
         + CASE WHEN stopword_hits >= 1 THEN 1 ELSE 0 END) >= {min_quality}
),
quality_docs AS (
    SELECT d.* FROM deduped d JOIN quality q ON d.doc_id = q.doc_id
),
bench_sh AS (
    SELECT DISTINCT s FROM (
        SELECT unnest(list_transform(
                   range(0, GREATEST(LEN(regexp_split_to_array(text, '\s+')) - {n}, 0) + 1),
                   i -> array_to_string(regexp_split_to_array(text, '\s+')[i + 1 : i + {n}], ' ')
               )) AS s
        FROM bench
    ) t WHERE s <> ''
),
contaminated AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, GREATEST(LEN(regexp_split_to_array(text, '\s+')) - {n}, 0) + 1),
                   i -> array_to_string(regexp_split_to_array(text, '\s+')[i + 1 : i + {n}], ' ')
               )) AS s
        FROM quality_docs
    ) cs WHERE s IN (SELECT s FROM bench_sh)
),
clean AS (
    SELECT doc_id, source, CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
    FROM quality_docs WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id, source,
       CAST(LEAST(n_tokens, {capacity}) AS BIGINT) AS packed_tokens,
       CAST(FLOOR((SUM(LEAST(n_tokens, {capacity})) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - LEAST(n_tokens, {capacity})) / {capacity}) AS BIGINT) AS bin_id
FROM clean
ORDER BY doc_id
"""


def filter_funnel(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pipeline funnel audit: how many documents survive each PREFIX of the
    cleaning stages (length band -> alpha ratio -> stopword evidence ->
    exact-dup canonical), in ONE aggregate pass.

    Per-stage keep/drop observability is the first thing a 100 TB curation
    run needs (a mis-tuned filter silently deleting a corpus shows up here,
    not in the output schema).  Every stage predicate is evaluated in the
    same narrow scan and combined with ``sum(case ...)`` — one job, one
    tiny result, no per-stage rescans; the only shuffle is exact dedup's
    min-id-per-text aggregate, which ships (text-hash, id) pairs only.

    Returns (stage, surviving, dropped_at_stage) ordered by stage.
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    alpha_chars = F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")
    ).cast("bigint")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORD_LIST])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))

    # project per-row flags + content hash BEFORE the dedup window, so the
    # one shuffle ships (flags, hash, id) — never the text
    pre = docs.select(
        ((n_tokens >= 10) & (n_tokens <= 100000)).alias("s1"),
        (alpha_chars * 1000 >= n_chars * 600).alias("s2"),
        (stop_hits >= 1).alias("s3"),
        F.md5(F.col(text_col).cast("binary")).alias("h"),
        F.col(id_col).alias("id"),
    )
    w_canon = Window.partitionBy("h").orderBy(F.asc("id"))
    flags = pre.select(
        "s1", "s2", "s3", (F.row_number().over(w_canon) == 1).alias("s4")
    )
    b = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("c0"),
        b(F.col("s1")).alias("c1"),
        b(F.col("s1") & F.col("s2")).alias("c2"),
        b(F.col("s1") & F.col("s2") & F.col("s3")).alias("c3"),
        b(F.col("s1") & F.col("s2") & F.col("s3") & F.col("s4")).alias("c4"),
    )
    stages = ["ingested", "length_band", "alpha_ratio", "stopword_evidence", "dedup_canonical"]
    stack = ", ".join(f"'{i}_{s}', c{i}" for i, s in enumerate(stages))
    return agg.select(
        F.expr(f"stack({len(stages)}, {stack}) AS (stage, surviving)")
    ).select(
        "stage",
        "surviving",
        (F.lag("surviving", 1).over(Window.orderBy("stage")) - F.col("surviving"))
        .cast("bigint")
        .alias("dropped_at_stage"),
    )


FILTER_FUNNEL_SQL_TEMPLATE = """
WITH flags AS (
    SELECT (n_tokens >= 10 AND n_tokens <= 100000) AS s1,
           (alpha_chars * 1000 >= n_chars * 600) AS s2,
           (stop_hits >= 1) AS s3,
           (rn = 1) AS s4
    FROM (
        SELECT CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
                   AS alpha_chars,
               LEN(LIST_INTERSECT(LIST_DISTINCT(STR_SPLIT(text, ' ')),
                                  {stopwords!r})) AS stop_hits,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        FROM documents
    ) t
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN s1 AND s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
           CAST(SUM(CASE WHEN s1 AND s2 AND s3 AND s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
    FROM flags
),
long AS (
    SELECT '0_ingested' AS stage, c0 AS surviving FROM agg
    UNION ALL SELECT '1_length_band', c1 FROM agg
    UNION ALL SELECT '2_alpha_ratio', c2 FROM agg
    UNION ALL SELECT '3_stopword_evidence', c3 FROM agg
    UNION ALL SELECT '4_dedup_canonical', c4 FROM agg
)
SELECT stage, surviving,
       CAST(LAG(surviving, 1) OVER (ORDER BY stage) - surviving AS BIGINT)
           AS dropped_at_stage
FROM long
"""


def corpus_report(docs, strata_col: str = "source"):
    """Per-source corpus curation dashboard — the one-glance report a data
    team reads before deciding caps/mixtures: document and token volume,
    mean quality score (milli-units), and the exact-duplicate rate (ppm)
    per stratum.  Composes :func:`~dbt_trill_shop_spark.ext.textstats.
    quality_score` with an md5 exact-dup count; ONE pass over the text for
    the per-doc signals, then one map-side-combined rollup keyed by the
    low-cardinality stratum — doc-level rows never leave the first shuffle.
    """
    from pyspark.sql import functions as F

    from .textstats import quality_score

    q = quality_score(docs).select("doc_id", F.col("quality_score").alias("score"))
    per_doc = docs.select(
        "doc_id",
        F.col(strata_col).alias("stratum"),
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    ).join(q, "doc_id")
    dups = (
        per_doc.groupBy("stratum", "fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("stratum")
        .agg(
            F.sum("n").alias("n_docs_fp"),
            F.sum(F.col("n") - 1).alias("n_dups"),
        )
    )
    base = per_doc.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr("sum(score) * 1000 div count(*)").cast("bigint").alias("mean_quality_milli"),
    )
    return (
        base.join(dups.select("stratum", "n_dups"), "stratum")
        .select(
            "stratum",
            "n_docs",
            "total_tokens",
            "mean_quality_milli",
            F.expr("n_dups * 1000000 div n_docs").cast("bigint").alias("dup_ppm"),
        )
        .orderBy("stratum")
    )


CORPUS_REPORT_SQL = """
WITH q AS ({quality_sql}),
per_doc AS (
    SELECT d.doc_id, d.source AS stratum,
           CAST(LEN(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS n_tokens,
           md5(d.text) AS fp, q.quality_score AS score
    FROM documents d JOIN q ON q.doc_id = d.doc_id
),
dups AS (
    SELECT stratum, CAST(SUM(n - 1) AS BIGINT) AS n_dups
    FROM (SELECT stratum, fp, COUNT(*) AS n FROM per_doc GROUP BY stratum, fp) g
    GROUP BY stratum
),
base AS (
    SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(score) * 1000 // COUNT(*) AS BIGINT) AS mean_quality_milli
    FROM per_doc GROUP BY stratum
)
SELECT base.stratum, n_docs, total_tokens, mean_quality_milli,
       CAST(n_dups * 1000000 // n_docs AS BIGINT) AS dup_ppm
FROM base JOIN dups ON base.stratum = dups.stratum
ORDER BY base.stratum
"""


def curation_pipeline_v2(docs: DataFrame) -> DataFrame:
    """Second-generation curation pipeline, composed as ONE lazy plan from
    this round's operators: lexicon blocklist → per-language adaptive
    quality cut (CCNet policy) → exact-dup groups keep their
    HIGHEST-QUALITY member → curriculum ordering of the survivors.
    Output: (rank, doc_id, lang, bucket).

    Like :func:`training_pipeline`, Catalyst sees the whole chain — the
    cheap row-local gates (blocklist, threshold) prune the input of the
    dedup window and the ranking sort, and the only exchanges carry
    (doc_id, hash, logit) slim rows.  Every stage is integer-deterministic,
    so the full four-stage composition is value-hash checkable end-to-end.

    Both total orders are two-phase (same posture as
    :func:`~dbt_trill_shop_spark.ext.sampling.curriculum_order`): the
    NTILE rides 64-wide milli-logit bands and the final rank rides
    (stage, md5-prefix) sub-buckets — no partition-less window ever sees
    the survivor relation.
    """
    from ..ext.textstats import blocklist_filter, quality_classifier
    from ..operators.twophase import bucketed_ntile, bucketed_rank

    scored = quality_classifier(docs).select("doc_id", "logit_milli")
    keep_ids = blocklist_filter(docs).filter(F.col("keep")).select("doc_id")
    base = (
        docs.select("doc_id", "lang", F.md5(F.col("text")).alias("fp"))
        .join(keep_ids, "doc_id", "left_semi")
        .join(scored, "doc_id")
    )
    thr = base.groupBy("lang").agg(
        F.expr(
            "CAST(ROUND(percentile(logit_milli, 0.25) * 4, 0) AS BIGINT)"
        ).alias("thr4")
    )
    q_kept = base.join(F.broadcast(thr), "lang").filter(
        4 * F.col("logit_milli") > F.col("thr4")
    )
    wd = Window.partitionBy("fp").orderBy(
        F.desc("logit_milli"), F.asc("doc_id")
    )
    canon = q_kept.withColumn("rn", F.row_number().over(wd)).filter(
        F.col("rn") == 1
    )
    bucketed = bucketed_ntile(
        canon.select("doc_id", "lang", "logit_milli"),
        F.expr("-logit_milli DIV 64"),
        [F.desc("logit_milli"), F.asc("doc_id")],
        4,
        "bucket",
        # canon is the full gate+dedup pipeline: checkpoint the slim
        # survivor relation once rather than re-running it per pass
        materialize=True,
    ).select("doc_id", "lang", "bucket")
    h = F.md5(F.concat(F.lit("curriculum:"), F.col("doc_id").cast("string")))
    with_h = bucketed.withColumn("h", h)
    # zero-padded stage + hash prefix: lexicographic == (bucket, h) order.
    # Width 2 is safe ONLY because the tile count is fixed at 4 above —
    # Spark's lpad truncates longer strings (see curriculum_order's
    # parameterized fix, ADVICE r5); widen the pad with the tile count if
    # this ever becomes a parameter.
    bk = F.concat(
        F.lpad(F.col("bucket").cast("string"), 2, "0"), F.substring("h", 1, 2)
    )
    return (
        bucketed_rank(
            with_h,
            bk,
            [F.asc("bucket"), F.asc("h"), F.asc("doc_id")],
            materialize=True,
        )
        .select("rank", "doc_id", "lang", "bucket")
        .orderBy("rank")
    )


def curation_pipeline_v2_sql(quality_sql: str, blocklist_sql: str) -> str:
    """DuckDB oracle: the identical four-stage chain over the composed
    classifier and blocklist SQL."""
    return f"""
WITH scored AS ({quality_sql}),
blk AS ({blocklist_sql}),
base AS (
    SELECT d.doc_id, d.lang, md5(d.text) AS fp, s.logit_milli
    FROM documents d
    JOIN scored s ON d.doc_id = s.doc_id
    JOIN blk b ON d.doc_id = b.doc_id AND b.keep
),
thr AS (
    SELECT lang,
           CAST(ROUND(quantile_cont(logit_milli, 0.25) * 4, 0) AS BIGINT)
               AS thr4
    FROM base GROUP BY lang
),
q_kept AS (
    SELECT base.* FROM base JOIN thr USING (lang)
    WHERE 4 * logit_milli > thr4
),
canon AS (
    SELECT doc_id, lang, logit_milli FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                     ORDER BY logit_milli DESC, doc_id ASC) AS rn
        FROM q_kept
    ) WHERE rn = 1
),
bucketed AS (
    SELECT doc_id, lang,
           CAST(NTILE(4) OVER (ORDER BY logit_milli DESC, doc_id ASC) AS BIGINT)
               AS bucket
    FROM canon
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bucket ASC,
                               md5('curriculum:' || CAST(doc_id AS VARCHAR)) ASC,
                               doc_id ASC) AS BIGINT) AS rank,
       doc_id, lang, bucket
FROM bucketed
ORDER BY rank
"""


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """K-ANONYMITY audit (Sweeney 2002) over quasi-identifier columns —
    the privacy-governance check a training-data release runs before
    structured records (or metadata joined to text) leave the pipeline:
    every row must be indistinguishable from at least k-1 others on the
    quasi-identifiers, else the class re-identifies its members.

    Output: one row per equivalence-CLASS SIZE — (class_size, n_classes,
    n_rows, below_k) ordered by size — the histogram an auditor reads to
    pick suppression/generalization targets.  NULL quasi values form
    their own class (SQL GROUP BY semantics, identical cross-engine).

    Scale: two map-side-combinable aggregations; the first shuffles the
    quasi-key (never payload), the second shuffles at most one row per
    distinct class size.  No window, no collect."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            (F.col("class_size") < k).alias("below_k"),
        )
        .orderBy("class_size")
    )


def k_anonymity_sql(table: str, quasi_cols: list[str], k: int = 5) -> str:
    """DuckDB oracle for :func:`k_anonymity_report`."""
    qcols = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
    SELECT {qcols}, COUNT(*) AS class_size FROM {table} GROUP BY {qcols}
)
SELECT class_size,
       COUNT(*) AS n_classes,
       class_size * COUNT(*) AS n_rows,
       class_size < {k} AS below_k
FROM classes
GROUP BY class_size
ORDER BY class_size
"""


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """L-DIVERSITY audit (Machanavajjhala et al. 2007): k-anonymity's
    complement — a large equivalence class still leaks when every member
    shares the same SENSITIVE value (homogeneity attack).  Each class
    must contain at least ``l`` distinct sensitive values.

    Output: one row per distinct-sensitive-count — (n_sensitive,
    n_classes, n_rows, below_l) ordered — with NULL sensitive values
    excluded from the distinct count (an absent value discloses
    nothing).  Same two-aggregation scale shape as the k-anonymity
    report."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
    )
    return (
        classes.groupBy("n_sensitive")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows"),
        )
        .select(
            "n_sensitive",
            "n_classes",
            "n_rows",
            (F.col("n_sensitive") < l).alias("below_l"),
        )
        .orderBy("n_sensitive")
    )


def l_diversity_sql(
    table: str, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> str:
    """DuckDB oracle for :func:`l_diversity_report`."""
    qcols = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
    SELECT {qcols}, COUNT(*) AS class_size,
           COUNT(DISTINCT {sensitive_col}) AS n_sensitive
    FROM {table} GROUP BY {qcols}
)
SELECT n_sensitive,
       COUNT(*) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       n_sensitive < {l} AS below_l
FROM classes
GROUP BY n_sensitive
ORDER BY n_sensitive
"""


def k_anonymity_customers(spark, sf_dir: str) -> DataFrame:
    """Registry-ready realization (STAGED for round 9): k-anonymity audit
    of the customer table on (c_mktsegment, c_nationkey), k=10."""
    from ..catalog import load_table

    return k_anonymity_report(
        load_table(spark, sf_dir, "customer"), ["c_mktsegment", "c_nationkey"], k=10
    )


K_ANONYMITY_CUSTOMERS_SQL = k_anonymity_sql(
    "customer", ["c_mktsegment", "c_nationkey"], k=10
)


def l_diversity_customers(spark, sf_dir: str) -> DataFrame:
    """Registry-ready realization (STAGED for round 9): l-diversity audit
    over (c_nationkey, c_custkey % 20) classes with c_mktsegment as the
    sensitive attribute, l=3."""
    from ..catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", (F.col("c_custkey") % 20).alias("kb"), "c_mktsegment"
    )
    return l_diversity_report(cust, ["c_nationkey", "kb"], "c_mktsegment", l=3)


L_DIVERSITY_CUSTOMERS_SQL = l_diversity_sql(
    "(SELECT c_nationkey, c_custkey % 20 AS kb, c_mktsegment FROM customer) t",
    ["c_nationkey", "kb"],
    "c_mktsegment",
    l=3,
)
