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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact, decontaminate
from .sampling import pack_documents
from .textstats import quality_score


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
