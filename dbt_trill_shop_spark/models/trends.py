"""The reference's 7 models, re-expressed with the DataFrame API.

- 4 staging projections (``models/staging/stg_*.sql``) -> views;
- 3 marts -> tables:
  - ``weekly_trends_summary``   (``models/marts/weekly_trends_summary.sql:1-110``)
  - ``top_terms_comparison``    (``models/marts/top_terms_comparison.sql:1-67``)
  - ``trending_terms_analysis`` (``models/marts/trending_terms_analysis.sql:1-70``)

plus the full 68-test declarative suite from the model YAMLs (SURVEY.md §5).

Spark-first notes: unions are positional (``DataFrame.union``) after
explicitly aligned selects, matching SQL UNION ALL semantics
(SURVEY.md §2.6); NULL branches of unions are *explicitly typed*
(``F.lit(None).cast(...)``) so cross-branch coercion is deterministic
(SURVEY.md §7 hard-part 1).  Aggregations pre-aggregate before the union —
the reference model's own shape — so the shuffle happens on the small
grouped side, not the unioned fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import (
    AcceptedValues,
    Materialization,
    Model,
    NotNull,
    Project,
)
from ..functions import bucketize

# ---------------------------------------------------------------------------
# staging (models/staging/stg_*.sql — pure projections, grouped column order)
# ---------------------------------------------------------------------------

_STG_COLS = {
    "stg_top_terms": ["dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank"],
    "stg_top_rising_terms": [
        "dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank", "percent_gain",
    ],
    "stg_international_top_terms": [
        "country_code", "region_code", "country_name", "region_name",
        "term", "refresh_date", "week", "score", "rank",
    ],
    "stg_international_top_rising_terms": [
        "country_code", "region_code", "country_name", "region_name",
        "term", "refresh_date", "week", "score", "rank", "percent_gain",
    ],
}

_STG_SOURCE = {
    "stg_top_terms": "top_terms",
    "stg_top_rising_terms": "top_rising_terms",
    "stg_international_top_terms": "international_top_terms",
    "stg_international_top_rising_terms": "international_top_rising_terms",
}


def _staging_builder(name: str):
    def build(spark: SparkSession, ref) -> DataFrame:
        return ref(_STG_SOURCE[name]).select(*_STG_COLS[name])

    return build


# ---------------------------------------------------------------------------
# mart: weekly_trends_summary (weekly_trends_summary.sql:1-110)
# ---------------------------------------------------------------------------


def _weekly_agg(df: DataFrame, trend_type: str, geo_col: str, has_gain: bool) -> DataFrame:
    """One UNION branch: group by (week, refresh_date) with the branch's
    trend_type literal; rising branches aggregate percent_gain, top branches
    emit typed NULLs (weekly_trends_summary.sql:24-25,52-53)."""
    aggs = [
        F.count(F.lit(1)).alias("total_terms"),
        F.avg("score").alias("avg_score"),
        F.countDistinct(geo_col).alias("unique_geos"),
    ]
    if has_gain:
        aggs += [
            F.avg("percent_gain").alias("avg_percent_gain"),
            F.max("percent_gain").alias("max_percent_gain"),
        ]
    agg = df.groupBy("week", "refresh_date").agg(*aggs)
    return agg.select(
        "week",
        "refresh_date",
        F.lit(trend_type).alias("trend_type"),
        "total_terms",
        "avg_score",
        (F.col("avg_percent_gain") if has_gain else F.lit(None).cast("double")).alias(
            "avg_percent_gain"
        ),
        (F.col("max_percent_gain") if has_gain else F.lit(None).cast("bigint")).alias(
            "max_percent_gain"
        ),
        "unique_geos",
    )


def weekly_trends_summary(spark: SparkSession, ref) -> DataFrame:
    intl = _weekly_agg(
        ref("stg_international_top_rising_terms"), "international_rising", "country_name", True
    ).union(
        _weekly_agg(ref("stg_international_top_terms"), "international_top", "country_name", False)
    )
    us = _weekly_agg(ref("stg_top_rising_terms"), "us_rising", "dma_name", True).union(
        _weekly_agg(ref("stg_top_terms"), "us_top", "dma_name", False)
    )
    combined = intl.union(us)  # positional UNION ALL (SURVEY.md §2.6 U3)
    final = combined.select(
        "week",
        "refresh_date",
        "trend_type",
        "total_terms",
        F.round("avg_score", 2).alias("avg_score"),
        F.round("avg_percent_gain", 2).alias("avg_percent_gain"),
        "max_percent_gain",
        "unique_geos",
        F.when(F.col("trend_type").like("%rising%"), "Rising Trends")
        .otherwise("Top Trends")
        .alias("trend_category"),
        F.when(F.col("trend_type").like("international%"), "International")
        .otherwise("US Market")
        .alias("market_scope"),
    )
    return final.orderBy(F.desc("week"), F.asc("trend_type"))


# ---------------------------------------------------------------------------
# mart: top_terms_comparison (top_terms_comparison.sql:1-67)
# ---------------------------------------------------------------------------

RANK_CATEGORY_RULES = [("=", 1, "#1 Term"), ("<=", 5, "Top 5"), ("<=", 10, "Top 10")]
INTEREST_LEVEL_RULES = [
    (">=", 80, "Very High Interest"),
    (">=", 60, "High Interest"),
    (">=", 40, "Moderate Interest"),
    (">=", 20, "Low Interest"),
]
RANK_TIER_RULES = [("<=", 5, "Top 5"), ("<=", 10, "Top 10"), ("<=", 25, "Top 25")]
GROWTH_CATEGORY_RULES = [
    (">=", 1000, "Explosive (1000%+)"),
    (">=", 500, "Very High (500-999%)"),
    (">=", 200, "High (200-499%)"),
    (">=", 100, "Moderate (100-199%)"),
]


def _scoped_union(intl: DataFrame, us: DataFrame, with_gain: bool) -> DataFrame:
    """Normalize the international and US shapes to 9 (or 10) aligned columns
    then UNION ALL positionally (top_terms_comparison.sql:3-35)."""
    base_intl = [
        F.lit("international").alias("scope"),
        F.col("country_name").alias("geo_name"),
        F.col("country_code").alias("geo_code"),
        F.col("region_name"),
        F.col("term"),
        F.col("week"),
        F.col("refresh_date"),
        F.col("score"),
        F.col("rank"),
    ]
    base_us = [
        F.lit("us_dma").alias("scope"),
        F.col("dma_name").alias("geo_name"),
        F.col("dma_id").cast("string").alias("geo_code"),
        F.lit(None).cast("string").alias("region_name"),
        F.col("term"),
        F.col("week"),
        F.col("refresh_date"),
        F.col("score"),
        F.col("rank"),
    ]
    if with_gain:
        base_intl.append(F.col("percent_gain"))
        base_us.append(F.col("percent_gain"))
    return intl.select(*base_intl).union(us.select(*base_us))


def top_terms_comparison(spark: SparkSession, ref) -> DataFrame:
    all_top = _scoped_union(
        ref("stg_international_top_terms"), ref("stg_top_terms"), with_gain=False
    )
    return all_top.select(
        "*",
        bucketize("rank", RANK_CATEGORY_RULES, "Other").alias("rank_category"),
        bucketize("score", INTEREST_LEVEL_RULES, "Very Low Interest").alias("interest_level"),
    )


def trending_terms_analysis(spark: SparkSession, ref) -> DataFrame:
    all_rising = _scoped_union(
        ref("stg_international_top_rising_terms"), ref("stg_top_rising_terms"), with_gain=True
    )
    return all_rising.select(
        "*",
        bucketize("rank", RANK_TIER_RULES, "Other").alias("rank_tier"),
        bucketize("percent_gain", GROWTH_CATEGORY_RULES, "Low (<100%)").alias("growth_category"),
    )


def sql_models_dir() -> str:
    """models/sql/ — the 7 reference models authored as dbt SQL files (the
    project's source of truth; the DataFrame builders above are their
    independently-implemented twins, asserted equal in tests)."""
    import os

    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "models", "sql")


_TRENDS_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def build_trends_relations(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Ephemeral build of the whole trends DAG (sources -> staging -> marts)
    as lazy DataFrames — used by the correctness harness, where Catalyst sees
    each query as one logical plan end-to-end (views inlined, like dbt views
    in a warehouse).  Models come from the ``models/sql/*.sql`` dbt files,
    built in dependency order.

    Memoized per (Spark app, sf_dir): the relations are immutable lazy plans
    over the read-only testdata, and dbt likewise compiles a project DAG once
    per invocation, not once per model — rebuilding cost ~1.5 s of pure
    driver-side analysis per call with zero data dependence."""
    from ..core.jinja_lite import load_sql_models
    from ..fixtures import register_trends_sources

    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _TRENDS_CACHE:
        return _TRENDS_CACHE[cache_key]

    rel: dict[str, DataFrame] = dict(register_trends_sources(spark, sf_dir))
    pending = {m.name: m for m in load_sql_models(sql_models_dir())}
    while pending:
        ready = [m for m in pending.values() if all(d in rel for d in m.deps)]
        if not ready:
            raise ValueError(f"unresolvable model deps: {sorted(pending)}")
        for m in ready:
            rel[m.name] = m.build(spark, rel.__getitem__)
            del pending[m.name]
    _TRENDS_CACHE[cache_key] = rel
    return rel


# ---------------------------------------------------------------------------
# project wiring + the 68 declarative tests (SURVEY.md §5)
# ---------------------------------------------------------------------------


def _not_nulls(*cols: str) -> list:
    return [NotNull(c) for c in cols]


def _model_tests() -> dict[str, list]:
    """The reference's 68 declarative tests, keyed by model (staging YAMLs +
    models/marts/*.yml — SURVEY.md §5).

    Independent Python twin of the ``models/properties.yml`` declarations —
    the YAML is the build path (``trends_project``); this dict exists so a
    parity test can assert the two transcriptions agree test-for-test."""
    tests: dict[str, list] = {}
    for stg in _STG_COLS:
        tests[stg] = _not_nulls(
            *[c for c in _STG_COLS[stg] if c not in ("region_code", "region_name")]
        )
    tests["weekly_trends_summary"] = [
        *_not_nulls(
            "week", "refresh_date", "trend_type", "total_terms",
            "avg_score", "unique_geos", "trend_category", "market_scope",
        ),
        AcceptedValues(
            "trend_type",
            ("international_rising", "international_top", "us_rising", "us_top"),
        ),
        AcceptedValues("trend_category", ("Rising Trends", "Top Trends")),
        AcceptedValues("market_scope", ("International", "US Market")),
    ]
    tests["top_terms_comparison"] = [
        *_not_nulls(
            "scope", "geo_name", "geo_code", "term", "week",
            "refresh_date", "score", "rank", "rank_category", "interest_level",
        ),
        AcceptedValues("scope", ("international", "us_dma")),
        AcceptedValues("rank_category", ("#1 Term", "Top 5", "Top 10", "Other")),
        AcceptedValues(
            "interest_level",
            (
                "Very High Interest", "High Interest", "Moderate Interest",
                "Low Interest", "Very Low Interest",
            ),
        ),
    ]
    tests["trending_terms_analysis"] = [
        *_not_nulls(
            "scope", "geo_name", "geo_code", "term", "week", "refresh_date",
            "score", "rank", "percent_gain", "rank_tier", "growth_category",
        ),
        AcceptedValues("scope", ("international", "us_dma")),
        AcceptedValues("rank_tier", ("Top 5", "Top 10", "Top 25", "Other")),
        AcceptedValues(
            "growth_category",
            (
                "Explosive (1000%+)", "Very High (500-999%)", "High (200-499%)",
                "Moderate (100-199%)", "Low (<100%)",
            ),
        ),
    ]
    return tests


def properties_path() -> str:
    """models/properties.yml — the dbt property YAML (sources + models with
    column docs and the 68 data tests, doc() refs into models/docs/*.md)."""
    import os

    return os.path.join(os.path.dirname(__file__), "properties.yml")


def load_trends_properties() -> dict:
    """Parse the property YAML with every ``{{ doc(...) }}`` ref resolved
    against the project's ``{% docs %}`` blocks — dbt's schema-parser step
    (reference ``models/staging/__sources.yml`` + ``models/docs/
    google_trends_docs.md``)."""
    from ..core.docs import default_docs_paths, load_doc_blocks, load_properties

    docs = load_doc_blocks(*default_docs_paths())
    return load_properties(properties_path(), docs)


def trends_project(target: str = "dev", warehouse_dir: str | None = None) -> Project:
    """Assemble the full 7-model project from the ``models/sql/*.sql`` dbt
    files — in-file ``{{ config(...) }}`` picks view/table + schema — with
    descriptions, column metadata, and the declarative test suites all parsed
    from ``models/properties.yml`` + ``models/docs/*.md`` exactly like dbt's
    schema parser (sources must be added separately via
    ``fixtures.register_trends_sources`` + ``Project.add_sources``)."""
    from ..core.jinja_lite import load_sql_models

    p = Project(
        "dbt_trill_shop_spark",
        target=target,
        default_schema="analytics",
        warehouse_dir=warehouse_dir,
        # Mirror the reference's physical hint: sources are partitioned by
        # refresh_date (google_trends_docs.md:39); our mart tables partition
        # by week so time-ranged reads prune files.
        table_partition_cols={},
    )
    props = load_trends_properties()
    for name, meta in props["sources"].items():
        p.source_meta[name] = {
            "description": meta["description"],
            "columns": meta["columns"],
        }
    for m in load_sql_models(sql_models_dir()):
        meta = props["models"].get(m.name, {})
        m.tests = list(meta.get("tests", []))
        m.description = meta.get("description", "")
        m.columns = dict(meta.get("columns", {}))
        m.contract = meta.get("contract")
        p.add_model(m)
    return p


def term_momentum(spark, sf_dir: str):
    """Term momentum over the trends staging layer: each term's mean score
    per week with the week-over-week delta and a rank of this week's
    biggest risers — the "what's surging" readout the reference's marts
    stop short of (they bucket levels; this tracks MOTION).  Built on the
    same compiled staging relations, exact integer score sums with
    mean-milli output."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    stg = build_trends_relations(spark, sf_dir)["stg_top_terms"]
    weekly = stg.groupBy("term", "week").agg(
        F.count(F.lit(1)).alias("n"), F.sum("score").alias("s")
    )
    w = Window.partitionBy("term").orderBy("week")
    scored = weekly.select(
        "term",
        "week",
        F.expr("s * 1000 DIV n").alias("mean_score_milli"),
    ).withColumn(
        "delta_milli",
        F.col("mean_score_milli") - F.lag("mean_score_milli").over(w),
    )
    wr = Window.partitionBy("week").orderBy(
        F.desc("delta_milli"), F.asc("term")
    )
    return (
        scored.filter(F.col("delta_milli").isNotNull())
        .withColumn("riser_rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("riser_rank") <= 5)
        .select(
            "week",
            "riser_rank",
            "term",
            F.col("mean_score_milli").cast("bigint").alias("mean_score_milli"),
            F.col("delta_milli").cast("bigint").alias("delta_milli"),
        )
        .orderBy("week", "riser_rank")
    )


TERM_MOMENTUM_BODY = """
SELECT week, riser_rank, term, mean_score_milli, delta_milli
FROM (
    SELECT week, term, mean_score_milli, delta_milli,
           CAST(ROW_NUMBER() OVER (PARTITION BY week
                ORDER BY delta_milli DESC, term ASC) AS BIGINT) AS riser_rank
    FROM (
        SELECT term, week,
               CAST(SUM(score) * 1000 // COUNT(*) AS BIGINT) AS mean_score_milli,
               CAST(SUM(score) * 1000 // COUNT(*)
                    - LAG(CAST(SUM(score) * 1000 // COUNT(*) AS BIGINT))
                      OVER (PARTITION BY term ORDER BY week) AS BIGINT)
                   AS delta_milli
        FROM stg_top_terms
        GROUP BY term, week
    ) d
    WHERE delta_milli IS NOT NULL
) r
WHERE riser_rank <= 5
ORDER BY week, riser_rank
"""
