"""dbt_trill_shop_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference dbt project ``Muizzkolapo/dbt-trill-shop``.

The reference (a dbt project over BigQuery's public ``google_trends`` dataset —
see ``/root/reference/dbt_project.yml:1-38``) is a declarative SQL-transformation
DAG: sources -> staging views -> mart tables, plus declarative data tests, seeds
and macros.  This package re-implements that execution model natively on Spark:

- ``session``   — SparkSession factory (AQE, tz, shuffle sizing)
- ``catalog``   — source registration (parquet -> temp views), incl. a
                  nanosecond-timestamp ingestion path Spark lacks natively
- ``core``      — Model / Project / DAG / materialization / data tests
                  (the dbt-like orchestration layer, SURVEY.md §3)
- ``functions`` — macro equivalents (cents_to_dollars, surrogate keys, CASE
                  bucketing builders, SURVEY.md §2.7)
- ``models``    — the 7 reference models re-expressed with the DataFrame API
- ``fixtures``  — google-trends-shaped inputs derived from the driver testdata
- ``operators`` — relational harness operators (joins/windows/set ops)
- ``ext``       — LLM-data-pipeline extensions: dedup, similarity search,
                  text analysis, multimodal columns (SURVEY.md §2.9)
"""

__version__ = "0.1.0"
