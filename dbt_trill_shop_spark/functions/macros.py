"""Engine equivalents of the reference's Jinja macros and CASE patterns.

- ``cents_to_dollars``: ``macros/cents_to_dollars.sql:7-21`` has 4 dialect
  variants; we encode the BigQuery one (``round(cast(x/100 as numeric), 2)``,
  line 16 — the reference's primary target) as the default, and the
  Postgres/Fabric exact-decimal variant separately.
- ``generate_surrogate_key``: dbt_utils surface (``packages.yml:2-3``) —
  md5 over '-'-joined stringified columns.
- ``bucketize``: builder for the reference's chained CASE WHEN range bucketing
  (``models/marts/top_terms_comparison.sql:50-63``,
  ``trending_terms_analysis.sql:53-66``) — thresholds evaluated top-down,
  exactly like SQL CASE.

All of these are pure Column expressions: they stay inside whole-stage
codegen, never a Python UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def cents_to_dollars(col: Column | str, scale: int = 2) -> Column:
    """BigQuery-variant semantics: round(x / 100, 2) -> DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c / F.lit(100), scale)


def cents_to_dollars_decimal(col: Column | str) -> Column:
    """Exact-decimal variant (``(x / 100)::numeric(16, 2)``,
    macros/cents_to_dollars.sql:8)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast(DecimalType(16, 4)) / F.lit(100)).cast(DecimalType(16, 2))


def generate_surrogate_key(*cols: Column | str) -> Column:
    """dbt_utils.generate_surrogate_key: md5 of '-'-joined columns with NULLs
    mapped to a sentinel (dbt_utils semantics)."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("_dbt_utils_surrogate_key_null_"))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def bucketize(
    col: Column | str,
    rules: Sequence[tuple],
    default: str,
) -> Column:
    """Chained CASE: rules are (op, threshold, label) evaluated in order.

    op in {'=', '<=', '>='} — the only comparison forms the reference's CASE
    blocks use (SURVEY.md §2.7).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for op, threshold, label in rules:
        if op == "=":
            cond = c == threshold
        elif op == "<=":
            cond = c <= threshold
        elif op == ">=":
            cond = c >= threshold
        else:
            raise ValueError(f"unsupported op {op!r}")
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(default)


def register_sql_macros(spark) -> None:
    """Register the project macros as Spark 4 SQL UDFs
    (``CREATE TEMPORARY FUNCTION … RETURN expr``, SPARK-42849) — so pure
    spark.sql() users call ``cents_to_dollars(col)`` exactly like a dbt
    macro, with the expression inlined by Catalyst (no Python boundary;
    the UDF body participates in codegen and pushdown like any column
    expression).  The SQL-text twin of this module's Column builders."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents_to_dollars(c BIGINT) "
        "RETURNS DOUBLE RETURN ROUND(c / 100, 2)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rank_tier(r BIGINT) "
        "RETURNS STRING RETURN CASE WHEN r <= 5 THEN 'Top 5' "
        "WHEN r <= 10 THEN 'Top 10' WHEN r <= 25 THEN 'Top 25' "
        "ELSE 'Other' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION surrogate_key(a STRING, b STRING) "
        "RETURNS STRING RETURN md5(concat_ws('-', "
        "coalesce(a, '_dbt_utils_surrogate_key_null_'), "
        "coalesce(b, '_dbt_utils_surrogate_key_null_')))"
    )
