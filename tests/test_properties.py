"""Property-based tests (SURVEY.md §5 item 3): the CASE-bucketing logic must
match a straight-line Python reference on arbitrary ints, with explicit
coverage of every boundary value the reference models branch on
(rank 1/5/10/25 — top_terms_comparison.sql:51-54, trending_terms_analysis.sql:54-57;
score 20/40/60/80 — top_terms_comparison.sql:55-62;
percent_gain 100/200/500/1000 — trending_terms_analysis.sql:61-64).

One Spark job per test: hypothesis generates the whole value list, Spark
evaluates the bucketize Column over it in a single pass.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dbt_trill_shop_spark.functions import bucketize
from dbt_trill_shop_spark.models.trends import (
    GROWTH_CATEGORY_RULES,
    INTEREST_LEVEL_RULES,
    RANK_CATEGORY_RULES,
    RANK_TIER_RULES,
)

BOUNDARIES = [0, 1, 2, 4, 5, 6, 9, 10, 11, 19, 20, 21, 24, 25, 26, 39, 40, 41,
              59, 60, 61, 79, 80, 81, 99, 100, 101, 199, 200, 201, 499, 500,
              501, 999, 1000, 1001]


def _py_bucketize(v, rules, default):
    for op, threshold, label in rules:
        if (op == "=" and v == threshold) or (op == "<=" and v <= threshold) or (
            op == ">=" and v >= threshold
        ):
            return label
    return default


def _spark_buckets(spark, values, rules, default):
    df = spark.range(0).selectExpr("id as v").unionByName(
        spark.createDataFrame([(int(v),) for v in values], "v long")
    )
    out = df.select("v", bucketize("v", rules, default).alias("b")).collect()
    return {r.v: r.b for r in out}


CASES = [
    ("rank_category", RANK_CATEGORY_RULES, "Other"),
    ("interest_level", INTEREST_LEVEL_RULES, "Very Low Interest"),
    ("rank_tier", RANK_TIER_RULES, "Other"),
    ("growth_category", GROWTH_CATEGORY_RULES, "Low (<100%)"),
]


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(extra=st.lists(st.integers(min_value=-10_000, max_value=10_000), max_size=30))
def test_bucketize_matches_python_reference(spark, extra):
    values = sorted(set(BOUNDARIES + extra))
    for name, rules, default in CASES:
        got = _spark_buckets(spark, values, rules, default)
        for v in values:
            want = _py_bucketize(v, rules, default)
            assert got[v] == want, (name, v, got[v], want)
