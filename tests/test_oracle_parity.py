"""Pre-flight of the driver's correctness gate: every oracle-backed query in
the harness must match DuckDB exactly (columns, row count, order-insensitive
values) at the test scale factor."""

import pytest

from dbt_trill_shop_spark.harness import QUERIES

from .oracle_utils import compare, duck_connection, oracle_frame

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    con = duck_connection(sf_dir)
    odf = oracle_frame(con, spec.oracle)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.count() >= 0, name
