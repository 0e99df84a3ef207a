"""Local replica of the driver's DuckDB-oracle comparison (BASELINE.md:
row count + schema + order-insensitive value match), used as a pre-flight so
mismatches surface in pytest before the driver's CORRECTNESS gate."""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from dbt_trill_shop_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# DuckDB-only numeric types the driver's type-sensitive value hash can never
# match against a Spark result (bare SUM(BIGINT) -> HUGEINT was the cause of
# every round-1 hash failure). _cell() stringifies numerics, so without this
# guard the local pre-flight silently masks the whole class.
_FORBIDDEN_DUCK_TYPES = {"HUGEINT", "UHUGEINT"}


def oracle_frame(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    """Run oracle SQL, rejecting column types the driver cannot hash-match."""
    rel = con.sql(sql)
    bad = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t in _FORBIDDEN_DUCK_TYPES
    ]
    assert not bad, (
        f"oracle emits driver-unhashable DuckDB types {bad}; "
        "wrap the offending aggregate in CAST(... AS BIGINT)"
    )
    return rel.df()


def _cell(v) -> str:
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v.is_integer():
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = sorted(tuple(_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    s = spark_df.toPandas()
    problems = []
    s_cols, s_rows = normalize(s)
    o_cols, o_rows = normalize(oracle_df)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            problems.append(f"first differing row #{i}: spark={a} oracle={b}")
            break
    return problems
