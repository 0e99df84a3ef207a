"""Bounded driver-side rows as a pure-JVM ``VALUES`` relation.

``spark.createDataFrame(rows, ...)`` parallelizes even a 2-row constant
over ``defaultParallelism`` RDD partitions, and every downstream action
then walks those partitions through Python-worker round-trips (a
``coalesce(1)`` funnel walks ALL of them in one task: measured 4.7-5.4 s
for a 2-row write at 32 cores, vs 0.13 s for the equivalent inline SQL
``VALUES`` — guide §4, the Python boundary has no business in a
constant-building path).  An inline ``VALUES`` relation plans as a
``LocalTableScan``: no RDD, no Python workers, visible to Catalyst for
constant folding and broadcast sizing.

Only bounded, driver-resident relations belong here (merge tables, probe
arrays, collected loop results, partition tuples).  Corpus-sized data must
stay distributed — the row-count fallback below is a tripwire, not an
invitation.
"""

from __future__ import annotations

import datetime
import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["values_relation"]

# Past this many rows the generated SQL text stops being obviously cheap to
# parse; fall back to createDataFrame (the previous behavior) rather than
# hand the driver a multi-MB statement.
_MAX_VALUES_ROWS = 5000


def _lit(v) -> str:
    """One Python value as an exact Spark SQL literal (escaped)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # text round-trip through Java's parseDouble is exact for every
        # finite double (repr is the shortest round-tripping form) and
        # handles NaN/Infinity uniformly, unlike bare decimal literals
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        # backslash is an escape character in Spark string literals
        # (escapedStringLiterals=false default): escape it first, then quotes
        s = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if isinstance(v, datetime.datetime):
        # timezone-proof: epoch micros (naive values are interpreted in the
        # process-local timezone, exactly like createDataFrame does).  Epoch
        # micros are exactly representable in float64 until ~year 2255.
        if v.tzinfo is None:
            v = v.astimezone()
        return f"timestamp_micros({round(v.timestamp() * 1_000_000)})"
    if isinstance(v, datetime.date):
        return f"DATE'{v.isoformat()}'"
    raise TypeError(f"values_relation cannot render {type(v).__name__!r}")


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    """Split a DDL column list into (name, type) pairs, honoring nesting
    (``decimal(38,0)``, ``array<bigint>``)."""
    cols: list[str] = []
    depth = 0
    cur = ""
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        cols.append(cur)
    out = []
    for c in cols:
        name, typ = c.strip().split(None, 1)
        out.append((name, typ.strip()))
    return out


def values_relation(
    spark: SparkSession, rows: Iterable[Sequence], ddl: str
) -> DataFrame:
    """``rows`` (sequence of tuples) with schema ``ddl`` ("name type, ...")
    as a LocalRelation-backed DataFrame.  Column values are rendered as
    exact SQL literals and CAST to the declared type, so results are
    bit-identical to ``createDataFrame(rows, ddl)`` for the supported types
    (int/bool/float/str/date/datetime/None).  Empty input yields a typed
    empty relation; oversized input falls back to ``createDataFrame``."""
    rows = list(rows)
    cols = _split_ddl(ddl)
    if len(rows) > _MAX_VALUES_ROWS:
        return spark.createDataFrame(rows, ddl)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    if not rows:
        typed_null = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return spark.sql(f"SELECT {typed_null} WHERE FALSE")
    body = ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return spark.sql(
        f"SELECT {sel} FROM VALUES {body} AS t({names})"
    )
