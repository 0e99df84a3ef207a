"""values_relation must be a drop-in, bit-identical replacement for
createDataFrame over the supported scalar types — the r14 optimization
swaps it into ~25 bounded driver-side relations across the txn/ext query
paths, so any literal-rendering defect (escaping, float text round-trip,
timezone handling) would silently change query results."""

import datetime
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest  # noqa: E402

from dbt_trill_shop_spark.localrel import _lit, _split_ddl, values_relation  # noqa: E402


def test_split_ddl_handles_nesting():
    assert _split_ddl("a bigint, b string") == [("a", "bigint"), ("b", "string")]
    assert _split_ddl("a decimal(38,0), b array<bigint>") == [
        ("a", "decimal(38,0)"),
        ("b", "array<bigint>"),
    ]
    assert _split_ddl("x DOUBLE") == [("x", "DOUBLE")]


def test_literal_rendering():
    assert _lit(None) == "NULL"
    assert _lit(True) == "TRUE" and _lit(False) == "FALSE"
    assert _lit(-42) == "-42"
    assert _lit("it's") == "'it\\'s'"
    assert _lit("a\\b") == "'a\\\\b'"
    assert _lit(0.1) == "CAST('0.1' AS DOUBLE)"
    assert _lit(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert _lit(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    assert _lit(datetime.date(2031, 3, 1)) == "DATE'2031-03-01'"
    with pytest.raises(TypeError):
        _lit(b"bytes")


@pytest.fixture(scope="module")
def spark():
    from dbt_trill_shop_spark.session import get_spark

    s = get_spark(app_name="test-localrel", master="local[2]", shuffle_partitions=2)
    yield s


def test_bit_identical_to_createdataframe(spark):
    rows = [
        (1, "plain", 0.5, True, datetime.date(2031, 1, 2)),
        (-7, "quo'te\\slash\nnewline", -1.7976931348623157e308, False, None),
        (None, None, float("nan"), None, datetime.date(1970, 1, 1)),
    ]
    ddl = "i bigint, s string, d double, b boolean, dt date"
    a = values_relation(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema
    ra, rb = a.collect(), b.collect()
    for x, y in zip(ra, rb):
        for c in a.columns:
            vx, vy = x[c], y[c]
            if isinstance(vx, float) and isinstance(vy, float) and math.isnan(vx):
                assert math.isnan(vy)
            else:
                assert vx == vy, (c, vx, vy)
    # LocalRelation, not an RDD scan: the point of the rewrite
    assert "ExistingRDD" not in a._jdf.queryExecution().executedPlan().toString()


def test_timestamp_round_trip(spark):
    ts = datetime.datetime(2031, 3, 1, 12, 34, 56, 789123)
    a = values_relation(spark, [(ts,)], "ts timestamp")
    b = spark.createDataFrame([(ts,)], "ts timestamp")
    assert a.collect() == b.collect()


def test_empty_and_fallback(spark):
    e = values_relation(spark, [], "a bigint, s string")
    assert e.count() == 0
    assert [f.dataType.simpleString() for f in e.schema.fields] == ["bigint", "string"]
    big = [(i,) for i in range(5001)]
    f = values_relation(spark, big, "a bigint")
    assert f.count() == 5001


def test_float_text_round_trip_is_exact(spark):
    import struct

    vals = [0.1, 1 / 3, 2.2250738585072014e-308, 1.5e300, -0.0]
    got = values_relation(
        spark, [(v,) for v in vals], "d double"
    ).collect()
    for v, row in zip(vals, got):
        assert struct.pack("d", row["d"]) == struct.pack("d", v)
