"""dbt source freshness + dbt-1.8-style unit tests.

Source freshness (dbt ``sources: freshness:`` YAML + ``dbt source
freshness``): compare ``max(loaded_at_field)`` against ``warn_after`` /
``error_after`` age thresholds.  One ``max()`` aggregate per source — on a
partitioned 100 TB table Spark answers it from the latest partitions'
statistics, not a full scan, when the loaded-at column is the partition key.

Unit tests (dbt 1.8 ``unit_tests:`` YAML): build ONE model over small
inline fixture inputs (every ``ref``/``source`` replaced by given rows) and
compare the result to expected rows — logic tests that run in milliseconds
and need no warehouse state, complementing the data tests in
:mod:`testing` that validate real relations.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PERIOD_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


@dataclass(frozen=True)
class FreshnessPolicy:
    """dbt freshness block: ``{count, period}`` thresholds."""

    warn_after: tuple[int, str] | None = None
    error_after: tuple[int, str] | None = None
    loaded_at_field: str = ""

    @staticmethod
    def from_yaml(spec: dict) -> "FreshnessPolicy":
        def thr(d):
            if not d:
                return None
            period = d["period"]
            if period not in _PERIOD_SECONDS:
                raise ValueError(f"unknown freshness period {period!r}")
            return (int(d["count"]), period)

        return FreshnessPolicy(
            warn_after=thr(spec.get("warn_after")),
            error_after=thr(spec.get("error_after")),
            loaded_at_field=spec.get("loaded_at_field", ""),
        )


def _seconds(thr: tuple[int, str]) -> int:
    return thr[0] * _PERIOD_SECONDS[thr[1]]


def check_freshness(
    df: DataFrame,
    loaded_at_field: str,
    policy: FreshnessPolicy,
    now: datetime.datetime,
) -> dict:
    """One source's freshness verdict: ``{max_loaded_at, age_seconds,
    status}`` with dbt's status routing (error_after beats warn_after; no
    rows at all is an error)."""
    max_loaded = df.agg(F.max(loaded_at_field)).collect()[0][0]
    if max_loaded is None:
        return {"max_loaded_at": None, "age_seconds": None, "status": "error"}
    if isinstance(max_loaded, datetime.date) and not isinstance(
        max_loaded, datetime.datetime
    ):
        max_loaded = datetime.datetime.combine(max_loaded, datetime.time())
    age = (now - max_loaded).total_seconds()
    status = "pass"
    if policy.error_after and age > _seconds(policy.error_after):
        status = "error"
    elif policy.warn_after and age > _seconds(policy.warn_after):
        status = "warn"
    return {"max_loaded_at": max_loaded, "age_seconds": age, "status": status}


# -- unit tests ---------------------------------------------------------------

_INPUT_REF_RE = re.compile(
    r"^\s*(?:ref\(\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)"
    r"|source\(\s*['\"][A-Za-z0-9_]+['\"]\s*,\s*['\"]([A-Za-z0-9_]+)['\"]\s*\))\s*$"
)


def parse_input_name(text: str) -> str:
    """``ref('m')`` / ``source('s','t')`` in a unit test's ``input:`` ->
    the bare relation name (matching the dep names models resolve)."""
    m = _INPUT_REF_RE.match(text)
    if not m:
        raise ValueError(f"malformed unit-test input {text!r}")
    return m.group(1) or m.group(2)


@dataclass
class UnitTest:
    name: str
    model: str
    given: dict[str, list[dict]]  # relation name -> fixture rows
    expect: list[dict]
    description: str = ""


@dataclass
class UnitTestResult:
    name: str
    model: str
    passed: bool
    diff: str = ""


def parse_unit_tests(spec: dict) -> list[UnitTest]:
    """The ``unit_tests:`` section of a property YAML (dbt 1.8 grammar)."""
    out = []
    for ut in spec.get("unit_tests", []) or []:
        given = {
            parse_input_name(g["input"]): list(g.get("rows", []) or [])
            for g in ut.get("given", []) or []
        }
        out.append(
            UnitTest(
                name=ut["name"],
                model=ut["model"],
                given=given,
                expect=list((ut.get("expect") or {}).get("rows", []) or []),
                description=ut.get("description", ""),
            )
        )
    return out


def _fixture_df(spark: SparkSession, rows: list[dict], like: DataFrame | None) -> DataFrame:
    """Fixture rows -> DataFrame.  When the real relation is available its
    schema types the fixture exactly (absent columns become typed NULLs, as
    in dbt); otherwise types are inferred from the rows."""
    if like is not None:
        base = like.schema
        filled = [
            {f.name: r.get(f.name) for f in base.fields} for r in rows
        ]
        return spark.createDataFrame(filled, schema=base)
    if not rows:
        # No rows AND no reference relation: there is nothing to infer a
        # schema from, so fail with the actionable contract instead of
        # PySpark's CANNOT_INFER_EMPTY_SCHEMA.
        raise ValueError(
            "unit-test fixture has zero rows and no backing relation to "
            "type it; give the input at least one row or reference an "
            "existing model/source so its schema can type the empty fixture"
        )
    return spark.createDataFrame(rows)  # inferred


def run_unit_test(
    spark: SparkSession,
    model,
    ut: UnitTest,
    real_relations: dict[str, DataFrame] | None = None,
    macros: dict | None = None,
    vars: dict | None = None,
) -> UnitTestResult:
    """Build ``model`` with every dependency resolved to the test's fixture
    rows and compare against the expected rows (on the expected columns,
    order-insensitive).

    Raw Jinja SQL-text models are supported too: the text compiles with the
    project's ``macros``/``vars`` (``is_incremental()`` False, as dbt
    compiles unit tests), each mocked dep registers under its bare name as
    a temp view for the compiled SQL to read — and is DROPPED afterward so
    a previously built DAG's views of the same names aren't left clobbered.
    """
    real_relations = real_relations or {}
    fixtures = {
        name: _fixture_df(spark, rows, real_relations.get(name))
        for name, rows in ut.given.items()
    }

    def resolve(name: str) -> DataFrame:
        if name not in fixtures:
            raise KeyError(
                f"unit test {ut.name!r} gave no fixture for dependency {name!r}"
            )
        return fixtures[name]

    if isinstance(model.builder, str):
        from .jinja_lite import compile_model_sql, extract_deps

        deps = list(extract_deps(model.builder))
        for dep in deps:
            resolve(dep).createOrReplaceTempView(dep)
        try:
            compiled = compile_model_sql(
                model.builder, macros=macros, is_incremental=False, vars=vars
            )
            # materialize the comparison before the views drop
            df = spark.createDataFrame(
                spark.sql(compiled).collect(), spark.sql(compiled).schema
            )
        finally:
            for dep in deps:
                spark.catalog.dropTempView(dep)
    else:
        df = model.build(spark, resolve, ctx={"vars": vars or {}, "is_incremental": False})
    if not ut.expect:
        ok = df.isEmpty()
        return UnitTestResult(ut.name, ut.model, ok, "" if ok else "expected 0 rows")
    cols = list(ut.expect[0].keys())
    # None-safe total order: rows may mix NULL and non-NULL in one column
    # (tuple comparison would raise TypeError); order only drives the
    # comparison, equality itself uses the raw values.
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    got = sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()), key=key
    )
    want = sorted((tuple(r.get(c) for c in cols) for r in ut.expect), key=key)
    if got == want:
        return UnitTestResult(ut.name, ut.model, True)
    return UnitTestResult(
        ut.name, ut.model, False, f"expected {want[:5]}..., got {got[:5]}..."
    )
