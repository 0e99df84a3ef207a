"""dbt unit tests (dbt 1.8 ``unit_tests:`` YAML): given MOCK inputs for a
model's refs/sources, assert the model's transformation produces an expected
output — logic testing without touching warehouse data, the complement of
data tests (which validate real rows after a build).

Scope parity with dbt: every input the model reads must be mocked (an
unmocked ref raises — a unit test that silently reads production data isn't
a unit test); ``expect`` may list a SUBSET of output columns (dbt's
``expect`` format ignores unlisted columns); row comparison is
order-insensitive multiset equality.  Works for both Python-builder models
and SQL-file models — the mock resolver flows through the same
``Model.build`` path the real DAG uses, so Jinja compilation, macros and
``is_incremental()`` (compiled False, as in dbt unit tests) behave
identically.

Reference scope note: the dbt reference project declares only data tests
(`models/staging/*.yml`), but unit tests are core current-dbt surface;
cited against the public dbt docs, not the reference repo.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class UnitTestResult:
    name: str
    model: str
    passed: bool
    message: str = ""


@dataclass
class UnitTest:
    """One unit test: mock rows per input relation + expected output rows.

    ``given`` values are lists of dicts (rows); a missing column in a mock
    row becomes NULL, matching dbt's sparse ``rows:`` fixtures.  ``schemas``
    optionally pins a DDL schema per input (otherwise inferred from rows —
    fine for ints/strings, pin timestamps/decimals explicitly).
    """

    name: str
    model: str
    given: dict[str, list[dict]]
    expect: list[dict]
    schemas: dict[str, str] = field(default_factory=dict)

    def run(self, project, spark: SparkSession) -> UnitTestResult:
        model = project.models.get(self.model)
        if model is None:
            return UnitTestResult(self.name, self.model, False, "unknown model")

        def mock_df(name: str) -> DataFrame:
            rows = self.given[name]
            if name in self.schemas:
                return spark.createDataFrame(rows, self.schemas[name])
            cols: list[str] = []
            for r in rows:
                cols += [c for c in r if c not in cols]
            data = [tuple(r.get(c) for c in cols) for r in rows]
            return spark.createDataFrame(data, cols)

        def mock_resolve(name: str, version: int | None = None) -> DataFrame:
            if name not in self.given:
                raise AssertionError(
                    f"unit test {self.name!r}: input {name!r} is not mocked "
                    "(every ref/source a unit test touches must appear in "
                    "`given`)"
                )
            return mock_df(name)

        ctx = {
            "vars": project.vars,
            "is_incremental": False,  # dbt compiles unit tests non-incremental
            "this": None,
            "model_name": model.node_name,
        }
        try:
            if isinstance(model.builder, str):
                # raw Jinja SQL text: compile with the project's macros/vars
                # and register each mocked dep as the bare-name temp view the
                # compiled SQL reads (the same convention the DAG uses)
                from .jinja_lite import compile_model_sql, extract_deps

                for dep in extract_deps(model.builder):
                    mock_resolve(dep).createOrReplaceTempView(dep)
                compiled = compile_model_sql(
                    model.builder,
                    macros=project.macros,
                    is_incremental=False,
                    vars=project.vars,
                )
                out = spark.sql(compiled)
            else:
                out = model.build(spark, mock_resolve, ctx=ctx)
        except AssertionError:
            raise
        except Exception as e:  # model logic error surfaces as a failure
            return UnitTestResult(self.name, self.model, False, f"build error: {e}")

        want_cols: list[str] = []
        for r in self.expect:
            want_cols += [c for c in r if c not in want_cols]
        missing = [c for c in want_cols if c not in out.columns]
        if missing:
            return UnitTestResult(
                self.name, self.model, False, f"output lacks columns {missing}"
            )
        got = sorted(
            tuple(row[c] for c in want_cols)
            for row in out.select(*want_cols).collect()
        )
        want = sorted(tuple(r.get(c) for c in want_cols) for r in self.expect)
        if got == want:
            return UnitTestResult(self.name, self.model, True)
        extra = [r for r in got if r not in list(want)]
        absent = [r for r in want if r not in list(got)]
        return UnitTestResult(
            self.name,
            self.model,
            False,
            f"rows mismatch over {want_cols}: unexpected={extra[:5]} "
            f"missing={absent[:5]} (got {len(got)} rows, want {len(want)})",
        )


def run_unit_tests(
    project, spark: SparkSession, tests: list[UnitTest]
) -> list[UnitTestResult]:
    """Run a suite; never raises on assertion mismatches (results carry the
    verdicts, like ``dbt test`` output)."""
    return [t.run(project, spark) for t in tests]
