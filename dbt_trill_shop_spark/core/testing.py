"""Declarative data tests — the reference's entire correctness surface.

The reference uses exactly two generic test types (SURVEY.md §5): ``not_null``
(59 instances, e.g. ``models/staging/stg_top_terms.yml:7-8``) and
``accepted_values`` (9 instances, e.g. ``models/marts/top_terms_comparison.yml:9-10``).
dbt compiles each to a SELECT returning violating rows; >0 rows = FAIL
(SURVEY.md §3.3).

We add the dbt_utils-style tests the project declares but never uses
(``packages.yml:1-7``): ``unique``, ``unique_combination_of_columns``,
``accepted_range``, ``relationships``, plus dbt's test *config* surface:
``severity`` (``warn`` | ``error``), ``warn_if`` / ``error_if`` count
thresholds, and ``store_failures`` (violations persisted for audit) — the
dbt-core knobs a real project sets in its schema YAML.

Scale posture: every default-config test is compiled to a *violations
DataFrame* and executed via ``.isEmpty()`` — Spark's ``limit(1)``-based probe
— so a failing test on a 100 TB table short-circuits instead of scanning
everything.  Violation *counts* are computed only when a non-default
threshold (or a failure needing diagnostics) requires them; ``sample_limit``
rows are collected only on non-pass, for diagnostics.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataTest(Protocol):
    def violations(self, df: DataFrame) -> DataFrame: ...

    def describe(self) -> str: ...


@dataclass(frozen=True)
class NotNull:
    column: str

    def violations(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.column).isNull())

    def describe(self) -> str:
        return f"not_null({self.column})"


@dataclass(frozen=True)
class AcceptedValues:
    column: str
    values: tuple = ()

    def violations(self, df: DataFrame) -> DataFrame:
        # dbt compiles this to `where col not in (...)`; NULLs are not
        # violations of accepted_values (they're not_null's job).
        c = F.col(self.column)
        return df.filter(c.isNotNull() & ~c.isin(list(self.values)))

    def describe(self) -> str:
        return f"accepted_values({self.column} in {list(self.values)})"


@dataclass(frozen=True)
class AcceptedRange:
    column: str
    min_value: float | None = None
    max_value: float | None = None
    inclusive: bool = True

    def violations(self, df: DataFrame) -> DataFrame:
        c = F.col(self.column)
        cond: Column = F.lit(False)
        if self.min_value is not None:
            cond = cond | (c < self.min_value if self.inclusive else c <= self.min_value)
        if self.max_value is not None:
            cond = cond | (c > self.max_value if self.inclusive else c >= self.max_value)
        return df.filter(c.isNotNull() & cond)

    def describe(self) -> str:
        return f"accepted_range({self.column} in [{self.min_value}, {self.max_value}])"


@dataclass(frozen=True)
class Finite:
    """Floating-point hygiene gate: NaN and ±Infinity in a measure column.

    The engine's money/measure arithmetic uses the int64 micro-unit cast
    (``CAST(ROUND(x * 100) AS BIGINT)``), which under ANSI mode FAILS
    LOUDLY on non-finite doubles mid-job — by design: silently coercing a
    poisoned price corrupts aggregates.  This test is the up-front gate
    that names the column and rows instead, so corrupt loads are caught at
    `engine test` time rather than as a CAST_OVERFLOW stack three stages
    deep (the r6 degenerate-input sweep measured that failure shape across
    41 queries on a NaN-poisoned twin).
    """

    column: str

    def violations(self, df: DataFrame) -> DataFrame:
        c = F.col(self.column)
        return df.filter(c.isNotNull() & (F.isnan(c) | (F.abs(c) == float("inf"))))

    def describe(self) -> str:
        return f"finite({self.column})"


@dataclass(frozen=True)
class Unique:
    column: str

    def violations(self, df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(self.column).isNotNull())
            .groupBy(self.column)
            .count()
            .filter(F.col("count") > 1)
        )

    def describe(self) -> str:
        return f"unique({self.column})"


@dataclass(frozen=True)
class UniqueCombination:
    columns: tuple[str, ...]

    def violations(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.columns).count().filter(F.col("count") > 1)

    def describe(self) -> str:
        return f"unique_combination({','.join(self.columns)})"


@dataclass(frozen=True)
class Relationships:
    """FK test: every non-null value of ``column`` exists in ``to`` (an
    anti-join — broadcast the parent side when it is a dimension)."""

    column: str
    to: DataFrame = field(compare=False, hash=False)
    to_column: str = ""

    def violations(self, df: DataFrame) -> DataFrame:
        parent = self.to.select(F.col(self.to_column).alias("__pk")).distinct()
        return (
            df.filter(F.col(self.column).isNotNull())
            .join(F.broadcast(parent), on=F.col(self.column) == F.col("__pk"), how="left_anti")
        )

    def describe(self) -> str:
        return f"relationships({self.column} -> {self.to_column})"


@dataclass(frozen=True)
class TestConfig:
    """dbt test config block (schema YAML ``config:``): severity routing and
    count thresholds.  ``warn_if`` / ``error_if`` are dbt threshold strings
    (``">0"``, ``">=100"``, ``"!=0"`` ...) evaluated against the violation
    count."""

    severity: str = "error"  # "error" | "warn"
    warn_if: str = ">0"
    error_if: str = ">0"
    store_failures: bool = False


_THRESHOLD_RE = re.compile(r"^\s*(>=|<=|!=|=|>|<)\s*(-?\d+)\s*$")


def eval_threshold(expr: str, count: int) -> bool:
    m = _THRESHOLD_RE.match(expr)
    if not m:
        raise ValueError(f"bad threshold expression {expr!r}")
    op, n = m.group(1), int(m.group(2))
    return {
        ">": count > n,
        ">=": count >= n,
        "<": count < n,
        "<=": count <= n,
        "=": count == n,
        "!=": count != n,
    }[op]


@dataclass(frozen=True)
class ConfiguredTest:
    """A generic test with a non-default dbt config attached."""

    test: DataTest
    config: TestConfig

    def violations(self, df: DataFrame) -> DataFrame:
        return self.test.violations(df)

    def describe(self) -> str:
        return self.test.describe()


@dataclass
class TestResult:
    model: str
    test: str
    passed: bool  # True unless status == "error" (dbt: warn is still a pass)
    sample: list | None = None
    status: str = "pass"  # "pass" | "warn" | "error"
    failures: int | None = None  # violation count (None when not computed)


_DEFAULT_CONFIG = TestConfig()


def _evaluate(
    t, df: DataFrame, model_name: str, sample_limit: int, store_dir: str | None
) -> TestResult:
    cfg = t.config if isinstance(t, ConfiguredTest) else _DEFAULT_CONFIG
    v = t.violations(df)
    default_thresholds = cfg.warn_if == ">0" and cfg.error_if == ">0"
    if default_thresholds and not cfg.store_failures:
        # fast path: limit(1)-style probe, short-circuits on first violation;
        # the full count is only paid on failure (diagnostics)
        if v.isEmpty():
            return TestResult(model_name, t.describe(), True)
        n = v.count()
    else:
        n = v.count()
    # dbt status routing: error_if fires only under severity=error; warn_if
    # can fire under either severity.
    if cfg.severity == "error" and eval_threshold(cfg.error_if, n):
        status = "error"
    elif eval_threshold(cfg.warn_if, n):
        status = "warn"
    else:
        status = "pass"
    sample = None
    if status != "pass":
        sample = [r.asDict() for r in v.limit(sample_limit).collect()]
    if cfg.store_failures and store_dir and (n or 0) > 0:
        safe = re.sub(r"[^A-Za-z0-9_]+", "_", t.describe())[:120]
        v.write.mode("overwrite").parquet(os.path.join(store_dir, f"{model_name}__{safe}"))
    return TestResult(model_name, t.describe(), status != "error", sample, status, n)


def run_model_tests(
    df: DataFrame,
    tests: list[DataTest],
    model_name: str,
    sample_limit: int = 5,
    store_dir: str | None = None,
) -> list[TestResult]:
    return [_evaluate(t, df, model_name, sample_limit, store_dir) for t in tests]


def run_tests(project, spark=None) -> list[TestResult]:
    """Run every registered model's tests against its built relation."""
    out: list[TestResult] = []
    for name, model in project.models.items():
        if not model.tests:
            continue
        df = project.relations.get(name)
        if df is None:
            continue
        out.extend(run_model_tests(df, model.tests, name))
    return out
