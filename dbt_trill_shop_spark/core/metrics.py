"""dbt metrics (the semantic-layer ``metrics:`` YAML grammar): declarative
aggregations over a model, compiled to ONE grouped Spark plan.

Surface mirrored: dbt's metric spec — ``calculation_method`` (sum / count /
count_distinct / average / min / max / derived), ``expression``, ``timestamp``
+ time grain, ``dimensions``, and row-level ``filters`` — the contract the
reference project would declare under ``metrics:`` in a property YAML (the
reference itself declares none, but ships dbt packages whose grammar includes
it; SURVEY.md §2.8).

Execution shape: every primary metric on a model folds into a single
``groupBy(grain, *dims)`` aggregate — filters become ``CASE WHEN`` guards
inside each aggregate, so N metrics cost one shuffle of (keys, partial
states), never N passes.  Derived metrics are post-aggregation column
expressions over their siblings, evaluated map-side on the (tiny) grouped
result.  At 100 TB the plan is the same one a hand-written rollup would get:
partial aggregation before the exchange, no per-metric scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CALCS = {"sum", "count", "count_distinct", "average", "min", "max", "derived"}

# SQL aggregate spelling per calculation method (Spark and DuckDB agree on
# these, which keeps compiled metrics oracle-checkable)
_AGG_SQL = {
    "sum": "sum",
    "count": "count",
    "count_distinct": None,  # special-cased: count(DISTINCT ...)
    "average": "avg",
    "min": "min",
    "max": "max",
}


@dataclass(frozen=True)
class Metric:
    """One declared metric (dbt ``metrics:`` entry)."""

    name: str
    model: str
    calculation_method: str
    expression: str
    timestamp: str | None = None
    dimensions: tuple[str, ...] = ()
    filters: tuple[str, ...] = ()  # SQL boolean exprs, ANDed

    def __post_init__(self) -> None:
        if self.calculation_method not in _CALCS:
            raise ValueError(
                f"metric {self.name!r}: unknown calculation_method "
                f"{self.calculation_method!r} (expected one of {sorted(_CALCS)})"
            )

    def agg_sql(self) -> str:
        """The aggregate expression for a primary metric (filters folded in as
        a CASE guard so all metrics share one grouped pass)."""
        if self.calculation_method == "derived":
            raise ValueError(f"metric {self.name!r} is derived; no direct aggregate")
        guarded = self.expression
        if self.filters:
            cond = " AND ".join(f"({f})" for f in self.filters)
            # `*` is not a value expression: a filtered count counts the guard
            payload = "1" if self.expression == "*" else self.expression
            guarded = f"CASE WHEN {cond} THEN {payload} END"
        if self.calculation_method == "count_distinct":
            return f"count(DISTINCT {guarded})"
        return f"{_AGG_SQL[self.calculation_method]}({guarded})"


def parse_metrics(spec: dict) -> list[Metric]:
    """Parse the ``metrics:`` list of a dbt property YAML (already loaded)."""
    out: list[Metric] = []
    for m in spec.get("metrics", []) or []:
        model = m.get("model", "")
        if model.startswith("ref("):
            model = model[len("ref(") : -1].strip("'\" ")
        out.append(
            Metric(
                name=m["name"],
                model=model,
                calculation_method=m.get("calculation_method", m.get("type", "")),
                expression=str(m.get("expression", "*")),
                timestamp=m.get("timestamp"),
                dimensions=tuple(m.get("dimensions", []) or []),
                filters=tuple(
                    f["expression"] if isinstance(f, dict) else str(f)
                    for f in (m.get("filters", []) or [])
                ),
            )
        )
    return out


def metric_frame(
    rel: DataFrame,
    metrics: list[Metric],
    grain: str = "week",
    dimensions: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Compile ``metrics`` (all on the same model) into one grouped DataFrame.

    Output columns: ``metric_time`` (timestamp truncated to ``grain``; only if
    a metric declares a timestamp), requested ``dimensions``, then one column
    per metric in declaration order.  Derived metrics may reference any
    earlier metric by name.
    """
    if not metrics:
        raise ValueError("no metrics to compile")
    models = {m.model for m in metrics}
    if len(models) > 1:
        raise ValueError(f"metrics span multiple models {sorted(models)}; compile per model")
    dims = tuple(dimensions)
    for m in metrics:
        missing = [d for d in dims if d not in m.dimensions]
        if m.calculation_method != "derived" and missing:
            raise ValueError(f"metric {m.name!r} does not declare dimensions {missing}")

    keys: list = []
    ts_cols = [m.timestamp for m in metrics if m.timestamp]
    if ts_cols:
        keys.append(
            F.date_trunc(grain, F.col(ts_cols[0])).cast("date").alias("metric_time")
        )
    keys.extend(F.col(d) for d in dims)

    primary = [m for m in metrics if m.calculation_method != "derived"]
    derived = [m for m in metrics if m.calculation_method == "derived"]
    aggs = [F.expr(m.agg_sql()).alias(m.name) for m in primary]
    out = rel.groupBy(*keys).agg(*aggs) if keys else rel.agg(*aggs)
    for m in derived:
        out = out.withColumn(m.name, F.expr(m.expression))
    ordered = ([F.col("metric_time")] if ts_cols else []) + [F.col(d) for d in dims]
    return out.select(*ordered, *[F.col(m.name) for m in metrics])
