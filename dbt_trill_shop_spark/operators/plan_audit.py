"""Mechanical scale audit over physical plans — the invariant checker
behind the round-5 sweep that caught four defects per-query review missed
(dedup_exact's raw-text shuffle; partition-less corpus cumsums in
abc_analysis, mannwhitney, curation_pipeline_v2).

A plan is flagged when it contains any of:

- ``Exchange SinglePartition`` whose nearest ancestor is NOT a keyless
  aggregate (the benign scalar partial→final combiner shape) — the
  single-task funnel that breaks at 100×;
- ``CartesianProduct`` — a non-broadcast all-pairs join;
- ``BatchEvalPython`` — a row-at-a-time Python UDF (Arrow paths render as
  ArrowEvalPython / MapInPandas instead);
- a ``text#``/``vec``/``embedding#`` column referenced on an
  ``Exchange hashpartitioning`` line — document/vector payloads riding a
  shuffle that should carry ids, keys, or codes.

Single-partition hits are then classified against an explicit allowlist of
queries whose flagged window/sort input is bounded BY CONSTRUCTION
(calendar days, NTILE deciles, Benford digits, |event-types|³ paths, the
two-phase helpers' per-bucket offsets relations).  Anything new fails the
DEFAULT suite (``tests/test_oracle_parity.py`` audits every query's plan
inside the parity chunk — promoted out of the opt-in PLAN_AUDIT=1 sweep
per VERDICT r5 #2), so a query added or refactored with a corpus-scaled
single-task shape is caught the round it lands, not two verdicts later.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["audit_plan", "SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION"]

# Queries whose non-combiner Exchange SinglePartition inputs are bounded by
# construction (reason documented per entry; audited 2026-08, round 5).
SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION: dict[str, str] = {
    # reference models: final global ORDER BY of a <=25k-row aggregate (the
    # reference's own output contract orders the full result)
    "stg_top_terms": "final presentation sort of bounded staging output",
    "stg_top_rising_terms": "final presentation sort of bounded staging output",
    "stg_international_top_terms": "final presentation sort of bounded staging output",
    "stg_international_top_rising_terms": "final sort of bounded staging output",
    "weekly_trends_summary": "final sort of per-week aggregate (<=700 rows)",
    "top_terms_comparison": "final sort of bounded mart output",
    "trending_terms_analysis": "final sort of bounded mart output",
    # two-phase rewrites: the only global window/sort covers the per-bucket
    # offsets relation (bucket-domain-sized, not input-sized)
    "x_ppl_buckets": "two-phase offsets relation (__tp_bk)",
    "x_length_bias": "two-phase offsets relation (__tp_bk)",
    "q_rfm_segments": "two-phase offsets relation (__tp_bk)",
    "q_gini": "two-phase offsets relation (__tp_bk)",
    "q_mannwhitney": "two-phase offsets relation (__tp_bk)",
    "q_abc_analysis": "two-phase offsets relation (__tp_bk)",
    "x_quality_auc": "two-phase offsets relation (__tp_bk)",
    "q_ks_test": "two-phase offsets relation (per-quantile-bucket)",
    "q_theilsen_trend": "two-phase offsets relation (per-quantile-bucket)",
    "x_curriculum_order": "two-phase offsets relation (__tp_bk)",
    "x_curation_pipeline_v2": "two-phase offsets relation (__tp_bk)",
    "x_training_order": "two-phase offsets relation (__tp_bk)",
    "x_token_budget_select": "per-score offsets + single boundary group",
    # windows/sorts over relations bounded by construction
    "q_lorenz_curve": "cumsum over <=10 deciles",
    "q_kaplan_meier": "per-distinct-event-day relation (calendar-bounded)",
    "q_spearman": "per-distinct-DAILY-value rank (calendar-bounded)",
    "q_benford": "9 leading digits",
    "q_runs_test": "daily median sign series (calendar-bounded)",
    "q_histogram_quantiles": "fixed histogram bins",
    "x_vocab_growth": "fixed corpus-prefix buckets",
    "q_ma_crossover": "daily series (calendar-bounded)",
    "q_adoption_curve": "daily first-seen series (calendar-bounded)",
    "q_session_paths": "|event-types|^3 path space",
    "q_profile_orders": "keyless SortAggregate combiner (key=[] singular)",
    "x_stopword_discovery": "TakeOrderedAndProject top-k below the rank window",
}

_BENIGN_PARENT = re.compile(
    r"(Hash|Sort|ObjectHash)Aggregate\(keys?=\[\]"
)
_PAYLOAD_IN_SHUFFLE = re.compile(r"\b(text|vec|embedding|emb)#\d+")


def _depth(line: str) -> int:
    return len(re.match(r"^[\s+:*-]*", line).group(0))


def audit_plan(df: DataFrame) -> list[str]:
    """Return scale-defect flags for a DataFrame's physical plan (empty =
    clean).  See module docstring for the flag taxonomy."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    flags: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            parent = ""
            d = _depth(ln)
            for j in range(i - 1, -1, -1):
                if lines[j].strip() and _depth(lines[j]) < d:
                    parent = lines[j].strip()
                    d = _depth(lines[j])
                    # post-AQE plans interpose materialized-stage wrappers
                    # (ShuffleQueryStage / AQEShuffleRead / ReusedExchange)
                    # between the exchange and its true consumer — keep
                    # walking up so the combiner check sees the consumer
                    if re.search(
                        r"(QueryStage|AQEShuffleRead|ReusedExchange|"
                        r"ShuffleExchange|Exchange SinglePartition)",
                        parent,
                    ):
                        continue
                    break
            if not _BENIGN_PARENT.search(parent):
                flags.append(f"single-partition-exchange under: {parent[:100]}")
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python-udf")
    for ln in lines:
        if "Exchange hashpartitioning" in ln and _PAYLOAD_IN_SHUFFLE.search(ln):
            flags.append(f"payload-in-shuffle: {ln.strip()[:100]}")
            break
    return flags
