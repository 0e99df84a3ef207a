"""Registry-wide mechanical scale audit — DEFAULT-ON since round 6.

The audit itself (non-combiner Exchange SinglePartition, cartesian product,
row-at-a-time Python UDF, text/vector payload on a hash shuffle) runs inside
tests/test_oracle_parity.py for EVERY registered query: the parity chunk has
already built each DataFrame, so the audit costs one plan-string render +
regex per query and a corpus-scaled single-task shape fails the default
suite the round it lands (VERDICT r5 #2 — previously this was an opt-in
PLAN_AUDIT=1 sweep that only ran when someone remembered the env var, which
is exactly how curation_pipeline_v2's stale inlined shape slipped through
r4).  Queries whose single-partition input is bounded by construction are
allowlisted WITH REASONS in ``dbt_trill_shop_spark.operators.plan_audit``;
this module pins the allowlist's hygiene.
"""

from __future__ import annotations

from dbt_trill_shop_spark.operators.plan_audit import (
    SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION,
)


def test_allowlist_names_are_registered():
    """Every allowlist entry must name a live query — a renamed or removed
    query must take its classification reason with it."""
    from dbt_trill_shop_spark.harness import QUERIES

    stale = set(SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION) - set(QUERIES)
    assert not stale, sorted(stale)


def test_allowlist_reasons_are_real():
    for name, reason in SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION.items():
        assert isinstance(reason, str) and len(reason) >= 10, name
