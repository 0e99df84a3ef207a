"""Full-registry mechanical scale audit (opt-in: PLAN_AUDIT=1).

Builds every registered query's physical plan at the test SF (driver-side
only — nothing executes) and asserts no query carries an unclassified
scale-defect shape: a non-combiner Exchange SinglePartition, a cartesian
product, a row-at-a-time Python UDF, or a text/vector payload on a hash
shuffle.  Queries whose single-partition input is bounded by construction
are allowlisted WITH REASONS in
``dbt_trill_shop_spark.operators.plan_audit``; a new query (or a refactor
of an old one) that reintroduces a corpus-scaled single-task shape fails
here the round it lands.

Opt-in because building ~287 plans costs ~2-3 min — run it whenever the
registry or an operator's plan shape changes:

    PLAN_AUDIT=1 python -m pytest tests/test_plan_audit.py -q
"""

from __future__ import annotations

import os

import pytest

from dbt_trill_shop_spark.operators.plan_audit import (
    SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION,
    audit_plan,
)


@pytest.mark.skipif(
    os.environ.get("PLAN_AUDIT") != "1",
    reason="full-registry plan audit is opt-in (PLAN_AUDIT=1); ~2-3 min",
)
def test_all_registered_plans_are_scale_clean(spark, sf_dir):
    from dbt_trill_shop_spark.harness import QUERIES

    bad: dict[str, list[str]] = {}
    for name, q in QUERIES.items():
        flags = audit_plan(q.fn(spark, sf_dir))
        if name in SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION:
            flags = [f for f in flags if not f.startswith("single-partition")]
        if flags:
            bad[name] = flags
    assert not bad, "\n".join(f"{k}: {v}" for k, v in sorted(bad.items()))


def test_allowlist_names_are_registered():
    """Every allowlist entry must name a live query — a renamed or removed
    query must take its classification reason with it."""
    from dbt_trill_shop_spark.harness import QUERIES

    stale = set(SP_EXCHANGE_BOUNDED_BY_CONSTRUCTION) - set(QUERIES)
    assert not stale, sorted(stale)
