"""DuckDB-dialect oracle SQL: fixture + staging CTE prelude.

Mirrors ``fixtures/trends_fixtures.py`` (the Spark derivations) and the 4
staging projections (``models/staging/stg_*.sql``) as a WITH-clause prelude
that every trends oracle query is prefixed with.  Expressions are written to
be *bit-identical* to the Spark side:

- integer arithmetic only (``%``, ``floor`` -> BIGINT) for score/gain;
- ``date_trunc('week', ts)`` truncates to Monday in both engines;
- window ``row_number`` fully tie-broken by a unique key (event_id /
  o_orderkey) so ranks are deterministic;
- the scalar ``refresh_date`` is a cross-joined 1-row aggregate, like the
  broadcast cross join on the Spark side.
"""

from __future__ import annotations

FIXTURE_CTES = """
_ev AS (
    SELECT
        user_id % 50                                   AS dma_id,
        'dma_' || CAST(user_id % 50 AS VARCHAR)        AS dma_name,
        event_type                                     AS term,
        CAST(date_trunc('week', ts) AS DATE)           AS week,
        LEAST(CAST(FLOOR(value) AS BIGINT) % 101, 100) AS score,
        event_id
    FROM events
),
_ev_rd AS (SELECT MAX(CAST(ts AS DATE)) AS refresh_date FROM events),
top_terms AS (
    SELECT dma_id, dma_name, term, week, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY week, dma_id
                                   ORDER BY score DESC, event_id ASC) AS BIGINT) AS rank,
           refresh_date
    FROM _ev CROSS JOIN _ev_rd
),
top_rising_terms AS (
    SELECT dma_id, dma_name, term, week, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY week, dma_id
                                   ORDER BY score DESC, event_id ASC) AS BIGINT) AS rank,
           refresh_date,
           event_id % 1500 AS percent_gain
    FROM _ev CROSS JOIN _ev_rd
),
_intl AS (
    SELECT
        'C' || CAST(n_nationkey AS VARCHAR)            AS country_code,
        n_name                                         AS country_name,
        CASE WHEN r_name = 'AFRICA' THEN NULL
             ELSE 'R' || CAST(r_regionkey AS VARCHAR) END AS region_code,
        NULLIF(r_name, 'AFRICA')                       AS region_name,
        o_orderpriority                                AS term,
        CAST(date_trunc('week', o_orderdate) AS DATE)  AS week,
        LEAST(CAST(FLOOR(o_totalprice) AS BIGINT) % 101, 100) AS score,
        o_orderkey
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
),
_intl_rd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS refresh_date FROM orders),
international_top_terms AS (
    SELECT country_code, country_name, region_code, region_name, term, week, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY week, country_name
                                   ORDER BY score DESC, o_orderkey ASC) AS BIGINT) AS rank,
           refresh_date
    FROM _intl CROSS JOIN _intl_rd
),
international_top_rising_terms AS (
    SELECT country_code, country_name, region_code, region_name, term, week, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY week, country_name
                                   ORDER BY score DESC, o_orderkey ASC) AS BIGINT) AS rank,
           refresh_date,
           o_orderkey % 1500 AS percent_gain
    FROM _intl CROSS JOIN _intl_rd
)
""".strip()

# Staging projections (models/staging/stg_*.sql: "renamed" CTE column lists).
STAGING_CTES = """
stg_top_terms AS (
    SELECT dma_id, dma_name, term, refresh_date, week, score, rank
    FROM top_terms
),
stg_top_rising_terms AS (
    SELECT dma_id, dma_name, term, refresh_date, week, score, rank, percent_gain
    FROM top_rising_terms
),
stg_international_top_terms AS (
    SELECT country_code, region_code, country_name, region_name,
           refresh_date, week, term, score, rank
    FROM international_top_terms
),
stg_international_top_rising_terms AS (
    SELECT country_code, region_code, country_name, region_name,
           refresh_date, week, term, score, rank, percent_gain
    FROM international_top_rising_terms
)
""".strip()


def with_prelude(body: str, extra_ctes: str | None = None) -> str:
    """Wrap a SELECT (optionally with its own leading CTEs) in the fixture +
    staging prelude.  ``extra_ctes`` must be "name AS (...), name2 AS (...)"."""
    ctes = FIXTURE_CTES + ",\n" + STAGING_CTES
    if extra_ctes:
        ctes += ",\n" + extra_ctes.strip()
    return f"WITH {ctes}\n{body.strip()}"
