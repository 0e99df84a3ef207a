{{ config(materialized='table', schema='marts') }}
-- US + international top terms normalized onto one geo shape, then labeled.
-- Semantics of reference models/marts/top_terms_comparison.sql:1-67: the US
-- branch casts dma_id to string for geo_code and carries a typed-NULL
-- region_name so the positional UNION ALL coerces deterministically; the
-- rank/score CASE ladders append the two category columns.
WITH unified AS (
    SELECT 'international' AS scope,
           country_name AS geo_name,
           country_code AS geo_code,
           region_name, term, week, refresh_date, score, rank
    FROM {{ ref('stg_international_top_terms') }}
    UNION ALL
    SELECT 'us_dma',
           dma_name,
           CAST(dma_id AS STRING),
           CAST(NULL AS STRING),
           term, week, refresh_date, score, rank
    FROM {{ ref('stg_top_terms') }}
)
SELECT *,
       CASE WHEN rank = 1  THEN '#1 Term'
            WHEN rank <= 5 THEN 'Top 5'
            WHEN rank <= 10 THEN 'Top 10'
            ELSE 'Other' END AS rank_category,
       CASE WHEN score >= 80 THEN 'Very High Interest'
            WHEN score >= 60 THEN 'High Interest'
            WHEN score >= 40 THEN 'Moderate Interest'
            WHEN score >= 20 THEN 'Low Interest'
            ELSE 'Very Low Interest' END AS interest_level
FROM unified
