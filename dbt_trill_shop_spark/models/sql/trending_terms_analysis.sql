{{ config(materialized='table', schema='marts') }}
-- Rising-term growth analysis over the two rising feeds on the shared geo
-- shape (plus percent_gain).  Semantics of reference
-- models/marts/trending_terms_analysis.sql:1-70: same normalization as
-- top_terms_comparison, with rank-tier and growth-category CASE ladders.
WITH unified AS (
    SELECT 'international' AS scope,
           country_name AS geo_name,
           country_code AS geo_code,
           region_name, term, week, refresh_date, score, rank, percent_gain
    FROM {{ ref('stg_international_top_rising_terms') }}
    UNION ALL
    SELECT 'us_dma',
           dma_name,
           CAST(dma_id AS STRING),
           CAST(NULL AS STRING),
           term, week, refresh_date, score, rank, percent_gain
    FROM {{ ref('stg_top_rising_terms') }}
)
SELECT *,
       CASE WHEN rank <= 5  THEN 'Top 5'
            WHEN rank <= 10 THEN 'Top 10'
            WHEN rank <= 25 THEN 'Top 25'
            ELSE 'Other' END AS rank_tier,
       CASE WHEN percent_gain >= 1000 THEN 'Explosive (1000%+)'
            WHEN percent_gain >= 500  THEN 'Very High (500-999%)'
            WHEN percent_gain >= 200  THEN 'High (200-499%)'
            WHEN percent_gain >= 100  THEN 'Moderate (100-199%)'
            ELSE 'Low (<100%)' END AS growth_category
FROM unified
