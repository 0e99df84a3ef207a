{{ config(materialized='table', schema='marts') }}
-- Weekly roll-up across all four trend feeds, one row per
-- (week, refresh_date, trend_type).  Semantics of reference
-- models/marts/weekly_trends_summary.sql:1-110: rising feeds aggregate
-- percent_gain while top feeds carry typed NULLs; the international pair
-- counts distinct countries and the US pair distinct DMAs, renamed to a
-- shared unique_geos on the outer union; category labels derive from the
-- trend_type string.  Each branch pre-aggregates BEFORE the union, so the
-- shuffle runs on the small grouped side, not the raw feeds.
WITH intl AS (
    SELECT week, refresh_date, 'international_rising' AS trend_type,
           COUNT(*) AS total_terms,
           AVG(score) AS avg_score,
           AVG(percent_gain) AS avg_percent_gain,
           MAX(percent_gain) AS max_percent_gain,
           COUNT(DISTINCT country_name) AS unique_countries
    FROM {{ ref('stg_international_top_rising_terms') }}
    GROUP BY week, refresh_date
    UNION ALL
    SELECT week, refresh_date, 'international_top',
           COUNT(*), AVG(score),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           COUNT(DISTINCT country_name)
    FROM {{ ref('stg_international_top_terms') }}
    GROUP BY week, refresh_date
),
us AS (
    SELECT week, refresh_date, 'us_rising' AS trend_type,
           COUNT(*) AS total_terms,
           AVG(score) AS avg_score,
           AVG(percent_gain) AS avg_percent_gain,
           MAX(percent_gain) AS max_percent_gain,
           COUNT(DISTINCT dma_name) AS unique_dmas
    FROM {{ ref('stg_top_rising_terms') }}
    GROUP BY week, refresh_date
    UNION ALL
    SELECT week, refresh_date, 'us_top',
           COUNT(*), AVG(score),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           COUNT(DISTINCT dma_name)
    FROM {{ ref('stg_top_terms') }}
    GROUP BY week, refresh_date
),
unioned AS (
    SELECT week, refresh_date, trend_type, total_terms, avg_score,
           avg_percent_gain, max_percent_gain,
           unique_countries AS unique_geos
    FROM intl
    UNION ALL
    SELECT week, refresh_date, trend_type, total_terms, avg_score,
           avg_percent_gain, max_percent_gain, unique_dmas
    FROM us
)
SELECT week, refresh_date, trend_type, total_terms,
       ROUND(avg_score, 2) AS avg_score,
       ROUND(avg_percent_gain, 2) AS avg_percent_gain,
       max_percent_gain, unique_geos,
       CASE WHEN trend_type LIKE '%rising%' THEN 'Rising Trends'
            ELSE 'Top Trends' END AS trend_category,
       CASE WHEN trend_type LIKE 'international%' THEN 'International'
            ELSE 'US Market' END AS market_scope
FROM unioned
ORDER BY week DESC, trend_type
