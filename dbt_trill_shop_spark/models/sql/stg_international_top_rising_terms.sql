{{ config(materialized='view') }}
-- international rising-terms projection (reference models/staging/stg_international_top_rising_terms.sql:1-30)
SELECT country_code, region_code, country_name, region_name,
       term, refresh_date, week, score, rank, percent_gain
FROM {{ source('ecom', 'international_top_rising_terms') }}
