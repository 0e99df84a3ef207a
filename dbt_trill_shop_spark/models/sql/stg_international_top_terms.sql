{{ config(materialized='view') }}
-- international top-terms projection (reference models/staging/stg_international_top_terms.sql:1-31)
SELECT country_code, region_code, country_name, region_name,
       term, refresh_date, week, score, rank
FROM {{ source('ecom', 'international_top_terms') }}
