{{ config(materialized='view') }}
-- US rising-terms projection (reference models/staging/stg_top_rising_terms.sql:1-32)
SELECT dma_id, dma_name, term, refresh_date, week, score, rank, percent_gain
FROM {{ source('ecom', 'top_rising_terms') }}
