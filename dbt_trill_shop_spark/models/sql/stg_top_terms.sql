{{ config(materialized='view') }}
-- typed projection over the raw US top-terms source, grouped column order
-- (semantics of reference models/staging/stg_top_terms.sql:1-33)
SELECT dma_id, dma_name, term, refresh_date, week, score, rank
FROM {{ source('ecom', 'top_terms') }}
