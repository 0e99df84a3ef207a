{# Project macro definitions, loaded by core/jinja_lite.load_macro_files.
   cents_to_dollars mirrors the reference's adapter-dispatch idiom
   (macros/cents_to_dollars.sql:3-17): the entry macro dispatches to a
   per-adapter variant; our spark__ variant produces the same rounded
   2-dp value the BigQuery variant does (functions/macros.py is the
   DataFrame-API twin of the same semantics). #}

{% macro cents_to_dollars(column_name) -%}
    {{ return(adapter.dispatch('cents_to_dollars')(column_name)) }}
{%- endmacro %}

{% macro default__cents_to_dollars(column_name) -%}
    CAST(({{ column_name }}) / 100 AS DECIMAL(16, 2))
{%- endmacro %}

{% macro spark__cents_to_dollars(column_name) -%}
    ROUND(({{ column_name }}) / 100, 2)
{%- endmacro %}
