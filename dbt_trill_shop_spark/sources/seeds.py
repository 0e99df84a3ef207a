"""Seed ingestion — the ``dbt seed`` path (SURVEY.md §3.2).

Reference semantics: CSVs under ``seeds/jaffle-data/`` load into a global
``raw`` schema (``dbt_project.yml:27-31`` sets ``+schema: jaffle_shop`` ->
routed verbatim for seeds by ``macros/generate_schema_name.sql:6-7``), gated
by the ``load_source_data`` var.  dbt infers CSV types via agate; we instead
require an explicit ``StructType`` per seed (the canonical jaffle schemas are
documented at reference ``README.md:196-203`` and declared below) — schema
inference over CSVs is both slow (extra pass) and nondeterministic, which
matters at scale and for oracle checks.

Loaded seeds are registered as ``<schema>__<name>`` temp views (Spark temp
views have no database namespace; the double-underscore encodes the routed
schema) and optionally persisted as parquet tables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core.model import resolve_schema

# canonical jaffle seed schemas (reference README.md:196-203)
JAFFLE_SEED_SCHEMAS: dict[str, T.StructType] = {
    "raw_customers": T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    ),
    "raw_orders": T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("customer", T.StringType()),
            T.StructField("ordered_at", T.TimestampType()),
            T.StructField("store_id", T.StringType()),
            T.StructField("subtotal", T.LongType()),
            T.StructField("tax_paid", T.LongType()),
            T.StructField("order_total", T.LongType()),
        ]
    ),
    "raw_order_items": T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("order_id", T.StringType()),
            T.StructField("sku", T.StringType()),
        ]
    ),
    "raw_products": T.StructType(
        [
            T.StructField("sku", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("price", T.LongType()),
            T.StructField("description", T.StringType()),
        ]
    ),
    "raw_supplies": T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("cost", T.LongType()),
            T.StructField("perishable", T.BooleanType()),
            T.StructField("sku", T.StringType()),
        ]
    ),
    "raw_stores": T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("opened_at", T.TimestampType()),
            T.StructField("tax_rate", T.DoubleType()),
        ]
    ),
}


@dataclass
class SeedSpec:
    name: str
    path: str
    schema: T.StructType
    custom_schema: str = "raw"  # dbt_project.yml:29 routes seeds to `raw`
    options: dict[str, str] = field(default_factory=dict)


def load_seed(
    spark: SparkSession, spec: SeedSpec, target: str = "dev", default_schema: str = "analytics"
) -> DataFrame:
    """CSV -> typed DataFrame -> temp view ``<routed_schema>__<name>``."""
    opts = {"header": "true", **spec.options}
    df = spark.read.options(**opts).schema(spec.schema).csv(spec.path)
    schema = resolve_schema(spec.custom_schema, "seed", target, default_schema)
    df.createOrReplaceTempView(f"{schema}__{spec.name}")
    return df


def load_seeds(
    spark: SparkSession,
    seed_dir: str,
    load_source_data: bool | None = None,
    target: str = "dev",
    schemas: dict[str, T.StructType] | None = None,
    vars: dict | None = None,
) -> dict[str, DataFrame]:
    """Load every ``*.csv`` in ``seed_dir`` whose name has a declared schema.

    Gating mirrors the reference's seed config
    (``dbt_project.yml:31`` ``+enabled: "{{ var('load_source_data', false) }}"``):
    when ``vars`` is given, the ``load_source_data`` var decides (default
    false, as in the reference); the explicit ``load_source_data`` parameter
    overrides the var.  With neither supplied, seeds load (the ergonomic
    default for direct calls).
    """
    if load_source_data is None:
        enabled = bool(vars.get("load_source_data", False)) if vars is not None else True
    else:
        enabled = load_source_data
    if not enabled:
        return {}
    schemas = schemas or JAFFLE_SEED_SCHEMAS
    out: dict[str, DataFrame] = {}
    for fname in sorted(os.listdir(seed_dir)):
        if not fname.endswith(".csv"):
            continue
        name = fname[:-4]
        if name not in schemas:
            raise KeyError(f"no declared schema for seed {name!r} — seeds must be typed")
        spec = SeedSpec(name=name, path=os.path.join(seed_dir, fname), schema=schemas[name])
        out[name] = load_seed(spark, spec, target=target)
    return out
