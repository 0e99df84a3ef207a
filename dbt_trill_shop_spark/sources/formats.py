"""Generic source/sink format layer (SURVEY.md §2.1).

The reference's sources are warehouse-external tables (BigQuery
``google_trends`` dataset, `models/staging/__sources.yml:4-20`); its "formats"
are whatever the warehouse ingests.  Spark-native equivalent: the DataSource
V2 readers/writers.  This module is a thin declarative wrapper so pipeline
models can say ``SourceSpec(path, fmt, schema)`` and stay format-agnostic.

Format notes at scale:

- **parquet / orc** — columnar, splittable, predicate+projection pushdown;
  the only formats that should appear in a hot path.
- **csv / json** — row formats for ingest edges only.  ALWAYS pass an
  explicit schema: inference costs an extra full pass and pins types
  nondeterministically.  Both parallelize per-file (and per-split for
  uncompressed), but carry no pushdown, so land them into parquet first.
- **text** — one string column per line; the raw-corpus ingest edge for the
  LLM pipeline ops.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READABLE = {"parquet", "orc", "csv", "json", "text"}


@dataclass(frozen=True)
class SourceSpec:
    path: str
    fmt: str = "parquet"
    schema: T.StructType | None = None
    options: dict[str, str] = field(default_factory=dict)


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    if spec.fmt not in _READABLE:
        raise ValueError(f"unsupported source format: {spec.fmt!r}")
    reader = spark.read.format(spec.fmt).options(**spec.options)
    if spec.schema is not None:
        reader = reader.schema(spec.schema)
    elif spec.fmt in ("csv", "json"):
        raise ValueError(f"{spec.fmt} sources require an explicit schema")
    return reader.load(spec.path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    if fmt not in _READABLE:
        raise ValueError(f"unsupported sink format: {fmt!r}")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_with_quarantine(
    spark: SparkSession, spec: SourceSpec
) -> tuple[DataFrame, DataFrame, "Callable[[], None]"]:
    """Malformed-row quarantine for csv/json ingest edges: PERMISSIVE mode
    routes unparseable rows into a ``_corrupt_record`` column instead of
    failing the job (FAILFAST) or silently dropping them (DROPMALFORMED)
    — at crawl scale bad rows are a certainty and deleting them unaudited
    is how ingestion bugs hide.

    Returns ``(clean, quarantine, release)``: clean rows with the corrupt
    column projected away, the raw text of every malformed record for the
    dead-letter sink, and a ``release()`` callable that unpersists the
    shared parse cache once both sides are consumed (the cache is what
    lets one scan feed both filters — Spark refuses a bare filter on the
    corrupt column; without release it would pin executor storage for the
    session lifetime).  The declared schema is REQUIRED — schema inference
    plus quarantine would mask drift as corruption.
    """
    if spec.fmt not in ("csv", "json"):
        raise ValueError("quarantine reads are for csv/json ingest edges")
    if spec.schema is None:
        raise ValueError("quarantine reads require an explicit schema")
    schema = T.StructType(
        list(spec.schema.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
        **spec.options,
    }
    raw = (
        spark.read.format(spec.fmt)
        .options(**opts)
        .schema(schema)
        .load(spec.path)
        # Spark requires caching/materialization before referencing the
        # corrupt column in a filter (the parser is lazy per column)
        .cache()
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_record")
    )
    return clean, quarantine, lambda: raw.unpersist()
