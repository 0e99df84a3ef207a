"""Multimodal column handling (SURVEY.md §2.9): image/audio/video as opaque
``binary`` payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

Design for 100 TB:
- blobs stay **out of row** where possible (uri column; ``binaryFile`` source
  loads them lazily), and in-row ``binary`` columns are only carried through
  narrow pipelines (no shuffle of blob columns — project them away before any
  join/groupBy and re-join by id afterwards);
- decode / resize / frame-sample run as ``mapInPandas`` over Arrow batches —
  one Python roundtrip per batch, not per row;
- the actual codec calls (PIL/librosa/ffmpeg) are STUBBED here — the
  container has no media libraries — behind ``DECODERS``; the Spark-side
  plumbing (schemas, batching, partition sizing) is real and tested with the
  deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("uri", StringType(), True),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def _fake_image_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real decoder (PIL not installed):
    pretends the payload is a (width, height) derived from its length."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _real_image_decode(payload: bytes) -> tuple[int, int]:
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "swap DECODERS['image'] for a real implementation in production"
    )


DECODERS: dict[str, Callable[[bytes], tuple[int, int]]] = {
    "image/fake": _fake_image_decode,
    "image/png": _real_image_decode,
    "image/jpeg": _real_image_decode,
}


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as an opaque binary payload
    so the multimodal plumbing is exercisable with the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id").cast("string")).alias("uri"),
        F.lit("image/fake").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    The UDF sees pandas DataFrames (one per Arrow batch); per-batch vectorized
    metadata plus a per-row decoder call — the pattern a real image pipeline
    uses (decode cost dominates; Arrow transfer is amortized).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [
                DECODERS.get(m, _real_image_decode)(p) if p is not None else (None, None)
                for m, p in zip(pdf["mime"], payloads)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None for p in payloads
                    ],
                }
            )

    # project away nothing here — media is already narrow; callers must drop
    # `payload` before any wide operation (see module docstring).
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# Oracle for extract_features(docs_as_media(documents)): the fake decoder is
# pure arithmetic on byte length, so the whole mapInPandas path is
# SQL-checkable (octet_length = UTF-8 byte count = len(payload)).
MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       'image/fake' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
       md5(text) AS checksum
FROM documents
"""


FRAME_SAMPLE_SQL_TEMPLATE = """
SELECT doc_id AS media_id,
       'mem://doc/' || CAST(doc_id AS VARCHAR) AS uri,
       unnest(generate_series(0,
              GREATEST(CAST(octet_length(encode(text)) // 1000 AS BIGINT) - 1, 0),
              {every_n})) AS frame_idx
FROM documents
"""


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into frame-index
    rows (0, every_n, 2*every_n, ... based on fake duration = n_bytes//1000)
    without touching payloads — the decode of selected frames happens in
    ``extract_features``-style UDFs downstream.  Pure Column exprs."""
    duration = (F.length("payload").cast("long") / 1000).cast("long")
    return media.select(
        "media_id",
        "uri",
        F.explode(
            F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


RESIZE_TARGET = (224, 224)


def resize_plan(media: DataFrame, target: tuple[int, int] = RESIZE_TARGET) -> DataFrame:
    """Resize planning: compute each image's decode dims (fake decoder) and
    the letterboxed output geometry for a ``target`` canvas — scale factor in
    1e-6 fixed-point so the arithmetic is integer-exact cross-engine.  The
    actual pixel resample would run inside the same mapInPandas pass as
    ``extract_features`` (stubbed: no imaging libs in this container)."""
    feats = extract_features(media)
    tw, th = target
    # fixed-point scale = floor(1e6 * min(tw/w, th/h)); explicit FLOOR on
    # every double->int step (Spark casts truncate, DuckDB casts round — a
    # bare cast would silently disagree)
    scale = F.least(
        F.floor(F.lit(tw * 1_000_000) / F.col("width")),
        F.floor(F.lit(th * 1_000_000) / F.col("height")),
    )
    return feats.select(
        "media_id",
        "width",
        "height",
        scale.alias("scale_micro"),
        F.floor(F.col("width") * scale / 1_000_000).alias("out_width"),
        F.floor(F.col("height") * scale / 1_000_000).alias("out_height"),
    )


RESIZE_PLAN_SQL = """
WITH feats AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height
    FROM documents
),
scaled AS (
    SELECT media_id, width, height,
           LEAST(CAST(FLOOR(224000000.0 / width) AS BIGINT),
                 CAST(FLOOR(224000000.0 / height) AS BIGINT)) AS scale_micro
    FROM feats
)
SELECT media_id, width, height, scale_micro,
       CAST(FLOOR(width * scale_micro / 1000000.0) AS BIGINT) AS out_width,
       CAST(FLOOR(height * scale_micro / 1000000.0) AS BIGINT) AS out_height
FROM scaled
"""


PATCH_SIZE = 16


def patch_grid_plan(media: DataFrame, patch: int = PATCH_SIZE) -> DataFrame:
    """ViT-style patch tokenization plan: number of non-overlapping
    ``patch`` x ``patch`` patches per image (floor division — edge remainders
    are cropped, the standard ViT choice) and the resulting token count.
    Pure integer arithmetic over the fake-decoded dims; the patch pixel
    extraction itself would ride the same mapInPandas pass as
    :func:`extract_features`."""
    feats = extract_features(media)
    rows = F.floor(F.col("height") / patch).cast("bigint")
    cols = F.floor(F.col("width") / patch).cast("bigint")
    return feats.select(
        "media_id",
        "width",
        "height",
        rows.alias("patch_rows"),
        cols.alias("patch_cols"),
        (rows * cols).alias("n_patches"),
    )


PATCH_GRID_SQL_TEMPLATE = """
WITH feats AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height
    FROM documents
)
SELECT media_id, width, height,
       CAST(FLOOR(height / {patch}) AS BIGINT) AS patch_rows,
       CAST(FLOOR(width / {patch}) AS BIGINT) AS patch_cols,
       CAST(FLOOR(height / {patch}) * FLOOR(width / {patch}) AS BIGINT) AS n_patches
FROM feats
"""


AUDIO_SAMPLE_RATE = 16000  # Hz; fake metadata derives n_samples from bytes
AUDIO_BYTES_TO_SAMPLES = 16


def audio_window_plan(
    media: DataFrame, window: int = 400, hop: int = 160
) -> DataFrame:
    """ASR-style audio framing plan: sliding sample windows (default 25 ms
    window / 10 ms hop at 16 kHz) per audio blob — the batch-shape step
    before any acoustic featurizer (the decode itself is the env-stubbed
    Pandas-UDF path, see module docstring).

    Metadata-only arithmetic: ``n_samples`` derives from the payload byte
    length (fake decoder convention, like width/height for images), the
    window lattice is an int64 ``sequence`` explode — no UDF, no shuffle;
    start/end sample indices and exact µs timestamps are all integer ops.
    Only FULL windows are emitted (blobs shorter than one window yield no
    rows), matching fixed-frame featurizer semantics.
    """
    n_samples = (F.octet_length("payload") * AUDIO_BYTES_TO_SAMPLES).cast("bigint")
    base = media.select(
        "media_id", n_samples.alias("n_samples")
    ).filter(F.col("n_samples") >= window)
    n_win = F.expr(f"(n_samples - {window}) div {hop} + 1")
    out = base.select(
        "media_id",
        "n_samples",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_win - 1)).alias("win_idx"),
    )
    start = F.col("win_idx") * hop
    return out.select(
        "media_id",
        "n_samples",
        "win_idx",
        start.alias("start_sample"),
        (start + window - 1).alias("end_sample"),
        F.expr(f"(win_idx * {hop}) * 1000000 div {AUDIO_SAMPLE_RATE}").alias("start_us"),
    )


AUDIO_WINDOW_SQL_TEMPLATE = """
WITH media AS (
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) * 16 AS BIGINT) AS n_samples
    FROM documents
)
SELECT media_id, n_samples,
       CAST(win_idx AS BIGINT) AS win_idx,
       CAST(win_idx * {hop} AS BIGINT) AS start_sample,
       CAST(win_idx * {hop} + {window} - 1 AS BIGINT) AS end_sample,
       CAST((win_idx * {hop}) * 1000000 // 16000 AS BIGINT) AS start_us
FROM (
    SELECT media_id, n_samples,
           unnest(generate_series(0, (n_samples - {window}) // {hop})) AS win_idx
    FROM media
    WHERE n_samples >= {window}
)
"""
