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

from pyspark.sql import DataFrame, Window
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
        StructField("media_id", LongType(), True),
        StructField("uri", StringType(), True),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        # nullable (r7): the adapter passes source ids through verbatim and
        # a NULL id is schema-legal input — a False here makes codegen read
        # the Arrow batch with an unchecked getLong and crash the task
        # ("Value at index is null") instead of propagating the NULL.
        StructField("media_id", LongType(), True),
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


def _pil_image_decode(payload: bytes) -> tuple[int, int]:
    """Real decoder: PIL header read (lazy — no pixel decode for size)."""
    import io

    from PIL import Image  # type: ignore[import-not-found]

    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height


def _imageio_image_decode(payload: bytes) -> tuple[int, int]:
    """Real decoder fallback: imageio full decode (shape = h, w[, c])."""
    import imageio.v3 as iio  # type: ignore[import-not-found]

    arr = iio.imread(payload)
    return int(arr.shape[1]), int(arr.shape[0])


def _stdlib_header_decode(payload: bytes) -> tuple[int, int]:
    """Third decoder tier (VERDICT r4 #5): pure-stdlib dimension parse of
    REAL PNG and JPEG containers — the formats' headers carry (w, h)
    directly, so no pixel codec is needed for the feature-extraction
    columns this pipeline reads.  PNG: the IHDR chunk is mandated first,
    width/height big-endian at bytes 16..24 — the payload is length- and
    IHDR-validated before slicing so a truncated file raises instead of
    returning dimensions parsed from short slices (ADVICE r5).  JPEG: walk
    the marker stream to the first SOFn frame header (height at +5, width
    at +7), skipping spec-legal 0xFF fill/padding bytes before each marker
    and stopping at EOI (ADVICE r5: a fill byte is NOT a segment and must
    not have a length field read from its following bytes).  Anything else
    raises the documented NotImplementedError."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # 8 signature + 4 length + 4 type + 13 IHDR body = 29 bytes minimum
        if (
            len(payload) < 29
            or int.from_bytes(payload[8:12], "big") != 13
            or payload[12:16] != b"IHDR"
        ):
            raise NotImplementedError("truncated or malformed PNG header")
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                break
            # skip 0xFF fill/padding bytes preceding a marker (B.1.1.2)
            while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(payload):
                break
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI: no frame header found
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(payload):
                    break  # truncated SOF segment
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
            else:
                if i + 4 > len(payload):
                    break  # truncated length field
                i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        raise NotImplementedError("JPEG payload has no SOF frame header")
    raise NotImplementedError(
        "payload is neither PNG nor JPEG; full-codec decoding requires PIL "
        "or imageio (not in this container) — DECODERS picks either up "
        "automatically when installed"
    )


def _real_image_decode(payload: bytes) -> tuple[int, int]:
    """Import-guarded real decoder (VERDICT r2 #6): PIL if present, else
    imageio, else the vendored stdlib PNG/JPEG header parser.  The guard
    runs per-executor at first call and memoizes, so a worker with PIL
    decodes any format while this container (no media libs) still decodes
    real PNG/JPEG containers via their headers — the deterministic fake
    twin remains the oracle path either way."""
    impl = globals().get("_REAL_DECODE_IMPL")
    if impl is None:
        try:
            import PIL  # noqa: F401  type: ignore[import-not-found]

            impl = _pil_image_decode
        except ImportError:
            try:
                import imageio  # noqa: F401  type: ignore[import-not-found]

                impl = _imageio_image_decode
            except ImportError:
                impl = _stdlib_header_decode
        globals()["_REAL_DECODE_IMPL"] = impl
    return impl(payload)


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


def perceptual_hash_neardup(
    media: DataFrame,
    hamming_max: int = 3,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """dHash perceptual near-duplicate detection over media payloads: sample
    65 evenly-strided points from each payload, hash bit i = (sample_i >
    sample_{i+1}) — the gradient-sign fingerprint real image dedup uses on
    a downscaled 8x8 luminance grid (here the sample stream is the payload
    itself, so the whole path stays engine-checkable without a codec; a real
    decoder swaps in upstream of the sampling, the banding/verify machinery
    is unchanged).

    The 64-bit hash is held as FOUR 16-bit band ints: candidate pairs come
    from equality self-joins on any (band_idx, band_value).  Pigeonhole
    guarantees a clean shared band only while hamming < 4 (the band
    count) — the default threshold stays under that bound, so candidate
    generation is COMPLETE for the advertised radius; a larger radius
    needs more/narrower bands (recall<1 otherwise).  Exact Hamming over
    all four bands (XOR + bit_count) verifies candidates.
    Banded-join + verify is the same scale shape as MinHash/SimHash: no
    all-pairs, shuffle keyed on short band values.  Payloads shorter than
    66 samples are skipped (no stable gradient exists).
    """
    # chars bound once as an array: strided substring() samples would each
    # re-seek the string from the front (same lesson as patch stats)
    base = media.select(
        F.col(id_col).alias("mid"),
        F.split(F.col(payload_col).cast("string"), "").alias("cs"),
    ).withColumn("n", F.size("cs"))
    strided = base.filter(F.col("n") >= 66).withColumn(
        "stride", F.greatest(F.lit(1), F.floor(F.col("n") / 66)).cast("int")
    )
    sampled = strided.select(
        "mid",
        F.expr(
            "transform(sequence(0, 64), "
            "i -> ascii(element_at(cs, cast(1 + i * stride as int))))"
        ).alias("s"),
    )
    banded = sampled.select(
        "mid",
        F.expr(
            "transform(sequence(0, 3), j -> aggregate(sequence(0, 15), "
            "cast(0 as bigint), (acc, i) -> acc + CASE WHEN "
            "element_at(s, cast(16 * j + i + 1 as int)) > "
            "element_at(s, cast(16 * j + i + 2 as int)) "
            "THEN shiftleft(cast(1 as bigint), i) ELSE cast(0 as bigint) END))"
        ).alias("bands"),
    ).localCheckpoint(eager=True)
    exploded = banded.select("mid", F.posexplode("bands").alias("band_idx", "bv"))
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.mid") < F.col("b.mid")),
        )
        .select(F.col("a.mid").alias("id_a"), F.col("b.mid").alias("id_b"))
        .distinct()
    )
    ba = banded.select(F.col("mid").alias("id_a"), F.col("bands").alias("bands_a"))
    bb = banded.select(F.col("mid").alias("id_b"), F.col("bands").alias("bands_b"))
    hamming = F.expr(
        "aggregate(zip_with(bands_a, bands_b, (x, y) -> bit_count(x ^ y)), "
        "0, (acc, h) -> acc + h)"
    )
    return (
        cand.join(ba, "id_a")
        .join(bb, "id_b")
        .select("id_a", "id_b", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
        .orderBy("id_a", "id_b")
    )


PHASH_NEARDUP_SQL_TEMPLATE = """
WITH base AS (
    SELECT doc_id AS mid, text AS t, LENGTH(text) AS n FROM documents
    WHERE LENGTH(text) >= 66
),
strided AS (
    SELECT mid, t, GREATEST(1, CAST(n // 66 AS INT)) AS stride FROM base
),
sampled AS (
    SELECT mid,
           list_transform(range(0, 65),
                          i -> ascii(substr(t, CAST(1 + i * stride AS INT), 1))) AS s
    FROM strided
),
banded AS (
    SELECT mid,
           list_transform(range(0, 4), j ->
               CAST(list_sum(list_transform(range(0, 16), i ->
                   CASE WHEN s[CAST(16 * j + i + 1 AS INT)]
                             > s[CAST(16 * j + i + 2 AS INT)]
                        THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS bands
    FROM sampled
),
exploded AS (
    SELECT mid, i AS band_idx, bands[CAST(i + 1 AS INT)] AS bv
    FROM banded, UNNEST(range(0, 4)) AS u(i)
),
cand AS (
    SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
    FROM exploded a JOIN exploded b
      ON a.band_idx = b.band_idx AND a.bv = b.bv AND a.mid < b.mid
)
SELECT id_a, id_b,
       CAST(list_sum(list_transform(range(1, 5),
                j -> bit_count(xor(ba.bands[CAST(j AS INT)],
                                   bb.bands[CAST(j AS INT)])))) AS BIGINT)
           AS hamming
FROM cand
JOIN banded ba ON ba.mid = id_a
JOIN banded bb ON bb.mid = id_b
WHERE CAST(list_sum(list_transform(range(1, 5),
              j -> bit_count(xor(ba.bands[CAST(j AS INT)],
                                 bb.bands[CAST(j AS INT)])))) AS BIGINT)
          <= {hamming_max}
ORDER BY id_a, id_b
"""


def patch_intensity_stats(
    media: DataFrame,
    patch_bytes: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-patch intensity statistics over the payload byte stream: tile
    each payload into ``patch_bytes`` tiles and compute each tile's sample
    count, integer intensity sum, and mean (milli-units, integer division)
    — the aggregation a ViT-style preprocessor runs per patch after decode
    (here the payload stream stands in for pixels, keeping the whole path
    engine-checkable; a real decoder feeds the same tiling).

    Narrow plan: one posexplode over the per-row tile sequence, intensity
    summed inside the tile via an array fold over bound columns.  Tile
    count is ceil(n/patch_bytes) per row — bounded fan-out, no shuffle.
    """
    # chars bound ONCE as an array: substring(t, p, 1) inside the fold
    # would re-seek the string from the front per sample (O(len²) per doc)
    base = (
        media.filter(F.length(F.col(payload_col).cast("string")) > 0)
        .select(
            F.col(id_col).alias("mid"),
            F.split(F.col(payload_col).cast("string"), "").alias("cs"),
        )
        .withColumn("n", F.size("cs"))
    )
    tiles = base.select(
        "mid",
        "cs",
        "n",
        F.posexplode(
            F.expr(f"sequence(1, greatest(n, 1), {patch_bytes})")
        ).alias("patch_id", "start"),
    )
    tile_len = F.least(F.lit(patch_bytes), F.col("n") - F.col("start") + 1)
    s = F.expr(
        "aggregate(sequence(start, start + tlen - 1), cast(0 as bigint), "
        "(acc, p) -> acc + ascii(element_at(cs, cast(p as int))))"
    )
    return (
        tiles.withColumn("tlen", tile_len)
        .select(
            F.col("mid").alias(id_col),
            F.col("patch_id").cast("bigint").alias("patch_id"),
            F.col("tlen").cast("bigint").alias("n_bytes"),
            s.alias("sum_intensity"),
        )
        .withColumn("mean_milli", F.expr("sum_intensity * 1000 div n_bytes"))
        .orderBy(id_col, "patch_id")
    )


PATCH_INTENSITY_SQL_TEMPLATE = """
WITH base AS (
    SELECT doc_id AS media_id, text AS t, LENGTH(text) AS n FROM documents
    WHERE LENGTH(text) > 0
),
tiles AS (
    SELECT media_id, t, n,
           i - 1 AS patch_id,
           CAST(1 + (i - 1) * {patch_bytes} AS BIGINT) AS start
    FROM base, UNNEST(range(1, GREATEST(CAST((n + {patch_bytes} - 1) // {patch_bytes} AS BIGINT), 1) + 1)) AS u(i)
),
stats AS (
    SELECT media_id, patch_id,
           LEAST({patch_bytes}, n - start + 1) AS n_bytes,
           CAST(list_sum(list_transform(
               range(start, start + LEAST({patch_bytes}, n - start + 1)),
               p -> ascii(substr(t, CAST(p AS INT), 1)))) AS BIGINT) AS sum_intensity
    FROM tiles
)
SELECT media_id, CAST(patch_id AS BIGINT) AS patch_id,
       CAST(n_bytes AS BIGINT) AS n_bytes, sum_intensity,
       CAST(sum_intensity * 1000 // n_bytes AS BIGINT) AS mean_milli
FROM stats
ORDER BY media_id, patch_id
"""


def scene_change_plan(
    media: DataFrame,
    frame_bytes: int = 32,
    threshold_milli: int = 4000,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Scene-change detection plan over a media payload stream: tile the
    payload into fixed ``frame_bytes`` frames, compute each frame's mean
    intensity (integer milli), and emit a cut wherever consecutive frame
    means jump by ≥ ``threshold_milli`` — the shot-boundary pass a video
    ingestion pipeline runs before frame sampling (cut frames are the
    keyframes worth decoding).  The payload stream stands in for decoded
    luma exactly as in :func:`patch_intensity_stats`; a real decoder feeds
    the same differencing.

    Shape: frames explode to rows (same tiling as the patch stats — the
    per-frame fold touches each byte once over a BOUND char array), then
    consecutive differencing is one ``lag`` window keyed by media id.  An
    earlier all-array formulation kept the means as an array column and
    indexed it inside a filter lambda — Catalyst inlined the full
    means-array expression into EVERY element access (projection collapse
    into the lambda), recomputing the array per frame: O(frames²) per
    payload, 50 s at sf0.1 vs 1.5 s for this plan.  Lambda-referenced
    array columns must be materialized through an explode or checkpoint
    before indexed reuse.
    """
    fb = frame_bytes
    base = (
        media.filter(F.length(F.col(payload_col).cast("string")) > 0)
        .select(
            F.col(id_col).alias("mid"),
            F.split(F.col(payload_col).cast("string"), "").alias("cs"),
        )
        .withColumn("n", F.size("cs"))
    )
    frames = base.select(
        "mid",
        "cs",
        "n",
        F.posexplode(F.expr(f"sequence(1, greatest(n, 1), {fb})")).alias(
            "fidx", "start"
        ),
    )
    mean = F.expr(
        f"aggregate(sequence(start, start + least({fb}, n - start + 1) - 1), "
        "cast(0 as bigint), "
        "(acc, p) -> acc + ascii(element_at(cs, cast(p as int)))) "
        f"* 1000 DIV least({fb}, n - start + 1)"
    )
    means = frames.select("mid", "fidx", mean.alias("mean_milli"))
    w = Window.partitionBy("mid").orderBy("fidx")
    return (
        means.withColumn("prev", F.lag("mean_milli").over(w))
        .filter(
            F.col("prev").isNotNull()
            & (F.abs(F.col("mean_milli") - F.col("prev")) >= threshold_milli)
        )
        .select(
            F.col("mid").alias(id_col),
            (F.col("fidx") + 1).cast("bigint").alias("frame_id"),
            (F.col("mean_milli") - F.col("prev")).cast("bigint").alias(
                "delta_milli"
            ),
        )
        .orderBy(id_col, "frame_id")
    )


SCENE_CHANGE_SQL_TEMPLATE = """
WITH base AS (
    SELECT doc_id AS media_id, text AS t, LENGTH(text) AS n FROM documents
    WHERE LENGTH(text) > 0
),
means AS (
    SELECT media_id,
           list_transform(
               range(1, GREATEST(CAST((n + {frame_bytes} - 1) // {frame_bytes}
                                      AS BIGINT), 1) + 1),
               i -> CAST(list_sum(list_transform(
                        range(1 + (i - 1) * {frame_bytes},
                              1 + (i - 1) * {frame_bytes}
                              + LEAST({frame_bytes},
                                      n - (1 + (i - 1) * {frame_bytes}) + 1)),
                        p -> ascii(substr(t, CAST(p AS INT), 1)))) * 1000
                    // LEAST({frame_bytes},
                             n - (1 + (i - 1) * {frame_bytes}) + 1)
                    AS BIGINT)) AS ms
    FROM base
),
cuts AS (
    SELECT media_id, u.i AS frame_id, ms[u.i] - ms[u.i - 1] AS delta
    FROM means, UNNEST(range(2, LEN(ms) + 1)) AS u(i)
    WHERE LEN(ms) >= 2 AND ABS(ms[u.i] - ms[u.i - 1]) >= {threshold_milli}
)
SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id,
       CAST(delta AS BIGINT) AS delta_milli
FROM cuts
ORDER BY media_id, frame_id
"""


def shot_stats(
    media: DataFrame,
    frame_bytes: int = 32,
    threshold_milli: int = 4000,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-media shot statistics from the scene-change cuts: shot count
    (cuts + 1) and mean shot length in frames (integer milli) — the
    editing-rhythm summary a video-curation pass keys on (one long shot =
    static slide; hundreds of micro-shots = strobing/corrupt).  Composes
    :func:`scene_change_plan` with each payload's frame count; media with
    no cuts report one full-length shot."""
    fb = frame_bytes
    frames = media.filter(
        F.length(F.col(payload_col).cast("string")) > 0
    ).select(
        F.col(id_col).alias("mid"),
        F.ceil(F.length(F.col(payload_col).cast("string")) / fb)
        .cast("bigint")
        .alias("n_frames"),
    )
    cuts = scene_change_plan(
        media, frame_bytes, threshold_milli, id_col, payload_col
    ).groupBy(F.col(id_col).alias("mid")).agg(
        F.count(F.lit(1)).alias("n_cuts")
    )
    return (
        frames.join(cuts, "mid", "left")
        .select(
            F.col("mid").alias(id_col),
            "n_frames",
            F.coalesce(F.col("n_cuts"), F.lit(0)).cast("bigint").alias("n_cuts"),
        )
        .withColumn("n_shots", (F.col("n_cuts") + 1).cast("bigint"))
        .withColumn(
            "mean_shot_frames_milli",
            F.expr("n_frames * 1000 DIV n_shots"),
        )
        .orderBy(id_col)
    )


SHOT_STATS_SQL_TEMPLATE = """
WITH cuts AS ({scene_sql}),
per_media AS (
    SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_cuts FROM cuts
    GROUP BY media_id
),
frames AS (
    SELECT doc_id AS media_id,
           CAST(CEIL(LENGTH(text) / {frame_bytes}.0) AS BIGINT) AS n_frames
    FROM documents WHERE LENGTH(text) > 0
)
SELECT f.media_id, f.n_frames,
       CAST(COALESCE(p.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(p.n_cuts, 0) + 1 AS BIGINT) AS n_shots,
       CAST(f.n_frames * 1000 // (COALESCE(p.n_cuts, 0) + 1) AS BIGINT)
           AS mean_shot_frames_milli
FROM frames f LEFT JOIN per_media p ON f.media_id = p.media_id
ORDER BY f.media_id
"""


def flatness_stats(
    media: DataFrame,
    patch_bytes: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-media flatness/blur proxy: the variance of patch mean
    intensities — flat or blurred media have near-identical patches
    (variance → 0), textured content spreads them.  The cheap visual
    quality gate an image-curation pass runs before any model scoring.

    Composes :func:`patch_intensity_stats`; variance comes from exact
    int64 sufficient sums over each media's patch means (n·Σx²−(Σx)²,
    cross-multiplied — division-free until the final milli² output).
    """
    stats = patch_intensity_stats(media, patch_bytes, id_col, payload_col)
    agg = stats.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mean_milli").alias("s"),
        F.sum(F.col("mean_milli") * F.col("mean_milli")).alias("sq"),
    )
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            F.col(id_col),
            F.col("n").cast("bigint").alias("n_patches"),
            F.expr("s DIV n").cast("bigint").alias("mean_intensity_milli"),
            F.expr("(n * sq - s * s) DIV (n * n)").cast("bigint").alias(
                "variance_milli2"
            ),
            F.expr("(n * sq - s * s) DIV (n * n) < 1000").alias("is_flat"),
        )
        .orderBy(id_col)
    )


FLATNESS_SQL_TEMPLATE = """
WITH patches AS ({patch_sql}),
agg AS (
    SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(mean_milli) AS BIGINT) AS s,
           CAST(SUM(mean_milli * mean_milli) AS BIGINT) AS sq
    FROM patches GROUP BY media_id
)
SELECT media_id, n AS n_patches,
       CAST(s // n AS BIGINT) AS mean_intensity_milli,
       CAST((n * sq - s * s) // (n * n) AS BIGINT) AS variance_milli2,
       (n * sq - s * s) // (n * n) < 1000 AS is_flat
FROM agg
WHERE n >= 2
ORDER BY media_id
"""


def vad_segments(
    media: DataFrame,
    patch_bytes: int = 64,
    threshold_milli: int = 100_000,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-threshold activity segmentation (the VAD shape): frames whose
    mean intensity clears the threshold merge into contiguous ACTIVE
    segments via gaps-and-islands (``frame − row_number`` grouping) — the
    speech/silence splitter an ASR ingestion pass runs before windowing,
    here over the payload stand-in energy like the other media ops.

    One narrow frame pass (patch stats) + one user-keyed island window;
    output is (media, segment) spans with start/end frame and length.
    """
    stats = patch_intensity_stats(media, patch_bytes, id_col, payload_col)
    active = stats.filter(F.col("mean_milli") >= threshold_milli)
    w = Window.partitionBy(id_col).orderBy("patch_id")
    islands = active.withColumn(
        "grp", F.col("patch_id") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("patch_id").alias("start_frame"),
            F.max("patch_id").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .select(
            id_col,
            F.col("start_frame").cast("bigint").alias("start_frame"),
            F.col("end_frame").cast("bigint").alias("end_frame"),
            F.col("n_frames").cast("bigint").alias("n_frames"),
        )
        .orderBy(id_col, "start_frame")
    )


VAD_SEGMENTS_SQL_TEMPLATE = """
WITH stats AS ({patch_sql}),
active AS (
    SELECT media_id, patch_id FROM stats WHERE mean_milli >= {threshold_milli}
),
islands AS (
    SELECT media_id, patch_id,
           patch_id - ROW_NUMBER() OVER (PARTITION BY media_id
                                         ORDER BY patch_id) AS grp
    FROM active
)
SELECT media_id,
       CAST(MIN(patch_id) AS BIGINT) AS start_frame,
       CAST(MAX(patch_id) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM islands
GROUP BY media_id, grp
ORDER BY media_id, start_frame
"""
