"""Spark 4 Python DataSource API (SPARK-44076): a custom batch source
implemented in pure Python and registered with
``spark.dataSource.register`` — the extension point that replaces ad-hoc
``parallelize``/driver-side generation for sources Spark has no built-in
connector for (internal APIs, proprietary formats, synthetic load).

The example source is a DETERMINISTIC synthetic event generator: every
row is a pure function of its index via md5, so (a) partition count and
scheduling cannot change the data, (b) a DuckDB oracle can regenerate the
identical relation from a ``range()`` formula, making even the custom
connector value-hash checkable, and (c) at cluster scale the generator is
embarrassingly parallel — ``partitions()`` splits the index range and each
executor materializes only its slice (the same contract a real paginated
API reader would implement).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_SCHEMA = (
    "event_id bigint, day bigint, user_id bigint, type_id bigint, value_cents bigint"
)


def _synth_row(i: int) -> tuple:
    """THE row formula — shared by the batch reader, the stream reader's
    replay, and mirrored by both DuckDB oracles; one definition so the
    replay/regeneration guarantees can't drift."""
    h = hashlib.md5(f"evt-{i}".encode()).hexdigest()
    return (
        i,
        int(h[:6], 16) % 30,
        int(h[6:12], 16) % 500,
        int(h[12:14], 16) % 5,
        int(h[14:18], 16),
    )


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((i * step, min((i + 1) * step, self.n)))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, part: InputPartition):
        lo, hi = part.value
        for i in range(lo, hi):
            yield _synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — options: rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration (a session registers a name once)."""
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:  # already registered in this session
        pass


def synthetic_events(spark: SparkSession, rows: int, partitions: int = 8) -> DataFrame:
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def synthetic_source_rollup(
    spark: SparkSession, rows: int = 20000, partitions: int = 8
) -> DataFrame:
    """Harness entry: aggregate the custom-source relation per type —
    proves the connector's rows survive a real shuffle + aggregate and
    match the formula-regenerated oracle exactly."""
    import pyspark.sql.functions as F

    df = synthetic_events(spark, rows, partitions)
    return (
        df.groupBy("type_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("value_cents").alias("total_cents"),
            F.max("day").alias("max_day"),
        )
        .select(
            "type_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
            F.col("max_day").cast("bigint").alias("max_day"),
        )
        .orderBy("type_id")
    )


SYNTHETIC_SOURCE_SQL_TEMPLATE = """
WITH gen AS (
    SELECT i AS event_id,
           CAST('0x' || substring(md5('evt-' || i), 1, 6) AS BIGINT) % 30 AS day,
           CAST('0x' || substring(md5('evt-' || i), 7, 6) AS BIGINT) % 500
               AS user_id,
           CAST('0x' || substring(md5('evt-' || i), 13, 2) AS BIGINT) % 5
               AS type_id,
           CAST('0x' || substring(md5('evt-' || i), 15, 4) AS BIGINT)
               AS value_cents
    FROM range(0, {rows}) t(i)
)
SELECT CAST(type_id AS BIGINT) AS type_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(value_cents) AS BIGINT) AS total_cents,
       CAST(MAX(day) AS BIGINT) AS max_day
FROM gen
GROUP BY type_id
ORDER BY type_id
"""


class _JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int) -> None:
        self.tmp_path = tmp_path
        self.rows = rows


class _JsonlSinkWriter(DataSourceWriter):
    """Task-side half of the two-phase commit: each task writes its rows to
    a hidden ``.tmp-*`` file and reports the path; only the driver-side
    ``commit`` renames temps into visibility, so readers never observe a
    torn write and a failed job leaves only invisible temps (cleaned by
    ``abort``) — the same protocol every Spark file sink implements."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommitMessage(tmp, n)

    def commit(self, messages) -> None:
        import os

        for i, m in enumerate(messages):
            if m is None or getattr(m, "rows", 0) == 0:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(getattr(m, "tmp_path", "")):
                os.remove(m.tmp_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir)`` — a custom
    Python DataSource WRITER (the other half of the Spark 4 API): tasks
    write temp files, the driver commits by rename.  The shape a real
    external-system sink (API uploader, message queue) implements."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonlSinkWriter(self.options)


def register_jsonl_sink(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch generator: offsets are ``{"pos": n}``,
    each batch advances by ``batch`` rows until ``rows``; every row is the
    same md5 formula as the batch source, so replays (``readBetweenOffsets``
    after a restart) are bit-identical — exactly the contract a real
    paginated/stream API reader must satisfy for exactly-once."""

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("rows", 1000))
        self.batch = int(options.get("batch", 250))

    @staticmethod
    def _row(i: int):
        return _synth_row(i)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch, self.total)
        return iter([self._row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([self._row(i) for i in range(start["pos"], end["pos"])])


class SyntheticEventStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_event_stream")`` — the
    STREAMING half of the Python DataSource API (SimpleDataSourceStreamReader
    with driver-side offset management)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_event_stream"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)


def stream_synthetic_rollup(
    spark: SparkSession, rows: int = 5000, batch: int = 2500
) -> DataFrame:
    """Harness entry: drain the custom Python stream source and roll it up
    per type — ``processAllAvailable`` stops once ``read`` stops advancing
    the offset, and the drained aggregate equals the batch formula exactly
    (micro-batch boundaries cannot change a sum of pure-function rows)."""
    import uuid

    import pyspark.sql.functions as F

    try:
        spark.dataSource.register(SyntheticEventStreamDataSource)
    except Exception:
        pass
    name = f"pystream_{uuid.uuid4().hex[:10]}"
    src = (
        spark.readStream.format("synthetic_event_stream")
        .option("rows", rows)
        .option("batch", batch)
        .load()
    )
    agg = src.groupBy("type_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").alias("total_cents"),
    )
    # bound the per-micro-batch state-store count like every other drain
    # (each batch instantiates one store per shuffle partition; at 32
    # partitions store setup dwarfed the 5-type aggregation: 11.9 -> ~4 s)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # bounded retry + backoff on worker-SPAWN infrastructure flakes
        # only, same envelope as every other drain (SCALE.md r9/r10)
        import time as _time

        last: Exception | None = None
        for attempt in range(4):
            if attempt:
                _time.sleep(2 * attempt)
            name = f"pystream_{uuid.uuid4().hex[:10]}"
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                break
            except Exception as ex:  # noqa: BLE001 - filtered re-raise
                last = ex
                if not any(
                    m in str(ex)
                    for m in (
                        "failed to connect back",
                        "worker exited unexpectedly",
                    )
                ):
                    raise
            finally:
                q.stop()
        else:
            raise last
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.table(name)
        .select(
            F.col("type_id").cast("bigint").alias("type_id"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("type_id")
    )


STREAM_SYNTHETIC_SQL_TEMPLATE = """
WITH gen AS (
    SELECT CAST('0x' || substring(md5('evt-' || i), 13, 2) AS BIGINT) % 5
               AS type_id,
           CAST('0x' || substring(md5('evt-' || i), 15, 4) AS BIGINT)
               AS value_cents
    FROM range(0, {rows}) t(i)
)
SELECT CAST(type_id AS BIGINT) AS type_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS total_cents
FROM gen
GROUP BY type_id
ORDER BY type_id
"""
