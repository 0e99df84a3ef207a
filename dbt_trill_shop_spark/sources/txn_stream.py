"""Structured-Streaming SOURCE over a transaction-logged table
(sources/txn_table.py): tail the commit log as micro-batches — the
other half of the loop whose sink side is ``txn_stream_sink`` (an
exactly-once ``foreachBatch`` writer).  Together they make txn tables a
streaming medium: one pipeline commits, downstream pipelines tail.

Design (the Delta streaming-source shape, re-expressed on the PySpark
Python DataSource API):

- **Offsets are log versions.**  ``initialOffset`` = the configured
  ``startingVersion`` (default: everything), ``latestOffset`` = the last
  committed version.  Offsets are exactly the unit the log already
  serializes, so replay after a checkpoint restore is trivially
  deterministic: ``partitions(start, end)`` re-derives the same file
  list from the same immutable commit entries.
- **One input partition per added file.**  The driver plans partitions
  from the LOG ONLY (no directory listing, no footer reads — the same
  zero-metadata-cost posture as snapshot reads); executors read their
  one file each via pyarrow and ship Arrow record batches to the JVM,
  so the hot path is columnar end-to-end.
- **Append-only contract, loud by default.**  A commit carrying removes
  or deletion vectors (overwrite / MERGE / DELETE) is NOT representable
  as a pure insert stream; the reader raises unless
  ``ignoreChanges=true`` (Delta's option of the same name), in which
  case only the commit's adds flow — re-inserted survivor rows reappear
  downstream, the documented ignoreChanges trade.  Compaction commits
  are physical rewrites, not data: always skipped entirely.
- **Schema = the table's schema at stream start**, additive evolution
  reconciled per file: an old file's missing columns surface as typed
  NULL Arrow columns (same rule as ``read_txn``).

100 TB posture: a micro-batch's cost is proportional to the NEW commits'
file bytes, never the table; offset planning folds a few KB of JSON.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .txn_table import _changes_plan, _list_versions, _read_entry, snapshot

try:  # pyspark >= 4 Python DataSource API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
except ImportError:  # pragma: no cover - import-gated like pydatasource.py
    DataSource = object
    DataSourceStreamReader = object
    InputPartition = object


def _file_name_map(file_schema_json: str, renames) -> dict:
    """{current-logical-name: physical-name-in-file} for the fields whose
    name the table's ordered rename chain has moved — computed DRIVER-side
    per file (metadata arithmetic) so executors read the right physical
    parquet columns on renamed tables."""
    names = [f["name"] for f in json.loads(file_schema_json)["fields"]]
    cur = list(names)
    for phys, logical in renames or ():
        if phys in cur and logical not in cur:
            cur[cur.index(phys)] = logical
    return {c: n for c, n in zip(cur, names) if c != n}


def _pv_arrow_column(raw, arrow_type, n):
    """A constant Arrow column for one metadata-resident PARTITION value
    (string form cast to the logical type; None = the NULL partition)."""
    import pyarrow as pa

    if raw is None:
        return pa.nulls(n, type=arrow_type)
    return pa.array([raw] * n, type=pa.string()).cast(arrow_type)


class _TxnFilePartition(InputPartition):
    def __init__(
        self, path: str, file_schema_json: str, version: int,
        pv: dict | None = None, name_map: dict | None = None,
    ) -> None:
        self.path = path
        self.file_schema_json = file_schema_json
        self.version = version
        self.pv = pv or {}
        self.name_map = name_map or {}


class _TxnStreamReader(DataSourceStreamReader):
    """Partition-planned stream reader (NOT the Simple driver-side one):
    executors read the planned files in parallel — the scale path."""

    def __init__(self, options: dict, schema) -> None:
        # Python DataSource options arrive lower-cased
        self.root = options.get("root") or options.get("path")
        if not self.root:
            raise ValueError("txn_table_stream needs .option('root', <table dir>)")
        self.ignore_changes = str(
            options.get("ignorechanges", "false")
        ).lower() == "true"
        self.start_version = int(options.get("startingversion", -1))
        mft = int(options.get("maxfilespertrigger", 0))
        if mft < 0:
            raise ValueError("maxFilesPerTrigger must be >= 1 (or unset)")
        self.max_files = mft or None
        mbt = int(options.get("maxbytespertrigger", 0))
        if mbt < 0:
            raise ValueError("maxBytesPerTrigger must be >= 1 (or unset)")
        self.max_bytes = mbt or None
        self.schema = schema
        # Best-known consumed position for admission control (offsets
        # themselves live in the query checkpoint; this mirror only
        # bounds how far latestOffset advances).  Taught by
        # initialOffset / partitions / commit.  The FIRST trigger of a
        # (re)started query is UNCAPPED: the engine calls latestOffset
        # BEFORE the reader learns any position (measured order:
        # latestOffset -> initialOffset -> partitions; on restart
        # initialOffset never fires), and the Python DataSource API has
        # no SupportsAdmissionControl bridge.  Returning a capped offset
        # computed from a guessed position could fall BEHIND a restarted
        # checkpoint and regress the offset log (duplicate replay), so
        # the head is the only monotone-safe answer.  Steady-state
        # tailing — the common case — is fully paced from trigger 2; to
        # pace a cold backlog, also set startingVersion near the head.
        self._pos: dict | None = None

    def initialOffset(self) -> dict:
        self._pos = {"version": self.start_version}
        return {"version": self.start_version}

    def _data_adds(self, e: dict) -> list[dict]:
        """A commit's streamable add actions (entry order — immutable, so
        partial-commit offsets replay deterministically); maintenance /
        stats-only commits contribute none."""
        if e.get("mode") in ("compact", "optimize", "set_bloom"):
            return []  # physical rewrite / stats-only re-add, not data
        return [a for a in e["actions"] if "add" in a]

    def latestOffset(self) -> dict:
        versions = _list_versions(self.root)
        head = versions[-1] if versions else -1
        if self.max_files is None and self.max_bytes is None:
            return {"version": head}
        pos = self._pos
        if pos is None:  # first trigger of a (re)start: see __init__ note
            return {"version": head}
        v0, k0 = pos["version"], pos.get("files")
        files_left = self.max_files if self.max_files is not None else 1 << 62
        bytes_left = self.max_bytes if self.max_bytes is not None else 1 << 62
        admitted = 0
        out = dict(pos)
        for v in versions:
            if v < v0 or (v == v0 and k0 is None):
                continue  # fully consumed
            adds = self._data_adds(_read_entry(self.root, v))
            k = k0 if (v == v0 and k0 is not None) else 0
            while k < len(adds):
                if (files_left <= 0 or bytes_left <= 0) and admitted > 0:
                    # budget spent: cut here (mid-commit offsets replay
                    # deterministically); at least one file always admits
                    # per batch so an oversized file cannot stall the
                    # stream (Delta's progress guarantee)
                    return {"version": v, "files": k}
                b = adds[k].get("stats", {}).get("__bytes")
                admitted += 1
                files_left -= 1
                # a pre-__bytes file has unknown size: assume it filled
                # the byte budget (conservative — under-counting would
                # degrade maxBytesPerTrigger to uncapped)
                bytes_left = bytes_left - b if b is not None else 0
                k += 1
            out = {"version": v}
        return out

    def partitions(self, start: dict, end: dict) -> list:
        # ``{"version": v}`` = commits through v fully consumed;
        # ``{"version": v, "files": k}`` = commits BEFORE v fully
        # consumed plus the first k add actions of v (rate limiting cuts
        # mid-commit; plain offsets from pre-rate-limit checkpoints parse
        # unchanged).
        s_v, s_k = start["version"], start.get("files")
        e_v, e_k = end["version"], end.get("files")
        self._pos = dict(end)  # teach admission control the real position
        listed = _list_versions(self.root)
        needed_lo = s_v if s_k is not None else s_v + 1
        if listed and needed_lo < listed[0] and needed_lo <= e_v:
            # entries below the log-retention horizon (cleanup_log_txn)
            # are gone; iterating only what remains would SILENTLY skip
            # the cleaned commits' rows — fail the lagging stream loudly
            # instead (restart from a fresh snapshot + startingVersion)
            raise ValueError(
                f"stream offset {start} is below the log-retention "
                f"horizon of {self.root} (earliest retained entry: "
                f"{listed[0]}); the cleaned commits cannot be replayed"
            )
        parts: list[_TxnFilePartition] = []
        # one log fold per partitions() call, not one per version entry —
        # the rename chain is a property of the CURRENT snapshot, and the
        # per-version fold was O(versions^2) log work on the hot
        # microbatch-planning path (ADVICE r12 low)
        renames = snapshot(self.root).renames
        for v in listed:
            if v < s_v or (v == s_v and s_k is None) or v > e_v:
                continue
            e = _read_entry(self.root, v)
            if e.get("mode") in ("compact", "optimize", "set_bloom"):
                continue
            has_changes = any("remove" in a or "dv" in a for a in e["actions"])
            if has_changes and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} of {self.root} removes or tombstones rows; "
                    "a txn stream is append-only — pass "
                    ".option('ignoreChanges', 'true') to tail adds anyway "
                    "(re-inserted survivor rows will reappear downstream)"
                )
            adds = [a for a in e["actions"] if "add" in a]
            lo = s_k if (v == s_v and s_k is not None) else 0
            hi = e_k if (v == e_v and e_k is not None) else len(adds)
            for a in adds[lo:hi]:
                sj = a.get("schema", e["schema"])
                parts.append(
                    _TxnFilePartition(
                        os.path.join(self.root, a["add"]), sj, v,
                        pv=(a.get("stats") or {}).get("__pv"),
                        name_map=_file_name_map(sj, renames),
                    )
                )
        return parts

    def read(self, partition: _TxnFilePartition):
        """Executor-side: one parquet file -> Arrow record batches aligned
        to the STREAM schema (missing later-added columns become typed
        NULL arrays; column order canonical)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        file_fields = {
            f.name for f in StructType.fromJson(json.loads(partition.file_schema_json)).fields
        }
        want_names = [f.name for f in self.schema.fields]
        phys_of = {n: partition.name_map.get(n, n) for n in want_names}
        # partition columns are in the RECORDED schema but not in the data
        # bytes (metadata-resident) — never ask the parquet reader for them
        tbl = pq.read_table(
            partition.path,
            columns=[
                phys_of[n]
                for n in want_names
                if phys_of[n] in file_fields and n not in partition.pv
            ],
        )
        n = tbl.num_rows
        cols = []
        for f in self.schema.fields:
            at = to_arrow_type(f.dataType)
            phys = phys_of[f.name]
            if phys in file_fields and f.name not in partition.pv:
                c = tbl.column(phys)
                if c.type != at:
                    c = c.cast(at)
                cols.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
            elif f.name in partition.pv:
                # metadata-resident partition value: constant column
                cols.append(_pv_arrow_column(partition.pv[f.name], at, n))
            else:
                cols.append(pa.nulls(n, type=at))
        out = pa.table(cols, names=want_names)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:  # offsets live in the query ckpt
        self._pos = dict(end)  # keep the admission-control mirror fresh


class _TxnCdfPartition(InputPartition):
    def __init__(
        self, root: str, rel: str, file_schema_json: str, version: int,
        change: str, dvs: list[str], dv: str | None,
        pv: dict | None = None, name_map: dict | None = None,
    ) -> None:
        self.root = root
        self.rel = rel
        self.file_schema_json = file_schema_json
        self.version = version
        self.change = change  # 'insert' | 'delete' | 'delete_at'
        self.dvs = dvs        # tombstone sidecars to EXCLUDE
        self.dv = dv          # delete_at: sidecar whose positions to SELECT
        self.pv = pv or {}    # metadata-resident partition values
        self.name_map = name_map or {}  # logical -> physical (renames)


class _TxnCdfStreamReader(DataSourceStreamReader):
    """Streaming CHANGE DATA FEED over the commit log (Delta's
    ``readChangeFeed`` streaming form): each micro-batch carries the
    row-level changes of the commits in ``(start, end]``, tagged
    ``_change_type`` ('insert' | 'delete') and ``_commit_version`` — the
    standing form of ``read_txn_changes``, so an incremental consumer
    (re-embed, re-dedup, MV sync) tails deletes as well as inserts
    instead of being limited to the append-only source.

    The batch plan comes from the SAME ``_changes_plan`` log walk the
    batch reader uses, so the two can never drift.  Partition planning is
    driver-side log arithmetic (checkpoint-accelerated folds, no data
    I/O); executors read one file-grained change unit each via pyarrow.
    Offsets are whole commit versions; replay is deterministic because
    entries are immutable.  A restart below the log-retention horizon
    fails loudly (same rule as the insert source)."""

    def __init__(self, options: dict, schema) -> None:
        self.root = options.get("root") or options.get("path")
        if not self.root:
            raise ValueError("txn_cdf_stream needs .option('root', <table dir>)")
        self.start_version = int(options.get("startingversion", -1))
        self.schema = schema  # table schema + _change_type/_commit_version

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.root)
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start: dict, end: dict) -> list:
        s_v, e_v = start["version"], end["version"]
        versions = _list_versions(self.root)
        if versions and s_v + 1 < versions[0] and s_v + 1 <= e_v:
            raise ValueError(
                f"CDF stream offset {start} is below the log-retention "
                f"horizon of {self.root} (earliest retained entry: "
                f"{versions[0]}); re-seed the consumer from a snapshot"
            )
        plan = _changes_plan(self.root, versions, s_v, e_v)
        renames = snapshot(self.root).renames
        return [
            _TxnCdfPartition(
                self.root, item["rel"], item["schema"], item["v"],
                item["change"], item.get("dvs", []), item.get("dv"),
                pv=item.get("pv"),
                name_map=_file_name_map(item["schema"], renames),
            )
            for item in plan
        ]

    def read(self, partition: _TxnCdfPartition):
        """Executor-side: one change unit -> Arrow batches.  DV exclusion
        (insert/delete units) and position selection (delete_at units)
        are numpy mask/take over the file's row indices — columnar end to
        end, no Python row loops."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        path = os.path.join(partition.root, partition.rel)
        base = os.path.basename(path)
        file_fields = {
            f.name
            for f in StructType.fromJson(
                json.loads(partition.file_schema_json)
            ).fields
        }
        data_names = [
            f.name
            for f in self.schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]
        phys_of = {n: partition.name_map.get(n, n) for n in data_names}
        tbl = pq.read_table(
            path,
            columns=[
                phys_of[n]
                for n in data_names
                if phys_of[n] in file_fields and n not in partition.pv
            ],
        )
        n = tbl.num_rows

        def _positions(sidecar: str) -> np.ndarray:
            dv = pq.read_table(
                os.path.join(partition.root, sidecar), columns=["file", "pos"]
            )
            mask = pa.compute.equal(dv.column("file"), pa.scalar(base))
            return dv.filter(mask).column("pos").to_numpy(zero_copy_only=False)

        if partition.change == "delete_at":
            pos = np.sort(_positions(partition.dv))
            tbl = tbl.take(pa.array(pos))
        elif partition.dvs:
            keep = np.ones(n, dtype=bool)
            for d in partition.dvs:
                p = _positions(d)
                if len(p):
                    keep[p] = False
            tbl = tbl.filter(pa.array(keep))
        m = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            at = to_arrow_type(f.dataType)
            if f.name == "_change_type":
                change = "delete" if partition.change == "delete_at" else partition.change
                c = pa.nulls(m, type=at).fill_null(change)
            elif f.name == "_commit_version":
                c = pa.nulls(m, type=at).fill_null(partition.version)
            elif f.name in partition.pv:
                c = _pv_arrow_column(partition.pv[f.name], at, m)
            elif phys_of.get(f.name, f.name) in file_fields:
                c = tbl.column(phys_of.get(f.name, f.name))
                if c.type != at:
                    c = c.cast(at)
                c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            else:
                c = pa.nulls(m, type=at)
            cols.append(c)
            names.append(f.name)
        out = pa.table(cols, names=names)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint


class TxnTableStreamDataSource(DataSource):
    """``spark.readStream.format("txn_table_stream").option("root", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_table_stream"

    def schema(self):
        from pyspark.sql.types import StructType

        root = self.options.get("root") or self.options.get("path")
        return StructType.fromJson(json.loads(snapshot(root).schema_json))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _TxnStreamReader(self.options, schema)


class TxnCdfStreamDataSource(DataSource):
    """``spark.readStream.format("txn_cdf_stream").option("root", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_cdf_stream"

    def schema(self):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        root = self.options.get("root") or self.options.get("path")
        base = StructType.fromJson(json.loads(snapshot(root).schema_json))
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _TxnCdfStreamReader(self.options, schema)


def register_txn_stream_source(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(TxnTableStreamDataSource)
    except Exception:  # already registered in this session
        pass
    try:
        spark.dataSource.register(TxnCdfStreamDataSource)
    except Exception:  # already registered in this session
        pass


def stream_txn_table(
    spark: SparkSession,
    root: str,
    starting_version: int = -1,
    ignore_changes: bool = False,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a txn table's commits after ``starting_version``
    (-1 = from the beginning).  ``max_files_per_trigger`` is admission
    control (Delta's option of the same name): steady-state tailing
    admits at most this many data files per micro-batch, so a burst of
    producer commits drains as ceil(N / cap) batches instead of one
    giant batch.  Offsets may then cut MID-commit
    (``{"version": v, "files": k}``), which replays deterministically
    because add actions are ordered in immutable log entries.  The FIRST
    batch of a (re)started query is uncapped (see _TxnStreamReader — the
    Python DataSource API calls latestOffset before the reader learns
    its position); pace a cold backlog by also passing
    ``starting_version``."""
    register_txn_stream_source(spark)
    reader = (
        spark.readStream.format("txn_table_stream")
        .option("root", root)
        .option("startingVersion", starting_version)
        .option("ignoreChanges", str(ignore_changes).lower())
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        # byte budget from the log's per-file __bytes stats (zero object
        # stats at plan time); files predating __bytes admit one per
        # batch (conservative); an oversized single file still admits
        reader = reader.option("maxBytesPerTrigger", int(max_bytes_per_trigger))
    return reader.load()


def stream_txn_changes(
    spark: SparkSession, root: str, starting_version: int = -1
) -> DataFrame:
    """``readStream`` over a txn table's CHANGE DATA FEED: every commit
    after ``starting_version`` arrives as row-level changes tagged
    ``_change_type``/``_commit_version`` — inserts AND deletes, so a
    downstream incremental consumer (re-embed, re-dedup, MV sync) keeps
    exact state without ever re-reading the table.  Batch twin:
    ``read_txn_changes`` (same log walk, shared plan)."""
    register_txn_stream_source(spark)
    return (
        spark.readStream.format("txn_cdf_stream")
        .option("root", root)
        .option("startingVersion", starting_version)
        .load()
    )
