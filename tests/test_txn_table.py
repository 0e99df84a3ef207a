"""Transaction-logged parquet tables (sources/txn_table.py): ACID
semantics staged for the round-8 registry wave — atomic commits, time
travel, optimistic concurrency, additive schema evolution, compaction,
vacuum retention."""

import json
import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from dbt_trill_shop_spark.sources.txn_table import (
    TxnConflict,
    compact_txn,
    delete_txn,
    merge_txn,
    read_txn,
    snapshot,
    vacuum_txn,
    write_txn,
)


def _df(spark, lo, hi, extra=None):
    df = spark.range(lo, hi).selectExpr("id", "id * 10 as v")
    if extra is not None:
        df = df.selectExpr("*", f"'{extra}' as tag")
    return df


def test_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t1")
    v0 = write_txn(_df(spark, 0, 5), root, mode="append")
    v1 = write_txn(_df(spark, 5, 8), root, mode="append")
    v2 = write_txn(_df(spark, 100, 102), root, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [100, 101]
    assert sorted(r.id for r in read_txn(spark, root, version=1).collect()) == list(range(8))
    assert sorted(r.id for r in read_txn(spark, root, version=0).collect()) == list(range(5))
    # timestamp travel: the v1 commit's own ts lands on v1
    ts1 = snapshot(root, version=1).committed_at_ms
    assert snapshot(root, as_of_ms=ts1).version == 1
    with pytest.raises(ValueError):
        snapshot(root, as_of_ms=0)
    with pytest.raises(ValueError):
        snapshot(root, version=99)
    with pytest.raises(FileNotFoundError):
        snapshot(str(tmp_path / "nope"))


def test_additive_schema_evolution(spark, tmp_path):
    root = str(tmp_path / "t2")
    write_txn(_df(spark, 0, 3), root)
    write_txn(_df(spark, 3, 5, extra="new"), root)
    rows = {r.id: r.tag for r in read_txn(spark, root).collect()}
    assert rows == {0: None, 1: None, 2: None, 3: "new", 4: "new"}
    # the pre-evolution snapshot still reads with its own schema
    assert "tag" not in read_txn(spark, root, version=0).columns
    # plan comes from the log: no parquet footer listing of the directory
    assert len(snapshot(root).files) == len(snapshot(root).file_schemas)


def test_concurrent_appends_both_commit(spark, tmp_path):
    root = str(tmp_path / "t3")
    write_txn(_df(spark, 0, 1), root)

    def commit(lo):
        return write_txn(_df(spark, lo, lo + 3), root, mode="append")

    with ThreadPoolExecutor(max_workers=2) as ex:
        versions = sorted(ex.map(commit, [10, 20]))
    assert versions == [1, 2]  # optimistic retry resolved the race
    got = sorted(r.id for r in read_txn(spark, root).collect())
    assert got == [0, 10, 11, 12, 20, 21, 22]


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t4")
    write_txn(_df(spark, 0, 2), root)
    # another writer takes version 1 BETWEEN our snapshot and our commit:
    # freeze the overwriter's view of the log at [0], then commit v1 behind
    # its back — the atomic create for v1 must fail and surface as a
    # conflict (an overwrite's remove-set is stale by then), never as a
    # silent retry that would drop the interloper's rows.
    import dbt_trill_shop_spark.sources.txn_table as tt

    monkeypatch.setattr(tt, "_list_versions", lambda r: [0])
    os.makedirs(os.path.join(root, "_txn"), exist_ok=True)
    with open(os.path.join(root, "_txn", f"{1:010d}.json"), "w") as fh:
        json.dump(
            {"version": 1, "mode": "append", "actions": [],
             "schema": _df(spark, 0, 1).schema.json(), "ts_ms": 1},
            fh,
        )
    with pytest.raises(TxnConflict):
        write_txn(_df(spark, 5, 6), root, mode="overwrite")
    monkeypatch.undo()
    # a LATER overwrite that sees the full log is not a conflict
    assert write_txn(_df(spark, 7, 9), root, mode="overwrite") == 2
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [7, 8]


def test_compaction_preserves_rows_and_is_atomic(spark, tmp_path):
    root = str(tmp_path / "t5")
    for lo in range(0, 12, 3):
        write_txn(_df(spark, lo, lo + 3).repartition(3), root)
    before = snapshot(root)
    assert len(before.files) >= 8
    v = compact_txn(spark, root, target_files=2)
    after = snapshot(root)
    assert v == after.version == before.version + 1
    assert len(after.files) <= 2
    assert sorted(r.id for r in read_txn(spark, root).collect()) == list(range(12))
    # the pre-compaction snapshot is still readable (old files on disk)
    assert sorted(
        r.id for r in read_txn(spark, root, version=before.version).collect()
    ) == list(range(12))
    # clustering compaction: range layout makes the stats prune afterwards
    compact_txn(spark, root, target_files=3, cluster_by=["id"])
    assert sorted(r.id for r in read_txn(spark, root).collect()) == list(range(12))
    pruned = read_txn(spark, root, prune={"id": (0, 3)})
    assert len(pruned.inputFiles()) < len(snapshot(root).files)
    assert sorted(r.id for r in pruned.filter("id <= 3").collect()) == [0, 1, 2, 3]


def test_merge_upserts_and_delete_keeps_null_predicate_rows(spark, tmp_path):
    root = str(tmp_path / "t7")
    write_txn(_df(spark, 0, 4), root)  # v=id*10
    src = spark.createDataFrame([(2, 999), (100, 1000)], "id long, v long")
    v = merge_txn(spark, src, root, on="id")
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 999, 3: 30, 100: 1000}
    # pre-merge snapshot intact (time travel across a merge)
    pre = {r.id: r.v for r in read_txn(spark, root, version=v - 1).collect()}
    assert pre == {0: 0, 1: 10, 2: 20, 3: 30}
    # DELETE with a predicate that is NULL for some rows: NULL != TRUE,
    # those rows survive (SQL three-valued DELETE semantics)
    evolved = spark.createDataFrame(
        [(200, 7, None), (201, 7, 5)], "id long, v long, w long"
    )
    write_txn(evolved, root, mode="append")
    delete_txn(spark, root, "w > 1")  # w NULL on all old rows + id=200
    ids = sorted(r.id for r in read_txn(spark, root).collect())
    assert ids == [0, 1, 2, 3, 100, 200]


def test_data_skipping_prunes_files_not_rows(spark, tmp_path):
    root = str(tmp_path / "t8")
    for lo in (0, 100, 200):
        write_txn(_df(spark, lo, lo + 10).coalesce(1), root)
    all_files = read_txn(spark, root).inputFiles()
    assert len(all_files) == 3
    pruned = read_txn(spark, root, prune={"id": (100, 105)})
    assert len(pruned.inputFiles()) == 1  # scan never opens the other files
    assert sorted(r.id for r in pruned.collect()) == list(range(100, 110))
    # prune is a file-set optimization: the caller's row filter still applies
    assert pruned.filter("id <= 105").count() == 6
    # a column with no recorded stats never skips
    assert len(read_txn(spark, root, prune={"nope": (0, 1)}).inputFiles()) == 3
    # open bounds
    assert len(read_txn(spark, root, prune={"id": (None, 50)}).inputFiles()) == 1


def test_log_checkpoint_accelerated_fold_is_equivalent(spark, tmp_path, monkeypatch):
    import dbt_trill_shop_spark.sources.txn_table as tt

    # the cadence is config, not logic: 4 keeps the test at 7 commits
    monkeypatch.setattr(tt, "_CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "t9")
    one = spark.createDataFrame([(1, 1)], "id long, v long").coalesce(1)
    for i in range(tt._CHECKPOINT_EVERY + 3):
        write_txn(one.selectExpr(f"{i} as id", "v"), root, extra={"batch_id": i})
    # streaming batch ids fold through the checkpoint: ids from entries the
    # checkpoint superseded are still visible to the replay check
    assert tt.committed_batch_ids(root) == set(range(tt._CHECKPOINT_EVERY + 3))
    ckpts = [
        f for f in os.listdir(os.path.join(root, "_txn"))
        if f.startswith("checkpoint-")
    ]
    assert len(ckpts) == 1  # written at version _CHECKPOINT_EVERY
    n = tt._CHECKPOINT_EVERY + 3
    assert read_txn(spark, root).count() == n
    # time travel BELOW the checkpoint still folds from entries alone
    assert read_txn(spark, root, version=2).count() == 3
    # fold-from-checkpoint == fold-from-scratch
    with_ckpt = snapshot(root)
    os.unlink(os.path.join(root, "_txn", ckpts[0]))
    from_scratch = snapshot(root)
    assert sorted(with_ckpt.files) == sorted(from_scratch.files)
    assert with_ckpt.version == from_scratch.version


def test_stream_sink_is_exactly_once_on_replay(spark, tmp_path):
    from dbt_trill_shop_spark.sources.txn_table import txn_stream_sink

    root = str(tmp_path / "t10")
    sink = txn_stream_sink(root)
    sink(_df(spark, 0, 3), 0)
    sink(_df(spark, 3, 5), 1)
    sink(_df(spark, 3, 5), 1)  # post-failure replay of the same batch
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [0, 1, 2, 3, 4]
    assert snapshot(root).version == 1  # two commits, not three


def test_txn_demo_queries_match_duckdb_oracles(spark, sf_dir):
    """The three round-8-staged registry queries (operators/txn_demo.py)
    pass the driver-style oracle comparison already, and the skipping
    query's scan provably opens a strict subset of the table's files."""
    from dbt_trill_shop_spark.operators.txn_demo import (
        ROUND8_TXN_QUERIES,
        txn_skipping_scan,
    )
    from .oracle_utils import compare, duck_connection, oracle_frame

    con = duck_connection(sf_dir)
    for name, (fn, sql) in ROUND8_TXN_QUERIES.items():
        probs = compare(fn(spark, sf_dir), oracle_frame(con, sql))
        assert not probs, f"{name}: " + "; ".join(probs)
    pruned = txn_skipping_scan(spark, sf_dir)
    import dbt_trill_shop_spark.sources.txn_table as tt
    import os as _os

    root = _os.path.join(
        __import__("tempfile").gettempdir(), f"txn_skipscan_{_os.getpid()}"
    )
    n_live = len(tt.snapshot(root).files)
    n_scanned = len(pruned.inputFiles())
    assert 0 < n_scanned < n_live, (n_scanned, n_live)


def test_vacuum_honors_retention(spark, tmp_path):
    root = str(tmp_path / "t6")
    write_txn(_df(spark, 0, 4), root)
    write_txn(_df(spark, 50, 52), root, mode="overwrite")
    old_files = snapshot(root, version=0).files
    # retain 2 versions: v0's files survive
    assert vacuum_txn(root, retain_versions=2, min_age_sec=0) == []
    assert all(os.path.exists(p) for p in old_files)
    # the writer-safety age floor: a young unreferenced file (an in-flight
    # writer's staged data) is NEVER deleted regardless of retention
    assert vacuum_txn(root, retain_versions=1, min_age_sec=3600) == []
    assert all(os.path.exists(p) for p in old_files)
    # retain 1, no age floor: v0's files are garbage
    removed = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert removed and not any(os.path.exists(p) for p in old_files)
    # the live snapshot is untouched
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [50, 51]
