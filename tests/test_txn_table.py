"""Transaction-logged parquet tables (sources/txn_table.py): ACID
semantics staged for the round-8 registry wave — atomic commits, time
travel, optimistic concurrency, additive schema evolution, compaction,
vacuum retention, data skipping, log checkpoints, exactly-once sink.

Scenarios run POOLED in a SIBLING PROCESS overlapping the whole suite
(txn_sibling_subprocess.py; join point tests/test_z_txn_join.py — the
suite-wide pattern: py4j/Spark job submission releases the GIL, every
scenario owns a disjoint table root, and the pool had become the main
suite's largest serial block at ~26 s idle).  The monkeypatching tests
(conflict injection patches module internals other threads would see)
stay serial in the main process."""

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

from .conftest import SF_DIR


def _df(spark, lo, hi, extra=None):
    df = spark.range(lo, hi).selectExpr("id", "id * 10 as v")
    if extra is not None:
        df = df.selectExpr("*", f"'{extra}' as tag")
    return df


def _sc_append_overwrite_and_time_travel(spark, base):
    root = os.path.join(base, "t")
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
        snapshot(os.path.join(base, "nope"))


def _sc_additive_schema_evolution(spark, base):
    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 3), root)
    write_txn(_df(spark, 3, 5, extra="new"), root)
    rows = {r.id: r.tag for r in read_txn(spark, root).collect()}
    assert rows == {0: None, 1: None, 2: None, 3: "new", 4: "new"}
    # the pre-evolution snapshot still reads with its own schema
    assert "tag" not in read_txn(spark, root, version=0).columns
    # plan comes from the log: schemas/stats ride with every live file
    assert len(snapshot(root).files) == len(snapshot(root).file_schemas)


def _sc_concurrent_appends_both_commit(spark, base):
    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 1), root)

    def commit(lo):
        return write_txn(_df(spark, lo, lo + 3), root, mode="append")

    with ThreadPoolExecutor(max_workers=2) as ex:
        versions = sorted(ex.map(commit, [10, 20]))
    assert versions == [1, 2]  # optimistic retry resolved the race
    got = sorted(r.id for r in read_txn(spark, root).collect())
    assert got == [0, 10, 11, 12, 20, 21, 22]


def _sc_compaction_preserves_rows_and_is_atomic(spark, base):
    root = os.path.join(base, "t")
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


def _sc_merge_upserts_and_delete_3vl(spark, base):
    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 4), root)  # v=id*10
    src = spark.createDataFrame([(2, 999), (100, 1000)], "id long, v long")
    v = merge_txn(spark, src, root, on="id")
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 999, 3: 30, 100: 1000}
    # pre-merge snapshot intact (time travel across a merge)
    pre = {r.id: r.v for r in read_txn(spark, root, version=v - 1).collect()}
    assert pre == {0: 0, 1: 10, 2: 20, 3: 30}
    # a source column the target lacks is loud, not silently dropped...
    bad = spark.createDataFrame([(1, 1, 1)], "id long, v long, w long")
    with pytest.raises(ValueError):
        merge_txn(spark, bad, root, on="id")
    # ...but evolve_schema=True extends the table instead (Delta's
    # automatic schema evolution): untouched rows surface NULL
    src2 = spark.createDataFrame(
        [(1, 11, "x"), (300, 12, "y")], "id long, v long, tag string"
    )
    merge_txn(spark, src2, root, on="id", evolve_schema=True)
    got2 = {r.id: (r.v, r.tag) for r in read_txn(spark, root).collect()}
    assert got2[1] == (11, "x") and got2[300] == (12, "y")
    assert got2[0] == (0, None)
    # DELETE with a predicate that is NULL for some rows: NULL != TRUE,
    # those rows survive (SQL three-valued DELETE semantics)
    evolved = spark.createDataFrame(
        [(200, 7, None), (201, 7, 5)], "id long, v long, w long"
    )
    write_txn(evolved, root, mode="append")
    delete_txn(spark, root, "w > 1")  # w NULL on all old rows + id=200
    ids = sorted(r.id for r in read_txn(spark, root).collect())
    assert ids == [0, 1, 2, 3, 100, 200, 300]


def _sc_data_skipping_prunes_files_not_rows(spark, base):
    root = os.path.join(base, "t")
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
    # NULL-count skipping: IS [NOT] NULL prunes against the log's
    # per-column null counts, and composes with interval bounds —
    # crucially WITHOUT the generic \bNOT\b guard nuking the whole
    # predicate's pruning
    root2 = os.path.join(base, "t2")
    write_txn(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long").coalesce(1),
        root2,
    )
    write_txn(
        spark.createDataFrame([(3, None), (4, None)], "id long, v long").coalesce(1),
        root2,
    )
    write_txn(
        spark.createDataFrame([(5, 50), (6, None)], "id long, v long").coalesce(1),
        root2,
    )
    nn = read_txn(spark, root2, where="v IS NOT NULL")
    assert len(nn.inputFiles()) == 2 and sorted(r.id for r in nn.collect()) == [1, 2, 5]
    isn = read_txn(spark, root2, where="v IS NULL")
    assert len(isn.inputFiles()) == 2 and sorted(r.id for r in isn.collect()) == [3, 4, 6]
    both = read_txn(spark, root2, where="id = 1 AND v IS NOT NULL")
    assert len(both.inputFiles()) == 1 and [r.id for r in both.collect()] == [1]
    # NOT in any other position still disables pruning entirely (sound)
    import dbt_trill_shop_spark.sources.txn_table as tt

    assert tt._prune_from_predicate("NOT (v IS NULL)") == {}


def _sc_log_checkpoint_fold_equivalent(spark, base):
    # the pooled runner pins tt._CHECKPOINT_EVERY = 4 for the whole pool
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = os.path.join(base, "t")
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


def _sc_stream_sink_exactly_once(spark, base):
    from dbt_trill_shop_spark.sources.txn_table import txn_stream_sink

    root = os.path.join(base, "t")
    sink = txn_stream_sink(root)
    sink(_df(spark, 0, 3), 0)
    sink(_df(spark, 3, 5), 1)
    sink(_df(spark, 3, 5), 1)  # post-failure replay of the same batch
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [0, 1, 2, 3, 4]
    assert snapshot(root).version == 1  # two commits, not three


def _sc_vacuum_honors_retention_and_age(spark, base):
    root = os.path.join(base, "t")
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
    # DRY RUN reports exactly what a real run would remove — and removes
    # nothing (the blast-radius preview before shrinking retention)
    preview = vacuum_txn(root, retain_versions=1, min_age_sec=0, dry_run=True)
    assert sorted(preview) == sorted(os.path.relpath(p, root) for p in old_files)
    assert all(os.path.exists(p) for p in old_files)
    # retain 1, no age floor: v0's files are garbage
    removed = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert sorted(removed) == sorted(preview)
    assert not any(os.path.exists(p) for p in old_files)
    # the live snapshot is untouched
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [50, 51]
    # a crashed writer's TORN commit tmp (write-then-link protocol) is
    # invisible to the log fold and swept by an aged vacuum
    torn = os.path.join(root, "_txn", f"{99:010d}.json.deadbeef.tmp")
    with open(torn, "w") as fh:
        fh.write('{"version": 99, "acti')  # truncated mid-JSON
    assert snapshot(root).version == 1
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [50, 51]
    assert vacuum_txn(root, retain_versions=1, min_age_sec=3600) == []
    assert os.path.exists(torn)  # age floor protects an in-flight commit
    swept = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert not os.path.exists(torn) and any("tmp" in f for f in swept)


def _sc_change_data_feed(spark, base):
    from dbt_trill_shop_spark.sources.txn_table import read_txn_changes

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 3), root)                      # v0: +0,1,2
    write_txn(_df(spark, 3, 5), root)                      # v1: +3,4
    src = spark.createDataFrame([(1, 111)], "id long, v long")
    merge_txn(spark, src, root, on="id")                   # v2: upsert id=1
    compact_txn(spark, root, target_files=1)               # v3: no-op logically
    def replay_equals_snapshot(from_v, to_v):
        # THE CDF contract: applying the per-commit diffs (deletes then
        # inserts, in version order) to the from_v snapshot reconstructs
        # the to_v snapshot exactly, as a multiset
        from collections import Counter

        state = Counter(
            (r.id, r.v)
            for r in read_txn(spark, root, version=from_v).collect()
        )
        rows = read_txn_changes(spark, root, from_version=from_v,
                                to_version=to_v).collect()
        versions = sorted({r._commit_version for r in rows})
        for v in versions:
            for r in rows:
                if r._commit_version == v and r._change_type == "delete":
                    state[(r.id, r.v)] -= 1
            for r in rows:
                if r._commit_version == v and r._change_type == "insert":
                    state[(r.id, r.v)] += 1
        want = Counter(
            (r.id, r.v)
            for r in read_txn(spark, root, version=to_v).collect()
        )
        assert +state == want, (from_v, to_v)

    ch = read_txn_changes(spark, root, from_version=0).collect()
    by = {}
    for r in ch:
        by.setdefault((r._commit_version, r._change_type), set()).add(r.id)
    assert by[(1, "insert")] == {3, 4}
    # the file-pruned merge diffs ONLY touched files: the upserted key is
    # in the delete set, and nothing outside the prior live set ever is
    assert 1 in by[(2, "delete")]
    assert by[(2, "delete")] <= {0, 1, 2, 3, 4}
    assert {r.v for r in ch if r._commit_version == 2
            and r._change_type == "insert" and r.id == 1} == {111}
    replay_equals_snapshot(0, 2)
    # compaction is a physical rewrite, not a data change: no v3 rows
    assert not [r for r in ch if r._commit_version == 3]
    # bounded window
    ch12 = read_txn_changes(spark, root, from_version=0, to_version=1)
    assert {r.id for r in ch12.collect()} == {3, 4}
    # empty window degrades to an empty typed frame
    assert read_txn_changes(spark, root, from_version=99).count() == 0
    # two consecutive remove-carrying commits with no compact between:
    # the rolled-forward prior-live map must serve the second's deletes
    delete_txn(spark, root, "id >= 4")                     # v4: drop 4
    merge_txn(spark, spark.createDataFrame([(0, 7)], "id long, v long"),
              root, on="id")                               # v5: upsert id=0
    tail = read_txn_changes(spark, root, from_version=3).collect()
    by2 = {}
    for r in tail:
        by2.setdefault((r._commit_version, r._change_type), set()).add(r.id)
    # DELETE is a full pinned rewrite: the whole live set diffs
    assert by2[(4, "delete")] == {0, 1, 2, 3, 4}
    assert by2[(4, "insert")] == {0, 1, 2, 3}
    assert 0 in by2[(5, "delete")]
    assert {r.v for r in tail if r._commit_version == 5
            and r._change_type == "insert" and r.id == 0} == {7}
    replay_equals_snapshot(3, 5)


def _sc_model_based_random_ops(spark, base):
    """Model-based randomized check of the WHOLE txn layer: a seeded
    random sequence of append / overwrite / merge / delete / DV-delete /
    compact / zorder-compact / restore ops runs against both the real
    table and a pure-Python reference model (a multiset of (id, v) rows
    per version).  After every commit the snapshot read must equal the
    model; at the end, every historical version time-travels to its
    model state and the change feed replays any version window into the
    target snapshot.  This is the test class that catches op-INTERACTION
    bugs (restore after DV after merge after compact) that per-feature
    scenarios cannot."""
    import random
    from collections import Counter

    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv,
        optimize_txn,
        read_txn_changes,
        restore_txn,
        set_bloom_txn,
        update_txn_dv,
    )

    rng = random.Random(80_86)
    root = os.path.join(base, "t")

    # model rows are ALWAYS (id, v, w) triples; ``arity`` (2 before the
    # additive evolution that adds ``w``, 3 after, and whatever the
    # restored version had after a restore) decides both the physical
    # shape of new batches and the visible projection at compare time
    def df_of(rows, arity):
        if arity == 2:
            rows2 = [(i, v) for i, v, _ in rows]
            return spark.createDataFrame(rows2 or [], "id long, v long").coalesce(
                max(1, min(3, len(rows2)))
            )
        return spark.createDataFrame(
            rows or [], "id long, v long, w long"
        ).coalesce(max(1, min(3, len(rows))))

    def fresh_rows(n, arity):
        return [
            (
                rng.randrange(0, 60),
                rng.randrange(-5, 100),
                rng.randrange(0, 9) if arity == 3 else None,
            )
            for _ in range(n)
        ]

    # reference model: rows (triples) + visible arity per committed version
    history: list[Counter] = []
    arities: list[int] = []

    def commit_model(rows, arity):
        history.append(Counter(rows))
        arities.append(arity)

    def visible(counter, arity):
        return Counter(t[:arity] for t in counter.elements())

    def collect_visible(df):
        has_w = "w" in df.columns
        return Counter(
            (r.id, r.v, r.w) if has_w else (r.id, r.v) for r in df.collect()
        )

    arity = 2
    rows0 = fresh_rows(8, arity)
    write_txn(df_of(rows0, arity), root)
    commit_model(rows0, arity)

    # the first six ops keep their fixed rotation slots; round-8 ops
    # (DV update / bin-packed optimize / bloom property+backfill) extend
    # the random tail so op-interaction coverage includes them
    ops = ["append", "overwrite", "merge", "delete", "dv", "compact",
           "zorder", "restore", "update", "optimize", "setbloom"]
    for step in range(30):
        cur = history[-1]
        if step == 6:
            # ADDITIVE EVOLUTION: one append introduces column ``w``;
            # pre-evolution rows surface NULL for it from here on
            arity = 3
            rows = fresh_rows(rng.randrange(1, 5), arity)
            write_txn(df_of(rows, arity), root, mode="append")
            commit_model(list(cur.elements()) + rows, arity)
            op = "evolve"
        else:
            op = ops[step % len(ops)] if step < 6 else rng.choice(ops)
            if op == "append":
                rows = fresh_rows(rng.randrange(1, 6), arity)
                write_txn(df_of(rows, arity), root, mode="append")
                commit_model(list(cur.elements()) + rows, arity)
            elif op == "overwrite":
                rows = fresh_rows(rng.randrange(1, 6), arity)
                write_txn(df_of(rows, arity), root, mode="overwrite")
                commit_model(rows, arity)
            elif op == "merge":
                rows = fresh_rows(rng.randrange(1, 5), arity)
                src = {t[0]: t for t in rows}  # key-unique upsert source
                merge_txn(
                    spark,
                    df_of([src[k] for k in sorted(src)], arity),
                    root,
                    on="id",
                )
                kept = [t for t in cur.elements() if t[0] not in src]
                # a rewrite at arity 2 materializes w away for touched
                # rows; survivors of UNtouched files keep physical w —
                # but under this scenario's op constraints every live
                # file's arity is <= the current arity, so kept rows'
                # w is already None whenever arity == 2
                commit_model(kept + [src[k] for k in sorted(src)], arity)
            elif op in ("delete", "dv"):
                cut = rng.randrange(0, 100)
                pred = f"v >= {cut}"
                kept = [t for t in cur.elements() if not (t[1] >= cut)]
                if op == "delete":
                    delete_txn(spark, root, pred)
                    commit_model(kept, arity)
                else:
                    v_before = snapshot(root).version
                    v_after = delete_txn_dv(spark, root, pred)
                    if v_after != v_before:  # no-match commits nothing
                        commit_model(kept, arity)
            elif op == "compact":
                compact_txn(spark, root, target_files=2)
                commit_model(list(cur.elements()), arity)
            elif op == "zorder":
                compact_txn(
                    spark, root, target_files=4,
                    cluster_by=["id", "v"], zorder=True,
                )
                commit_model(list(cur.elements()), arity)
            elif op == "restore":
                k = rng.randrange(0, len(history))
                restore_txn(root, k)
                arity = arities[k]
                commit_model(list(history[k].elements()), arity)
            elif op == "update":
                cut = rng.randrange(0, 100)
                v_before = snapshot(root).version
                v_after = update_txn_dv(
                    spark, root, f"v >= {cut}", {"v": "v - 200"}
                )
                if v_after != v_before:  # no-match commits nothing
                    commit_model(
                        [
                            (t[0], t[1] - 200, t[2]) if t[1] >= cut else t
                            for t in cur.elements()
                        ],
                        arity,
                    )
            elif op == "optimize":
                v_before = snapshot(root).version
                v_after = optimize_txn(spark, root, small_than=1 << 30)
                if v_after != v_before:  # <2 small files: no-op
                    commit_model(list(cur.elements()), arity)
            elif op == "setbloom":
                set_bloom_txn(spark, root, {"id": 4096})
                commit_model(list(cur.elements()), arity)
        got = collect_visible(read_txn(spark, root))
        assert got == visible(history[-1], arity), f"step {step} op {op}"

    # every historical version time-travels to its model state at ITS arity
    for k in range(0, len(history), 4):
        got = collect_visible(read_txn(spark, root, version=k))
        assert got == visible(history[k], arities[k]), f"version {k}"
    # CDF replay: base@i + per-version (deletes, inserts) == state@j,
    # compared at full physical width (pre-evolution rows carry NULL w)
    for i, j in ((0, len(history) - 1), (3, 12), (7, len(history) - 2)):
        state = Counter(t if len(t) == 3 else (*t, None)
                        for t in visible(history[i], 3).elements())
        rows = read_txn_changes(
            spark, root, from_version=i, to_version=j
        ).collect()
        for r in rows:
            t = (r.id, r.v, getattr(r, "w", None))
            state[t] += 1 if r._change_type == "insert" else -1
        assert +state == visible(history[j], 3), f"CDF replay {i}->{j}"


def _sc_check_constraints_enforced_in_pass(spark, base):
    """CHECK constraints: added via a metadata-only commit (existing rows
    validated first), enforced INSIDE every subsequent write/merge's
    single staging pass (raise_error chain, no second scan), SQL
    semantics (NULL passes, FALSE violates), survive checkpoints, and a
    rejected write publishes NOTHING (the log is unchanged).  Predicate-
    derived pruning (`where=`/`_prune_from_predicate`) rides along here."""
    from dbt_trill_shop_spark.sources.txn_table import (
        ConstraintViolation,
        _prune_from_predicate,
        add_constraint_txn,
        drop_constraint_txn,
        snapshot as snap_of,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 5), root)                      # v=id*10
    # a constraint existing rows violate is rejected outright
    with pytest.raises(ConstraintViolation):
        add_constraint_txn(spark, root, "v_small", "v < 10")
    add_constraint_txn(spark, root, "v_nonneg", "v >= 0")  # v1: ok
    assert dict(snap_of(root).constraints) == {"v_nonneg": "v >= 0"}
    # a violating append fails LOUDLY and publishes nothing
    v_before = snap_of(root).version
    with pytest.raises(ConstraintViolation, match="v_nonneg"):
        write_txn(
            spark.createDataFrame([(9, -1)], "id long, v long"), root
        )
    assert snap_of(root).version == v_before
    assert read_txn(spark, root).count() == 5
    # NULL passes (SQL CHECK three-valued semantics)
    write_txn(
        spark.createDataFrame([(9, None)], "id long, v long"), root
    )
    assert read_txn(spark, root).count() == 6
    # merge enforces too
    with pytest.raises(ConstraintViolation, match="v_nonneg"):
        merge_txn(
            spark,
            spark.createDataFrame([(1, -5)], "id long, v long"),
            root,
            on="id",
        )
    # duplicate add and unknown drop are loud; drop re-opens the gate
    with pytest.raises(ValueError):
        add_constraint_txn(spark, root, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError):
        drop_constraint_txn(root, "nope")
    drop_constraint_txn(root, "v_nonneg")
    write_txn(spark.createDataFrame([(10, -1)], "id long, v long"), root)
    assert read_txn(spark, root).count() == 7

    # predicate-derived data skipping: where= prunes files AND filters rows
    root2 = os.path.join(base, "t2")
    for lo in (0, 100, 200):
        write_txn(_df(spark, lo, lo + 10).coalesce(1), root2)
    q = read_txn(spark, root2, where="id >= 100 AND id <= 105")
    assert len(q.inputFiles()) == 1
    assert sorted(r.id for r in q.collect()) == list(range(100, 106))
    # BETWEEN + strict ops widen soundly; OR/parens disable pruning
    assert _prune_from_predicate("id BETWEEN 3 AND 7 AND v < 50") == {
        "id": (3, 7), "v": (None, 50)
    }
    assert _prune_from_predicate("id = 5 OR v = 1") == {}
    assert _prune_from_predicate("(id = 5)") == {}
    assert _prune_from_predicate("id % 3 = 1 AND id >= 7") == {"id": (7, None)}
    assert _prune_from_predicate("name = 'x' AND 10 >= id") == {
        "name": ("x", "x"), "id": (None, 10)
    }


def _sc_restore_rewinds_state_metadata_only(spark, base):
    """RESTORE: one metadata-only commit rewinds the table to a prior
    version — no data bytes move, heterogeneous-schema history restores
    exactly, DV chains reinstate, history stays reachable, and a
    vacuumed-away target is loud before anything commits."""
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv,
        restore_txn,
        snapshot as snap_of,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 10), root)                    # v0
    write_txn(_df(spark, 10, 20, extra="new"), root)      # v1: adds `tag`
    delete_txn_dv(spark, root, "id < 3")                  # v2: DV
    state_v2 = sorted((r.id, r.tag) for r in read_txn(spark, root).collect())
    delete_txn(spark, root, "id >= 15")                   # v3: rewrite (oops)
    assert read_txn(spark, root).count() == 12
    pre_restore_rels = {os.path.basename(p) for p in snap_of(root).files}
    v4 = restore_txn(root, 2)                             # undo the delete
    assert v4 == 4
    got = sorted((r.id, r.tag) for r in read_txn(spark, root).collect())
    assert got == state_v2
    # metadata-only: every restored file already existed on disk (the
    # commit introduced NO new data files)
    post = snap_of(root)
    assert all(
        os.path.basename(p) not in pre_restore_rels
        or os.path.exists(p)
        for p in post.files
    )
    new_rels = {os.path.basename(p) for p in post.files}
    all_known = {
        f for f in os.listdir(root) if f.endswith(".parquet")
    }
    assert new_rels <= all_known
    # DV chain reinstated: tombstoned ids stay dead after the restore
    assert sum(len(d) for d in post.file_dvs) >= 1
    assert not {i for i, _ in got} & {0, 1, 2}
    # the undone state is still reachable (restore is history, not erasure)
    assert read_txn(spark, root, version=3).count() == 12
    # restore to the PRE-EVOLUTION schema drops the evolved column
    restore_txn(root, 0)                                  # v5
    df0 = read_txn(spark, root)
    assert "tag" not in df0.columns
    assert sorted(r.id for r in df0.collect()) == list(range(10))
    # roll forward again (restore of a restore) and then verify vacuum
    # bounds restorability: drop history, restore must be LOUD
    restore_txn(root, 4)                                  # v6 == v4 state
    assert sorted((r.id, r.tag) for r in read_txn(spark, root).collect()) == state_v2
    compact_txn(spark, root, target_files=1)              # v7: fresh file
    vacuum_txn(root, retain_versions=1, min_age_sec=0)
    with pytest.raises(FileNotFoundError):
        restore_txn(root, 0)


def _sc_zorder_compaction_prunes_both_dims(spark, base):
    """Z-ORDER clustering compaction: after the Morton rewrite the log's
    min/max stats prune files on EITHER dimension — the second dimension
    would never prune under plain lexicographic range clustering."""
    root = os.path.join(base, "t")
    df = spark.range(0, 4096).selectExpr(
        "id", "CAST(id % 64 AS BIGINT) AS x", "CAST(id / 64 AS BIGINT) AS y"
    )
    write_txn(df.repartition(4), root)
    compact_txn(spark, root, target_files=16, cluster_by=["x", "y"], zorder=True)
    n_live = len(snapshot(root).files)
    assert n_live >= 8
    pruned_x = read_txn(spark, root, prune={"x": (0, 7)})
    pruned_y = read_txn(spark, root, prune={"y": (0, 7)})
    assert len(pruned_x.inputFiles()) < n_live
    assert len(pruned_y.inputFiles()) < n_live
    # values intact, filters still row-exact on the pruned scan
    assert pruned_x.filter("x <= 7").count() == 64 * 8
    assert pruned_y.filter("y <= 7").count() == 64 * 8
    assert read_txn(spark, root).count() == 4096


def _sc_stream_source_tails_commits(spark, base):
    """Txn table as a streaming SOURCE: offsets are log versions, each
    micro-batch is the new commits' added files, startingVersion skips
    history, schema evolution pads typed NULLs, compaction commits are
    invisible, and a remove-carrying commit is LOUD (append-only
    contract) unless ignoreChanges opts in."""
    import uuid

    from dbt_trill_shop_spark.sources.txn_stream import stream_txn_table

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 3), root)                     # v0
    write_txn(_df(spark, 3, 5, extra="new"), root)        # v1: adds `tag`
    compact_txn(spark, root, target_files=1)              # v2: not data

    def drain(src):
        # "Python worker failed to connect back" is a worker-SPAWN
        # infrastructure flake under a fully saturated box (this scenario
        # starts five short-lived streams, each spawning data-source
        # workers); a bounded retry on exactly that error keeps the
        # scenario's assertions honest without masking real failures
        import time as _time

        last = None
        for attempt in range(6):
            if attempt:  # back off before re-spawning into saturation
                _time.sleep(2 * attempt)
            name = f"tail_{uuid.uuid4().hex[:10]}"
            q = (
                src.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                return spark.table(name).collect()
            except Exception as ex:  # noqa: BLE001 - filtered re-raise below
                last = ex
                if not any(
                    m in str(ex)
                    for m in ("failed to connect back",
                              "worker exited unexpectedly")
                ):
                    raise
            finally:
                q.stop()
        raise last

    rows = drain(stream_txn_table(spark, root))
    assert sorted(r.id for r in rows) == [0, 1, 2, 3, 4]
    # stream schema is the CURRENT table schema; pre-evolution rows pad NULL
    assert {r.id: r.tag for r in rows} == {0: None, 1: None, 2: None,
                                           3: "new", 4: "new"}
    # compaction added files but contributed no stream rows
    assert len(rows) == 5
    # startingVersion: tail only commits AFTER v0
    rows1 = drain(stream_txn_table(spark, root, starting_version=0))
    assert sorted(r.id for r in rows1) == [3, 4]
    # a remove-carrying commit breaks the append-only contract loudly...
    delete_txn(spark, root, "id = 0")                     # v3: overwrite
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        drain(stream_txn_table(spark, root, starting_version=2))
    # ...unless ignoreChanges opts in: the rewrite's adds flow through
    rows2 = drain(
        stream_txn_table(spark, root, starting_version=2, ignore_changes=True)
    )
    assert sorted(r.id for r in rows2) == [1, 2, 3, 4]
    # exactly-once bookkeeping: replanning the same offset window is
    # deterministic (same files, same rows) — the checkpoint-replay story
    rows2b = drain(
        stream_txn_table(spark, root, starting_version=2, ignore_changes=True)
    )
    assert sorted((r.id, r.v) for r in rows2b) == sorted((r.id, r.v) for r in rows2)
    # value sanity under evolution: old columns intact post-pad
    assert {r.v for r in rows if r.id == 4} == {40}


def _sc_stream_cdf_tails_changes(spark, base):
    """Streaming CHANGE DATA FEED (the readChangeFeed twin of the
    append-only source): a drain of the stream equals the batch
    read_txn_changes row-for-row — inserts AND deletes, merge rewrites,
    DV tombstones, evolution NULL-padding — because both sides consume
    the SAME _changes_plan log walk.  startingVersion tails a suffix;
    an offset below the log-retention horizon is loud."""
    import uuid

    from dbt_trill_shop_spark.sources.txn_stream import (
        _TxnCdfStreamReader, stream_txn_changes,
    )
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv, read_txn_changes,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 5), root)                      # v0: inserts
    merge_txn(
        spark,
        spark.createDataFrame([(1, 111), (9, 90)], "id long, v long"),
        root, on="id",
    )                                                      # v1: rewrite
    write_txn(_df(spark, 20, 22, extra="new"), root)       # v2: evolution
    delete_txn_dv(spark, root, "id = 2")                   # v3: DV delete
    compact_txn(spark, root, target_files=1)               # v4: not data

    def drain(src):
        import time as _time

        last = None
        for attempt in range(6):  # worker-spawn flake retry + backoff
            if attempt:
                _time.sleep(2 * attempt)
            name = f"cdf_{uuid.uuid4().hex[:10]}"
            q = (
                src.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                return spark.table(name).collect()
            except Exception as ex:  # noqa: BLE001 - filtered re-raise
                last = ex
                if not any(
                    m in str(ex)
                    for m in ("failed to connect back",
                              "worker exited unexpectedly")
                ):
                    raise
            finally:
                q.stop()
        raise last

    def key(rows):
        return sorted(
            (r.id, r.v, getattr(r, "tag", None), r._change_type, r._commit_version)
            for r in rows
        )

    got = drain(stream_txn_changes(spark, root))
    want = read_txn_changes(spark, root, from_version=-1).collect()
    assert key(got) == key(want) and len(got) > 0
    # the stream carries real deletes: the DV'd row and the merge rewrite
    by = {}
    for r in got:
        by.setdefault((r._commit_version, r._change_type), set()).add(r.id)
    assert by[(3, "delete")] == {2}
    assert 1 in by[(1, "delete")] and 1 in by[(1, "insert")]
    assert (4, "insert") not in by  # compaction is not a data change
    # evolution: pre-evolution change rows pad NULL for the late column
    assert {r.tag for r in got if r._commit_version == 2} == {"new"}
    # startingVersion tails a suffix, matching the batch window exactly
    got2 = drain(stream_txn_changes(spark, root, starting_version=1))
    want2 = read_txn_changes(spark, root, from_version=1).collect()
    assert key(got2) == key(want2)
    # replanning the same window is deterministic (checkpoint replay)
    got2b = drain(stream_txn_changes(spark, root, starting_version=1))
    assert key(got2b) == key(got2)
    # below the log-retention horizon: loud, not silently partial
    import dbt_trill_shop_spark.sources.txn_table as tt

    for _ in range(12):  # push past a checkpoint, then clean the log
        write_txn(_df(spark, 100, 101), root)
    assert tt.cleanup_log_txn(root, retain_versions=4)
    rd = _TxnCdfStreamReader.__new__(_TxnCdfStreamReader)
    rd.root = root
    with pytest.raises(ValueError, match="retention horizon"):
        rd.partitions({"version": 0}, {"version": 16})


def _sc_stream_rate_limited_admission(spark, base):
    """maxFilesPerTrigger (Delta parity, steady-state contract): once the
    stream is positioned, a burst of producer commits drains as
    ceil(N / cap) micro-batches of at most cap files each — offsets cut
    MID-commit deterministically, maintenance commits cost no budget,
    and totals equal the uncapped drain.  The FIRST batch of a
    (re)started query is uncapped by documented API constraint (the
    engine asks for the latest offset before the reader learns its
    position), which the first drain here also demonstrates."""
    import uuid

    from dbt_trill_shop_spark.sources.txn_stream import stream_txn_table

    import time as _time

    def _data_progress(q, want_rows):
        # processAllAvailable waits for the data, but the PROGRESS entry
        # of the final batch can lag its commit under a loaded box —
        # poll briefly until the reported row total catches up
        for _ in range(100):
            prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if sum(p["numInputRows"] for p in prog) >= want_rows:
                return prog
            _time.sleep(0.1)
        return [p for p in q.recentProgress if p["numInputRows"] > 0]

    def _start_positioned(src, prefix):
        # bounded retry on the worker-SPAWN infrastructure flake only (the
        # _drain_complete pattern): each short-lived stream spawns Python
        # data-source workers, and a saturated box occasionally fails the
        # connect-back during the FIRST micro-batch; any other failure
        # re-raises immediately.
        last = None
        for attempt in range(6):
            if attempt:
                _time.sleep(2 * attempt)
            nm = f"{prefix}_{uuid.uuid4().hex[:10]}"
            qq = (
                src.writeStream.outputMode("append").format("memory")
                .queryName(nm).start()
            )
            try:
                qq.processAllAvailable()                   # positions stream
                return nm, qq
            except Exception as ex:  # noqa: BLE001 - filtered re-raise below
                last = ex
                qq.stop()
                if not any(
                    p in str(ex)
                    for p in (
                        "failed to connect back",
                        "worker exited unexpectedly",
                    )
                ):
                    raise
        raise last

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 3).coalesce(1), root)         # v0: 1 file
    src = stream_txn_table(spark, root, max_files_per_trigger=1)
    name, q = _start_positioned(src, "rl")
    try:
        n0 = len(_data_progress(q, 3))
        # producer burst AFTER the stream is live: 2 commits x 2 files
        # of EXACTLY 3 rows each (the range source's numPartitions split
        # is deterministic — repartition(2) is NOT and gave 4/2 files),
        # one maintenance commit (no budget), one more 1-file commit
        for lo in (3, 9):
            two = spark.range(lo, lo + 6, 1, 2).selectExpr(
                "id", "id * 10 as v"
            )
            write_txn(two, root)
        compact_txn(spark, root, target_files=1)
        write_txn(_df(spark, 15, 18).coalesce(1), root)
        q.processAllAvailable()
        progress = _data_progress(q, 18)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert sorted(r.id for r in rows) == list(range(18))
    burst = progress[n0:]
    # 5 burst data files, cap 1 -> 5 paced micro-batches of one 3-row
    # file each; the mid-commit cut means commits of 2 files split
    assert len(burst) == 5, [p["numInputRows"] for p in burst]
    assert max(p["numInputRows"] for p in burst) <= 3
    # BYTE budget variant: a 1-byte cap still admits one file per batch
    # (progress guarantee — an oversized file cannot stall the stream),
    # so the same burst shape drains one file at a time
    root2 = os.path.join(base, "tb")
    write_txn(_df(spark, 0, 3).coalesce(1), root2)
    src2 = stream_txn_table(spark, root2, max_bytes_per_trigger=1)
    name2, q2 = _start_positioned(src2, "rlb")
    try:
        m0 = len(_data_progress(q2, 3))
        write_txn(
            spark.range(3, 9, 1, 2).selectExpr("id", "id * 10 as v"), root2
        )
        write_txn(_df(spark, 9, 12).coalesce(1), root2)
        q2.processAllAvailable()
        prog2 = _data_progress(q2, 12)
    finally:
        q2.stop()
    assert sorted(r.id for r in spark.table(name2).collect()) == list(range(12))
    burst2 = prog2[m0:]
    assert len(burst2) == 3, [p["numInputRows"] for p in burst2]
    assert max(p["numInputRows"] for p in burst2) <= 3


def _sc_deletion_vectors_merge_on_read(spark, base):
    """Merge-on-read DELETE: tombstones ride a small sidecar; NO data file
    is rewritten by the commit.  Readers apply them, time travel ignores
    them, successive DVs never double-record, MERGE does not resurrect
    tombstoned rows, compaction materializes them away, the CDF reports
    exactly the newly-tombstoned rows, and vacuum keeps sidecars alive as
    long as a retained snapshot references them."""
    from collections import Counter

    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv,
        read_txn_changes,
        snapshot as snap_of,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 400).repartitionByRange(4, "id"), root)   # v0
    before = snap_of(root)
    v1 = delete_txn_dv(spark, root, "id % 100 < 3 AND id < 200")      # v1
    after = snap_of(root)
    # the data file set is byte-identical; only a dv sidecar was added
    assert set(after.files) == set(before.files)
    assert sum(len(d) for d in after.file_dvs) >= 1
    gone = {i for i in range(400) if i % 100 < 3 and i < 200}
    assert sorted(r.id for r in read_txn(spark, root).collect()) == sorted(
        set(range(400)) - gone
    )
    # time travel to the pre-DV snapshot still sees every row
    assert read_txn(spark, root, version=0).count() == 400
    # a second DV computes positions over the DV-APPLIED view: no overlap
    v2 = delete_txn_dv(spark, root, "id < 10")                        # v2
    gone2 = gone | set(range(10))
    assert sorted(r.id for r in read_txn(spark, root).collect()) == sorted(
        set(range(400)) - gone2
    )
    # a no-match predicate commits nothing
    assert delete_txn_dv(spark, root, "id > 100000") == v2
    # CDF: each DV commit's deletes are exactly the newly-tombstoned rows
    ch = read_txn_changes(spark, root, from_version=0).collect()
    by = {}
    for r in ch:
        by.setdefault((r._commit_version, r._change_type), set()).add(r.id)
    assert by[(v1, "delete")] == gone
    assert by[(v2, "delete")] == set(range(10)) - gone
    assert (v1, "insert") not in by and (v2, "insert") not in by
    # MERGE against a DV-carrying file: tombstoned rows stay dead
    src = spark.createDataFrame([(150, -1)], "id long, v long")
    merge_txn(spark, src, root, on="id")                              # v3
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert got[150] == -1 and 100 not in got and 0 not in got
    assert len(got) == 400 - len(gone2)
    # compaction materializes tombstones away: fresh files, no dvs, same rows
    compact_txn(spark, root, target_files=2)                          # v4
    final = snap_of(root)
    assert all(len(d) == 0 for d in final.file_dvs)
    assert {r.id for r in read_txn(spark, root).collect()} == set(got)
    # vacuum with retention 1: the old data files AND dv sidecars are
    # garbage now that no retained snapshot references them
    removed = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert any(f.startswith("dv-") for f in removed), removed
    assert {r.id for r in read_txn(spark, root).collect()} == set(got)


def _sc_merge_prunes_untouched_files(spark, base):
    """File-pruned MERGE (VERDICT r7 #2): a narrow CDC batch against a
    key-clustered table rewrites ONLY the files whose key range holds a
    source key — every other file's path survives the merge commit
    unchanged (no read, no rewrite), and values still come out exactly
    right.  This is the property that keeps a 1 MB batch from rewriting
    100 TB."""
    root = os.path.join(base, "t")
    df = _df(spark, 0, 400).repartitionByRange(8, "id")
    write_txn(df, root)
    before = snapshot(root)
    assert len(before.files) >= 4
    src = spark.createDataFrame([(10, -1), (12, -2), (1000, -3)], "id long, v long")
    merge_txn(spark, src, root, on="id")
    after = snapshot(root)
    survived = set(before.files) & set(after.files)
    rewritten = set(before.files) - set(after.files)
    # the clustered layout puts ids 10 and 12 in one or two files; the
    # rest of the table must ride through untouched
    assert rewritten, "some file must be rewritten"
    assert len(survived) >= len(before.files) - 2, (len(survived), len(before.files))
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    want = {i: i * 10 for i in range(400)}
    want.update({10: -1, 12: -2, 1000: -3})
    assert got == want
    # a source whose keys miss every file range is a pure insert: zero
    # files rewritten
    pre = snapshot(root)
    merge_txn(
        spark,
        spark.createDataFrame([(5000, 1)], "id long, v long"),
        root,
        on="id",
    )
    post = snapshot(root)
    assert set(pre.files) <= set(post.files)
    # MULTI-KEY pruning: intervals intersect across ALL join keys — a
    # source matching file ranges on `id` but provably outside them on a
    # SECOND clustered key rewrites nothing
    import dbt_trill_shop_spark.sources.txn_table as tt

    root2 = os.path.join(base, "t2")
    two = spark.range(0, 400).selectExpr("id", "id as k2", "id * 10 as v")
    write_txn(two.repartitionByRange(8, "id"), root2)
    pre2 = snapshot(root2)
    # id=10 is in range for the first file, but k2=9999 is outside EVERY
    # file's k2 range (files are id-clustered, so k2 ranges track id)
    merge_txn(
        spark,
        spark.createDataFrame([(10, 9999, -1)], "id long, k2 long, v long"),
        root2,
        on=["id", "k2"],
    )
    post2 = snapshot(root2)
    assert set(pre2.files) <= set(post2.files)  # pure insert, no rewrite
    got2 = read_txn(spark, root2).filter("id = 10").collect()
    assert sorted((r.k2, r.v) for r in got2) == [(10, 100), (9999, -1)]
    # BLOOM refinement: on a hash-scattered (unclustered) key every file's
    # interval spans the domain, but the bloom knows which file holds the
    # source key — the merge rewrites a strict subset
    root3 = os.path.join(base, "t3")
    scat = spark.range(0, 4000).selectExpr(
        "id * 7919 % 100000 as id", "id as v"
    ).repartition(4)
    write_txn(scat, root3)
    tt.set_bloom_txn(spark, root3, {"id": 16384})
    pre3 = snapshot(root3)
    n_pre = len(pre3.files)
    merge_txn(
        spark,
        spark.createDataFrame([(7919, -7)], "id long, v long"),
        root3,
        on="id",
    )
    post3 = snapshot(root3)
    survived3 = set(pre3.files) & set(post3.files)
    assert len(survived3) >= n_pre - 2, (len(survived3), n_pre)
    assert {r.v for r in read_txn(spark, root3).filter("id = 7919").collect()} == {-7}


def _sc_timestamp_travel_clock_regression(spark, base):
    """ADVICE r7 (low): as_of_ms resolves to the LAST version at or before
    the timestamp and folds the CONTIGUOUS prefix — under wall-clock
    regression the reconstructed state is always one that actually
    existed (timestamp travel ≡ version travel)."""
    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 2).coalesce(1), root)   # v0
    write_txn(_df(spark, 2, 4).coalesce(1), root)   # v1
    write_txn(_df(spark, 4, 6).coalesce(1), root)   # v2
    # doctor the log: v1's clock regressed below v0's
    def set_ts(v, ts):
        p = os.path.join(root, "_txn", f"{v:010d}.json")
        with open(p) as fh:
            e = json.load(fh)
        e["ts_ms"] = ts
        with open(p, "w") as fh:
            json.dump(e, fh)

    set_ts(0, 100)
    set_ts(1, 50)
    set_ts(2, 200)
    # as-of 60: last version with ts<=60 is v1 -> fold v0..v1 (contiguous),
    # NOT the never-existed state {v1 alone}
    s = snapshot(root, as_of_ms=60)
    assert s.version == 1
    ids = sorted(
        r.id for r in read_txn(spark, root, as_of_ms=60).collect()
    )
    assert ids == [0, 1, 2, 3]
    # as-of 150: v2 (ts 200) is excluded, v0+v1 both included
    assert snapshot(root, as_of_ms=150).version == 1
    with pytest.raises(ValueError):
        snapshot(root, as_of_ms=10)


def _sc_stats_require_full_rowgroup_coverage(spark, base):
    """ADVICE r7 (medium): a column's [min, max] is recorded only when
    EVERY row group contributes trustworthy stats — a partially-covered
    or NaN-poisoned column is dropped entirely (no stats, no skip), so
    data skipping can never prune a file whose stats-less row group held
    matching rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import dbt_trill_shop_spark.sources.txn_table as tt

    # real footer: statistics disabled entirely -> no stats recorded
    p1 = os.path.join(base, "nostats.parquet")
    pq.write_table(
        pa.table({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]}),
        p1,
        write_statistics=False,
    )
    assert tt._file_stats(p1) == {}
    # real footer: float/double columns never yield a usable range (under
    # Spark's ordering NaN > everything, so even a NaN-excluding footer
    # max cannot prove an open-upper-bound interval excludes the file)
    p2 = os.path.join(base, "nan.parquet")
    pq.write_table(
        pa.table({"id": [1, 2], "v": [float("nan"), 1.0]}), p2
    )
    assert "v" not in tt._file_stats(p2)
    assert tt._file_stats(p2).get("id") == [1, 2]

    # synthetic metadata: two row groups, one with stats and one without —
    # the column must be DROPPED, not recorded with the understated range
    class St:
        def __init__(self, mn, mx):
            self.has_min_max = True
            self.min, self.max = mn, mx

    class Col:
        def __init__(self, name, st):
            self.path_in_schema = name
            self.statistics = st

    class RG:
        def __init__(self, cols):
            self._cols = cols
            self.num_columns = len(cols)

        def column(self, i):
            return self._cols[i]

    class MD:
        def __init__(self, rgs):
            self._rgs = rgs
            self.num_row_groups = len(rgs)

        def row_group(self, i):
            return self._rgs[i]

    md = MD([
        RG([Col("k", St(0, 9)), Col("u", St(1, 2))]),
        RG([Col("k", None), Col("u", St(5, 8))]),
    ])
    got = tt._stats_from_metadata(md)
    assert "k" not in got          # partial coverage -> dropped
    assert got["u"] == [1, 8]      # full coverage -> merged range


def _sc_incremental_agg_mv(spark, base):
    """CDF-driven aggregate MV maintenance (txn_mv.sync_agg_mv): after
    every source mutation class — append, DV delete, DV update, rewrite
    delete dropping a whole group, maintenance compaction — one delta
    sync makes the MV equal a from-scratch GROUP BY; watermarks advance
    O(1); re-sync with no new commits is a no-op; NULL group keys group
    like SQL; float sum columns are rejected loudly."""
    from dbt_trill_shop_spark.sources.txn_mv import mv_source_version, sync_agg_mv
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv, update_txn_dv,
    )

    root = os.path.join(base, "src")
    mv = os.path.join(base, "mv")

    def recompute():
        rows = (
            read_txn(spark, root)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
            .collect()
        )
        return {r.g: (r.n, None if r.s is None else int(r.s)) for r in rows}

    def mv_state():
        return {
            r.g: (r.n_rows, None if r.sum_x is None else int(r.sum_x))
            for r in read_txn(spark, mv).collect()
        }

    from pyspark.sql import functions as F

    df = spark.range(0, 100).selectExpr("id", "id % 5 as g", "id * 10 as x")
    write_txn(df.repartition(4), root)                               # v0
    assert sync_agg_mv(spark, root, mv, ["g"], ["x"]) == 0
    assert mv_state() == recompute()
    # NULL group key + NULL measure arrive with an append
    write_txn(
        spark.createDataFrame([(900, None, None), (901, None, 7)],
                              "id long, g long, x long"),
        root,
    )
    delete_txn_dv(spark, root, "g = 2 AND id < 50")
    update_txn_dv(spark, root, "g = 3", {"x": "x + 1"})
    delete_txn(spark, root, "g = 4")          # rewrite: group disappears
    compact_txn(spark, root, target_files=2)  # maintenance: no changes
    v = sync_agg_mv(spark, root, mv, ["g"], ["x"])
    assert v == snapshot(root).version == mv_source_version(mv)
    got, want = mv_state(), recompute()
    assert got == want, (got, want)
    assert 4 not in got                        # emptied group dropped out
    assert None in got and got[None] == (2, 7)  # NULL key groups like SQL
    # no new commits: no-op, watermark unchanged
    assert sync_agg_mv(spark, root, mv, ["g"], ["x"]) == v
    # float sums rejected (delta cancellation needs exact arithmetic)
    root2 = os.path.join(base, "f")
    write_txn(spark.range(3).selectExpr("id as g", "cast(id as double) as x"), root2)
    with pytest.raises(ValueError, match="integer/decimal"):
        sync_agg_mv(spark, root2, os.path.join(base, "fmv"), ["g"], ["x"])
    # a foreign table is not silently adopted as an MV root
    with pytest.raises(ValueError, match="mv_source_version"):
        mv_source_version(root)


def _sc_drop_column_metadata_only(spark, base):
    """DROP COLUMN as one metadata-only commit: the data stops surfacing
    instantly with zero rewrite; time travel still shows it; the name is
    TOMBSTONED against re-adding until a full compaction purges the
    physical values (name-mapped reads would otherwise resurrect old
    data as the 'new' column); constraints referencing the column block
    the drop; a dropped column's bloom spec retires."""
    from dbt_trill_shop_spark.sources.txn_table import (
        add_constraint_txn, drop_column_txn, drop_constraint_txn,
        merge_txn, set_bloom_txn,
    )

    root = os.path.join(base, "t")
    df = spark.range(0, 10).selectExpr("id", "id * 10 as v", "'s' as secret")
    write_txn(df.coalesce(2), root)                         # v0
    set_bloom_txn(spark, root, {"secret": 4096})            # v1
    add_constraint_txn(spark, root, "s_nn", "secret IS NOT NULL")  # v2
    with pytest.raises(ValueError, match="s_nn"):
        drop_column_txn(root, "secret")                     # constraint blocks
    drop_constraint_txn(root, "s_nn")                       # v3
    s_before = snapshot(root)
    v = drop_column_txn(root, "secret")                     # v4: metadata only
    s_after = snapshot(root)
    assert set(s_after.files) == set(s_before.files)        # zero data moved
    assert "secret" not in read_txn(spark, root).columns
    assert read_txn(spark, root).count() == 10
    # bloom spec on the dropped column retired
    assert all(c != "secret" for c, _, _ in s_after.bloom_spec)
    # time travel shows the column pre-drop
    assert "secret" in read_txn(spark, root, version=v - 1).columns
    # appends with the logical schema work; resurrecting the name is loud
    write_txn(spark.range(10, 12).selectExpr("id", "id * 10 as v"), root)
    with pytest.raises(ValueError, match="compact"):
        write_txn(df.limit(1), root)
    with pytest.raises(ValueError, match="compact"):
        merge_txn(
            spark, df.limit(1), root, on="id", evolve_schema=True
        )
    # full compaction purges the physical values and clears the tombstone
    compact_txn(spark, root, target_files=1)
    assert snapshot(root).dropped == ()
    write_txn(
        spark.range(0, 2).selectExpr("id + 100 as id", "id as v", "'new' as secret"),
        root,
    )
    got = {r.id: r.secret for r in read_txn(spark, root).collect()}
    assert got[100] == "new" and got[0] is None            # no resurrection
    # RESTORE to a pre-drop version reinstates the metadata too: the
    # column is back AND writable (no stale tombstone survives)
    from dbt_trill_shop_spark.sources.txn_table import restore_txn

    root3 = os.path.join(base, "r")
    write_txn(
        spark.range(0, 4).selectExpr("id", "'x' as c").coalesce(1), root3
    )
    drop_column_txn(root3, "c")
    restore_txn(root3, 0)
    assert snapshot(root3).dropped == ()
    write_txn(
        spark.range(4, 5).selectExpr("id", "'y' as c").coalesce(1), root3
    )
    assert read_txn(spark, root3).filter("id = 4").collect()[0].c == "y"
    # guardrails: unknown column, last column
    with pytest.raises(ValueError, match="no column"):
        drop_column_txn(root, "nope")
    one = os.path.join(base, "one")
    write_txn(spark.range(3).selectExpr("id"), one)
    with pytest.raises(ValueError, match="last column"):
        drop_column_txn(one, "id")


def _sc_table_history_audit(spark, base):
    """DESCRIBE HISTORY (table_history): one metadata-only row per commit,
    newest first, carrying file/byte deltas and the idempotence/lineage
    tags every other feature stamps — the operator-facing audit trail."""
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv, table_history,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 6).coalesce(1), root)                   # v0
    write_txn(_df(spark, 6, 9).coalesce(1), root, app_txn=("ld", 3))  # v1
    delete_txn_dv(spark, root, "id = 1")                            # v2
    compact_txn(spark, root, target_files=1)                        # v3
    h = {r.version: r for r in table_history(spark, root).collect()}
    assert sorted(h) == [0, 1, 2, 3]
    assert [r.version for r in table_history(spark, root).collect()] == [3, 2, 1, 0]
    assert h[0].mode == "append" and h[0].n_added_files == 1
    assert h[0].bytes_added > 0                     # __bytes stats surface
    assert h[1].app_txn == "ld@3"
    assert h[2].n_dv_files == 1 and h[2].require == "deletion_vectors"
    assert h[3].mode == "compact" and h[3].n_removed_files == 2
    assert h[2].committed_at is not None


def _sc_app_txn_idempotent_writes(spark, base):
    """Application transactions (Delta txnAppId/txnVersion): an append
    tagged (app_id, version) applies EXACTLY ONCE — re-running the same
    logical step is a no-op returning the current head; watermarks are
    per-app maxima and fold through log checkpoints."""
    from dbt_trill_shop_spark.sources.txn_table import last_app_version

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 3).coalesce(1), root)                      # v0
    v1 = write_txn(_df(spark, 3, 6).coalesce(1), root, app_txn=("loader", 1))
    assert v1 == 1 and last_app_version(root, "loader") == 1
    # duplicate apply: no-op, no new version, no new rows
    assert write_txn(_df(spark, 3, 6).coalesce(1), root, app_txn=("loader", 1)) == 1
    assert read_txn(spark, root).count() == 6
    assert snapshot(root).version == 1
    # a LATER version applies; an EARLIER re-run after it is also a no-op
    write_txn(_df(spark, 6, 9).coalesce(1), root, app_txn=("loader", 2))
    assert write_txn(_df(spark, 0, 99).coalesce(1), root, app_txn=("loader", 1)) == 2
    assert read_txn(spark, root).count() == 9
    # independent apps don't interfere
    write_txn(_df(spark, 9, 12).coalesce(1), root, app_txn=("other", 1))
    assert last_app_version(root, "loader") == 2
    assert last_app_version(root, "other") == 1
    assert last_app_version(root, "nobody") is None
    # watermarks fold through checkpoints (pool pins _CHECKPOINT_EVERY=4)
    for i in range(5):
        write_txn(_df(spark, 100 + i, 101 + i).coalesce(1), root)
    assert any(
        f.startswith("checkpoint-")
        for f in os.listdir(os.path.join(root, "_txn"))
    )
    assert last_app_version(root, "loader") == 2
    assert write_txn(_df(spark, 0, 99).coalesce(1), root, app_txn=("loader", 2)) == snapshot(root).version
    assert read_txn(spark, root).count() == 17
    # app_txn is append-only by contract
    with pytest.raises(ValueError):
        write_txn(_df(spark, 0, 1), root, mode="overwrite", app_txn=("x", 1))


def _sc_reader_feature_protocol(spark, base):
    """Reader feature flags (Delta's protocol idea): commits whose correct
    interpretation needs a capability stamp it in ``require``; a reader
    that lacks the feature fails LOUDLY instead of silently mis-reading
    (a DV-ignorant reader would resurrect deleted rows).  DV commits
    stamp automatically; a hand-crafted future-feature entry (and a
    future-feature checkpoint) poison every read path with RuntimeError."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import delete_txn_dv

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 10).coalesce(1), root)
    delete_txn_dv(spark, root, "id = 3")
    e = tt._read_entry(root, 1)
    assert e.get("require") == ["deletion_vectors"]  # stamped automatically
    assert read_txn(spark, root).count() == 9        # and still readable
    # a commit from a FUTURE writer requiring an unknown feature
    entry = tt._build_entry("append", 2, [], e["schema"], None)
    entry["require"] = ["deletion_vectors", "time_crystals"]
    assert tt._try_commit(root, 2, entry)
    with pytest.raises(RuntimeError, match="time_crystals"):
        snapshot(root)
    with pytest.raises(RuntimeError, match="time_crystals"):
        tt.read_txn_changes(spark, root, from_version=0).count()
    # time travel BEFORE the foreign commit still works
    assert read_txn(spark, root, version=1).count() == 9
    # a future-feature checkpoint poisons the fast path too
    os.unlink(tt._entry_path(root, 2))
    ckpt = {
        "version": 1, "live": [], "schema": e["schema"], "ts_ms": 1,
        "batch_ids": [], "require": ["warp_drive"],
    }
    with open(tt._ckpt_path(root, 1), "w") as fh:
        json.dump(ckpt, fh)
    with pytest.raises(RuntimeError, match="warp_drive"):
        snapshot(root)


def _sc_optimize_binpacks_small_files(spark, base):
    """optimize_txn (Delta OPTIMIZE): only live files under the size
    threshold are rewritten — right-sized files survive byte-identical;
    sizes plan from the log's __bytes stats (zero object stats); packed
    inputs' deletion vectors materialize away while other files' DVs
    survive; the commit is CDF-silent and invisible to the streaming
    tail; fewer than two small files is a no-op."""
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv, optimize_txn, read_txn_changes,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 20000).coalesce(1), root)        # v0: one big file
    for lo in range(20000, 20012, 3):                        # v1..v4: tiny files
        write_txn(_df(spark, lo, lo + 3).coalesce(1), root)
    s0 = snapshot(root)
    assert len(s0.files) == 5
    assert all("__bytes" in st for st in s0.file_stats)
    big = max(zip(s0.file_stats, s0.files), key=lambda x: x[0]["__bytes"])[1]
    # tombstone one row in a tiny file AND one in the big file
    delete_txn_dv(spark, root, "id = 20000 OR id = 7")       # v5
    thresh = sorted(st["__bytes"] for st in s0.file_stats)[-2] + 1
    v = optimize_txn(spark, root, small_than=thresh)
    s1 = snapshot(root)
    assert v == s1.version == 6
    assert big in s1.files                                    # untouched
    # 4 tiny files packed into 1; big file + its DV survive
    assert len(s1.files) == 2
    dvs_by_file = dict(zip(s1.files, s1.file_dvs))
    assert len(dvs_by_file[big]) == 1                         # big's DV kept
    packed = next(p for p in s1.files if p != big)
    assert dvs_by_file[packed] == ()                          # folded away
    got = sorted(r.id for r in read_txn(spark, root).collect())
    assert got == [i for i in range(20012) if i not in (7, 20000)]
    # CDF: the optimize commit reports no changes
    assert read_txn_changes(spark, root, from_version=5).count() == 0
    # no-op when fewer than two small files remain
    assert optimize_txn(spark, root, small_than=thresh) == 6


def _sc_update_dv_merge_on_read(spark, base):
    """Merge-on-read UPDATE (update_txn_dv): matched rows tombstone into a
    sidecar and their updated versions append in ONE commit — untouched
    data files survive byte-identical; set expressions evaluate against
    the OLD row and cast to the column's type; CDF reports the pre-image
    as deletes and the post-image as inserts of the same commit;
    three-valued logic leaves NULL-predicate rows; a no-match UPDATE
    commits nothing; compaction materializes the tombstones away."""
    from dbt_trill_shop_spark.sources.txn_table import (
        read_txn_changes, update_txn_dv,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 100).repartition(4), root)        # v0
    s0 = snapshot(root)
    v = update_txn_dv(spark, root, "id >= 95", {"v": "v + 1"})
    assert v == 1
    s1 = snapshot(root)
    assert set(s0.files) <= set(s1.files)                      # no rewrite
    assert sum(len(d) for d in s1.file_dvs) >= 1               # tombstones live
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert len(got) == 100
    assert got[94] == 940 and got[95] == 951 and got[99] == 991
    ch = read_txn_changes(spark, root, from_version=0)
    rows = sorted((r._change_type, r.id, r.v) for r in
                  ch.filter("_commit_version = 1").collect())
    assert rows == sorted(
        [("delete", i, i * 10) for i in range(95, 100)]
        + [("insert", i, i * 10 + 1) for i in range(95, 100)]
    )
    # no-match: nothing commits
    assert update_txn_dv(spark, root, "id = 12345", {"v": "0"}) == 1
    assert snapshot(root).version == 1
    # updating an already-updated row works (positions over DV-applied view)
    update_txn_dv(spark, root, "id = 99", {"v": "v + 1"})
    assert read_txn(spark, root).filter("id = 99").collect()[0].v == 992
    # three-valued logic: NULL predicate leaves the row
    write_txn(spark.createDataFrame([(200, None)], "id long, v long"), root)
    vb = snapshot(root).version
    assert update_txn_dv(spark, root, "v < 0", {"v": "0"}) == vb
    # unknown SET column is loud
    with pytest.raises(ValueError):
        update_txn_dv(spark, root, "id = 1", {"nope": "1"})
    # compaction folds tombstones away; values survive
    compact_txn(spark, root, target_files=2)
    s = snapshot(root)
    assert sum(len(d) for d in s.file_dvs) == 0
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert len(got) == 101 and got[99] == 992 and got[200] is None


def _sc_bloom_filter_equality_skipping(spark, base):
    """Per-file Bloom filters (set_bloom_txn): equality point lookups on a
    HIGH-CARDINALITY UNCLUSTERED key prune files where min/max stats are
    useless, with zero false negatives; the spec is a table property every
    later write honors in-pass; the backfill is metadata-only and CDF-
    silent; DV chains survive the backfill re-add; a bloom column missing
    from an old schema generation excludes those files outright; the spec
    folds through log checkpoints."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import (
        read_txn_changes, set_bloom_txn,
    )

    root = os.path.join(base, "t")
    # 4 files, key hash-scattered: every file's [min, max] spans the domain
    df = spark.range(0, 4000).selectExpr(
        "id * 7919 % 100000 as k", "id as v"
    ).repartition(4)
    write_txn(df, root)                                   # v0
    snap0 = snapshot(root)
    # interval pruning provably can't help on this layout
    assert len(tt._keep_files(spark, snap0, {"k": (7919, 7919)})) == 4
    set_bloom_txn(spark, root, {"k": 16384})              # v1: backfill
    snap1 = snapshot(root)
    assert snap1.bloom_spec == (("k", 16384, 5),)
    assert set(snap1.files) == set(snap0.files)           # metadata-only
    # backfill is not a data change
    assert read_txn_changes(spark, root, from_version=0).count() == 0
    # point lookup now opens ~1 file (16384 bits vs ~1000 distinct/file:
    # comfortably under saturation; false positives allowed, so <= 2)
    got = read_txn(spark, root, where="k = 7919")
    assert [(r.k, r.v) for r in got.collect()] == [(7919, 1)]
    assert len(got.inputFiles()) <= 2
    # absent key: zero rows and (almost surely) zero files
    assert read_txn(spark, root, where="k = 99999999").count() == 0
    # NO FALSE NEGATIVES: every present key in a sample finds its row
    sample = [(i * 7919) % 100000 for i in range(0, 4000, 97)]
    hits = read_txn(
        spark, root, prune={"k": (sample[5], sample[5])}
    ).filter(f"k = {sample[5]}")
    assert hits.count() == 1
    for key in sample[:8]:
        assert read_txn(spark, root, where=f"k = {key}").count() >= 1
    # writes after the spec compute blooms in-pass
    write_txn(
        spark.range(4000, 4500).selectExpr(
            "id * 7919 % 100000 as k", "id as v"
        ).coalesce(1),
        root,
    )                                                     # v2
    snap2 = snapshot(root)
    assert all("__bloom" in st for st in snap2.file_stats)
    # DV chain survives a later backfill re-add (merged spec, re-applied dvs)
    from dbt_trill_shop_spark.sources.txn_table import delete_txn_dv

    delete_txn_dv(spark, root, "v = 1")                   # v3: tombstone k=7919
    set_bloom_txn(spark, root, {"v": 8192})               # v4: second spec col
    snap4 = snapshot(root)
    assert {c for c, _, _ in snap4.bloom_spec} == {"k", "v"}
    assert read_txn(spark, root, where="k = 7919").count() == 0  # still deleted
    # schema evolution: files that PREDATE a bloom column are excluded for
    # any equality probe on it (their values are all NULL by evolution)
    write_txn(
        spark.range(0, 10).selectExpr(
            "id * 7919 % 100000 as k", "id as v", "id as extra"
        ).coalesce(1),
        root,
    )                                                     # v5: adds `extra`
    set_bloom_txn(spark, root, {"extra": 8192})           # v6: backfill all
    got = read_txn(spark, root, where="extra = 3")
    assert len(got.inputFiles()) == 1 and got.count() == 1
    # the spec folds through checkpoints (pool pins _CHECKPOINT_EVERY = 4;
    # the table is past version 4, so a checkpoint exists under _txn)
    assert any(
        f.startswith("checkpoint-")
        for f in os.listdir(os.path.join(root, "_txn"))
    )
    spec_now = dict((c, (m, k)) for c, m, k in snapshot(root).bloom_spec)
    assert spec_now == {"k": (16384, 5), "v": (8192, 5), "extra": (8192, 5)}
    # SIDECAR STORAGE (VERDICT r8 #2): bitsets live in per-file sidecar
    # files, NOT inline in the log — every entry and checkpoint stays
    # metadata-sized (the inline form was ~32 KiB of base64 per file,
    # gigabytes in the log at a 100k-file table)
    logdir = os.path.join(root, "_txn")
    for f in os.listdir(logdir):
        if f.endswith(".json"):
            body = open(os.path.join(logdir, f)).read()
            assert '"b64"' not in body, f
    snap_now = snapshot(root)
    refs = {
        tt._bloom_sidecar_ref(st)
        for st in snap_now.file_stats
        if tt._bloom_sidecar_ref(st)
    }
    assert refs and all(
        os.path.exists(os.path.join(root, r)) for r in refs
    )
    # a checkpoint entry for a bloom'd file is bounded: reference + (m,k)
    # per column, never the bitset
    per_file = max(
        len(json.dumps(st.get("__bloom", {}))) for st in snap_now.file_stats
    )
    assert per_file < 512, per_file
    # vacuum keeps referenced sidecars, sweeps unreferenced ones
    orphan = os.path.join(root, "bloom-deadbeef.json")
    open(orphan, "w").write("{}")
    swept = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert "bloom-deadbeef.json" in swept
    assert all(os.path.exists(os.path.join(root, r)) for r in refs)
    # post-vacuum bloom reads still work: the v3-tombstoned k=7919 row
    # stays deleted; only v5's re-added row matches
    assert read_txn(spark, root, where="k = 7919").count() == 1
    # TYPE-FAMILY GATE (ADVICE r9): a probe whose literal type family
    # differs from the column's must NOT bloom-prune — `scol = 5` on a
    # string column coerces the COLUMN ('05' casts to 5 and matches),
    # while a probe hashing the string '5' would have skipped its file
    sroot = os.path.join(base, "s")
    write_txn(
        spark.createDataFrame([("05", 1)], "scol string, v long").coalesce(1),
        sroot,
    )
    write_txn(
        spark.createDataFrame([("7", 2)], "scol string, v long").coalesce(1),
        sroot,
    )
    set_bloom_txn(spark, sroot, {"scol": 1024})
    got = read_txn(spark, sroot, where="scol = 5")
    assert len(got.inputFiles()) == len(snapshot(sroot).files)  # no skip
    assert [r.v for r in got.collect()] == [1]  # column coerced: '05' = 5
    # same-family probe still prunes
    got = read_txn(spark, sroot, where="scol = '7'")
    assert len(got.inputFiles()) == 1 and [r.v for r in got.collect()] == [2]


def _sc_scan_groups_coalesce_schema_generations(spark, base):
    """VERDICT r8 (low): a table with many ADDITIVE schema evolutions must
    plan O(distinct type-conflicting generations), not O(commits) — the
    parquet reader fills absent columns with NULL under an explicit
    schema, so type-compatible generations merge into ONE scan group
    instead of a left-deep unionByName chain."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = os.path.join(base, "t")
    n_gen = 25
    for i in range(n_gen):
        # every commit extends the schema by one column -> 25 distinct
        # commit-time schemas, each a superset of the last (additive)
        write_txn(
            spark.range(i, i + 1).selectExpr(
                "id", "id * 10 as v",
                *[f"id + {j} as c{j}" for j in range(i + 1)],
            ).coalesce(1),
            root,
        )
    snap = snapshot(root)
    assert len(set(snap.file_schemas)) == n_gen
    df = read_txn(spark, root)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan.count("Relation")
    assert "Union" not in plan
    # evolution read semantics are intact: c3 is NULL for generations that
    # predate it, id + 3 from generation 3 on; every generation survives
    rows = {r.id: (r.v, r.c3) for r in df.collect()}
    assert len(rows) == n_gen
    assert rows[2] == (20, None)
    assert rows[3] == (30, 6)
    assert rows[7] == (70, 10)
    # TYPE-CONFLICTING generations stay separate scan groups (sound):
    # fabricate two files whose recorded schemas disagree on v's type
    import pyspark.sql.functions as F

    d1 = os.path.join(base, "m1")
    a = spark.range(0, 2).select("id", F.lit(5).cast("long").alias("v"))
    b = spark.range(2, 4).select("id", F.lit("s").alias("v"))
    a.coalesce(1).write.parquet(os.path.join(d1, "a"))
    b.coalesce(1).write.parquet(os.path.join(d1, "b"))
    fa = [os.path.join(d1, "a", f) for f in os.listdir(os.path.join(d1, "a")) if f.endswith(".parquet")]
    fb = [os.path.join(d1, "b", f) for f in os.listdir(os.path.join(d1, "b")) if f.endswith(".parquet")]
    from pyspark.sql.types import StructType

    want = StructType.fromJson(json.loads(b.schema.json()))
    mixed = tt._scan_files(
        spark,
        [(fa[0], a.schema.json()), (fb[0], b.schema.json())],
        want,
    )
    plan2 = mixed._jdf.queryExecution().optimizedPlan().toString()
    assert plan2.count("Relation") == 2  # no unsound type merge


def _sc_log_cleanup_bounds_history(spark, base):
    """cleanup_log_txn (Delta's logRetention cleanup): entries a
    checkpoint superseded are deleted, bounding the _txn listing as
    commits accumulate; everything at or above the anchor checkpoint
    still folds exactly, and every reader that would cross the horizon
    fails LOUDLY (time travel, CDF, a lagging stream restart) instead of
    silently reconstructing partial state."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import cleanup_log_txn

    root = os.path.join(base, "t")
    one = spark.createDataFrame([(0, 0)], "id long, v long").coalesce(1)
    for i in range(11):  # v0..v10; pool pins _CHECKPOINT_EVERY = 4
        write_txn(one.selectExpr(f"{i} as id", "v"), root, extra={"batch_id": i})
    # no-op until a checkpoint old enough to anchor the horizon exists
    assert cleanup_log_txn(root, retain_versions=99) == []
    dry = cleanup_log_txn(root, retain_versions=4, dry_run=True)
    removed = cleanup_log_txn(root, retain_versions=4)
    assert removed == dry and len(removed) == 4  # entries 0..3 (anchor: ckpt 4)
    logdir = os.path.join(root, "_txn")
    assert tt._list_versions(root) == list(range(4, 11))
    # snapshots at/above the anchor fold exactly
    assert read_txn(spark, root).count() == 11
    assert read_txn(spark, root, version=4).count() == 5
    assert sorted(r.id for r in read_txn(spark, root, version=6).collect()) == list(range(7))
    # below the horizon: loud, not wrong
    with pytest.raises(ValueError):
        read_txn(spark, root, version=2)
    from dbt_trill_shop_spark.sources.txn_table import read_txn_changes

    with pytest.raises(ValueError, match="retention horizon"):
        read_txn_changes(spark, root, from_version=1)
    assert read_txn_changes(spark, root, from_version=4).count() == 6  # v5..v10
    # exactly-once replay watermarks survive via the checkpoint fold
    assert tt.committed_batch_ids(root) == set(range(11))
    # a lagging stream restart below the horizon raises instead of
    # silently skipping the cleaned commits
    from dbt_trill_shop_spark.sources.txn_stream import _TxnStreamReader

    rd = _TxnStreamReader.__new__(_TxnStreamReader)
    rd.root, rd.ignore_changes, rd._pos = root, False, None
    with pytest.raises(ValueError, match="retention horizon"):
        rd.partitions({"version": 1}, {"version": 10})
    # a restart AT the horizon streams the retained tail
    parts = rd.partitions({"version": 3}, {"version": 5})
    assert len(parts) == 2  # v4, v5
    # idempotent: a second cleanup with the same retention is a no-op
    assert cleanup_log_txn(root, retain_versions=4) == []
    assert any(f.startswith("checkpoint-") for f in os.listdir(logdir))


def _sc_shallow_clone_zero_copy(spark, base):
    """clone_txn (Delta's SHALLOW CLONE): the clone's v0 references the
    source snapshot's files and sidecars by relative traversal paths —
    zero bytes copied — and is a full table from then on: writes land
    clone-local, the source is never touched, metadata (constraints,
    bloom spec) carries over, bloom sidecars resolve across roots, and a
    full compaction self-contains the clone."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, compact_txn, delete_txn_dv, read_txn_changes,
        set_bloom_txn, vacuum_txn,
    )

    src = os.path.join(base, "src")
    df = spark.range(0, 400).selectExpr("id * 7919 % 10000 as k", "id as v")
    write_txn(df.repartition(2), src)                       # v0: 2 files
    delete_txn_dv(spark, src, "v = 3")                      # v1: DV sidecar
    set_bloom_txn(spark, src, {"k": 4096})                  # v2: bloom sidecars
    src_files = sorted(os.listdir(src))
    dst = os.path.join(base, "dst")
    assert clone_txn(src, dst) == 0
    # zero copy: the clone directory holds ONLY its log
    assert sorted(os.listdir(dst)) == ["_txn"]
    got = {r.k: r.v for r in read_txn(spark, dst).collect()}
    want = {r.k: r.v for r in read_txn(spark, src).collect()}
    assert got == want and 3 not in got.values()            # DV applied
    # bloom sidecars resolve across roots: a point lookup prunes
    k0 = next(iter(want))
    hit = read_txn(spark, dst, where=f"k = {k0}")
    assert hit.count() >= 1
    assert len(hit.inputFiles()) < len(snapshot(dst).files) + 1  # <= 1 of 2
    # clone CDF: v0 reports the referenced rows as inserts
    assert read_txn_changes(spark, dst, from_version=-1).count() == len(want)
    # writes land clone-local; the source never changes
    write_txn(
        spark.createDataFrame([(99999, 999)], "k long, v long").coalesce(1), dst
    )
    merge_txn(
        spark, spark.createDataFrame([(k0, -5)], "k long, v long"), dst, on="k"
    )
    assert sorted(os.listdir(src)) == src_files             # byte-identical
    assert {r.v for r in read_txn(spark, dst).filter(f"k = {k0}").collect()} == {-5}
    assert read_txn(spark, src).filter(f"k = {k0}").filter("v = -5").count() == 0
    # lineage is recorded; the clone's vacuum never sweeps source files
    e0 = tt._read_entry(dst, 0)
    assert e0["clone_of"]["root"] == os.path.abspath(src)
    vacuum_txn(dst, retain_versions=1, min_age_sec=0)
    assert sorted(os.listdir(src)) == src_files
    assert read_txn(spark, dst).count() == len(want) + 1 - 0  # still readable
    # metadata carried over: the bloom spec is live on the clone
    assert snapshot(dst).bloom_spec == snapshot(src).bloom_spec
    # full compaction self-contains the clone: no more source references
    compact_txn(spark, dst, target_files=1)
    live = snapshot(dst).files
    assert all(os.path.dirname(os.path.abspath(p)) == os.path.abspath(dst) for p in live)
    assert read_txn(spark, dst).count() == len(want) + 1
    # cloning over an existing table is loud
    with pytest.raises(ValueError):
        clone_txn(src, dst)
    # time-travel clone: clone at the source's v0 sees pre-delete rows
    dst2 = os.path.join(base, "dst2")
    clone_txn(src, dst2, version=0)
    assert read_txn(spark, dst2).filter("v = 3").count() == 1


def _sc_demo_queries_match_duckdb_oracles(spark, base):
    """The three round-8-staged registry queries (operators/txn_demo.py)
    pass the driver-style oracle comparison, and the skipping query's
    scan provably opens a strict subset of the table's files."""
    from dbt_trill_shop_spark.operators.txn_demo import (
        ROUND8_TXN_QUERIES,
        ROUND9_STAGED,
        ROUND10_STAGED,
        ROUND11_STAGED,
        ROUND12_STAGED,
        ROUND13_STAGED,
        ROUND14_STAGED,
        ROUND15_STAGED,
        txn_skipping_scan,
    )
    from .oracle_utils import compare, duck_connection, oracle_frame

    def one(item):
        name, (fn, sql) = item
        con = duck_connection(SF_DIR)
        probs = compare(fn(spark, SF_DIR), oracle_frame(con, sql))
        assert not probs, f"{name}: " + "; ".join(probs)

    every = {
        **ROUND8_TXN_QUERIES, **ROUND9_STAGED, **ROUND10_STAGED,
        **ROUND11_STAGED, **ROUND12_STAGED, **ROUND13_STAGED,
        **ROUND14_STAGED, **ROUND15_STAGED,
    }
    from dbt_trill_shop_spark.streaming import events as _ev

    policy_before = spark.conf.get(_ev._WM_POLICY_CONF, "min")
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(one, every.items()))
    # VERDICT r10 #4: s_stream_attribution_outer's multipleWatermarkPolicy
    # pin (policy=max, safe only for its symmetric topology) must not LEAK
    # past its drain — the refcount must be fully unwound and the session
    # value restored, even with the parity drains running concurrently
    assert _ev._wm_state["depth"] == 0, _ev._wm_state
    assert spark.conf.get(_ev._WM_POLICY_CONF, "min") == policy_before
    # the staged DV query's story depends on merge-on-read: the delete
    # commit must leave the data file set byte-identical
    import dbt_trill_shop_spark.sources.txn_table as _tt
    import tempfile as _tf

    dv_root = os.path.join(_tf.gettempdir(), f"txn_dvdel_{os.getpid()}")
    s0 = _tt.snapshot(dv_root, version=0)
    s1 = _tt.snapshot(dv_root)
    assert set(s1.files) == set(s0.files)
    assert sum(len(d) for d in s1.file_dvs) >= 1
    # the DV-update query's story: original files all survive the commit;
    # only the updated-rows file is new
    up_root = os.path.join(_tf.gettempdir(), f"txn_dvupd_{os.getpid()}")
    u0 = _tt.snapshot(up_root, version=0)
    u1 = _tt.snapshot(up_root)
    assert set(u0.files) <= set(u1.files)
    assert sum(len(d) for d in u1.file_dvs) >= 1
    pruned = txn_skipping_scan(spark, SF_DIR)
    import dbt_trill_shop_spark.sources.txn_table as tt
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"txn_skipscan_{os.getpid()}")
    n_live = len(tt.snapshot(root).files)
    n_scanned = len(pruned.inputFiles())
    assert 0 < n_scanned < n_live, (n_scanned, n_live)
    # the bloom-lookup query's story depends on equality skipping: a point
    # lookup on a guaranteed-present key (any file's recorded min) must
    # open a strict subset of the live files
    bl_root = os.path.join(_tf.gettempdir(), f"txn_bloomlkp_{os.getpid()}")
    sb = _tt.snapshot(bl_root)
    assert any(c == "o_orderkey" for c, _, _ in sb.bloom_spec)
    k = sb.file_stats[0]["o_orderkey"][0]
    got = _tt.read_txn(spark, bl_root, where=f"o_orderkey = {k}")
    assert got.count() >= 1
    assert 0 < len(got.inputFiles()) < len(sb.files)
    # the incremental re-embed story depends on the refresh MERGE being
    # FILE-PRUNED: the edited id range must rewrite a strict subset of
    # the corpus files (consumer work ~ changed files, never the corpus)
    re_root = os.path.join(_tf.gettempdir(), f"txn_cdfreembed_{os.getpid()}")
    e1 = _tt._read_entry(re_root, 1)
    n_removed = sum(1 for a in e1["actions"] if "remove" in a)
    assert 0 < n_removed < len(_tt.snapshot(re_root, version=0).files)


def _sc_replace_where_atomic_backfill(spark, base):
    """replaceWhere (Delta parity): ONE commit = delete(predicate rows) +
    insert(batch); cost ∝ the replaced region — untouched files keep
    their exact paths (never rewritten), fully-matched files drop by
    metadata-only remove, only the boundary file gets DV tombstones."""
    from dbt_trill_shop_spark.sources.txn_table import (
        _read_entry,
        read_txn_changes,
        replace_where_txn,
    )

    root = os.path.join(base, "t")
    # v0: ids 0..29 range-clustered into 3 files (~[0,10) [10,20) [20,30))
    write_txn(
        spark.range(0, 30).selectExpr("id", "id * 10 as v")
        .repartitionByRange(3, "id"),
        root,
    )
    files0 = set(snapshot(root).files)
    assert len(files0) == 3
    # replace [10, 22): the middle file fully matches (metadata remove),
    # the last file partially (ids 20,21 -> DV), the first is untouched
    batch = spark.range(10, 22).selectExpr("id", "id * 100 as v")
    v1 = replace_where_txn(spark, root, "id >= 10 AND id < 22", batch)
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    want = {i: i * 10 for i in range(30) if not 10 <= i < 22}
    want.update({i: i * 100 for i in range(10, 22)})
    assert got == want
    snap1 = snapshot(root)
    # the [0,10) file survives BY PATH — provably never rewritten
    assert len(files0 & set(snap1.files)) >= 1
    e = _read_entry(root, v1)
    kinds = {k for a in e["actions"] for k in a if k in ("remove", "dv", "add")}
    assert kinds == {"remove", "dv", "add"}
    # stats-pruned: the untouched file contributes NO remove/dv action
    removed = {a["remove"] for a in e["actions"] if "remove" in a}
    surviving_rels = {os.path.basename(p) for p in files0 & set(snap1.files)}
    assert not removed & surviving_rels
    # CDF reports exactly delete(replaced rows) + insert(batch rows)
    ch = read_txn_changes(spark, root, from_version=0, to_version=v1).collect()
    dels = {r.id for r in ch if r._change_type.startswith("delete")}
    ins = {r.id for r in ch if r._change_type == "insert"}
    assert dels == set(range(10, 22)) and ins == set(range(10, 22))
    assert {r.v for r in ch if r._change_type == "insert"} == {
        i * 100 for i in range(10, 22)
    }
    # CONFINEMENT: a batch row outside the predicate raises BEFORE any
    # commit — the table is unchanged
    with pytest.raises(ValueError, match="replaceWhere"):
        replace_where_txn(
            spark, root, "id >= 10 AND id < 22",
            spark.range(50, 52).selectExpr("id", "id as v"),
        )
    assert snapshot(root).version == v1
    # pure-insert degenerate (predicate matches nothing) then pure-delete
    # degenerate (empty batch)
    v2 = replace_where_txn(
        spark, root, "id >= 1000",
        spark.range(1000, 1002).selectExpr("id", "id * 10 as v"),
    )
    assert {r.id for r in read_txn(spark, root).collect()} >= {1000, 1001}
    v3 = replace_where_txn(
        spark, root, "id >= 1000",
        spark.range(0, 0).selectExpr("id", "id * 10 as v"),
    )
    assert v3 == v2 + 1
    assert {r.id for r in read_txn(spark, root).collect()} == set(want)
    # time travel: the pre-backfill snapshot is intact
    assert {r.v for r in read_txn(spark, root, version=0).collect()} == {
        i * 10 for i in range(30)
    }
    # 3VL delete side: NULL-predicate rows are OUTSIDE the region (kept)
    root2 = os.path.join(base, "t3vl")
    write_txn(
        spark.createDataFrame(
            [(1, "x"), (2, None), (3, "y")], "id long, tag string"
        ),
        root2,
    )
    replace_where_txn(
        spark, root2, "tag = 'x'",
        spark.createDataFrame([(9, "x")], "id long, tag string"),
    )
    assert {r.id for r in read_txn(spark, root2).collect()} == {2, 3, 9}


def _sc_clone_dv_dml_attaches(spark, base):
    """ADVICE r10 (high): DV-writing DML on a SHALLOW CLONE must attach
    its tombstones.  The fold keys live files by rel path — a traversal
    path like ``../src/part-x.parquet`` on a clone — while the scan's
    ``__file`` is the basename; before the fix the ``applies`` list kept
    basenames, silently never matched, and replace_where on a clone left
    BOTH the old and new row versions live (32 rows instead of 30-gone-
    plus-2-new with empty file_dvs).  All three DV writers
    (replace_where_txn, delete_txn_dv, update_txn_dv) now remap through
    the snapshot's rel paths (_applies_rels)."""
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, delete_txn_dv, replace_where_txn, update_txn_dv,
    )

    src = os.path.join(base, "src")
    write_txn(_df(spark, 0, 32).repartition(2), src)

    # replace_where: boundary-file tombstones must attach on the clone
    dst = os.path.join(base, "dst")
    clone_txn(src, dst)
    replace_where_txn(
        spark, dst, "id in (20, 21)",
        spark.createDataFrame([(20, 777), (21, 778)], "id long, v long"),
    )
    got = {r.id: r.v for r in read_txn(spark, dst).collect()}
    assert len(got) == 32, f"old+new doubles survived: {len(got)} rows"
    assert (got[20], got[21]) == (777, 778)
    assert any(snapshot(dst).file_dvs), "DV action dropped on the floor"

    # delete_txn_dv and update_txn_dv share the latent defect — same fix
    dst2 = os.path.join(base, "dst2")
    clone_txn(src, dst2)
    delete_txn_dv(spark, dst2, "id = 5")
    assert read_txn(spark, dst2).count() == 31
    assert any(snapshot(dst2).file_dvs)
    update_txn_dv(spark, dst2, "id = 7", {"v": "v + 1"})
    got2 = {r.id: r.v for r in read_txn(spark, dst2).collect()}
    assert len(got2) == 31 and got2[7] == 71

    # ADVICE r10 (low): a batch that CHANGES an existing column's type is
    # rejected BEFORE staging (Delta parity — _merge_schemas would log the
    # new files under the old type and explicit-schema reads would
    # misread them); nothing staged, nothing committed
    with pytest.raises(ValueError, match="type"):
        replace_where_txn(
            spark, dst, "id in (3,)",
            spark.createDataFrame([("3", 1)], "id string, v long"),
        )
    assert not [f for f in os.listdir(dst) if f.startswith("_staging_")]


def _sc_vacuum_vs_time_travel_safety(spark, base):
    """VERDICT r9 #5: the vacuum/time-travel interplay must be all-or-
    nothing for a pinned reader.  A version INSIDE the retention window
    keeps every file of its snapshot on disk (exact rows, always).  A
    version OUTSIDE it whose files were swept must fail LOUDLY at read
    time — never return the surviving subset as if it were the snapshot.
    The partial-overlap case is the dangerous one: the pinned snapshot
    shares some files with the head, vacuum sweeps only the others."""
    from dbt_trill_shop_spark.sources.txn_table import (
        delete_txn_dv, replace_where_txn, restore_txn,
    )

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 5).coalesce(1), root)               # v0: file A
    write_txn(_df(spark, 100, 103).coalesce(1), root)           # v1: + file B
    # v2 drops file B entirely (full-file remove), keeps A live
    replace_where_txn(
        spark, root, "id >= 100", spark.createDataFrame([], "id long, v long")
    )
    assert sorted(r.id for r in read_txn(spark, root).collect()) == list(range(5))

    # inside the retention window: v1's files survive the sweep, exact rows
    swept = vacuum_txn(root, retain_versions=3, min_age_sec=0)
    assert swept == []
    assert sorted(
        r.id for r in read_txn(spark, root, version=1).collect()
    ) == list(range(5)) + [100, 101, 102]

    # outside it: file B is garbage; the pinned read must raise, and must
    # NOT return file A's rows alone as if they were snapshot v1
    swept = vacuum_txn(root, retain_versions=1, min_age_sec=0)
    assert len(swept) == 1
    with pytest.raises(Exception) as ex:
        read_txn(spark, root, version=1).collect()
    assert "PATH_NOT_FOUND" in str(ex.value) or "does not exist" in str(
        ex.value
    ) or isinstance(ex.value, FileNotFoundError)
    # the head (retained) snapshot is untouched
    assert sorted(r.id for r in read_txn(spark, root).collect()) == list(range(5))
    # RESTORE to the vacuumed version refuses BEFORE committing anything
    with pytest.raises(FileNotFoundError):
        restore_txn(root, 1)
    assert snapshot(root).version == 2

    # DV sidecars have the same lifecycle: sweeping one that a pinned
    # version still references makes that read loud, not silently whole
    root2 = os.path.join(base, "t2")
    write_txn(_df(spark, 0, 8).coalesce(1), root2)              # v0
    delete_txn_dv(spark, root2, "id = 3")                       # v1: DV
    write_txn(_df(spark, 0, 8).coalesce(1), root2, mode="overwrite")  # v2
    assert vacuum_txn(root2, retain_versions=1, min_age_sec=0)  # sweeps v1's
    with pytest.raises(Exception):
        read_txn(spark, root2, version=1).collect()
    assert read_txn(spark, root2).count() == 8


def _sc_generated_columns(spark, base):
    """set_generated_txn (Delta's GENERATED ALWAYS AS, staged r11): a
    batch omitting the column gets it computed; a batch supplying a WRONG
    value fails the implicit CHECK before any commit; drop releases the
    column; clone and restore carry the declaration."""
    from dbt_trill_shop_spark.sources.txn_table import (
        ConstraintViolation, clone_txn, drop_generated_txn, restore_txn,
        set_generated_txn,
    )

    root = os.path.join(base, "t")
    df = spark.range(0, 10).selectExpr("id", "id * 10 as v", "id * 20 as dv")
    write_txn(df.coalesce(1), root)                                # v0
    # declaring over a violating table is loud
    with pytest.raises(ConstraintViolation):
        set_generated_txn(spark, root, {"dv": "v * 3"})
    set_generated_txn(spark, root, {"dv": "v * 2"})                # v1
    # unknown column / double declaration are loud
    with pytest.raises(ValueError):
        set_generated_txn(spark, root, {"nope": "v"})
    with pytest.raises(ValueError):
        set_generated_txn(spark, root, {"dv": "v * 2"})
    # a batch OMITTING dv gets it computed (and cast to the table type)
    write_txn(spark.range(10, 12).selectExpr("id", "id * 10 as v"), root)
    got = {r.id: r.dv for r in read_txn(spark, root).collect()}
    assert got[10] == 200 and got[11] == 220 and len(got) == 12
    # a batch SUPPLYING the correct value passes; a wrong one fails the
    # implicit CHECK in-pass, before any log entry
    write_txn(
        spark.createDataFrame([(12, 120, 240)], "id long, v long, dv long"), root
    )
    v_ok = snapshot(root).version
    with pytest.raises(ConstraintViolation):
        write_txn(
            spark.createDataFrame([(13, 130, 999)], "id long, v long, dv long"),
            root,
        )
    assert snapshot(root).version == v_ok  # nothing committed
    # clone carries the declaration: the clone computes omitted columns
    dst = os.path.join(base, "dst")
    clone_txn(root, dst)
    write_txn(spark.createDataFrame([(50, 500)], "id long, v long"), dst)
    assert {r.dv for r in read_txn(spark, dst).filter("id = 50").collect()} == {1000}
    # MERGE supplying a wrong generated value fails the implicit CHECK
    # too (the constraint rides the ordinary map -> every write path)
    with pytest.raises(ConstraintViolation):
        merge_txn(
            spark,
            spark.createDataFrame([(40, 400, 999)], "id long, v long, dv long"),
            root, on="id",
        )
    # the declaration survives the checkpoint FAST PATH (pool pins
    # _CHECKPOINT_EVERY=4; cross it, then fold from the checkpoint)
    import dbt_trill_shop_spark.sources.txn_table as tt

    while snapshot(root).version % tt._CHECKPOINT_EVERY != 0:
        write_txn(spark.createDataFrame([(60, 600)], "id long, v long"), root)
    assert os.path.exists(
        tt._ckpt_path(root, snapshot(root).version)
    )
    write_txn(spark.createDataFrame([(61, 610)], "id long, v long"), root)
    assert dict(snapshot(root).generated) == {"dv": "v * 2"}  # via ckpt
    got_ck = {r.id: r.dv for r in read_txn(spark, root).collect()}
    assert got_ck[60] == 1200 and got_ck[61] == 1220
    # drop releases the column; restore to the declared version reinstates
    drop_generated_txn(root, "dv")
    write_txn(
        spark.createDataFrame([(14, 140, 999)], "id long, v long, dv long"), root
    )  # now legal
    assert snapshot(root).generated == ()
    restore_txn(root, v_ok)
    assert dict(snapshot(root).generated) == {"dv": "v * 2"}
    with pytest.raises(ValueError):
        drop_generated_txn(root, "nope")


def _sc_ndv_sketch_stats(spark, base):
    """set_ndv_txn / ndv_estimate_txn (staged r11): log-resident KMV NDV
    statistics.  The merged per-file estimate equals the direct bottom-k
    estimate over the raw data (the KMV union property), survives
    compaction (sketches recompute in-pass), rides clones, and the
    planner read opens zero data files."""
    import hashlib

    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, compact_txn, ndv_estimate_txn, set_ndv_txn,
    )

    root = os.path.join(base, "t")
    df = spark.range(0, 300).selectExpr(
        "id", "id % 97 as u", "CAST(id % 3 AS STRING) as tag"
    )
    write_txn(df.filter("id < 200").repartition(3), root)        # v0
    set_ndv_txn(spark, root, {"u": 64, "tag": 64})               # v1 backfill
    write_txn(df.filter("id >= 200").coalesce(2), root)          # v2 in-pass

    def expect(values, k=64):
        hs = sorted(
            {int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in values}
        )
        return len(hs) if len(hs) < k else (k - 1) * (1 << 32) // (hs[k - 1] + 1)

    want = {"u": expect(range(97)), "tag": expect(["0", "1", "2"])}
    assert ndv_estimate_txn(root) == want
    assert want["tag"] == 3  # below k: exact
    # the estimate is log arithmetic: valid even with the data unreadable
    # by the caller (no spark session passed at all)
    # compaction recomputes sketches in-pass; the estimate is invariant
    compact_txn(spark, root, target_files=1)
    assert ndv_estimate_txn(root) == want
    # clone carries spec AND per-file sketches (stats ride the adds)
    dst = os.path.join(base, "dst")
    clone_txn(root, dst)
    assert ndv_estimate_txn(dst) == want
    # pre-spec versions know nothing
    assert ndv_estimate_txn(root, version=0) == {}
    # the spec AND per-file sketches survive the checkpoint fast path
    # (pool pins _CHECKPOINT_EVERY=4; push past it, fold from checkpoint)
    import dbt_trill_shop_spark.sources.txn_table as tt

    while snapshot(root).version % tt._CHECKPOINT_EVERY != 0:
        write_txn(df.filter("id < 0"), root)  # empty appends advance the log
    write_txn(df.filter("id < 0"), root)
    assert os.path.exists(
        tt._ckpt_path(root, snapshot(root).version - 1)
    ) or any(
        f.startswith("checkpoint-")
        for f in os.listdir(tt._log_dir(root))
    )
    assert ndv_estimate_txn(root) == want  # folded through the checkpoint
    # validation is loud: unknown column, non-sketchable type, tiny k
    with pytest.raises(ValueError):
        set_ndv_txn(spark, root, {"nope": 64})
    with pytest.raises(ValueError):
        set_ndv_txn(spark, root, {"u": 4})
    root2 = os.path.join(base, "t2")
    write_txn(spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) as d"), root2)
    with pytest.raises(ValueError):
        set_ndv_txn(spark, root2, {"d": 64})


def _sc_merge_when_full_grammar(spark, base):
    """merge_when_txn (staged r11): every clause of the full MERGE
    grammar, its 3VL condition semantics, and the pruning contract —
    file-pruned WITHOUT the BY SOURCE clause, table-wide WITH it."""
    from dbt_trill_shop_spark.sources.txn_table import merge_when_txn

    root = os.path.join(base, "t")
    # two range-disjoint files so pruning is observable
    write_txn(spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)], "id long, tag string, v long"
    ).coalesce(1), root)
    write_txn(spark.createDataFrame(
        [(10, "x", 50), (11, "y", 1100)], "id long, tag string, v long"
    ).coalesce(1), root)
    files_before = set(snapshot(root).files)

    # WITHOUT the BY SOURCE clause: only the file whose key range holds a
    # source key is rewritten — the other survives BY PATH
    src = spark.createDataFrame(
        [(2, "U", 999), (3, "D", 0), (7, "I", 700)], "id long, op string, nv long"
    )
    merge_when_txn(
        spark, src, root, on="id",
        matched_update={"v": "s.nv"},
        matched_delete="s.op = 'D'",
        unmatched_insert={"v": "s.nv", "tag": "lower(s.op)"},
    )
    files_after = set(snapshot(root).files)
    survivors = files_before & files_after
    assert len(survivors) == 1, (files_before, files_after)  # 10/11 file kept
    got = {r.id: (r.tag, r.v) for r in read_txn(spark, root).collect()}
    assert got == {
        1: ("a", 100), 2: ("b", 999), 7: ("i", 700),
        10: ("x", 50), 11: ("y", 1100),
    }, got

    # 3VL: a NULL condition keeps the row (both clause kinds)
    src2 = spark.createDataFrame([(1, None, 5)], "id long, op string, nv long")
    merge_when_txn(
        spark, src2, root, on="id",
        matched_delete="s.op = 'D'",        # NULL op -> keep
        insert_unmatched=False,
        not_matched_by_source_delete="t.v > NULL",  # NULL -> keep everything
    )
    assert read_txn(spark, root).count() == 5

    # WITH the BY SOURCE clause: every file is rewritten (no per-file stat
    # can prove source ABSENCE), and unmatched low-v targets purge
    files_pre = set(snapshot(root).files)
    merge_when_txn(
        spark,
        spark.createDataFrame([(11, "U", 1111)], "id long, op string, nv long"),
        root, on="id",
        matched_update={"v": "s.nv"},
        not_matched_by_source_delete="t.v < 100",
    )
    assert not (files_pre & set(snapshot(root).files))  # full rewrite
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    # 10 purged (50 < 100); 1 survives exactly at the boundary (100 !< 100)
    assert got == {1: 100, 2: 999, 7: 700, 11: 1111}, got

    # empty source: no-op without the BY SOURCE clause (version unchanged)
    v = snapshot(root).version
    merge_when_txn(
        spark,
        spark.createDataFrame([], "id long, op string, nv long"),
        root, on="id", matched_update={"v": "s.nv"},
    )
    assert snapshot(root).version == v
    # ... but WITH it, the purge still applies
    merge_when_txn(
        spark,
        spark.createDataFrame([], "id long, op string, nv long"),
        root, on="id", not_matched_by_source_delete="t.v >= 1000",
    )
    assert {r.id for r in read_txn(spark, root).collect()} == {1, 2, 7}

    # loud validation: unknown UPDATE / INSERT columns
    with pytest.raises(ValueError, match="UPDATE SET"):
        merge_when_txn(spark, src, root, on="id", matched_update={"nope": "1"})
    with pytest.raises(ValueError, match="INSERT maps"):
        merge_when_txn(spark, src, root, on="id", unmatched_insert={"nope": "1"})


def _sc_merge_rejects_ambiguous_source(spark, base):
    """ADVICE r10 / VERDICT r10 #1: a CDC batch carrying TWO rows for one
    join key that matches a target row must raise (Delta's
    multiple-source-rows-matched error) in BOTH merge paths — before the
    guard, merge_txn landed both copies and merge_when_txn's left join
    fanned the matched target row out into two updated survivors.
    Duplicate keys that match NO target row stay Delta-legal (each
    inserts), and NULL join keys never match, so all-NULL dups insert."""
    from dbt_trill_shop_spark.sources.txn_table import merge_when_txn

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 6).coalesce(1), root)
    v = snapshot(root).version

    dup_matched = spark.createDataFrame(
        [(3, 31), (3, 32), (9, 90)], "id long, v long"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_txn(spark, dup_matched, root, on="id")
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_when_txn(spark, dup_matched, root, on="id", matched_update={"v": "s.v"})
    # ... including the table-wide BY SOURCE path (touched = all files)
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_when_txn(
            spark, dup_matched, root, on="id",
            matched_update={"v": "s.v"},
            not_matched_by_source_delete="t.v < 0",
        )
    assert snapshot(root).version == v  # nothing staged, nothing committed
    assert not [f for f in os.listdir(root) if f.startswith("_staging_")]

    # duplicate UNMATCHED keys are Delta-legal: both rows insert
    dup_unmatched = spark.createDataFrame(
        [(100, 1), (100, 2), (3, 33)], "id long, v long"
    )
    merge_txn(spark, dup_unmatched, root, on="id")
    got = sorted(
        (r.id, r.v) for r in read_txn(spark, root).filter("id >= 100 OR id = 3").collect()
    )
    assert got == [(3, 33), (100, 1), (100, 2)], got

    # NULL join keys never match a target: all-NULL dups pass and insert
    dup_null = spark.createDataFrame([(None, 7), (None, 8)], "id long, v long")
    merge_when_txn(spark, dup_null, root, on="id")
    assert read_txn(spark, root).filter("id IS NULL").count() == 2

    # multi-key: duplicate on (id, tag) matching one target row raises
    root2 = os.path.join(base, "t2")
    write_txn(_df(spark, 0, 4, extra="a"), root2)
    src = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11)], "id long, tag string, v long"
    ).select("id", "v", "tag")
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_txn(spark, src, root2, on=["id", "tag"])
    # same key pair duplicated but matching nothing: inserts both
    src2 = spark.createDataFrame(
        [(1, "zz", 10), (1, "zz", 11)], "id long, tag string, v long"
    ).select("id", "v", "tag")
    merge_txn(spark, src2, root2, on=["id", "tag"])
    assert read_txn(spark, root2).filter("tag = 'zz'").count() == 2


def _sc_stats_backfill_on_clone(spark, base):
    """ADVICE r10 (medium): statistics BACKFILL on a SHALLOW CLONE — the
    clone's live set is keyed by traversal rel paths
    ('../src/part-x.parquet') while the compute jobs' _metadata.file_path
    yields basenames; before the basename->rel remap,
    set_ndv_txn(backfill=True) crashed with KeyError and
    set_bloom_txn(backfill=True) silently attached NOTHING (the same
    coordinate defect _applies_rels fixed for DV attachment).  Also pins
    the k-RAISE contract (ADVICE r10 low): growing a sketched column's k
    without backfill would bias the estimator, so it is loud."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, ndv_estimate_txn, set_bloom_txn, set_ndv_txn,
    )

    src = os.path.join(base, "src")
    # key hash-scattered across 3 files: every file's [min, max] spans the
    # domain, so only an ATTACHED bloom can prune a point lookup
    write_txn(
        spark.range(0, 3000)
        .selectExpr("id * 7919 % 100000 as k", "id % 7 as u")
        .repartition(3),
        src,
    )
    dst = os.path.join(base, "dst")
    clone_txn(src, dst)

    # clone-then-backfill: crashed (KeyError) before the remap
    set_ndv_txn(spark, dst, {"u": 64}, backfill=True)
    assert ndv_estimate_txn(dst) == {"u": 7}  # below k: exact

    # bloom backfill on the clone: the bitsets must ATTACH; before the fix
    # they were silently dropped and the point lookup opened all 3 files
    assert len(tt._keep_files(spark, snapshot(dst), {"k": (7919, 7919)})) == 3
    set_bloom_txn(spark, dst, {"k": 16384}, backfill=True)
    got = read_txn(spark, dst, where="k = 7919")
    assert [(r.k, r.u) for r in got.collect()] == [(7919, 1)]
    assert len(got.inputFiles()) <= 2, got.inputFiles()  # bloom pruned

    # k-raise without backfill: loud (biased estimates otherwise)
    with pytest.raises(ValueError, match="backfill"):
        set_ndv_txn(spark, dst, {"u": 128}, backfill=False)
    # with backfill: legal, re-sketched at the new k, estimate intact
    set_ndv_txn(spark, dst, {"u": 128}, backfill=True)
    assert ndv_estimate_txn(dst) == {"u": 7}
    # lowering k never needs a backfill (bottom-k' ⊆ recorded bottom-k)
    set_ndv_txn(spark, dst, {"u": 64}, backfill=False)
    assert ndv_estimate_txn(dst) == {"u": 7}


def _sc_partitioned_tables(spark, base):
    """PARTITIONED BY (staged r12): partition tuples live in the log
    (flat uuid file layout — add-action ``__pv`` stats plus exact
    ``[v, v]`` bounds), giving exact pruning including the NULL
    partition, metadata-only dynamic partition overwrite with untouched
    partitions surviving BY PATH, partition-aligned DML/compaction,
    clone/restore carry, checkpoint-fast-path persistence, and an
    immutable creation-only spec."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, delete_txn_dv, restore_txn, set_bloom_txn, set_ndv_txn,
    )

    root = os.path.join(base, "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, None, 40)],
        "id long, cat string, v long",
    )
    write_txn(df.coalesce(1), root, partition_by=["cat"])
    snap0 = snapshot(root)
    assert snap0.partition_cols == ("cat",)
    assert all("__pv" in st for st in snap0.file_stats)
    # one file per partition tuple (coalesce(1) pre-split): a, b, NULL
    assert len(snap0.files) == 3
    # round trip reattaches the metadata-resident partition column
    assert sorted(
        (r.id, r.cat, r.v) for r in read_txn(spark, root).collect()
    ) == [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, None, 40)]
    # EXACT pruning: equality opens only the matching partition's file,
    # and the NULL partition is provably excluded by any interval
    got = read_txn(spark, root, where="cat = 'a'")
    assert sorted(r.id for r in got.collect()) == [1, 2]
    assert len(got.inputFiles()) == 1
    # dynamic partition overwrite: partition 'a' swaps, 'b' and the NULL
    # partition survive BY PATH, and a brand-new partition lands
    survivors = {
        p for p, st in zip(snap0.files, snap0.file_stats)
        if st["__pv"]["cat"] != "a"
    }
    write_txn(
        spark.createDataFrame(
            [(9, "a", 90), (10, "c", 100)], "id long, cat string, v long"
        ),
        root, mode="overwrite_partitions",
    )
    snap1 = snapshot(root)
    assert survivors <= set(snap1.files)
    assert not any(
        st["__pv"]["cat"] == "a" and p not in survivors
        for p, st in zip(snap1.files, snap1.file_stats) if p in snap0.files
    )
    got = {r.id: r.cat for r in read_txn(spark, root).collect()}
    assert got == {3: "b", 4: None, 9: "a", 10: "c"}, got
    # DML keeps the table partitioned: merge rewrites carry fresh __pv
    merge_txn(
        spark,
        spark.createDataFrame([(3, "b", 33), (7, "d", 70)], "id long, cat string, v long"),
        root, on="id",
    )
    assert all("__pv" in st for st in snapshot(root).file_stats)
    delete_txn_dv(spark, root, "id = 9")
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [3, 4, 7, 10]
    # compaction is partition-aligned (a data file never spans two
    # partitions) and preserves rows + pv coverage
    compact_txn(spark, root, target_files=1)
    snap2 = snapshot(root)
    assert len(snap2.files) == len(
        {tuple(sorted(st["__pv"].items())) for st in snap2.file_stats}
    )
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [3, 4, 7, 10]
    # clone carries the spec and tuples; restore rewinds them
    dst = os.path.join(base, "dst")
    clone_txn(root, dst)
    assert snapshot(dst).partition_cols == ("cat",)
    assert read_txn(spark, dst, where="cat = 'b'").count() == 1
    restore_txn(root, 0)
    assert snapshot(root).partition_cols == ("cat",)
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [1, 2, 3, 4]
    # the spec survives the checkpoint FAST PATH (pool pins
    # _CHECKPOINT_EVERY=4; cross it, fold from the checkpoint)
    while snapshot(root).version % tt._CHECKPOINT_EVERY != 0:
        write_txn(
            spark.createDataFrame([(50, "a", 500)], "id long, cat string, v long"),
            root,
        )
    write_txn(
        spark.createDataFrame([(51, "a", 510)], "id long, cat string, v long"), root
    )
    assert snapshot(root).partition_cols == ("cat",)  # via ckpt
    assert read_txn(spark, root, where="cat = 'b'").count() == 1
    # guards: creation-only spec, no bloom/ndv/drop on partition columns,
    # batches must carry the partition column, dynamic overwrite needs a
    # partitioned table
    with pytest.raises(ValueError, match="creation-only"):
        write_txn(df, root, partition_by=["v"])
    with pytest.raises(ValueError, match="partition"):
        set_bloom_txn(spark, root, {"cat": 256})
    with pytest.raises(ValueError, match="partition"):
        set_ndv_txn(spark, root, {"cat": 64})
    with pytest.raises(ValueError, match="partition"):
        tt.drop_column_txn(root, "cat")
    with pytest.raises(ValueError, match="partition column"):
        write_txn(spark.createDataFrame([(1, 5)], "id long, v long"), root)
    root2 = os.path.join(base, "unpart")
    write_txn(_df(spark, 0, 3), root2)
    with pytest.raises(ValueError, match="PARTITIONED"):
        write_txn(_df(spark, 0, 3), root2, mode="overwrite_partitions")
    # NULLNESS predicates prune EXACTLY on partition values (a partition
    # value is constant per file): IS NULL keeps only the NULL partition
    # — the first cut pruned it (silent empty result) because nullness
    # marks are 1-tuples, not intervals — and IS NOT NULL drops it
    nroot = os.path.join(base, "nulls")
    write_txn(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (4, None, 40)],
            "id long, cat string, v long",
        ).coalesce(1),
        nroot, partition_by=["cat"],
    )
    gn = read_txn(spark, nroot, where="cat IS NULL")
    assert [r.id for r in gn.collect()] == [4] and len(gn.inputFiles()) == 1
    gnn = read_txn(spark, nroot, where="cat IS NOT NULL")
    assert gnn.count() == 2 and len(gnn.inputFiles()) == 2
    # EMPTY-STRING partition values are LOUD in the staging pass: the
    # hive dir encoding cannot distinguish '' from NULL, so the classic
    # engine behavior silently reads '' rows back as NULL — corruption
    from dbt_trill_shop_spark.sources.txn_table import ConstraintViolation

    with pytest.raises(ConstraintViolation, match="__pv_nonempty"):
        write_txn(
            spark.createDataFrame([(9, "", 9)], "id long, cat string, v long"),
            nroot,
        )
    assert read_txn(spark, nroot).count() == 3  # nothing committed
    # the CHANGE FEED reattaches metadata-resident partition values (they
    # are not in the data bytes; before the pv plumbing they surfaced
    # NULL), and a dynamic overwrite reports exactly the replaced
    # partition's rows as the delete/insert pair
    from dbt_trill_shop_spark.sources.txn_table import read_txn_changes

    cdf_root = os.path.join(base, "cdf")
    write_txn(
        spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "id long, cat string, v long"),
        cdf_root, partition_by=["cat"],
    )
    write_txn(
        spark.createDataFrame([(9, "a", 9)], "id long, cat string, v long"),
        cdf_root, mode="overwrite_partitions",
    )
    ch = {
        (r.id, r.cat, r._change_type)
        for r in read_txn_changes(spark, cdf_root, from_version=0).collect()
    }
    assert ch == {(1, "a", "delete"), (9, "a", "insert")}, ch
    # DATE partitions prune through DATE literals (ISO-string bounds)
    root3 = os.path.join(base, "dates")
    d = spark.sql(
        "SELECT id, DATE'2024-01-01' + CAST(id % 3 AS INT) AS d FROM range(9)"
    ).coalesce(1)
    write_txn(d, root3, partition_by=["d"])
    g = read_txn(spark, root3, where="d = DATE'2024-01-02'")
    assert g.count() == 3 and len(g.inputFiles()) == 1
    assert dict(read_txn(spark, root3).dtypes)["d"] == "date"


def _sc_rename_column(spark, base):
    """RENAME COLUMN (staged r12): metadata-only, ordered rename chain —
    old files read their physical bytes remapped to the logical name,
    writes after the rename carry the new name natively, chained renames
    resolve by order, DML works under the new name, compaction
    materializes the chain (names free again), RESTORE rewinds names AND
    chain, clones carry it, and both reuse hazards (rename target / new
    batch column named like a chain source) are loud."""
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, compact_txn as _compact, rename_column_txn, restore_txn,
    )
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = os.path.join(base, "t")
    write_txn(_df(spark, 0, 5), root)                          # v0: (id, v)
    rename_column_txn(root, "v", "value")                      # v1
    assert read_txn(spark, root).columns == ["id", "value"]
    assert {r.value for r in read_txn(spark, root).collect()} == {0, 10, 20, 30, 40}
    # post-rename writes carry the logical name; mixed generations read
    write_txn(spark.createDataFrame([(9, 90)], "id long, value long"), root)
    rename_column_txn(root, "value", "amount")                 # chained
    got = {r.id: r.amount for r in read_txn(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40, 9: 90}
    # DML under the new name (merge + 3VL delete)
    merge_txn(spark, spark.createDataFrame([(0, 5)], "id long, amount long"), root, on="id")
    delete_txn(spark, root, "amount > 80")
    assert {r.id: r.amount for r in read_txn(spark, root).collect()} == {
        0: 5, 1: 10, 2: 20, 3: 30, 4: 40
    }
    # time travel shows era-correct names
    assert read_txn(spark, root, version=0).columns == ["id", "v"]
    # reuse hazards are LOUD until compaction materializes the chain
    with pytest.raises(ValueError, match="rename chain"):
        rename_column_txn(root, "id", "value")
    with pytest.raises(ValueError, match="rename chain"):
        write_txn(
            spark.createDataFrame([(7, 70, 700)], "id long, amount long, v long"),
            root,
        )
    v_pre = snapshot(root).version
    _compact(spark, root, target_files=1)
    assert snapshot(root).renames == ()
    rename_column_txn(root, "id", "value")  # the name is free again
    assert read_txn(spark, root).columns == ["value", "amount"]
    # RESTORE rewinds schema AND chain; the pre-compact state still reads
    restore_txn(root, v_pre)
    assert read_txn(spark, root).columns == ["id", "amount"]
    assert len(snapshot(root).renames) == 2
    assert {r.id: r.amount for r in read_txn(spark, root).collect()} == {
        0: 5, 1: 10, 2: 20, 3: 30, 4: 40
    }
    # the chain folds through the checkpoint fast path
    while snapshot(root).version % tt._CHECKPOINT_EVERY != 0:
        write_txn(spark.createDataFrame([(50, 500)], "id long, amount long"), root)
    write_txn(spark.createDataFrame([(51, 510)], "id long, amount long"), root)
    assert len(snapshot(root).renames) == 2
    assert read_txn(spark, root).filter("id = 1").first().amount == 10
    # clone carries the chain; source-file physical names still remap
    dst = os.path.join(base, "c")
    clone_txn(root, dst)
    assert read_txn(spark, dst).columns == ["id", "amount"]
    assert read_txn(spark, dst).filter("id = 1").first().amount == 10
    # the CHANGE FEED surfaces rows under the range-END's logical names:
    # a head read remaps pre-rename files through the chain; a range
    # pinned inside the v-era keeps that era's name (Delta's
    # schema-at-end-version rule)
    from dbt_trill_shop_spark.sources.txn_table import read_txn_changes

    ch = read_txn_changes(spark, root, from_version=-1).filter(
        "_commit_version = 0"
    )
    assert "amount" in ch.columns and "v" not in ch.columns
    assert {r.amount for r in ch.collect()} == {0, 10, 20, 30, 40}
    era = read_txn_changes(spark, root, from_version=-1, to_version=0)
    assert "v" in era.columns and "amount" not in era.columns
    # statistics backfill AFTER a rename reads old files through the
    # chain: spec columns are LOGICAL, files carry PHYSICAL names — the
    # first cut recorded exclude-all blooms / empty sketches for every
    # pre-rename file (silent wrong pruning, zero NDV)
    from dbt_trill_shop_spark.sources.txn_table import (
        ndv_estimate_txn, set_bloom_txn, set_ndv_txn,
    )

    root3 = os.path.join(base, "t3")
    write_txn(
        spark.range(0, 2000)
        .selectExpr("id * 7919 % 100000 as k", "id as v")
        .repartition(3),
        root3,
    )
    rename_column_txn(root3, "k", "key")
    set_bloom_txn(spark, root3, {"key": 16384}, backfill=True)
    gb = read_txn(spark, root3, where="key = 7919")
    assert gb.count() == 1 and len(gb.inputFiles()) <= 2
    set_ndv_txn(spark, root3, {"key": 64}, backfill=True)
    assert ndv_estimate_txn(root3)["key"] > 1000
    # guards: unknown column, collision, bound columns
    with pytest.raises(ValueError, match="no column"):
        rename_column_txn(root, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column_txn(root, "amount", "id")
    root2 = os.path.join(base, "t2")
    write_txn(spark.range(3).selectExpr("id", "id % 2 as p"), root2, partition_by=["p"])
    with pytest.raises(ValueError, match="partition"):
        rename_column_txn(root2, "p", "q")


def _sc_identity_columns(spark, base):
    """GENERATED ALWAYS AS IDENTITY (staged r12): deterministic
    contiguous assignment from a log-carried high watermark — backfill
    rewrites existing rows ranked by the declared unique key, appends
    continue the watermark, supplying/updating/merging the column is
    loud, DELETE preserves assigned ids without moving the watermark,
    RESTORE rewinds it, clones carry it, and the declaration rides the
    checkpoint fast path."""
    import dbt_trill_shop_spark.sources.txn_table as tt
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, delete_txn_dv, rename_column_txn, restore_txn,
        set_identity_txn, update_txn_dv,
    )

    root = os.path.join(base, "t")
    write_txn(
        spark.createDataFrame(
            [(30, "c"), (10, "a"), (20, "b")], "k long, name string"
        ),
        root,
    )
    set_identity_txn(spark, root, "row_id", order_by="k", start=100, step=10)
    assert sorted((r.k, r.row_id) for r in read_txn(spark, root).collect()) == [
        (10, 100), (20, 110), (30, 120)
    ]
    # appends rank within the batch and continue the watermark
    write_txn(
        spark.createDataFrame([(50, "e"), (40, "d")], "k long, name string"), root
    )
    assert sorted((r.k, r.row_id) for r in read_txn(spark, root).collect()) == [
        (10, 100), (20, 110), (30, 120), (40, 130), (50, 140)
    ]
    # ALWAYS semantics: supplying / UPDATEing / MERGEing the column is loud
    with pytest.raises(ValueError, match="IDENTITY"):
        write_txn(
            spark.createDataFrame([(60, "f", 1)], "k long, name string, row_id long"),
            root,
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        update_txn_dv(spark, root, "k = 10", {"row_id": "0"})
    with pytest.raises(ValueError, match="IDENTITY"):
        merge_txn(
            spark,
            spark.createDataFrame([(10, "x", 1)], "k long, name string, row_id long"),
            root, on="k",
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        rename_column_txn(root, "row_id", "rid2")
    # DELETE / DV-delete / compaction preserve assigned ids; the
    # watermark does not move, so the next append stays gapless
    delete_txn(spark, root, "k = 20")
    delete_txn_dv(spark, root, "k = 40")
    compact_txn(spark, root, target_files=1)
    assert sorted((r.k, r.row_id) for r in read_txn(spark, root).collect()) == [
        (10, 100), (30, 120), (50, 140)
    ]
    write_txn(spark.createDataFrame([(70, "g")], "k long, name string"), root)
    assert read_txn(spark, root).filter("k = 70").first().row_id == 150
    # RESTORE rewinds rows AND the watermark
    restore_txn(root, 1)
    assert sorted(
        (c, nx) for c, _s, _p, nx, _o in snapshot(root).identity_spec
    ) == [("row_id", 130)]
    write_txn(spark.createDataFrame([(99, "z")], "k long, name string"), root)
    assert read_txn(spark, root).filter("k = 99").first().row_id == 130
    # empty-table declaration is metadata-only; clone carries watermark;
    # the spec folds through the checkpoint fast path
    root2 = os.path.join(base, "e")
    write_txn(spark.createDataFrame([], "k long, name string"), root2)
    set_identity_txn(spark, root2, "rid", order_by="k")
    write_txn(spark.createDataFrame([(5, "z"), (3, "y")], "k long, name string"), root2)
    assert sorted((r.k, r.rid) for r in read_txn(spark, root2).collect()) == [
        (3, 1), (5, 2)
    ]
    dst = os.path.join(base, "c")
    clone_txn(root2, dst)
    write_txn(spark.createDataFrame([(9, "w")], "k long, name string"), dst)
    assert read_txn(spark, dst).filter("k = 9").first().rid == 3
    while snapshot(root2).version % tt._CHECKPOINT_EVERY != 0:
        write_txn(spark.createDataFrame([], "k long, name string"), root2)
    write_txn(spark.createDataFrame([(8, "v")], "k long, name string"), root2)
    assert read_txn(spark, root2).filter("k = 8").first().rid == 3  # via ckpt
    # declaration guards: existing column, bad order_by, zero step
    with pytest.raises(ValueError, match="already exists"):
        set_identity_txn(spark, root2, "k", order_by="k")
    with pytest.raises(ValueError, match="not in schema"):
        set_identity_txn(spark, root2, "x", order_by="nope")
    with pytest.raises(ValueError, match="step"):
        set_identity_txn(spark, root2, "x", order_by="k", step=0)


def _sc_cluster_keys(spark, base):
    """Declared CLUSTERING KEYS (liquid-clustering lite): a metadata-only
    declaration that routine compaction applies lazily — after
    ``compact_txn`` with no explicit keys, the log's min/max stats prune
    range predicates on the declared columns; re-declaring re-clusters on
    the next compaction; RESTORE and clones carry the declaration."""
    from dbt_trill_shop_spark.sources.txn_table import (
        clone_txn, set_cluster_txn,
    )

    root = os.path.join(base, "t")
    # hash-scattered layout: every file spans the whole key domain
    write_txn(
        spark.range(0, 4000)
        .selectExpr("id * 7919 % 10000 as k", "id % 100 as j", "id as v")
        .repartition(4),
        root,
    )
    pred = "k >= 9000"
    before = read_txn(spark, root, where=pred)
    assert len(before.inputFiles()) == 4  # nothing prunes pre-cluster
    set_cluster_txn(root, ["k"])                          # metadata-only
    assert set(snapshot(root).files) == set(
        snapshot(root, version=0).files
    )  # declaration rewrote nothing
    compact_txn(spark, root, target_files=4)              # applies keys
    after = read_txn(spark, root, where=pred)
    assert sorted(r.k for r in after.collect()) == sorted(
        r.k for r in before.collect()
    )
    assert len(after.inputFiles()) < 4, after.inputFiles()
    # two declared keys -> the default compaction is a genuine Z-order
    set_cluster_txn(root, ["k", "j"])
    compact_txn(spark, root, target_files=4)
    g1 = read_txn(spark, root, where="k >= 9000")
    g2 = read_txn(spark, root, where="j >= 90")
    assert len(g1.inputFiles()) < 4 and len(g2.inputFiles()) < 4
    # clone and restore carry / rewind the declaration; clearing works
    dst = os.path.join(base, "c")
    clone_txn(root, dst)
    assert snapshot(dst).cluster_by == ("k", "j")
    set_cluster_txn(root, None)
    assert snapshot(root).cluster_by == ()
    from dbt_trill_shop_spark.sources.txn_table import restore_txn

    restore_txn(root, snapshot(root).version - 1)
    assert snapshot(root).cluster_by == ("k", "j")
    with pytest.raises(ValueError, match="not in schema"):
        set_cluster_txn(root, ["nope"])
    with pytest.raises(ValueError, match="two clustering"):
        set_cluster_txn(root, ["k", "j", "v"])


def _sc_scoped_compaction(spark, base):
    """Partition-scoped compaction (Delta's OPTIMIZE ... WHERE, r14
    shortlist): only files whose partition tuple satisfies the predicate
    are rewritten; every other file is untouched bytes AND metadata;
    rows are preserved exactly; the scope is evaluated with full SQL
    semantics (not stats may-match); a scoped rewrite never clears the
    rename chain; empty scope is a no-op; unpartitioned tables and
    non-partition predicates fail loudly."""
    from dbt_trill_shop_spark.sources.txn_table import rename_column_txn

    root = os.path.join(base, "t")
    write_txn(
        spark.range(0, 2000)
        .selectExpr("id % 2 as p", "id as k", "id * 10 as v")
        .repartition(4),
        root,
        partition_by=["p"],
    )
    snap0 = snapshot(root)
    want = sorted((r.p, r.k, r.v) for r in read_txn(spark, root).collect())
    files_p0 = {f for f, st in zip(snap0.files, snap0.file_stats)
                if st["__pv"]["p"] == "0"}
    files_p1 = set(snap0.files) - files_p0
    assert len(files_p0) == 4 and len(files_p1) == 4

    compact_txn(spark, root, target_files=1, where="p = 0")
    snap1 = snapshot(root)
    new_p0 = {f for f, st in zip(snap1.files, snap1.file_stats)
              if st["__pv"]["p"] == "0"}
    assert len(new_p0) == 1 and not (new_p0 & files_p0)  # p=0 rewritten
    assert files_p1 <= set(snap1.files)                  # p=1 untouched
    got = sorted((r.p, r.k, r.v) for r in read_txn(spark, root).collect())
    assert got == want                                   # rows preserved

    # empty scope: no commit at all
    v = snapshot(root).version
    assert compact_txn(spark, root, where="p = 99") == v
    assert snapshot(root).version == v

    # a scoped rewrite must NOT clear the rename chain — the untouched
    # partition's files still carry the physical name
    rename_column_txn(root, "v", "val")
    compact_txn(spark, root, target_files=1, where="p = 0")
    assert snapshot(root).renames  # chain survives the scoped rewrite
    got2 = sorted((r.p, r.k, r.val) for r in read_txn(spark, root).collect())
    assert got2 == want                                  # p=1 resolves via chain

    # deletion vectors: a scoped rewrite MATERIALIZES the scope's
    # tombstones (reads post-DV rows, removes file + sidecar refs) and
    # leaves the other partition's DV chain alone
    from dbt_trill_shop_spark.sources.txn_table import delete_txn_dv

    delete_txn_dv(spark, root, "p = 0 AND k < 100")   # 50 rows of p=0
    delete_txn_dv(spark, root, "p = 1 AND k < 100")   # 50 rows of p=1
    want3 = sorted(
        (r.p, r.k, r.val) for r in read_txn(spark, root).collect()
    )
    assert len(want3) == 2000 - 100
    compact_txn(spark, root, target_files=1, where="p = 0")
    s3 = snapshot(root)
    for f, dvs, st in zip(s3.files, s3.file_dvs, s3.file_stats):
        if st["__pv"]["p"] == "0":
            assert not dvs  # p=0 tombstones materialized away
        else:
            assert dvs      # p=1 chain untouched
    got3 = sorted((r.p, r.k, r.val) for r in read_txn(spark, root).collect())
    assert got3 == want3

    # loud failures: unpartitioned table; non-partition predicate
    flat = os.path.join(base, "flat")
    write_txn(spark.range(5).selectExpr("id", "id as v"), flat)
    with pytest.raises(ValueError, match="PARTITIONED"):
        compact_txn(spark, flat, where="id = 1")
    with pytest.raises(Exception, match="k"):
        compact_txn(spark, root, where="k > 10")  # k is not a partition col


def _sc_quantile_histograms(spark, base):
    """Log-resident quantile statistics (r14 shortlist): declare +
    backfill computes per-file histograms; subsequent writes sketch
    in-pass; estimates from the log alone match exact-rank arithmetic
    over the raw rows; compaction re-sketches its outputs so estimates
    survive rewrites; declaration-time and data-time violations are
    loud."""
    from dbt_trill_shop_spark.sources.txn_table import (
        _QH_KEY,
        _qh_lower,
        compact_txn,
        quantile_estimate_txn,
        set_quantile_txn,
    )

    root = os.path.join(base, "t")
    write_txn(
        spark.range(0, 3000).selectExpr("id", "id * id % 50000 as v"), root
    )
    set_quantile_txn(spark, root, ["v"])                    # backfill
    write_txn(
        spark.range(3000, 5000).selectExpr("id", "id * 3 % 70000 as v"),
        root,
    )                                                       # in-pass
    assert all(
        (st.get(_QH_KEY) or {}).get("v") for st in snapshot(root).file_stats
    )
    raw = sorted(r.v for r in read_txn(spark, root).select("v").collect())

    def bucket(v):
        return v if v <= 15 else 8 * v.bit_length() + (v >> (v.bit_length() - 4)) - 32

    import math

    def expect(q):
        # first bucket whose cumulative count reaches ceil(q*n)
        target = bucket(raw[math.ceil(q * len(raw)) - 1])
        return _qh_lower(target)

    n, est = quantile_estimate_txn(root, "v", [0.25, 0.5, 0.9])
    assert n == len(raw)
    assert est == {q: expect(q) for q in (0.25, 0.5, 0.9)}
    # estimates survive a full rewrite (compaction re-sketches in-pass)
    compact_txn(spark, root, target_files=2)
    n2, est2 = quantile_estimate_txn(root, "v", [0.25, 0.5, 0.9])
    assert (n2, est2) == (n, est)
    # loud failures: unknown column, non-integer type, negative values
    with pytest.raises(ValueError, match="not in table schema"):
        set_quantile_txn(spark, root, ["nope"])
    root2 = os.path.join(base, "t2")
    write_txn(spark.range(5).selectExpr("id", "'x' as s"), root2)
    with pytest.raises(ValueError, match="only integer"):
        set_quantile_txn(spark, root2, ["s"])
    root3 = os.path.join(base, "t3")
    write_txn(spark.range(5).selectExpr("id", "id - 10 as v"), root3)
    with pytest.raises(ValueError, match="negative"):
        set_quantile_txn(spark, root3, ["v"])
    with pytest.raises(ValueError, match="no quantile histogram"):
        quantile_estimate_txn(root, "id", [0.5])
    # partition profile: per-partition walk matches per-slice expectation
    from dbt_trill_shop_spark.sources.txn_table import (
        quantile_partition_profile,
    )

    with pytest.raises(ValueError, match="PARTITIONED"):
        quantile_partition_profile(root, "v", [0.5])  # t is unpartitioned
    proot = os.path.join(base, "tp")
    write_txn(
        spark.range(0, 1200).selectExpr(
            "id % 3 as p", "id as k", "id * id % 9000 as v"
        ),
        proot,
        partition_by=["p"],
    )
    set_quantile_txn(spark, proot, ["v"])
    prof = quantile_partition_profile(proot, "v", [0.5])
    assert [pv["p"] for pv, _n, _e in prof] == ["0", "1", "2"]
    raw_by_p: dict = {}
    for r in read_txn(spark, proot).collect():
        raw_by_p.setdefault(str(r.p), []).append(r.v)
    for pv, n, ests in prof:
        vals = sorted(raw_by_p[pv["p"]])
        assert n == len(vals)
        assert ests[0.5] == _qh_lower(bucket(vals[(len(vals) + 1) // 2 - 1]))


_SCENARIOS = [
    _sc_demo_queries_match_duckdb_oracles,  # longest first (LPT)
    _sc_scoped_compaction,
    _sc_quantile_histograms,
    _sc_partitioned_tables,
    _sc_rename_column,
    _sc_identity_columns,
    _sc_cluster_keys,
    _sc_merge_rejects_ambiguous_source,
    _sc_stats_backfill_on_clone,
    _sc_clone_dv_dml_attaches,
    _sc_vacuum_vs_time_travel_safety,
    _sc_generated_columns,
    _sc_ndv_sketch_stats,
    _sc_merge_when_full_grammar,
    _sc_replace_where_atomic_backfill,
    _sc_model_based_random_ops,
    _sc_check_constraints_enforced_in_pass,
    _sc_restore_rewinds_state_metadata_only,
    _sc_zorder_compaction_prunes_both_dims,
    _sc_stream_source_tails_commits,
    _sc_stream_rate_limited_admission,
    _sc_deletion_vectors_merge_on_read,
    _sc_merge_prunes_untouched_files,
    _sc_log_checkpoint_fold_equivalent,
    _sc_timestamp_travel_clock_regression,
    _sc_optimize_binpacks_small_files,
    _sc_incremental_agg_mv,
    _sc_drop_column_metadata_only,
    _sc_table_history_audit,
    _sc_app_txn_idempotent_writes,
    _sc_reader_feature_protocol,
    _sc_update_dv_merge_on_read,
    _sc_bloom_filter_equality_skipping,
    _sc_scan_groups_coalesce_schema_generations,
    _sc_log_cleanup_bounds_history,
    _sc_shallow_clone_zero_copy,
    _sc_stream_cdf_tails_changes,
    _sc_stats_require_full_rowgroup_coverage,
    _sc_compaction_preserves_rows_and_is_atomic,
    _sc_append_overwrite_and_time_travel,
    _sc_merge_upserts_and_delete_3vl,
    _sc_change_data_feed,
    _sc_data_skipping_prunes_files_not_rows,
    _sc_concurrent_appends_both_commit,
    _sc_additive_schema_evolution,
    _sc_vacuum_honors_retention_and_age,
    _sc_stream_sink_exactly_once,
]


# The pooled scenario runner lives in a SIBLING PROCESS since round 8
# (txn_sibling_subprocess.py runs _SCENARIOS overlapping the whole suite;
# tests/test_z_txn_join.py is the join point) — the pool was the suite's
# largest serial block (~26 s idle).  Only the monkeypatching serial
# tests below run in the main process.


def test_merge_conflict_preserves_concurrent_append(spark, tmp_path, monkeypatch):
    """ADVICE r7 (high): an append landing BETWEEN a merge's snapshot read
    and its commit must surface as TxnConflict — the merge's survivor set
    was derived from a snapshot that no longer describes the table, and
    folding over the interloper would silently drop its rows (the classic
    OCC lost update).  The interloper's rows must remain live afterwards.
    Serial: patches module internals the pooled threads would observe."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = str(tmp_path / "t5")
    write_txn(_df(spark, 0, 4), root)
    orig = tt._stage_files
    state = {"fired": False}

    def stage_then_interlope(df, root_, *args):
        out = orig(df, root_, *args)
        if not state["fired"]:
            state["fired"] = True
            # the interloper commits AFTER the merge read its snapshot and
            # staged its files, BEFORE the merge's log-entry create
            tt.write_txn(_df(spark, 900, 902), root, mode="append")
        return out

    monkeypatch.setattr(tt, "_stage_files", stage_then_interlope)
    src = spark.createDataFrame([(1, -1)], "id long, v long")
    with pytest.raises(TxnConflict):
        merge_txn(spark, src, root, on="id")
    monkeypatch.undo()
    # nothing was lost OR applied: the interloper's rows are live, the
    # merge is not
    got = {r.id: r.v for r in read_txn(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 900: 9000, 901: 9010}
    # same guarantee for DELETE (the other read-modify-write path)
    state["fired"] = False
    monkeypatch.setattr(tt, "_stage_files", stage_then_interlope)
    with pytest.raises(TxnConflict):
        delete_txn(spark, root, "id >= 900")
    monkeypatch.undo()
    assert read_txn(spark, root).count() == 8  # 6 + interloper's 2
    # a clean retry (no interloper) succeeds at the advanced version
    merge_txn(spark, src, root, on="id")
    assert {r.v for r in read_txn(spark, root).collect() if r.id == 1} == {-1}


def test_maintenance_rewrite_commutes_with_append(spark, tmp_path, monkeypatch):
    """Delta's disjoint-file-set conflict rule for maintenance rewrites:
    a blind append landing between a compaction's read and its commit
    COMMUTES — the compaction retries at the new head and the appended
    file stays live alongside the compacted output.  A concurrent DV
    tombstoning rows IN a compaction input does NOT commute (the rewrite
    would resurrect the deleted rows) and must raise.  Serial: patches
    module internals the pooled threads would observe."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = str(tmp_path / "t6")
    for lo in (0, 3, 6):
        write_txn(_df(spark, lo, lo + 3).coalesce(1), root)
    orig = tt._stage_files
    state = {"interlope": None}

    def stage_then_interlope(df, root_, *args):
        out = orig(df, root_, *args)
        fn, state["interlope"] = state["interlope"], None
        if fn is not None:
            fn()
        return out

    monkeypatch.setattr(tt, "_stage_files", stage_then_interlope)
    # commuting case: append interleaves a full compaction
    state["interlope"] = lambda: tt.write_txn(
        _df(spark, 900, 902).coalesce(1), root, mode="append"
    )
    v = compact_txn(spark, root, target_files=1)
    got = sorted(r.id for r in read_txn(spark, root).collect())
    assert got == list(range(9)) + [900, 901]           # nothing lost
    assert snapshot(root).version == v
    # schema-evolving append commutes too, and the table schema is NOT
    # regressed by the rewrite's entry
    state["interlope"] = lambda: tt.write_txn(
        spark.createDataFrame([(950, 1, "x")], "id long, v long, tag string"),
        root, mode="append",
    )
    tt.optimize_txn(spark, root, small_than=1 << 30)
    snap = snapshot(root)
    assert "tag" in [f["name"] for f in json.loads(snap.schema_json)["fields"]]
    got = {r.id: r.tag for r in read_txn(spark, root).collect()}
    assert got[950] == "x" and got[0] is None
    # NON-commuting case: a DV lands on a compaction input file
    state["interlope"] = lambda: tt.delete_txn_dv(spark, root, "id = 900")
    with pytest.raises(TxnConflict):
        compact_txn(spark, root, target_files=1)
    # the delete won, the compaction did not apply
    got = sorted(r.id for r in read_txn(spark, root).collect())
    assert 900 not in got and 901 in got
    # NON-commuting case (ADVICE r9 medium): a concurrent DROP COLUMN is a
    # METADATA change — the compaction's output files physically carry the
    # dropped column's values, so retrying at head would resurrect it (and
    # compact's tombstone-clearing extra was computed at base).  Conflict.
    state["interlope"] = lambda: tt.drop_column_txn(root, "tag")
    with pytest.raises(TxnConflict):
        compact_txn(spark, root, target_files=1)
    snap = snapshot(root)
    assert snap.dropped == ("tag",)  # the drop won, the rewrite did not
    assert "tag" not in read_txn(spark, root).columns
    # a clean compaction afterwards purges the dropped column and clears
    # its tombstone as designed
    compact_txn(spark, root, target_files=1)
    assert snapshot(root).dropped == ()


def test_app_txn_race_applies_exactly_once(spark, tmp_path, monkeypatch):
    """Two writers racing with the SAME (app_id, version): the loser's OCC
    retry loop re-checks the watermark BEFORE its commit attempt, so the
    apply lands exactly once — the second writer degrades to a no-op, not
    a duplicate.  Serial: patches module internals."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    root = str(tmp_path / "t7")
    write_txn(_df(spark, 0, 3).coalesce(1), root)
    orig = tt._stage_files
    state = {"fired": False}

    def stage_then_interlope(df, root_, *args):
        out = orig(df, root_, *args)
        if not state["fired"]:
            state["fired"] = True
            # the rival writer commits the SAME app txn after we staged,
            # before our log-entry create
            tt.write_txn(
                _df(spark, 100, 103).coalesce(1), root,
                app_txn=("loader", 7),
            )
        return out

    monkeypatch.setattr(tt, "_stage_files", stage_then_interlope)
    v = write_txn(_df(spark, 100, 103).coalesce(1), root, app_txn=("loader", 7))
    monkeypatch.undo()
    # exactly once: the rival's rows are live, ours became a no-op
    assert read_txn(spark, root).count() == 6
    assert v == snapshot(root).version
    assert tt.last_app_version(root, "loader") == 7
    # the loser's already-staged data files were dropped at the no-op
    # instead of lingering as orphans until vacuum (ADVICE r9)
    live = {os.path.relpath(p, root) for p in snapshot(root).files}
    on_disk = {f for f in os.listdir(root) if f.endswith(".parquet")}
    assert on_disk == live


def test_prune_predicate_masks_string_literals():
    """ADVICE r9 (high): SQL keywords INSIDE a quoted string literal are
    inert text, never structure — the IS NULL pre-pass used to rewrite
    `note = 'status IS NULL'` into a bound on the WRONG column plus a
    bogus nullness mark, making file pruning unsound.  No Spark needed."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    p = tt._prune_from_predicate
    # the reproduced regression: the literal is a plain string bound on
    # `note`; no nullness mark on `status`, no 1=1 placeholder bound
    assert p("note = 'status IS NULL'") == {
        "note": ("status IS NULL", "status IS NULL")
    }
    # keywords in strings no longer disable (or corrupt) sibling conjuncts
    assert p("note = 'a AND b' AND id >= 7") == {
        "note": ("a AND b", "a AND b"), "id": (7, None),
    }
    assert p("note = 'x OR y'") == {"note": ("x OR y", "x OR y")}
    # string BETWEEN now derives bounds (masking made it parseable)
    assert p("name BETWEEN 'a' AND 'c'") == {"name": ("a", "c")}
    # SQL '' escape: tokenizes as two literals; the conjunct contributes
    # nothing (sound), siblings still prune
    assert p("note = 'it''s' AND id = 2") == {"id": (2, 2)}
    # unterminated quote: conjunct contributes nothing, stays sound
    assert p("note = 'abc AND id = 9") == {}
    # real nullness extraction still works alongside masked strings
    assert p("tag = 'v IS NULL' AND v IS NOT NULL") == {
        "tag": ("v IS NULL", "v IS NULL"), "v": ("__notnull",),
    }


def test_date_bound_type_gate(spark, tmp_path):
    """ADVICE r12 (high): DATE-literal bounds are type-checked against
    the snapshot schema before pruning.  A TIMESTAMP column's footer
    stats stringify as 'YYYY-MM-DD HH:MM:SS', which compares GREATER
    than the bare 'YYYY-MM-DD' bound, so `ts <= DATE'2024-01-02'` used
    to prune the file whose min is exactly midnight of the bound date —
    silently dropping matching rows.  Same hazard for a PLAIN string
    upper bound on a timestamp column (SQL zero-extends the literal when
    casting): both now prefix-compare, and DATE bounds on string columns
    (cast semantics raw string order does not model) contribute nothing."""
    import dbt_trill_shop_spark.sources.txn_table as tt

    # unit: the literal comes back marked
    b = tt._prune_from_predicate("ts <= DATE'2024-01-02'")
    assert b == {"ts": (None, "2024-01-02")}
    assert isinstance(b["ts"][1], tt._DateLit)
    # masked plain strings stay unmarked
    b2 = tt._prune_from_predicate("ts <= '2024-01-02'")
    assert not isinstance(b2["ts"][1], tt._DateLit)

    # end-to-end: Spark's default INT96 timestamps carry no parquet
    # min/max, but a session writing TIMESTAMP_MICROS (a public conf any
    # user can set) records them — stringified 'YYYY-MM-DD HH:MM:SS' in
    # the log.  One file's min is exactly midnight of the bound date,
    # one file strictly after it.
    root = str(tmp_path / "tsgate")
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        write_txn(
            spark.sql(
                "SELECT id, TIMESTAMP'2024-01-02 00:00:00' + "
                "make_interval(0,0,0,0,CAST(id AS INT)) AS ts FROM range(3)"
            ).coalesce(1),
            root,
        )
        write_txn(
            spark.sql(
                "SELECT id, TIMESTAMP'2024-01-03 05:00:00' AS ts "
                "FROM range(10, 12)"
            ).coalesce(1),
            root,
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert "ts" in tt.snapshot(root).file_stats[0], "micros stats recorded"
    # the midnight row survives a DATE upper bound (was pruned pre-fix) …
    g = read_txn(spark, root, where="ts <= DATE'2024-01-02'")
    assert [r.id for r in g.collect()] == [0]
    # … and the later file is still pruned (prefix-compare keeps skipping)
    assert len(g.inputFiles()) == 1
    # plain string upper bound: same zero-extension semantics, same fix
    g2 = read_txn(spark, root, where="ts <= '2024-01-02'")
    assert [r.id for r in g2.collect()] == [0]
    assert len(g2.inputFiles()) == 1
    # lower bounds prune exactly as before (sound without prefix logic)
    g3 = read_txn(spark, root, where="ts >= DATE'2024-01-03'")
    assert sorted(r.id for r in g3.collect()) == [10, 11]
    assert len(g3.inputFiles()) == 1

    # DATE bound on a STRING column contributes nothing (cast semantics) —
    # rows still filter correctly, no file is skipped
    root2 = str(tmp_path / "strgate")
    write_txn(
        spark.createDataFrame(
            [(1, " 2024-01-05"), (2, "2024-01-01")], "id long, s string"
        ).coalesce(1),
        root2,
    )
    write_txn(
        spark.createDataFrame([(3, "2023-12-31")], "id long, s string").coalesce(1),
        root2,
    )
    g4 = read_txn(spark, root2, where="s >= DATE'2024-01-02'")
    # ' 2024-01-05' trims under the cast and matches, though its raw
    # string sorts below the bound — the file must not be pruned
    assert [r.id for r in g4.collect()] == [1]
    assert len(g4.inputFiles()) == 2


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    """Serial (patches module internals the pooled threads would see):
    another writer takes version 1 BETWEEN our snapshot and our commit —
    the atomic create for v1 must fail and surface as a conflict (an
    overwrite's remove-set is stale by then), never as a silent retry
    that would drop the interloper's rows."""
    root = str(tmp_path / "t4")
    write_txn(_df(spark, 0, 2), root)
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


def test_overwrite_partitions_conflict_raises(spark, tmp_path, monkeypatch):
    """Serial (patches module internals the pooled threads would see):
    DYNAMIC PARTITION OVERWRITE computes its remove-set from the snapshot
    it staged against, so an interloper taking the next version between
    that fold and the commit must surface as TxnConflict — a silent retry
    could drop a concurrent append into the replaced partition.  Identity
    tables get the same contract through the pinned identity commit."""
    root = str(tmp_path / "tdp")
    write_txn(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string"),
        root, partition_by=["cat"],
    )
    import dbt_trill_shop_spark.sources.txn_table as tt

    monkeypatch.setattr(tt, "_list_versions", lambda r: [0])
    os.makedirs(os.path.join(root, "_txn"), exist_ok=True)
    with open(os.path.join(root, "_txn", f"{1:010d}.json"), "w") as fh:
        json.dump(
            {"version": 1, "mode": "append", "actions": [],
             "schema": spark.createDataFrame(
                 [], "id long, cat string").schema.json(), "ts_ms": 1},
            fh,
        )
    with pytest.raises(TxnConflict):
        write_txn(
            spark.createDataFrame([(9, "a")], "id long, cat string"),
            root, mode="overwrite_partitions",
        )
    monkeypatch.undo()
    # with the full log visible it commits, replacing exactly partition a
    v = write_txn(
        spark.createDataFrame([(9, "a")], "id long, cat string"),
        root, mode="overwrite_partitions",
    )
    assert v == 2
    assert sorted((r.id, r.cat) for r in read_txn(spark, root).collect()) == [
        (2, "b"), (9, "a")
    ]


def test_replace_where_conflict_raises(spark, tmp_path, monkeypatch):
    """Serial (patches module internals the pooled threads would see):
    replaceWhere is pinned read-modify-write — its remove/tombstone set
    derives from the snapshot it read, so an interloper taking the next
    version BETWEEN that read and the commit must surface as
    TxnConflict, never fold over (the interloper's rows could satisfy
    the predicate and would survive a stale remove-set)."""
    from dbt_trill_shop_spark.sources.txn_table import replace_where_txn

    root = str(tmp_path / "t")
    write_txn(_df(spark, 0, 4), root)
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
        replace_where_txn(
            spark, root, "id < 2", _df(spark, 0, 1)
        )
    monkeypatch.undo()
    # with the full log visible, the same backfill commits at v2 and the
    # interloper's (empty) commit survives in history
    v = replace_where_txn(spark, root, "id < 2", _df(spark, 0, 1))
    assert v == 2
    assert sorted(r.id for r in read_txn(spark, root).collect()) == [0, 2, 3]
