"""Degenerate-input sweep worker: run EVERY registered query against two
twins of the tables and report crashes.

- ``empty``: zero-row tables with the real schemas.  Fully-filtered shards
  and empty partitions are routine at 100 TB.  Found on introduction (r6):
  ``x_bm25_index_search`` crashed schema inference twice (createDataFrame
  without schema; part-less parquet dir read).
- ``nastyrow``: ONE row per table, with every string column set to "" and
  every array column set to [] — the nastiest row that is still LEGAL data
  (numbers stay finite; NaN/Inf measures are a data-contract violation
  where ANSI failing loudly is by design — see core.testing.Finite).
  Covers in one pass: n=1 statistics (``q_bootstrap_ci`` hit ANSI
  DIVIDE_BY_ZERO — a Poisson replica whose every row draws weight 0 has
  sum(w)=0, certain at n=1), empty documents (the quality classifier's
  ``div n_chars`` hit through six callers), zero-length embeddings
  (ragged np.stack in embedding_neardup; empty long-form aggregate in
  kmeans_refine), and malformed JSON payloads (FAILFAST parse_json in
  q_variant_props).
- ``nullrow`` (r7): ONE row per table with EVERY column NULL — schema-legal
  (the testdata parquet declares every field optional) and routine at
  100 TB as dirty rows.  Found on introduction: the kNN gemm np.stack'd
  NULL vectors (TypeError in 5 queries) and the multimodal FEATURE_SCHEMA
  declared media_id non-nullable, so codegen read the Arrow batch with an
  unchecked getLong and killed the task ("Value at index is null").

Empty/degenerate OUTPUT is fine; exceptions are not.

Runs as a SIBLING PROCESS of the main suite (launched at collection-finish
by conftest via test_zscale_empty_sweep.py): per-query cost is dominated by
GIL-bound py4j plan construction, which a thread pool INSIDE the main
pytest process cannot parallelize against the suite's own GIL load — the
r6 in-chunk attempt cost ~26 s of suite wall; a sibling process overlaps
the whole suite, and its own small pool (this process has no competing GIL
load) overlaps job execution with plan construction.  Own Spark session,
so the stateful queries' named sinks/indexes can't collide with the main
session's.

Usage: python tests/empty_sweep_subprocess.py <schema_sf_dir> <out_json>
"""
import json
import os
import sys
import tempfile
import time
import traceback


def _twin_dir(schema_sf_dir: str, kind: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix=f"sf_{kind}_")
    for f in os.listdir(schema_sf_dir):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(schema_sf_dir, f)
        if kind == "empty":
            pq.write_table(pq.read_schema(src).empty_table(), os.path.join(d, f))
            continue
        if kind == "nullrow":
            s = pq.read_schema(src)
            cols = {fl.name: pa.array([None], type=fl.type) for fl in s}
            pq.write_table(pa.table(cols, schema=s), os.path.join(d, f))
            continue
        t = pq.read_table(src).slice(0, 1)
        # A zero-row source table degrades to an as-is copy (ADVICE r6:
        # col[0] on an empty column would crash the whole sweep with an
        # unrelated IndexError instead of per-query results).
        if t.num_rows == 0:
            pq.write_table(t, os.path.join(d, f))
            continue
        cols = {}
        for field in t.schema:
            col = t.column(field.name).to_pylist()
            if pa.types.is_string(field.type):
                col[0] = ""
            elif pa.types.is_list(field.type):
                col[0] = []
            cols[field.name] = pa.array(col, type=field.type)
        pq.write_table(pa.table(cols, schema=t.schema), os.path.join(d, f))
    return d


def main(schema_sf_dir: str, out_path: str) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from dbt_trill_shop_spark.harness import QUERIES
    from dbt_trill_shop_spark.session import get_spark

    from tests.test_oracle_parity import _is_stateful

    spark = get_spark(
        app_name="trillshop-degenerate-sweep", master="local[8]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    failures: dict[str, str] = {}
    n_run = 0
    # STAGED queries (next round's registrations) sweep alongside the
    # registered ones — the degenerate contract is a day-one requirement,
    # not a registration-time retrofit (SCALE.md round-7 house rules)
    from dbt_trill_shop_spark.operators.txn_demo import (
        ROUND11_STAGED, ROUND12_STAGED, ROUND13_STAGED, ROUND14_STAGED,
        ROUND15_STAGED,
    )

    staged = {
        name: fn
        for name, (fn, _sql) in {
            **ROUND11_STAGED, **ROUND12_STAGED, **ROUND13_STAGED,
            **ROUND14_STAGED, **ROUND15_STAGED,
        }.items()
        if name not in QUERIES  # registration moves a query to the main lane
    }

    def fn_of(name: str):
        return staged[name] if name in staged else QUERIES[name].fn

    names = sorted(QUERIES) + sorted(staged)
    # registered q_txn_* queries ride the threaded pure lane (their tmp
    # roots are query-name-distinct — the r8 sweep proved the shape);
    # s_stream_* and any newly staged callables stay serial
    stateful = [n for n in names if _is_stateful(n) or n in staged]
    pure = [n for n in names if n not in set(stateful)]
    for label in ("empty", "nastyrow", "nullrow"):
        twin = _twin_dir(schema_sf_dir, label)

        def one(name: str):
            try:
                # fn() captures driver-side eager work (collect loops, index
                # builds, createDataFrame) and analysis; the noop WRITE
                # materializes EVERY column — count() let Catalyst prune
                # output columns, which hid 9 degenerate DIVIDE_BY_ZERO
                # crashes in result expressions until the r7 noop audit.
                fn_of(name)(spark, twin).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                return name, traceback.format_exc()
            return None

        # Threaded submission, parity-chunk style (py4j and Spark job
        # execution release the GIL): a serial loop was ~2 min per twin;
        # pooling pays for the third twin and then some.  Stateful queries
        # (uuid sinks, pid-keyed indexes) keep their own narrow lane.
        with ThreadPoolExecutor(max_workers=2) as ser, ThreadPoolExecutor(
            max_workers=8
        ) as ex:
            futs = [ser.submit(one, n) for n in stateful]
            results = list(ex.map(one, pure)) + [f.result() for f in futs]
        n_run += len(names)
        for r in results:
            if r is not None:
                failures[f"{label}:{r[0]}"] = r[1]
        shutil.rmtree(twin, ignore_errors=True)
    result = {
        "n_queries": n_run,
        "elapsed_sec": round(time.time() - t0, 1),
        "failures": failures,
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(result, fh)
    os.replace(tmp, out_path)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
