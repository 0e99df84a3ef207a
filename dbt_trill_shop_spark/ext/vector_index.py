"""Persisted IVF-PQ vector index: build once, search many.

:func:`ivfpq_topk` (similarity.py) computes coarse cells + PQ codes inside
every query plan — right for a one-shot job, wasteful for a serving corpus
searched repeatedly.  This module materializes the index as parquet tables:

- ``centroids/``  (cell, centroid)              — tiny, broadcast at search
- ``codebooks/``  (block, code, cv)             — tiny, broadcast at search
- ``postings/``   (vec_id, block, code) **partitioned by cell** — the
  compressed corpus; a search probing ``n_probe`` cells prunes to those
  partition directories at scan time and never reads the rest
- ``meta.json``   (n_cells/n_blocks/n_codes)

At 100 TB the postings are codes-only (bytes per vector instead of KB), the
build cost amortizes across every later search, and per-search I/O is
``n_probe/n_cells`` of the codes — the FAISS IVF-PQ serving layout (Johnson
et al. 2017) expressed as parquet + partition pruning.

Determinism matches :func:`ivfpq_topk` exactly (probe distances rounded to
6 dp with cell tie-breaks, ADC as int64 micro-units), so searching a built
index returns the identical rows — asserted in tests, and the harness query
shares the composition's DuckDB oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# shared with similarity.py so the persisted index stays bit-identical to
# the one-plan ivfpq_topk composition (same expression trees, same rounding)
from .similarity import _as_double, _block_slices, _sq_l2


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    n_blocks: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index for ``embeddings`` under ``path``."""
    from .similarity import ivf_assign, pq_encode

    spark = embeddings.sparkSession
    cents = embeddings.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), _as_double(F.col(vec_col)).alias("centroid")
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    codebooks = (
        embeddings.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("code"), _as_double(F.col(vec_col)).alias("v"))
        .select("code", F.explode(_block_slices(n_blocks)).alias("s"))
        .select("code", F.col("s.block").alias("block"), F.col("s.bv").alias("cv"))
    )
    codebooks.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))

    assign = ivf_assign(embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        embeddings, n_blocks=n_blocks, n_codes=n_codes, id_col=id_col, vec_col=vec_col
    )
    postings = codes.join(assign, id_col).select(id_col, "block", "code", "cell")
    (
        postings.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "postings"))
    )
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {"n_cells": n_cells, "n_blocks": n_blocks, "n_codes": n_codes, "id_col": id_col},
            fh,
        )
    spark.catalog.refreshByPath(os.path.join(path, "postings"))


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ANN over a built index: probe each query's ``n_probe`` nearest
    cells, scan ONLY those postings partitions, score via the broadcast
    ADC lookup table, window top-k.  Returns (query_id, neighbor_id, rank) —
    bit-identical to :func:`similarity.ivfpq_topk` on the same corpus."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_blocks = meta["n_blocks"]

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    qcells = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "cell", F.round(_sq_l2(F.col("qv"), F.col("centroid")), 6).alias("d2")
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    # the probe assignment is tiny and bounded (|queries| x n_probe rows) —
    # collect it ONCE; the collected rows feed both the literal IN-filter
    # (so the postings scan prunes partition directories, which a join could
    # not do) and a VALUES relation for the candidate join (so the
    # crossJoin + window never re-runs per consumer)
    probed_rows = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
        .collect()
    )
    if not probed_rows:
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) query_id, CAST(NULL AS BIGINT) neighbor_id, "
            "CAST(NULL AS BIGINT) rank WHERE FALSE"
        )
    cells = sorted({int(r["cell"]) for r in probed_rows})
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("cell").isin(cells)
    )
    values = ", ".join(f"({int(r['query_id'])}, {int(r['cell'])})" for r in probed_rows)
    probed = spark.sql(
        f"SELECT CAST(query_id AS BIGINT) query_id, CAST(cell AS BIGINT) cell "
        f"FROM VALUES {values} AS t(query_id, cell)"
    )

    codebooks = spark.read.parquet(os.path.join(path, "codebooks"))
    qblocks = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("v"))
        .select("query_id", F.explode(_block_slices(n_blocks)).alias("s"))
        .select("query_id", F.col("s.block").alias("block"), F.col("s.bv").alias("qv"))
    )
    lut = qblocks.join(F.broadcast(codebooks), "block").select(
        "query_id", "block", "code",
        F.round(_sq_l2(F.col("qv"), F.col("cv")) * 1_000_000, 0).cast("bigint").alias("d2_micro"),
    )

    cand = postings.select(
        F.col(meta["id_col"]).alias("cand_id"), "block", "code", "cell"
    ).join(F.broadcast(probed), "cell")
    scored = (
        cand.join(F.broadcast(lut), ["query_id", "block", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d2_micro").alias("adc_micro"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_micro"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("neighbor_id"), "rank")
    )
