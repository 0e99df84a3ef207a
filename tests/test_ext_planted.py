"""Planted-truth tests for the ext operators whose only evidence was the
DuckDB oracle (a shared-formula bug passes parity on both engines).

Every check plants data whose correct answer is known by construction —
two separable clusters, a line vs a cube, one far outlier, documents
containing exact blocklist words — and asserts the operator recovers it.
Same posture as tests/test_stats_replays.py for the relational family.

Pooled from the start (the checks are pure: a shared read-only session,
no catalog/tmp-path mutation); failures surface per-name.
"""

import math

from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def _px_cluster_purity_pure_planted_clusters(spark):
    from dbt_trill_shop_spark.ext.similarity import cluster_purity

    # seeds: vec_id < n_cells pick the initial centroids -> id 0 anchors
    # cell A at the origin, id 1 anchors cell B far away
    rows = [(0, [0.0, 0.0], 7), (1, [100.0, 100.0], 9)]
    rows += [(2 + i, [float(i % 3), 0.5], 7) for i in range(8)]
    rows += [(10 + i, [100.0 + i % 3, 100.5], 9) for i in range(8)]
    out = cluster_purity(_vecs(spark, rows), n_cells=2).collect()
    assert len(out) == 2
    assert {r["majority_label"] for r in out} == {7, 9}
    for r in out:
        assert r["purity_ppm"] == 1_000_000, r
        assert r["n_members"] == r["n_majority"] == 9, r


def _px_class_separation_gap_exceeds_spread(spark):
    from dbt_trill_shop_spark.ext.similarity import class_separation

    # symmetric points -> centroids exactly (0,0) and (10,0); spread 1
    rows = [
        (0, [1.0, 0.0], 0), (1, [-1.0, 0.0], 0),
        (2, [11.0, 0.0], 1), (3, [9.0, 0.0], 1),
    ]
    out = {(r["label_a"], r["label_b"]): r["dist_milli"]
           for r in class_separation(_vecs(spark, rows)).collect()}
    assert out[(0, 1)] == 10_000  # centroid gap = 10.0 exactly
    assert out[(0, 0)] == 1_000 and out[(1, 1)] == 1_000  # mean spread = 1.0


def _px_intrinsic_dimension_line_vs_cube(spark):
    import random

    from dbt_trill_shop_spark.ext.similarity import intrinsic_dimension

    rng = random.Random(7)
    line = [(i, [rng.uniform(0, 100), 0.0, 0.0, 0.0], 0) for i in range(80)]
    cube = [
        (i, [rng.uniform(0, 10) for _ in range(4)], 0) for i in range(80)
    ]
    d_line = intrinsic_dimension(_vecs(spark, line), num_queries=80).collect()[0]
    d_cube = intrinsic_dimension(_vecs(spark, cube), num_queries=80).collect()[0]
    assert d_line["intrinsic_dim"] <= 2.0, d_line
    assert d_cube["intrinsic_dim"] >= 2.5, d_cube
    assert d_cube["intrinsic_dim"] > d_line["intrinsic_dim"]


def _px_embedding_outliers_finds_planted_point(spark):
    from dbt_trill_shop_spark.ext.similarity import embedding_outliers

    rows = [(i, [float(i % 2), 0.0], 0) for i in range(20)]
    rows.append((99, [50.0, 0.0], 0))  # same label, far from its centroid
    out = embedding_outliers(_vecs(spark, rows), k=3).collect()
    assert out[0]["rank"] == 1 and out[0]["vec_id"] == 99


def _px_adaptive_quality_keeps_top_three_quarters(spark):
    from dbt_trill_shop_spark.ext.textstats import adaptive_quality_cut

    # 8 docs per lang with strictly increasing quality (longer, wordier
    # text scores higher) -> distinct logits, no threshold ties: the
    # q=0.25 cut keeps exactly 6 of 8 per language
    def doc(i, lang):
        words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
        return (i, " ".join(words * (2 + i % 8)), lang)

    rows = [doc(i, "en") for i in range(8)] + [doc(100 + i, "de") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in adaptive_quality_cut(docs).collect()}
    for lang in ("en", "de"):
        r = out[lang]
        assert r["n_docs"] == 8, r
        # strictly-above-threshold keep of 8 distinct logits at q=0.25
        assert r["n_kept"] == 6, r
        assert r["kept_ppm"] == 750_000, r


def _px_blocklist_filter_counts_planted_hits(spark):
    from dbt_trill_shop_spark.ext.textstats import blocklist_filter

    rows = [
        (1, "this damn text is damn hell annoying"),      # profanity 3
        (2, "win the lottery at our casino jackpot now"),  # spam 3
        (3, "please Subscribe Now and read the cookie policy"),  # boiler 2
        (4, "a perfectly clean document about spark plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in blocklist_filter(docs).collect()}
    assert out[1]["n_profanity"] == 3 and not out[1]["keep"]
    assert out[2]["n_spam"] == 3 and not out[2]["keep"]
    assert out[3]["n_boilerplate"] == 2 and not out[3]["keep"]
    assert out[4]["n_total_hits"] == 0 and out[4]["keep"]


def _px_dup_cluster_sizes_planted_histogram(spark):
    from dbt_trill_shop_spark.ext.dedup import dup_cluster_size_histogram

    # pair graph: {1-2, 2-3} one 3-cluster, {5-6} one 2-cluster, 9 single
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 9)], "doc_id long")
    out = {r["cluster_size"]: r["n_clusters"]
           for r in dup_cluster_size_histogram(pairs, ids).collect()}
    assert out == {3: 1, 2: 1, 1: 1}


def _px_minhash_scurve_theory_column(spark, sf_dir):
    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.ext.dedup import minhash_scurve_audit

    docs = load_table(spark, sf_dir, "documents")
    out = minhash_scurve_audit(docs, num_hashes=8, bands=4).collect()
    assert out  # at least one populated Jaccard decile
    r, b = 8 // 4, 4
    for row in out:
        j = (row["bucket"] + 0.5) / 10.0
        theory = round((1.0 - (1.0 - j**r) ** b) * 1_000_000)
        assert abs(row["theory_ppm"] - theory) <= 1, row
        assert 0 <= row["recall_ppm"] <= 1_000_000, row
        assert row["n_candidates"] <= row["n_pairs"], row


def _px_sample_bias_ppm_arithmetic(spark, sf_dir):
    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.ext.sampling import sample_bias_audit

    docs = load_table(spark, sf_dir, "documents")
    out = sample_bias_audit(docs, fraction=0.25).collect()
    tot_full = sum(r["n_full"] for r in out)
    tot_samp = sum(r["n_samp"] for r in out)
    assert tot_full == docs.count() and 0 < tot_samp < tot_full
    for r in out:
        assert r["full_ppm"] == r["n_full"] * 1_000_000 // tot_full, r
        assert r["sample_ppm"] == r["n_samp"] * 1_000_000 // tot_samp, r
        assert r["skew_ppm"] == abs(r["sample_ppm"] - r["full_ppm"]), r


def _px_pack_efficiency_mass_conservation(spark, sf_dir):
    from dbt_trill_shop_spark.catalog import load_table
    from dbt_trill_shop_spark.ext.sampling import pack_efficiency

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    capacity = 512
    total_docs = docs.count()
    total_tokens = docs.agg(F.sum(F.least("n_tokens", F.lit(capacity)))).collect()[0][0]
    out = pack_efficiency(docs, capacity=capacity).collect()
    assert sum(r["n_docs"] for r in out) == total_docs
    assert sum(r["tokens"] for r in out) == total_tokens  # mass conserved
    for r in out:
        assert 0 <= r["util_decile"] <= 10, r


def _px_chunk_inflation_invariants(spark, sf_dir):
    from dbt_trill_shop_spark.harness import QUERIES

    row = QUERIES["x_chunk_inflation"].fn(spark, sf_dir).collect()[0]
    assert row["n_chunks"] >= row["n_docs"] > 0
    assert row["chunk_tokens"] >= row["doc_tokens"] > 0
    assert row["inflation_ppm"] == row["chunk_tokens"] * 1_000_000 // row["doc_tokens"]


def _px_band_balance_share_arithmetic(spark, sf_dir):
    from dbt_trill_shop_spark.harness import QUERIES

    out = QUERIES["x_band_balance"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["max_bucket"] <= r["n_docs"], r
        assert r["max_share_ppm"] == r["max_bucket"] * 1_000_000 // r["n_docs"], r
        assert r["n_buckets"] <= r["n_docs"], r


def _px_hashed_embedding_single_token_doc(spark):
    from dbt_trill_shop_spark.ext.textstats import hashed_embedding

    docs = spark.createDataFrame(
        [(1, "spark spark spark"), (2, "spark")], "doc_id long, text string"
    )
    out = hashed_embedding(docs, dim=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # one distinct token -> exactly one populated dim per doc, weight = tf
    # with a fixed sign, same dim/sign for the same token in both docs
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    assert by_doc[1][0]["dim_idx"] == by_doc[2][0]["dim_idx"]
    assert abs(by_doc[1][0]["weight"]) == 3 and abs(by_doc[2][0]["weight"]) == 1
    assert (by_doc[1][0]["weight"] > 0) == (by_doc[2][0]["weight"] > 0)


def _px_search_snippets_contain_planted_needle(spark):
    from dbt_trill_shop_spark.ext.textstats import search_snippets

    docs = spark.createDataFrame(
        [(7, "aaa bbb ccc needle ddd eee fff ggg hhh")],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(0, 7, 1, ["needle"])],
        "query_id long, hit_id long, rank long, terms array<string>",
    )
    out = search_snippets(docs, hits).collect()
    assert len(out) == 1
    r = out[0]
    assert "needle" in r["snippet"]
    # 1-indexed, JVM instr() semantics
    assert r["match_pos"] == "aaa bbb ccc needle ddd eee fff ggg hhh".find("needle") + 1


def _px_pack_positions_are_prefix_sums(spark, sf_dir):
    from dbt_trill_shop_spark.harness import QUERIES

    rows = QUERIES["x_pack_positions"].fn(spark, sf_dir).collect()
    assert rows
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault((r["source"], r["bin_id"]), []).append(r)
    for (_, _), members in by_bin.items():
        members.sort(key=lambda r: r["doc_id"])
        pos = 0
        for m in members:
            assert m["start_pos"] == pos, m
            pos += m["packed_tokens"]


def _px_hard_negatives_exclude_positives_and_follow_bm25(spark, sf_dir):
    from dbt_trill_shop_spark.harness import QUERIES

    rows = QUERIES["x_hard_negatives"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["neg_rank"] >= 1 and r["bm25_rank"] >= r["neg_rank"], r
    # per query: neg_rank is dense 1..n and bm25_rank strictly increases
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, g in by_q.items():
        g.sort(key=lambda r: r["neg_rank"])
        assert [r["neg_rank"] for r in g] == list(range(1, len(g) + 1)), q
        ranks = [r["bm25_rank"] for r in g]
        assert ranks == sorted(ranks), q


def _px_simhash_calibration_identical_docs_at_zero(spark):
    from dbt_trill_shop_spark.ext.dedup import simhash_distance_histogram

    base = " ".join(f"tok{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base)], "doc_id long, text string"
    )
    out = {r["hamming"]: r["n_pairs"] for r in simhash_distance_histogram(docs).collect()}
    # three identical docs -> all C(3,2)=3 sampled pairs at hamming 0
    assert out == {0: 3}


def _px_shingle_df_histogram_planted_pair_mass(spark):
    from dbt_trill_shop_spark.ext.dedup import shingle_df_histogram

    shared = "alpha beta gamma"  # one 3-shingle present in all three docs
    docs = spark.createDataFrame(
        [(1, shared + " uniq1a uniq1b"), (2, shared + " uniq2a uniq2b"),
         (3, shared + " uniq3a uniq3b")],
        "doc_id long, text string",
    )
    out = {r["log2_df_bucket"]: r for r in shingle_df_histogram(docs).collect()}
    # df=3 shingles land in bucket floor(log2(3))=1 with pair mass C(3,2)
    assert 1 in out and out[1]["pair_mass"] >= 3
    # df=1 shingles carry zero pair mass
    if 0 in out:
        assert out[0]["pair_mass"] == 0


def _px_bitext_mining_identical_pair_ranks_first(spark):
    from dbt_trill_shop_spark.ext.similarity import bitext_margin_mining

    import random

    rng = random.Random(3)
    # noise lives in dims 0-1; the planted identical pair lives in dims 2-3,
    # so it is orthogonal to every noise vector (cosine 0) while matching
    # itself at cosine 1 -> maximal margin by construction
    rows = [(i, [rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0, 0.0], 0) for i in range(8)]
    rows += [(100 + i, [rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0, 0.0], 1) for i in range(8)]
    rows.append((50, [0.0, 0.0, 1.0, 1.0], 0))
    rows.append((150, [0.0, 0.0, 1.0, 1.0], 1))
    out = bitext_margin_mining(_vecs(spark, rows), knn=3, top_n=5).collect()
    top = out[0]
    assert top["rank"] == 1
    assert {top["x_id"], top["y_id"]} == {50, 150}, top


def _media(spark, payloads):
    return spark.createDataFrame(
        [
            (i, f"mem://m/{i}", "application/octet-stream", bytearray(p))
            for i, p in enumerate(payloads)
        ],
        "media_id long, uri string, mime string, payload binary",
    )


def _px_knn_homophily_pure_and_anti_clusters(spark):
    """Two tight pairs far apart: pair-aligned labels give homophily
    exactly 10^6 per label; cross-pair labels give exactly 0 (every
    nearest neighbor carries the other label)."""
    from dbt_trill_shop_spark.ext.similarity import knn_label_homophily

    pts = [[0.0, 0.0], [0.1, 0.0], [100.0, 100.0], [100.1, 100.0]]
    pure = _vecs(spark, [(i, p, 1 if i < 2 else 2) for i, p in enumerate(pts)])
    out = {r["label"]: r for r in knn_label_homophily(pure, k=1).collect()}
    assert out[1]["homophily_ppm"] == 1_000_000
    assert out[2]["homophily_ppm"] == 1_000_000
    assert out[1]["n_edges"] == out[2]["n_edges"] == 2

    anti = _vecs(spark, [(i, p, 1 + i % 2) for i, p in enumerate(pts)])
    out = {r["label"]: r for r in knn_label_homophily(anti, k=1).collect()}
    assert out[1]["homophily_ppm"] == 0 and out[2]["homophily_ppm"] == 0


def _px_knn_hubness_planted_hub_histogram(spark):
    """A center node with 3 spokes (radii 10/11/12, pairwise spoke
    distance ~18-19): with k=1 every spoke lists the center, the center
    lists the nearest spoke — in-degree histogram is exactly
    {0: 2, 1: 1, 3: 1} and mass conserves to N*k."""
    import math

    from dbt_trill_shop_spark.ext.similarity import knn_hubness

    rows = [(0, [0.0, 0.0], 0)]
    for i, r in enumerate((10.0, 11.0, 12.0)):
        a = 2 * math.pi * i / 3
        rows.append((i + 1, [r * math.cos(a), r * math.sin(a)], 0))
    hist = {r["in_degree"]: r["n_nodes"] for r in knn_hubness(_vecs(spark, rows), k=1).collect()}
    assert hist == {0: 2, 1: 1, 3: 1}, hist
    assert sum(d * n for d, n in hist.items()) == 4 * 1  # N*k edges


def _px_patch_stats_ascii_tiles(spark):
    """'AAAA'+'BBBB' at patch_bytes=4: two exact tiles with known ascii
    sums (4*65, 4*66) and integer milli means."""
    from dbt_trill_shop_spark.ext.multimodal import patch_intensity_stats

    out = patch_intensity_stats(_media(spark, [b"AAAABBBB"]), patch_bytes=4).collect()
    got = [(r["patch_id"], r["n_bytes"], r["sum_intensity"], r["mean_milli"]) for r in out]
    assert got == [(0, 4, 260, 65000), (1, 4, 264, 66000)], got


def _px_scene_change_single_planted_cut(spark):
    """32 'A's then two 32-'z' frames: exactly one cut at frame 2 with
    delta = (122-65)*1000; the flat z->z transition is silent."""
    from dbt_trill_shop_spark.ext.multimodal import scene_change_plan

    payload = b"A" * 32 + b"z" * 32 + b"z" * 32
    out = scene_change_plan(
        _media(spark, [payload]), frame_bytes=32, threshold_milli=4000
    ).collect()
    assert [(r["frame_id"], r["delta_milli"]) for r in out] == [(2, 57000)]


def _px_shot_stats_planted_cut_counts(spark):
    """Same payload: 3 frames, 1 cut -> 2 shots, mean shot length 1.5
    frames (1500 milli); an all-flat payload reports one full shot."""
    from dbt_trill_shop_spark.ext.multimodal import shot_stats

    cut = b"A" * 32 + b"z" * 64
    flat = b"Q" * 96
    out = {r["media_id"]: r for r in shot_stats(
        _media(spark, [cut, flat]), frame_bytes=32, threshold_milli=4000
    ).collect()}
    r0 = out[0]
    assert (r0["n_frames"], r0["n_cuts"], r0["n_shots"]) == (3, 1, 2)
    assert r0["mean_shot_frames_milli"] == 1500
    r1 = out[1]
    assert (r1["n_frames"], r1["n_cuts"], r1["n_shots"]) == (3, 0, 1)
    assert r1["mean_shot_frames_milli"] == 3000


def _px_flatness_constant_vs_split_payload(spark):
    """Constant payload -> variance exactly 0 (flat); a half-'A' half-'z'
    payload -> variance ((122000-65000)/2)^2 = 812_250_000 milli^2 by the
    two-point variance closed form, mean (65000+122000)/2 = 93500."""
    from dbt_trill_shop_spark.ext.multimodal import flatness_stats

    out = {r["media_id"]: r for r in flatness_stats(
        _media(spark, [b"A" * 128, b"A" * 64 + b"z" * 64]), patch_bytes=64
    ).collect()}
    assert out[0]["variance_milli2"] == 0 and bool(out[0]["is_flat"]) is True
    r = out[1]
    assert r["n_patches"] == 2
    assert r["mean_intensity_milli"] == 93500
    assert r["variance_milli2"] == 28500 ** 2 == 812_250_000
    assert bool(r["is_flat"]) is False


def _px_bm25_precision_disjoint_vocab_sources(spark):
    """Two sources with DISJOINT vocabularies: every BM25 hit must come
    from the query's own source -> precision exactly 10^6, base rate
    exactly 500000 (3 of 6 docs per source)."""
    from dbt_trill_shop_spark.ext.textstats import bm25_source_precision

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry date elder", "alpha"),
            (1, "zebra yak xerus walrus vulture", "beta"),
            (2, "apple banana cherry elder fig", "alpha"),
            (3, "apple grape banana melon kiwi", "alpha"),
            (4, "zebra yak xerus vulture newt", "beta"),
            (5, "zebra lion yak tiger wolf", "beta"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["query_id"]: r for r in bm25_source_precision(
        docs, n_queries=2, q_terms=5, k=10
    ).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_hits"] >= 2 and r["n_relevant"] == r["n_hits"]
        assert r["precision_ppm"] == 1_000_000
        assert r["base_rate_ppm"] == 500_000


def _px_retrieval_ndcg_perfect_and_rank2(spark):
    """All-same-label corpus: every hit relevant -> nDCG exactly 10^6 and
    RR exactly 10^6.  A query whose first same-label neighbor sits at
    rank 2 -> RR exactly 500000 (10^6 div 2) and nDCG < 10^6."""
    from dbt_trill_shop_spark.ext.similarity import retrieval_eval

    perfect = _vecs(
        spark, [(i, [float(i), 0.0], 7) for i in range(6)]
    )
    r = retrieval_eval(perfect, num_queries=1, k=3).collect()[0]
    assert r["ndcg_ppm"] == 1_000_000 and r["rr_micro"] == 1_000_000

    mixed = _vecs(
        spark,
        [
            (0, [0.0, 0.0], 7),
            (1, [1.0, 0.0], 9),   # nearest: wrong label
            (2, [2.0, 0.0], 7),   # rank 2: first relevant
            (3, [3.0, 0.0], 9),
            (4, [4.0, 0.0], 7),
        ],
    )
    r = retrieval_eval(mixed, num_queries=1, k=3).collect()[0]
    assert r["rr_micro"] == 500_000
    assert 0 < r["ndcg_ppm"] < 1_000_000


def _px_sq8_recon_error_exact_grid(spark):
    """1-D corpora hitting the quantizer grid exactly: range 255 micro
    reconstructs every point losslessly (errors 0); range 510 micro puts
    the midpoint half a step off (code 127 -> recon 254, error 1)."""
    from dbt_trill_shop_spark.ext.similarity import sq8_reconstruction_error

    exact = _vecs(
        spark, [(0, [0.0], 0), (1, [0.000255], 0)]
    )
    r = sq8_reconstruction_error(exact).collect()[0]
    assert r["mean_abs_err_micro"] == 0 and r["max_abs_err_micro"] == 0

    mid = _vecs(
        spark, [(0, [0.0], 0), (1, [0.000255], 0), (2, [0.000510], 0)]
    )
    r = sq8_reconstruction_error(mid).collect()[0]
    assert r["mean_abs_err_micro"] == 0  # (0+1+0) div 3
    assert r["max_abs_err_micro"] == 1


def _px_dedup_quality_canonical_keeps_best_logit(spark):
    """Planted cluster {1,2,3} (pairs 1-2, 2-3) with logits 10/99/50 must
    keep doc 2 under component label 1 (min reachable id); singletons keep
    themselves with n_members 1."""
    from dbt_trill_shop_spark.ext.dedup import dedup_quality_canonical

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    scored = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 8)],
        "doc_id long, logit_milli long",
    )
    out = {r["component"]: r for r in dedup_quality_canonical(
        pairs, docs, scored
    ).collect()}
    assert set(out) == {1, 4, 5}
    assert out[1]["kept_doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["kept_logit_milli"] == 99
    assert out[4]["kept_doc_id"] == 4 and out[4]["n_members"] == 1
    assert out[5]["kept_doc_id"] == 5 and out[5]["n_members"] == 1


def _px_label_propagation_two_planted_cliques(spark):
    from dbt_trill_shop_spark.ext.similarity import knn_label_propagation

    # two far-apart 5-point clusters with DISTINCT coordinates; k=4 makes
    # each cluster a mutual clique.  Synchronous LPA with the (count DESC,
    # label ASC) tie-break converges each clique to its minimum member id
    # by round 2 (round 1: everyone adopts the smallest OTHER id; round 2:
    # the minimum flows back) — stable thereafter, so 4 rounds must land
    # exactly {A -> 0, B -> 1}.
    rows = [(2 * i, [float(i), 0.25 * i], 0) for i in range(5)]
    rows += [(2 * i + 1, [50.0 + i, 50.0 + 0.25 * i], 0) for i in range(5)]
    got = {
        r["vec_id"]: r["community"]
        for r in knn_label_propagation(_vecs(spark, rows), k=4, n_iters=4).collect()
    }
    assert got == {**{2 * i: 0 for i in range(5)}, **{2 * i + 1: 1 for i in range(5)}}, got


def _px_kneser_ney_stock_phrases_score_low(spark):
    from dbt_trill_shop_spark.ext.textstats import kneser_ney_bigram

    # doc 0 repeats one stock bigram; doc 1 is all singleton bigrams.
    # The repeated bigram's discounted ML term dominates -> doc 0 must
    # score a LOWER mean neg-logprob than the all-novel doc, and the
    # bigram counts are exact.
    docs = spark.createDataFrame(
        [
            (0, "san francisco san francisco san francisco"),
            (1, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in kneser_ney_bigram(docs).collect()}
    assert got[0]["n_bigrams"] == 5 and got[1]["n_bigrams"] == 5
    assert got[0]["avg_neg_logp_kn"] < got[1]["avg_neg_logp_kn"], got


def _px_unigram_em_learns_whole_word_piece(spark):
    from dbt_trill_shop_spark.ext.bpe import unigram_fertility, unigram_lm_em

    # 'abab' dominates a corpus with enough filler mass that the
    # whole-word piece beats two 'ab' pieces (single piece wins once
    # total piece mass > 4x the word's count), so EM's Viterbi assigns
    # every occurrence to 'abab' and the M-step concentrates usage there.
    docs = spark.createDataFrame(
        [(i, "abab abab abab") for i in range(10)]
        + [(100 + i, "red green blue cyan pink gold") for i in range(3)],
        "doc_id long, text string",
    )
    table = unigram_lm_em(docs, max_vocab=50, n_pieces=40, top_out=40)
    rows = {r["piece"]: r["usage"] for r in table.collect()}
    assert rows.get("abab") == 30, rows
    assert rows.get("ab", 0) == 0, rows
    # fertility: the dominant word stays WHOLE (exactly 1 piece/word);
    # the rare filler words fragment more — the tokenizer-quality signal
    # the report exists to surface (observed deterministic value: 27
    # pieces over 18 words = 1.5 under this seed vocab)
    docs2 = docs.withColumn(
        "source", F.when(F.col("doc_id") < 100, "rep").otherwise("filler")
    )
    fert = {
        r["source"]: r
        for r in unigram_fertility(docs2, max_vocab=50, n_pieces=40).collect()
    }
    assert fert["rep"]["n_words"] == 30 and fert["rep"]["fertility_ppm"] == 1_000_000, fert
    assert fert["filler"]["fertility_ppm"] == 1_500_000, fert


_PLANTED = [
    _px_label_propagation_two_planted_cliques,
    _px_kneser_ney_stock_phrases_score_low,
    _px_unigram_em_learns_whole_word_piece,
    _px_knn_homophily_pure_and_anti_clusters,
    _px_knn_hubness_planted_hub_histogram,
    _px_patch_stats_ascii_tiles,
    _px_scene_change_single_planted_cut,
    _px_shot_stats_planted_cut_counts,
    _px_flatness_constant_vs_split_payload,
    _px_bm25_precision_disjoint_vocab_sources,
    _px_retrieval_ndcg_perfect_and_rank2,
    _px_sq8_recon_error_exact_grid,
    _px_dedup_quality_canonical_keeps_best_logit,
    _px_hashed_embedding_single_token_doc,
    _px_search_snippets_contain_planted_needle,
    _px_pack_positions_are_prefix_sums,
    _px_hard_negatives_exclude_positives_and_follow_bm25,
    _px_simhash_calibration_identical_docs_at_zero,
    _px_shingle_df_histogram_planted_pair_mass,
    _px_bitext_mining_identical_pair_ranks_first,
    _px_cluster_purity_pure_planted_clusters,
    _px_intrinsic_dimension_line_vs_cube,
    _px_minhash_scurve_theory_column,
    _px_class_separation_gap_exceeds_spread,
    _px_embedding_outliers_finds_planted_point,
    _px_adaptive_quality_keeps_top_three_quarters,
    _px_blocklist_filter_counts_planted_hits,
    _px_dup_cluster_sizes_planted_histogram,
    _px_sample_bias_ppm_arithmetic,
    _px_pack_efficiency_mass_conservation,
    _px_chunk_inflation_invariants,
    _px_band_balance_share_arithmetic,
]


# _PLANTED runs in the pooled-scenarios SIBLING PROCESS since round 8
# (scenarios_sibling_subprocess.py, joined by test_z_scenarios_join.py) —
# the in-suite pool was a ~14 s idle serial block.
