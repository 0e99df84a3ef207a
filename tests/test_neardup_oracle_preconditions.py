"""Preconditions of the round-3 value-hash oracle upgrades.

x_neardup_minhash and x_simhash_neardup carry brute-force-Jaccard oracles,
valid iff the LSH candidate stage has recall 1 over every pair the exact
verify keeps.  That holds by a probability argument whose inputs are DATA
properties (near-dup pairs sit at J >= ~0.888, simhash hamming <= ~9); if
the driver regenerates testdata with different dup characteristics, THESE
tests fail with a direct explanation before the correctness gate turns an
oracle mismatch into an opaque hash diff.
"""

from pyspark.sql import functions as F

from dbt_trill_shop_spark.catalog import load_table
from dbt_trill_shop_spark.ext import dedup


def test_minhash_recall1_precondition(spark, sf_dir):
    """Every brute-force pair at J >= 0.5 must hit >= 4 of 16 minhash
    matches (the x_neardup_minhash candidate bar, r=1/b=16/m=4)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    sigs = dedup.minhash_signatures(docs, num_hashes=16)
    cands = dedup.minhash_banded_candidates(
        sigs, num_hashes=16, bands=16, min_band_matches=4
    )
    missed = exact.join(cands, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0, (
        f"{missed} true near-dup pair(s) below the 4-of-16 minhash bar - "
        "regenerated testdata? x_neardup_minhash's oracle is now unsound; "
        "lower min_band_matches or drop the oracle back to rows-only"
    )


def test_simhash_recall1_precondition(spark, sf_dir):
    """Every brute-force pair at J >= 0.85 must be a banded simhash
    candidate within hamming 12 (the x_simhash_neardup candidate bar)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.85).select("id_a", "id_b")
    cands = dedup.simhash_near_duplicates(docs, bands=8, max_hamming=12).select(
        "id_a", "id_b"
    )
    missed = exact.join(cands, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0, (
        f"{missed} true near-dup pair(s) missed by 8-band simhash within "
        "hamming 12 - regenerated testdata? x_simhash_neardup's oracle is "
        "now unsound; raise max_hamming/bands or drop back to rows-only"
    )
