"""Dedup operator properties that the DuckDB oracle gate can't cover:
SimHash pigeonhole completeness vs a brute-force Hamming scan, and
MinHash-LSH recall vs the exact blocked-Jaccard baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import dedup as D
from efficient_llm_data_wrangling_spark.queries.scale import _corpus_with_dups
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _pairs(df):
    return {(r["left_id"], r["right_id"]) for r in df.collect()}


def test_exact_dedup_drops_planted_clones(spark):
    corpus = _corpus_with_dups(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    n_clones = docs.filter(F.col("doc_id") % 7 == 0).count()

    kept = D.drop_exact_duplicates(corpus)
    # every clone collapses onto its original; mutants are distinct texts
    assert corpus.count() - kept.count() == n_clones
    # survivor of each duplicate group is the min id → all originals kept
    orig_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert orig_ids <= kept_ids


def test_simhash_pigeonhole_matches_brute_force(spark):
    """The segment join must find EXACTLY the pairs a full O(n²)
    Hamming scan finds (pigeonhole guarantees no false negatives;
    verification removes false positives)."""
    corpus = _corpus_with_dups(spark, SF_SMOKE).limit(400)
    got = _pairs(D.near_dup_pairs_simhash(corpus, max_hamming=3))

    sim = corpus.select("doc_id", D.simhash64(D.tokens(F.col("text"))).alias("s"))
    a = sim.select(F.col("doc_id").alias("left_id"), F.col("s").alias("sa"))
    b = sim.select(F.col("doc_id").alias("right_id"), F.col("s").alias("sb"))
    brute = (
        a.join(b, F.col("left_id") < F.col("right_id"))
        .filter(D.hamming64(F.col("sa"), F.col("sb")) <= 3)
    )
    assert got == _pairs(brute)


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH(16×4) + exact verification reproduces the exact blocked
    Jaccard pairs on the planted corpus (expected miss prob ≈ 3e-8 at
    J≥0.8 — deterministic equality in practice); precision is exact by
    construction (verification step)."""
    corpus = _corpus_with_dups(spark, SF_SMOKE)
    exact = _pairs(D.ngram_jaccard_pairs(corpus, block_col="lang", threshold=0.8))
    lsh = _pairs(D.near_dup_pairs_minhash(corpus, block_col="lang", threshold=0.8))
    assert lsh == exact
    assert exact  # the planted clones guarantee a non-trivial pair set


def test_minhash_signature_deterministic(spark):
    corpus = _corpus_with_dups(spark, SF_SMOKE).limit(50)
    sig = corpus.select(
        "doc_id",
        D.minhash_signature(D.shingle_hashes32(F.col("text")), 64, seed=42).alias("sig"),
    )
    r1 = {r["doc_id"]: r["sig"] for r in sig.collect()}
    r2 = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert r1 == r2
    assert all(len(v) == 64 for v in r1.values())


def test_minhash_signatures_agg_matches_fold(spark):
    """The codegen'd aggregate signature variant (minhash_signatures —
    measured slower than the fold in the r8 interleaved A/B, kept for
    the shingle-array-too-big-for-one-row regime) must be
    BIT-IDENTICAL to the pipeline fold — same coefficients, same
    formula, min over the same shingle set — at both the 64-lane
    headliner and the 256-lane sweep widths."""
    corpus = _corpus_with_dups(spark, SF_SMOKE).limit(50)
    for num_hashes in (64, 256):
        fold = corpus.select(
            "doc_id",
            D.minhash_signature(
                D.shingle_hashes32(F.col("text")), num_hashes, seed=42
            ).alias("sig"),
        )
        hashed = corpus.select("doc_id", D.shingle_hashes32(F.col("text")).alias("__h32"))
        agg = D.minhash_signatures(hashed, ["doc_id"], "__h32", num_hashes, seed=42, sig_col="sig")
        want = {r["doc_id"]: r["sig"] for r in fold.collect()}
        got = {r["doc_id"]: r["sig"] for r in agg.collect()}
        assert got == want


def test_minhash_candidate_plan_uses_the_fold(spark):
    """The candidate pipeline must compute signatures as the per-row
    zip_with fold — the r8 interleaved A/B measured it fastest (the
    explode+aggregate alternative was 2-2.5× slower and grows with
    data; see minhash_signature's docstring) — i.e. NO per-document
    signature aggregate/exchange before the band explode."""
    corpus = _corpus_with_dups(spark, SF_SMOKE)
    qe = D.minhash_candidate_pairs(corpus)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert "zip_with" in plan
    assert "__m0" not in plan  # no aggregate-lane signature path


def test_minhash_error_calibration_bookkeeping_and_planted_clones(spark):
    """The sketch-calibration report's integer bookkeeping must
    reconcile, and the planted exact clones (identical text ⇒ J=1000,
    identical signature ⇒ est=1000) must all land in the top decile
    with zero error — so the top band's zero-error pair count is
    bounded below by the clone-pair count."""
    from efficient_llm_data_wrangling_spark.queries.scale import (
        minhash_error_calibration,
    )

    rows = {r.jaccard_band: r for r in minhash_error_calibration(spark, SF_SMOKE).collect()}
    assert rows, "calibration report is empty"
    for band, r in rows.items():
        assert 0 <= band <= 9
        assert r.n_over + r.n_under <= r.n_pairs
        assert r.max_abs_err_milli <= r.sum_abs_err_milli <= r.n_pairs * r.max_abs_err_milli
        assert 0 <= r.max_abs_err_milli <= 1000
    clones = (
        load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") % 7 == 0).count()
    )
    top = rows[9]
    zero_err_pairs = top.n_pairs - top.n_over - top.n_under
    assert zero_err_pairs >= clones
    # the sketch must actually err somewhere (it is an estimate)
    assert any(r.sum_abs_err_milli > 0 for r in rows.values())
