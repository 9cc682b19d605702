"""Contract tests for the retrieval-serving family
(queries/retrieval.py): RAG retrieve→re-rank→pack and contrastive
pair mining. The DuckDB value oracle is the correctness gate; these
pin the semantic invariants a hash compare can't name."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_rag_retrieve_pack_prefix_and_ranking_contract(spark):
    """Per query: ctx_rank is 1..topk dense, cum_tokens is the running
    sum of n_tokens in rank order, in_context is exactly the
    cum<=budget prefix (monotone false-after-true boundary), and
    scores are non-increasing in rank."""
    from efficient_llm_data_wrangling_spark.queries.retrieval import (
        _RAG_BUDGET,
        _RAG_TOPK,
        rag_retrieve_pack,
    )

    rows = rag_retrieve_pack(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, qrows in by_q.items():
        qrows.sort(key=lambda r: r.ctx_rank)
        assert [r.ctx_rank for r in qrows] == list(range(1, len(qrows) + 1))
        assert len(qrows) <= _RAG_TOPK
        cum = 0
        prev_score = None
        seen_out = False
        for r in qrows:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert r.in_context == (cum <= _RAG_BUDGET)
            if not r.in_context:
                seen_out = True
            else:
                # prefix property: never back in after an overflow
                assert not seen_out
            if prev_score is not None:
                assert r.score_micro2 <= prev_score
            prev_score = r.score_micro2
            assert r.doc_id != qid  # the query vector never retrieves itself
    # the budget boundary must actually bite somewhere on this corpus
    assert any(not r.in_context for r in rows)
    assert any(r.in_context for r in rows)


def test_rag_retrieve_pack_candidates_come_from_probed_cells(spark):
    """Every retrieved doc must live in one of its query's nprobe
    nearest codebook cells — the IVF blocking contract."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_NPROBE,
        _assign,
        _fit_codebook,
        _load_vectors,
        _sq_dist_cols,
    )
    from efficient_llm_data_wrangling_spark.queries.retrieval import (
        rag_retrieve_pack,
    )

    vectors = _load_vectors(spark, SF_SMOKE)
    cb = _fit_codebook(vectors)
    cells = {r.vec_id: r.c for r in _assign(vectors, cb).collect()}
    mus = {r.c: r.mu for r in cb.collect()}
    xs = {r.vec_id: r.x for r in vectors.collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    rows = rag_retrieve_pack(spark, SF_SMOKE).collect()
    for r in rows:
        ranked = sorted(mus, key=lambda c: (d2(xs[r.query_id], mus[c]), c))
        assert cells[r.doc_id] in ranked[:_KNNJ_NPROBE]


def test_contrastive_pairs_labels_and_margin_reconcile(spark):
    """Positive/negative label membership, exact distances, and the
    margin/separated bookkeeping all recompute in pure Python."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_PROBES,
        _micro_units,
    )
    from efficient_llm_data_wrangling_spark.queries.retrieval import (
        contrastive_pairs_mining,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    )
    labels = {r.vec_id: r.label for r in emb}
    xs = {r.vec_id: r.x for r in emb}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    rows = contrastive_pairs_mining(spark, SF_SMOKE).collect()
    assert len(rows) == _KNNJ_PROBES
    for r in rows:
        assert r.anchor_label == labels[r.anchor_id]
        assert labels[r.positive_id] == r.anchor_label
        assert labels[r.negative_id] != r.anchor_label
        assert r.positive_id != r.anchor_id
        assert r.positive_d2 == d2(xs[r.anchor_id], xs[r.positive_id])
        assert r.negative_d2 == d2(xs[r.anchor_id], xs[r.negative_id])
        assert r.margin_d2 == r.negative_d2 - r.positive_d2
        assert r.separated == (r.negative_d2 > r.positive_d2)
        # elected minima: no same/different-label vector is closer
        for vid, lab in labels.items():
            if vid == r.anchor_id:
                continue
            d = d2(xs[r.anchor_id], xs[vid])
            if lab == r.anchor_label:
                assert (d, vid) >= (r.positive_d2, r.positive_id)
            else:
                assert (d, vid) >= (r.negative_d2, r.negative_id)


def test_hybrid_fusion_reconciles_with_both_legs(spark):
    """The fused list must be exactly the union of the two top-L leg
    lists: leg ranks must match the standalone BM25 top-k and a pure
    Python dense re-rank, RRF contributions must recompute from the
    ranks, and fused_rank must be the (rrf DESC, doc_id) order."""
    from efficient_llm_data_wrangling_spark.queries.retrieval import (
        _HYB_RRF_K,
        _HYB_TOPL,
        hybrid_retrieval_fusion,
    )
    from efficient_llm_data_wrangling_spark.queries.textquality import bm25_top_docs
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = sorted(
        hybrid_retrieval_fusion(spark, SF_SMOKE).collect(), key=lambda r: r.fused_rank
    )
    assert rows
    # lexical leg == the standalone graded BM25 ranking
    bm = bm25_top_docs(spark, SF_SMOKE).collect()
    lex_order = [r.doc_id for r in bm][:_HYB_TOPL]
    got_lex = {r.doc_id: r.lex_rank for r in rows if r.lex_rank > 0}
    assert got_lex == {d: i + 1 for i, d in enumerate(lex_order)}
    # dense leg == pure-python exact integer dot re-rank vs vec 0
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    import math

    vecs = {
        r.vec_id: [int(math.floor(float(x) * 1000000 + 0.5)) for x in r.embedding]
        for r in emb
    }
    q = vecs[0]
    scored = sorted(
        ((sum(a * b for a, b in zip(v, q)), vid) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:_HYB_TOPL]
    got_den = {r.doc_id: r.dense_rank for r in rows if r.dense_rank > 0}
    assert got_den == {vid: i + 1 for i, (_, vid) in enumerate(scored)}
    # fusion arithmetic + ordering
    for r in rows:
        want = (10**9 // (_HYB_RRF_K + r.lex_rank) if r.lex_rank > 0 else 0) + (
            10**9 // (_HYB_RRF_K + r.dense_rank) if r.dense_rank > 0 else 0
        )
        assert r.rrf_micro == want
        assert r.in_both == (r.lex_rank > 0 and r.dense_rank > 0)
    assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows == sorted(rows, key=lambda r: (-r.rrf_micro, r.doc_id))
    assert len(rows) == len(got_lex) + len(got_den) - sum(1 for r in rows if r.in_both)
    # any doc in both legs must outrank a doc seen by only one leg at
    # equal-or-worse per-leg ranks - the property fusion exists for
    if any(r.in_both for r in rows):
        best_single = min(
            (r.fused_rank for r in rows if not r.in_both), default=None
        )
        best_both = min(r.fused_rank for r in rows if r.in_both)
        assert best_single is None or best_both < len(rows)


def test_ndcg_report_control_monotonicity_and_internal_consistency(spark):
    """The exact policy is the self-validating control (nDCG ≡ 1000);
    ivf2's candidate set is a superset of ivf1's, so per query its
    nDCG / relevant-count / reciprocal-rank pointwise dominate (the
    j-th best of a superset has a better-or-equal total-order key,
    hence better-or-equal graded relevance); every derived column must
    recompute from its parts; and the headline finding must hold:
    blocked-index nDCG exceeds recall@10 because misses concentrate in
    the tail ranks."""
    from efficient_llm_data_wrangling_spark.queries.retrieval import (
        _NDCG_IDCG,
        _NDCG_K,
        retrieval_ndcg_report,
    )

    rows = retrieval_ndcg_report(spark, SF_SMOKE).collect()
    assert rows
    by = {(r.policy, r.query_id): r for r in rows}
    policies = {r.policy for r in rows}
    assert policies == {"exact", "ivf1", "ivf2"}
    qids = {r.query_id for r in rows}
    for r in rows:
        # derived-column consistency
        assert r.ndcg_permille == r.dcg_micro * 1000 // _NDCG_IDCG
        assert r.recall10_permille == r.n_relevant * 1000 // _NDCG_K
        assert 0 <= r.dcg_micro <= _NDCG_IDCG
        assert r.n_relevant <= r.n_retrieved <= _NDCG_K
        if r.policy == "exact":
            assert r.n_retrieved == _NDCG_K
            assert r.dcg_micro == _NDCG_IDCG
            assert r.ndcg_permille == 1000
            assert r.recall10_permille == 1000
            assert r.rr_top1_milli == 1000
    for q in qids:
        r1, r2 = by[("ivf1", q)], by[("ivf2", q)]
        assert r2.ndcg_permille >= r1.ndcg_permille
        assert r2.n_relevant >= r1.n_relevant
        assert r2.rr_top1_milli >= r1.rr_top1_milli
    for pol in ("ivf1", "ivf2"):
        sub = [r for r in rows if r.policy == pol]
        mean_ndcg = sum(r.ndcg_permille for r in sub) / len(sub)
        mean_rec = sum(r.recall10_permille for r in sub) / len(sub)
        assert mean_ndcg > mean_rec, (pol, mean_ndcg, mean_rec)
