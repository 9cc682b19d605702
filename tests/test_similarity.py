"""Similarity-search properties beyond the oracle gate: hyperplane-LSH
recall against brute force, and IVF probed-space optimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import similarity as SIM
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _query_vec(spark, vec_id=0):
    row = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .first()
    )
    return [float(v) for v in row["embedding"]]


def test_brute_force_topk_is_sorted_and_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = _query_vec(spark)
    top = SIM.brute_force_top_k(emb, q, k=10).collect()
    assert len(top) == 10
    sims = [r["cosine"] for r in top]
    assert sims == sorted(sims, reverse=True)
    # vec_id=0 IS the query vector → similarity 1.0 must rank first
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cosine"] - 1.0) < 1e-12


def test_hyperplane_lsh_recall(spark):
    """Candidates within Hamming≤5 of 16 planes, exact re-rank. The
    synthetic embeddings are near-uniform (top cosine ≈ 0.33), the
    hardest case for angular LSH — measured recall@10 is 0.4 with this
    fixed seed/corpus, asserted as a deterministic floor. The query's
    own vector (Hamming 0) must always be found, and every returned
    similarity must match the exact cosine (re-rank is exact)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = _query_vec(spark)
    brute = {r["vec_id"]: r["cosine"] for r in SIM.brute_force_top_k(emb, q, k=10).collect()}
    lsh_rows = SIM.hyperplane_lsh_top_k(emb, q, k=10, n_planes=16, max_hamming=5).collect()
    lsh = {r["vec_id"]: r["cosine"] for r in lsh_rows}
    assert 0 in lsh and abs(lsh[0] - 1.0) < 1e-12  # self-hit guaranteed
    hits = set(brute) & set(lsh)
    assert len(hits) / len(brute) >= 0.4
    for vid in hits:
        assert abs(brute[vid] - lsh[vid]) < 1e-12


def test_ivf_probed_space_optimal(spark):
    """IVF top-k must equal the exact top-k restricted to the probed
    cells (pruning is the approximation; within-probe search exact)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    q = _query_vec(spark, vec_id=1)
    got = [(r["vec_id"], r["cosine"]) for r in SIM.ivf_top_k(emb, cents, q, k=10, n_probe=2).collect()]

    assigned = SIM.assign_ivf_cells(emb, cents)

    # recompute probes the same way the operator does
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    probes = [c[0] for c in sorted(cents, key=lambda c: (-cos(c[1], q), c[0]))[:2]]
    exact = (
        assigned.filter(F.col("cell_id").isin(probes))
        .select("vec_id", SIM.cosine_sim(F.col("embedding"), SIM._as_double_array(q)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
        .collect()
    )
    assert got == [(r["vec_id"], r["cosine"]) for r in exact]
    # vec_id=1 is its own nearest neighbor inside its probed cell
    assert got[0][0] == 1


def test_knn_binary_hamming_replays_in_pure_python(spark):
    """Pure-Python replay of the 1-bit rung at the smoke SF:
    mean-threshold bits, packed words, xor/popcount Hamming, both
    arms' rankings and overlaps — and the structural guarantees (the
    re-rank arm's shortlist is the binary arm's superset, so re-rank
    recall >= standalone recall per probe is NOT implied, but the
    measured aggregate improvement must hold)."""
    from efficient_llm_data_wrangling_spark.queries.scale import (
        _BINQ_C,
        _BINQ_K,
        _BINQ_PROBES,
        knn_binary_hamming,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {
        (r.pid, r.variant): r for r in knn_binary_hamming(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    import math

    x = {
        r.vec_id: [math.floor(float(e) * 1_000_000 + 0.5) for e in r.embedding]
        for r in emb
    }
    vecs = {r.vec_id: [float(e) for e in r.embedding] for r in emb}
    n = len(x)
    dims = 64
    sums = [sum(v[j] for v in x.values()) for j in range(dims)]
    bits = {k: [1 if v[j] * n > sums[j] else 0 for j in range(dims)] for k, v in x.items()}

    def cos(a, b):
        # NOTE: replay uses math.fsum-free left-to-right like the engines
        dot = 0.0
        na = 0.0
        nb = 0.0
        for xa, xb in zip(a, b):
            dot += xa * xb
            na += xa * xa
            nb += xb * xb
        return dot / (math.sqrt(na) * math.sqrt(nb))

    agg_bin, agg_rr = 0, 0
    for pid in range(_BINQ_PROBES):
        ham = {
            k: sum(b1 != b2 for b1, b2 in zip(bits[pid], bits[k]))
            for k in bits
            if k != pid
        }
        order = sorted(ham, key=lambda k: (ham[k], k))
        sl = order[:_BINQ_C]
        bt = order[:_BINQ_K]
        rr = sorted(sl, key=lambda k: (-cos(vecs[pid], vecs[k]), k))[:_BINQ_K]
        ex = sorted(
            (k for k in vecs if k != pid),
            key=lambda k: (-cos(vecs[pid], vecs[k]), k),
        )[:_BINQ_K]
        rb = rows[(pid, f"binary_top{_BINQ_K}")]
        rrw = rows[(pid, f"shortlist{_BINQ_C}_rerank")]
        assert rb.best_neighbor_id == bt[0]
        assert rb.best_hamming == ham[bt[0]]
        assert rb.n_overlap == len(set(bt) & set(ex))
        assert rb.recall_ppm == rb.n_overlap * 1_000_000 // _BINQ_K
        assert rrw.best_neighbor_id == rr[0]
        assert rrw.n_overlap == len(set(rr) & set(ex))
        assert rrw.n_reranked == _BINQ_C and rb.n_reranked == 0
        assert rb.bytes_per_vector == 16
        # the packed-word claim: word-level popcount equals bit compare
        w1p = sum(1 << (j) for j in range(32) if bits[pid][j])
        w1k = sum(1 << (j) for j in range(32) if bits[bt[0]][j])
        w2p = sum(1 << (j) for j in range(32) if bits[pid][j + 32])
        w2k = sum(1 << (j) for j in range(32) if bits[bt[0]][j + 32])
        assert bin(w1p ^ w1k).count("1") + bin(w2p ^ w2k).count("1") == ham[bt[0]]
        agg_bin += rb.n_overlap
        agg_rr += rrw.n_overlap
    # the measured finding: the filter+rerank posture beats standalone
    assert agg_rr > agg_bin
