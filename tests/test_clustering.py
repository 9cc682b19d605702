"""k-means Lloyd iteration: partition/exactness properties plus the
plan shape that makes it scale (broadcast centroids, no window)."""

from __future__ import annotations

import pyspark.sql.functions as F

from efficient_llm_data_wrangling_spark.queries.clustering import (
    _K,
    kmeans_lloyd_embeddings,
)
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_kmeans_partitions_every_vector(spark):
    emb_n = load_table(spark, SF_SMOKE, "embeddings").count()
    out = kmeans_lloyd_embeddings(spark, SF_SMOKE).collect()
    assert sum(r["n_members"] for r in out) == emb_n
    assert len(out) <= _K
    # exact checksum consistency: vec_id_sum over all clusters is the
    # triangular total — every vector counted exactly once
    assert sum(r["vec_id_sum"] for r in out) == emb_n * (emb_n - 1) // 2


def test_kmeans_improves_or_holds_inertia(spark):
    """Lloyd's guarantee: total within-cluster SSE after the update +
    re-assign must not exceed the seed-assignment SSE (exact integer
    distances, so the comparison is exact)."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _assign,
        _micro_units,
        _sq_dist,
        _update,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vectors = emb.select("vec_id", _micro_units(F.col("embedding")).alias("x"))
    seeds = vectors.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("c"), F.col("x").alias("mu")
    )

    def inertia(assigned, centroids):
        return (
            assigned.join(centroids, "c")
            .select(_sq_dist("x", "mu").alias("d"))
            .agg(F.sum("d").alias("t"))
            .collect()[0]["t"]
        )

    a1 = _assign(vectors, seeds)
    mu1 = _update(a1)
    a2 = _assign(vectors, mu1)
    # SSE of the final assignment vs its own centroids <= SSE of the
    # first assignment vs the seed centroids (monotone descent; the
    # micro-unit quantization of the mean can cost at most a rounding
    # term, absorbed by strict improvement on this data)
    assert inertia(a2, mu1) <= inertia(a1, seeds)


def test_ivf_codebook_table_plan(spark):
    """The codebook-as-table ANN path must (a) semi-join assignments
    against the probed cells with a genuine BroadcastHashJoin on
    cell_id, (b) broadcast the codebook TABLE into the assignment
    (BroadcastNestedLoopJoin over C rows — the honest shape of
    score-every-centroid), and (c) contain no O(C) literal centroid
    arrays (the plan must not embed micro-unit vector literals)."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_ivf_codebook_table,
    )

    df = knn_ivf_codebook_table(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # literal-array codebooks embed centroid micro-units as plan
    # literals — a 7-digit integer literal list would appear; the
    # table path must not have any
    import re

    assert not re.search(r"\[-?\d{6,}(,\s*-?\d{6,}){3,}\]", plan), "literal codebook in plan"
    # and it must still compute the right thing: top-1 is the query itself
    rows = df.collect()
    assert rows[0]["vec_id"] == 1 and rows[0]["l2sq_micro"] == 0


def test_kmeans_plan_broadcasts_centroids(spark):
    plan = (
        kmeans_lloyd_embeddings(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan  # argmin must be the combinable min(struct)


def test_semdedup_overfull_cluster_is_aqe_skew_split(spark):
    """semdedup_clustered's docstring argues an over-full cluster in
    the within-cluster pair join "is exactly the AQE skew-join case".
    Prove it: plant one cluster holding ~99% of rows (the shape a bad
    k or a degenerate embedding space produces), run the same
    cluster-keyed self-join, and assert the executed adaptive plan
    actually skew-split it. Local-scale notes baked in: (a) thresholds
    are lowered because skew detection reads COMPRESSED shuffle sizes
    and defaults to 256 MB; (b) the payload must be per-row
    incompressible — a constant pad compresses to nothing and the
    skewed partition never crosses the threshold (found empirically);
    (c) broadcast is disabled so the join stays sort-merge, the only
    shape OptimizeSkewedJoin handles."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        n_skew, n_rest = 4000, 50
        pad = F.concat(
            *[
                F.sha2(F.concat(F.col("vec_id").cast("string"), F.lit(str(i))), 256)
                for i in range(8)
            ]
        )
        rows = (
            spark.range(n_skew)
            .select(F.lit(0).alias("c"), F.col("id").alias("vec_id"))
            .unionAll(
                spark.range(n_rest).select(
                    (F.col("id") % 50 + 1).alias("c"),
                    (F.col("id") + 100000).alias("vec_id"),
                )
            )
        )
        a = rows.select("c", F.col("vec_id").alias("left_id"), pad.alias("pad"))
        b = rows.select("c", F.col("vec_id").alias("rid"))
        j = (
            a.join(b, ["c"])
            .filter(F.col("left_id") < F.col("rid"))
            .agg(F.sum(F.length("pad")).alias("s"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "skewed" in plan  # the AQEShuffleRead split the partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_mmr_diversifies_and_marginals_decrease(spark):
    """Greedy MMR invariants: (a) rank-1 is the pure-relevance argmax,
    (b) marginal scores are non-increasing in rank (each round's
    winner was available earlier with a no-larger penalty), and (c)
    the selection diverges from the pure top-k by relevance — the
    diversity term must actually change the picks on real data."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _MMR_K,
        _dot_int_col,
        _micro_units,
        mmr_diversified_topk,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = sorted(mmr_diversified_topk(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, _MMR_K + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.score_u <= prev.score_u

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vectors = emb.select("vec_id", _micro_units(F.col("embedding")).alias("x"))
    q = vectors.filter(F.col("vec_id") == 0).select(F.col("x").alias("qx"))
    topk_rel = [
        r.vec_id
        for r in vectors.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _dot_int_col("x", "qx").alias("rel_u"))
        .orderBy(F.desc("rel_u"), F.asc("vec_id"))
        .limit(_MMR_K)
        .collect()
    ]
    assert rows[0].vec_id == topk_rel[0]
    assert [r.vec_id for r in rows] != topk_rel


def test_knn_join_semantics(spark):
    """Every vector gets ≤ K neighbors, ranks are 1..n contiguous,
    neighbors share the query's cell, distances are non-decreasing in
    rank with vec_id tie-break, and no vector is its own neighbor."""
    from collections import defaultdict

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        knn_join_within_cells,
    )
    from tests.conftest import SF_SMOKE

    rows = knn_join_within_cells(spark, SF_SMOKE).collect()
    per = defaultdict(list)
    cells = {}
    for r in rows:
        assert r.neighbor_id != r.vec_id
        per[r.vec_id].append(r)
        cells.setdefault(r.vec_id, r.cell_id)
        assert r.cell_id == cells[r.vec_id]
    for vid, nn in per.items():
        nn.sort(key=lambda r: r.nn_rank)
        assert [r.nn_rank for r in nn] == list(range(1, len(nn) + 1))
        assert len(nn) <= _KNNJ_K
        for p, q in zip(nn, nn[1:]):
            assert (p.l2sq_micro, p.neighbor_id) < (q.l2sq_micro, q.neighbor_id)


def test_knn_join_neighbors_are_mutually_co_celled(spark):
    """The neighbor relation must be consistent with one global
    assignment: if b is a's neighbor, then a and b report the same
    cell everywhere they appear as queries."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_join_within_cells,
    )
    from tests.conftest import SF_SMOKE

    rows = knn_join_within_cells(spark, SF_SMOKE).collect()
    cell_of = {r.vec_id: r.cell_id for r in rows}
    for r in rows:
        if r.neighbor_id in cell_of:
            assert cell_of[r.neighbor_id] == r.cell_id


def test_knn_join_plan_is_per_key_window_no_cartesian(spark):
    """The top-k election must be a per-vec_id window (no global
    sort), the cell join an equi-join (no cartesian), and everything
    JVM-side."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_join_within_cells,
    )
    from tests.conftest import SF_SMOKE

    plan = (
        knn_join_within_cells(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partitionBy" not in plan or True  # window spec below
    # the window must be keyed on vec_id, not empty (no single-partition sort)
    assert "Window" in plan and "windowspecdefinition(vec_id" in plan


def test_knn_graph_recall_report_bounds_and_exact_recompute(spark):
    """The recall row must be internally consistent (overlap ≤
    probes×k, ppm = floor arithmetic) and the iterated min-struct
    exact side must equal a brute-force Python recompute of the
    probe neighborhoods."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        _KNNJ_PROBES,
        _micro_units,
        knn_graph_recall_report,
        knn_join_within_cells,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.variant: r for r in knn_graph_recall_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "cell1",
        "probe2",
        "descent1",
        "descent2",
        "probe4",
        "descent1_d8",
        "d8_probe4",
    }
    for row in rows.values():
        assert row.k == _KNNJ_K and row.n_probes == _KNNJ_PROBES
        assert 0 <= row.n_overlap <= _KNNJ_PROBES * _KNNJ_K
        assert row.recall_ppm == row.n_overlap * 1000000 // (_KNNJ_PROBES * _KNNJ_K)
    # probe2's candidate set is a superset of cell1's, so its recall
    # cannot be lower (any exact-top-k member can only be displaced by
    # globally closer vectors, which are themselves exact-top-k);
    # descent1 re-ranks a superset of the probe2 edges (gu keeps every
    # directed probe2 edge), so the same argument chains once more —
    # and again for round 2, whose candidates include round 1's top-k
    assert rows["probe2"].n_overlap >= rows["cell1"].n_overlap
    assert rows["descent1"].n_overlap >= rows["probe2"].n_overlap
    assert rows["descent2"].n_overlap >= rows["descent1"].n_overlap
    # r9 rungs, same superset argument along their own chains: probe4
    # probes a superset of probe2's cells (index side unchanged), and
    # the d8 seed keeps top-8 ⊇ top-3 of the SAME multiprobe ranking
    # so the d8 descent round's candidate pool contains descent1's
    assert rows["probe4"].n_overlap >= rows["probe2"].n_overlap
    assert rows["descent1_d8"].n_overlap >= rows["descent1"].n_overlap
    # and the r9 verdict gate, measured STRICT on this corpus at both
    # sf0.001 and sf0.01: each new knob clears the converged-descent
    # ceiling (descent2) — the reason the rungs exist
    assert rows["probe4"].n_overlap > rows["descent2"].n_overlap
    assert rows["descent1_d8"].n_overlap > rows["descent2"].n_overlap
    # the combined rung's candidate pool contains both single-knob
    # rungs' pools (top-8 of the 4-probe ranking ⊇ top-8 of the
    # 2-probe ranking and ⊇ top-3 of the 4-probe ranking), so it can
    # never recall less — and measured STRICT on this corpus: the two
    # build knobs compound (83.3%/83.3% → 97.9% at sf0.01) where the
    # serving levers overlapped
    assert rows["d8_probe4"].n_overlap >= rows["probe4"].n_overlap
    assert rows["d8_probe4"].n_overlap >= rows["descent1_d8"].n_overlap
    assert rows["d8_probe4"].n_overlap > rows["descent1_d8"].n_overlap
    row = rows["cell1"]

    # brute-force the exact neighborhoods in Python and recount
    vecs = {
        r.vec_id: r.x
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    }
    exact = set()
    for pid in range(_KNNJ_PROBES):
        px = vecs[pid]
        cand = sorted(
            (sum((a - b) * (a - b) for a, b in zip(x, px)), vid)
            for vid, x in vecs.items()
            if vid != pid
        )[:_KNNJ_K]
        exact.update((pid, vid) for _, vid in cand)
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in knn_join_within_cells(spark, SF_SMOKE).collect()
        if r.vec_id < _KNNJ_PROBES
    }
    assert row.n_overlap == len(exact & approx)


def test_descent_convergence_accounting(spark):
    """The convergence rows must be internally exact (churn is floor
    permille of new/total) and the edge churn must not RISE between
    rounds on the smoke corpus — the falling update rate is the
    Dong-2011 stopping signal the query exists to report."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_graph_descent_convergence,
    )
    from tests.conftest import SF_SMOKE

    rows = {
        r.round: r for r in knn_graph_descent_convergence(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert 0 <= r.new_edges <= r.n_edges
        assert r.churn_permille == r.new_edges * 1000 // r.n_edges
    assert rows[2].churn_permille <= rows[1].churn_permille


def test_greedy_search_descends_and_distances_reconcile(spark):
    """Every probe's walk must respect the greedy contract: bounded
    strictly-descending moves, a final vertex whose exact integer
    distance (recomputed in Python) equals final_l2sq, the entry
    vertex kept only when no move improved, and recall bookkeeping in
    floor ppm against k."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _GREEDY_ENTRY,
        _GREEDY_HOPS,
        _KNNJ_K,
        _KNNJ_PROBES,
        _micro_units,
        knn_graph_greedy_search,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = knn_graph_greedy_search(spark, SF_SMOKE).collect()
    assert len(rows) == _KNNJ_PROBES
    vecs = {
        r.vec_id: r.x
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    moved_total = 0
    for r in rows:
        assert r.entry_id == _GREEDY_ENTRY
        assert 0 <= r.n_moves <= _GREEDY_HOPS
        assert r.final_l2sq == d2(vecs[r.pid], vecs[r.final_vertex])
        if r.n_moves == 0:
            assert r.final_vertex == _GREEDY_ENTRY
        else:
            # strict descent: any move ends strictly closer than entry
            assert r.final_l2sq < d2(vecs[r.pid], vecs[_GREEDY_ENTRY])
        assert 0 <= r.n_overlap <= _KNNJ_K
        assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        moved_total += r.n_moves
    assert moved_total > 0  # the walk must actually go somewhere


def test_search_ladder_monotone_and_bookkeeping_holds(spark):
    """The three-rung search ladder on the same round-1 graph must be
    internally consistent and monotone on the deterministic smoke
    corpus: beam's best touched vertex is never FARTHER than greedy's
    final vertex per probe (the beam frontier keeps the global best
    touched, so widening the frontier cannot lose ground), total
    exact-neighbor overlap is non-decreasing greedy → beam →
    IVF-seeded (each lever — width, then entry — buys recall), every
    best_l2sq equals the exact distance recomputed in Python, the
    seeded entries land in the probe's own cell (never a probe, by
    construction), and recall is floor ppm against k."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_WIDTH,
        _GREEDY_ENTRY,
        _KNNJ_K,
        _KNNJ_PROBES,
        _micro_units,
        knn_graph_beam_search,
        knn_graph_greedy_search,
        knn_graph_ivf_seeded_search,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    beam = {r.pid: r for r in knn_graph_beam_search(spark, SF_SMOKE).collect()}
    greedy = {r.pid: r for r in knn_graph_greedy_search(spark, SF_SMOKE).collect()}
    seeded = {
        r.pid: r for r in knn_graph_ivf_seeded_search(spark, SF_SMOKE).collect()
    }
    assert set(beam) == set(greedy) == set(seeded)
    assert len(beam) == _KNNJ_PROBES
    vecs = {
        r.vec_id: r.x
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for pid in beam:
        for r in (beam[pid], seeded[pid]):
            assert r.beam == _BEAM_WIDTH and r.n_hops == _BEAM_HOPS
            assert r.n_touched >= 1  # the entry vertex is always touched
            assert r.best_l2sq == d2(vecs[pid], vecs[r.best_vertex])
            assert 0 <= r.n_overlap <= _KNNJ_K
            assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert beam[pid].entry_id == _GREEDY_ENTRY
        assert beam[pid].best_l2sq <= greedy[pid].final_l2sq
        # seeded entries are corpus members, never probes (medoid
        # election excludes vec_id < probes; fallback is the global
        # entry, itself >= probes)
        assert seeded[pid].entry_id >= _KNNJ_PROBES
    tot = lambda d: sum(r.n_overlap for r in d.values())  # noqa: E731
    assert tot(greedy) <= tot(beam) <= tot(seeded)


def test_greedy_cands_checkpoint_variants_bit_identical(spark):
    """Both hop-candidate checkpoint variants of the greedy walk must
    return the exact same rows — the A/B that settled the r8 verdict's
    trim hypothesis (refuted: off/on median 1.049 over 10 interleaved
    pairs at sf0.1; checkpoint stays ON) is only valid evidence if the
    toggle is purely physical."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _greedy_report,
    )
    from tests.conftest import SF_SMOKE

    on = {tuple(r) for r in _greedy_report(spark, SF_SMOKE, True).collect()}
    off = {tuple(r) for r in _greedy_report(spark, SF_SMOKE, False).collect()}
    assert on == off


def test_degree8_serving_rungs_exceed_every_k3_lever(spark):
    """The r9 degree-8 rungs must close the serving ladder on the
    deterministic smoke corpus: the fixed-entry beam walk over the
    degree-8 graph STRICTLY beats the identical walk over the k=3
    graph (the build-degree lever, measured 1 → 5 → … → 27 total
    overlap at sf0.001), and the capstone (IVF-seeded entries + the
    same walk + the same degree-8 graph) STRICTLY exceeds every
    single-lever rung — the VERDICT r9 acceptance gate. Bookkeeping
    (beam/hops fields, ppm floor, exact best_l2sq recompute, seeded
    entries never probes) must hold on the new rungs too."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_WIDTH,
        _GREEDY_ENTRY,
        _KNNJ_K,
        _KNNJ_PROBES,
        _micro_units,
        knn_graph_beam_search,
        knn_graph_beam_search_degree8,
        knn_graph_ivf_seeded_search,
        knn_graph_serving_capstone,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    beam3 = {r.pid: r for r in knn_graph_beam_search(spark, SF_SMOKE).collect()}
    seeded3 = {
        r.pid: r for r in knn_graph_ivf_seeded_search(spark, SF_SMOKE).collect()
    }
    beam8 = {
        r.pid: r for r in knn_graph_beam_search_degree8(spark, SF_SMOKE).collect()
    }
    cap = {r.pid: r for r in knn_graph_serving_capstone(spark, SF_SMOKE).collect()}
    assert set(beam8) == set(cap) == set(beam3)
    assert len(beam8) == _KNNJ_PROBES
    vecs = {
        r.vec_id: r.x
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for pid in beam8:
        for r in (beam8[pid], cap[pid]):
            assert r.beam == _BEAM_WIDTH and r.n_hops == _BEAM_HOPS
            assert r.n_touched >= 1
            assert r.best_l2sq == d2(vecs[pid], vecs[r.best_vertex])
            assert 0 <= r.n_overlap <= _KNNJ_K
            assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert beam8[pid].entry_id == _GREEDY_ENTRY
        # capstone entries are IVF medoids: corpus members, never probes
        assert cap[pid].entry_id >= _KNNJ_PROBES
    tot = lambda d: sum(r.n_overlap for r in d.values())  # noqa: E731
    # the degree lever alone strictly beats the k=3 walk; the composed
    # capstone strictly exceeds EVERY single-lever rung (greedy is
    # ≤ beam3 by the ladder test, so beam3/seeded3/beam8 cover all)
    assert tot(beam8) > tot(beam3)
    assert tot(cap) > max(tot(beam3), tot(seeded3), tot(beam8))


def test_insert_batch_edges_contract_and_recall_floor(spark):
    """Inserted edges must respect the maintenance contract: every
    batch vector (vec_id % mod == rem) gets exactly k edges with
    contiguous ranks ordered by exact distance (recomputed in
    Python), every neighbor is a BASE member (the batch never links
    to itself), and edge recall vs the exact base neighbors clears
    the single-cell floor (the candidate structure is one cell plus
    one graph hop, so it must land between the cell1 and probe2
    build rungs — ≥40% leaves noise margin under determinism)."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _INS_MOD,
        _INS_REM,
        _KNNJ_K,
        _micro_units,
        knn_graph_insert_batch,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = knn_graph_insert_batch(spark, SF_SMOKE).collect()
    vecs = {
        r.vec_id: r.x
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _micro_units(F.col("embedding")).alias("x"))
        .collect()
    }
    base = {v for v in vecs if v % _INS_MOD != _INS_REM}
    new = {v for v in vecs if v % _INS_MOD == _INS_REM}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    per = {}
    for r in rows:
        assert r.vec_id in new and r.neighbor_id in base
        assert r.l2sq_micro == d2(vecs[r.vec_id], vecs[r.neighbor_id])
        per.setdefault(r.vec_id, []).append((r.nn_rank, r.l2sq_micro, r.neighbor_id))
    assert set(per) == new  # every batch vector got edges
    hit = 0
    for nv, es in per.items():
        es.sort()
        assert [rk for rk, _, _ in es] == list(range(1, _KNNJ_K + 1))
        # ranks ordered by (distance, id) — the exact re-rank contract
        assert es == sorted(es, key=lambda e: (e[1], e[2]))
        exact = {
            vid
            for _, vid in sorted((d2(vecs[nv], vecs[b]), b) for b in base)[:_KNNJ_K]
        }
        hit += len(exact & {nb for _, _, nb in es})
    assert hit / (len(new) * _KNNJ_K) >= 0.40


def test_dim_truncation_control_and_bounds(spark):
    """The d=64 row is the self-validating control (recall 100% by
    construction); every row stays inside [0, probes×k]; and the
    report exercises a real trade-off (some truncation below full
    recall exists on this corpus)."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        _KNNJ_PROBES,
        _TRUNC_DIMS,
        embedding_dim_truncation_report,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.dims: r for r in embedding_dim_truncation_report(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_TRUNC_DIMS)
    cap = _KNNJ_PROBES * _KNNJ_K
    for r in rows.values():
        assert 0 <= r.n_overlap <= cap
        assert r.recall_ppm == r.n_overlap * 1000000 // cap
    assert rows[64].n_overlap == cap  # control row
    assert rows[8].n_overlap < cap  # 8 dims must actually lose something


def test_pairwise_distance_is_unrolled_not_fold(spark):
    """The pairwise-join hot paths must compute distances as the
    unrolled 64-term expression, never the aggregate/zip_with fold:
    the fold dispatches its lambda per element per row and measured
    3.5x slower on 1M 64-dim pairs (8.4 s vs 2.4 s at sf0.1) with
    bit-identical sums. The one legitimate zip_with left in these
    plans would be a regression."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_join_multiprobe,
        knn_join_within_cells,
    )

    for fn in (knn_join_within_cells, knn_join_multiprobe):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "zip_with" not in plan, f"{fn.__name__} fell back to the fold distance"


def test_perceptron_matches_pure_python_replay(spark):
    """Engine-vs-oracle agreement cannot catch a bug both engines
    share (the BPE self-overlap lesson): replay the batch-perceptron
    rounds in plain Python over the collected corpus and compare every
    reported checksum. Also pins the classic first-round property
    (w=0 ⇒ margin 0 ⇒ every row misclassified)."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _DIMS,
        _PCT_ROUNDS,
        _micro_units,
        perceptron_train_rounds,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    data = [
        (list(r.x), 1 if r.label == 0 else -1)
        for r in emb.select(
            _micro_units(F.col("embedding")).alias("x"), "label"
        ).collect()
    ]
    w, b = [0] * _DIMS, 0
    expect = []
    for r in range(1, _PCT_ROUNDS + 1):
        mis = [(x, y) for x, y in data if y * (sum(wj * xj for wj, xj in zip(w, x)) + b) <= 0]
        for j in range(_DIMS):
            w[j] += sum(y * x[j] for x, y in mis)
        b += sum(y for _, y in mis)
        expect.append((r, len(mis), b, sum(w), sum(abs(v) for v in w)))

    got = [
        (r.round, r.n_misclassified, r.b_after, r.w_sum_after, r.w_abs_sum_after)
        for r in sorted(perceptron_train_rounds(spark, SF_SMOKE).collect(), key=lambda r: r.round)
    ]
    assert got == expect
    assert got[0][1] == len(data)  # round 1: every row misclassified


def test_perceptron_holdout_reconciles(spark):
    """Holdout invariants: non-empty test split, counts bounded,
    exact permille arithmetic, and the majority baseline matching a
    direct recount of the test labels."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        perceptron_holdout_accuracy,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    r = perceptron_holdout_accuracy(spark, SF_SMOKE).collect()[0]
    assert r.n_test > 0
    assert 0 <= r.n_correct <= r.n_test
    assert r.acc_permille == r.n_correct * 1000 // r.n_test
    assert r.majority_permille == r.n_correct_majority * 1000 // r.n_test
    # recount the majority baseline directly: test labels vs the
    # train-majority class (train skews negative: label != 0 dominates)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    bucket = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1),
    ) - 1
    test_neg = emb.filter(~(bucket < 12)).filter(F.col("label") != 0).count()
    assert r.n_correct_majority == test_neg


def test_pca_power_iteration_matches_python_replay(spark):
    """Replay the integer power iteration exactly in Python (ints for
    every sum/product, IEEE doubles for the three floor-divisions) and
    compare the full trace — the engine-shared-formula-bug guard the
    perceptron test establishes, applied to the linear-algebra loop."""
    import math

    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _DIMS,
        _PCA_DOWN,
        _PCA_ROUNDS,
        _PCA_SCALE,
        _micro_units,
        pca_power_iteration,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    xs = [
        list(r.x)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select(_micro_units(F.col("embedding")).alias("x"))
        .collect()
    ]
    n = len(xs)
    mu = [math.floor(sum(row[j] for row in xs) / n) for j in range(_DIMS)]
    xc = [[row[j] - mu[j] for j in range(_DIMS)] for row in xs]
    # per-product scale-down BEFORE the sum (r8 overflow fix): each
    # floor(va*vb / DOWN) is exact in a double, and the running sum
    # stays int64-sized at any corpus size
    gram = [
        [
            sum(math.floor(row[i] * row[j] / _PCA_DOWN) for row in xc)
            for j in range(_DIMS)
        ]
        for i in range(_DIMS)
    ]
    v = [_PCA_SCALE] * _DIMS
    expect = []
    for r in range(1, _PCA_ROUNDS + 1):
        u = [sum(gram[i][j] * v[j] for j in range(_DIMS)) for i in range(_DIMS)]
        mx = max(abs(x) for x in u)
        d = max(mx // _PCA_SCALE, 1)
        v = [math.floor(x / d) for x in u]
        expect.append((r, mx, sum(v), sum(abs(x) for x in v)))

    got = [
        (r.round, r.max_abs_u, r.v_sum, r.v_abs_sum)
        for r in sorted(pca_power_iteration(spark, SF_SMOKE).collect(), key=lambda r: r.round)
    ]
    assert got == expect


def test_assign_cells_narrow_vector_fails_loudly(spark):
    """A vector narrower than the plumbed dims must raise, not elect
    an arbitrary cell: getItem past the end returns NULL, so without
    the coalesce(raise_error) guard the min(struct) would silently
    pick whichever centroid happened to sort first (r8 ADVICE fix)."""
    import pytest

    from efficient_llm_data_wrangling_spark.operators import similarity as SIM

    vecs = spark.createDataFrame(
        [(1, [1, 2, 3])], "vec_id long, x array<long>"
    )
    cb = spark.createDataFrame([(0, [0, 0, 0, 0])], "c long, mu array<long>")
    # loud either way: under ANSI (Spark 4 default) the out-of-range
    # getItem raises INVALID_ARRAY_INDEX before the guard; with ANSI
    # off it yields NULL and the coalesce(raise_error) guard fires
    with pytest.raises(Exception, match="narrower than dims|INVALID_ARRAY_INDEX"):
        SIM.assign_cells_by_codebook(vecs, cb, dims=4).collect()
    # matching widths at the plumbed dims still assign fine
    ok = SIM.assign_cells_by_codebook(
        vecs, cb.select("c", F.slice("mu", 1, 3).alias("mu")), dims=3
    ).collect()
    assert ok[0]["cell_id"] == 0


def test_micro_units_out_of_bounds_fails_loudly_both_ansi_modes(spark):
    """A raw coordinate outside +/-2.0 breaks the int64 bounds analyses
    every hot kernel documents; under the session's non-ANSI posture a
    downstream overflow would WRAP silently, so the ingestion transform
    must raise in BOTH ANSI modes (VERDICT r12 item 6)."""
    import pytest

    from efficient_llm_data_wrangling_spark.queries.clustering import _micro_units

    bad = spark.createDataFrame([(1, [0.5, 2.5])], "vec_id long, embedding array<double>")
    good = spark.createDataFrame([(1, [0.5, -1.999])], "vec_id long, embedding array<double>")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            with pytest.raises(Exception, match="micro_units"):
                bad.select(_micro_units(F.col("embedding")).alias("x")).collect()
            ok = good.select(_micro_units(F.col("embedding")).alias("x")).collect()
            assert ok[0]["x"] == [500000, -1999000]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_serving_beam8_widens_and_dominates_capstone(spark):
    """The width-8 rung must be the same walk as the capstone with
    only the frontier widened: identical entry vertices per probe,
    strictly more touched corpus on average, strictly higher mean
    recall on this deterministic corpus (the measured 34.4% → 52.1%),
    and per-row bookkeeping (beam/hops/recall formula) consistent."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_W8,
        _BEAM_WIDTH,
        _KNNJ_K,
        _KNNJ_PROBES,
        knn_graph_serving_beam8,
        knn_graph_serving_capstone,
    )
    from tests.conftest import SF_SMOKE

    wide = {r.pid: r for r in knn_graph_serving_beam8(spark, SF_SMOKE).collect()}
    base = {r.pid: r for r in knn_graph_serving_capstone(spark, SF_SMOKE).collect()}
    assert len(wide) == len(base) == _KNNJ_PROBES
    for pid, r in wide.items():
        assert r.beam == _BEAM_W8
        assert base[pid].beam == _BEAM_WIDTH
        assert r.n_hops == _BEAM_HOPS
        # same seeding: entry vertices are identical per probe
        assert r.entry_id == base[pid].entry_id
        assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert 0 <= r.n_overlap <= _KNNJ_K
        # a wider frontier never touches less from the same entry
        assert r.n_touched >= base[pid].n_touched
    mean_wide = sum(r.recall_ppm for r in wide.values()) / len(wide)
    mean_base = sum(r.recall_ppm for r in base.values()) / len(base)
    assert mean_wide > mean_base
    tw = sum(r.n_touched for r in wide.values()) / len(wide)
    tb = sum(r.n_touched for r in base.values()) / len(base)
    assert tw > tb


def test_serving_best_build_isolates_walk_locality(spark):
    """The best-build rung must be the beam8 walk with only the graph
    swapped (same width/hops/grading; entries may differ only through
    the shared fit, so they are identical per probe), and the r9
    finding must hold on the deterministic corpus: the 97.9%-build
    graph does NOT lift serving recall past the walk-locality
    ceiling — mean recall stays within noise of the 83.3%-build walk
    rather than tracking the +14.6pt build gap."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_W8,
        _KNNJ_K,
        _KNNJ_PROBES,
        knn_graph_serving_beam8,
        knn_graph_serving_best_build,
    )
    from tests.conftest import SF_SMOKE

    best = {r.pid: r for r in knn_graph_serving_best_build(spark, SF_SMOKE).collect()}
    beam8 = {r.pid: r for r in knn_graph_serving_beam8(spark, SF_SMOKE).collect()}
    assert len(best) == len(beam8) == _KNNJ_PROBES
    for pid, r in best.items():
        assert r.beam == _BEAM_W8
        assert r.n_hops == _BEAM_HOPS
        # same codebook fit -> same IVF entry routing per probe
        assert r.entry_id == beam8[pid].entry_id
        assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert 0 <= r.n_overlap <= _KNNJ_K
    mean_best = sum(r.recall_ppm for r in best.values()) / len(best)
    mean_b8 = sum(r.recall_ppm for r in beam8.values()) / len(beam8)
    # the finding: build quality past 83.3% buys ~nothing for this
    # walk (sf0.01: 52.1% -> 50.0%); pin "no big lift AND no collapse"
    # so a regression in either direction (a walk bug collapsing
    # recall, or an oracle/code drift suddenly 'improving' it) fails
    assert abs(mean_best - mean_b8) <= 150_000, (mean_best, mean_b8)


def test_beam16_rung_and_frontier_reconcile(spark):
    """r10 walk-locality rung + frontier acceptance table, pinned
    together so the frontier can never drift from the rungs it
    tabulates: (a) the width-16 rung is the beam8 walk with only the
    frontier widened (identical per-probe entries, never fewer touched
    vertices, strictly higher mean recall — the measured 52.1% → 86.5%
    at sf0.01); (b) every frontier row's sums reconcile EXACTLY with
    the corresponding graded rung's per-probe rows (capstone/beam8/
    beam16 re-collected here); (c) the frontier's own bookkeeping
    (row count, key uniqueness, integer recall/touched formulas, width
    monotonicity, per-build edge-count consistency) holds."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_W8,
        _BEAM_W16,
        _BEAM_WIDTH,
        _FRONTIER_GRID,
        _KNNJ_K,
        _KNNJ_PROBES,
        ann_frontier_report,
        knn_graph_serving_beam8,
        knn_graph_serving_beam16,
        knn_graph_serving_capstone,
    )
    from tests.conftest import SF_SMOKE

    w16 = {r.pid: r for r in knn_graph_serving_beam16(spark, SF_SMOKE).collect()}
    w8 = {r.pid: r for r in knn_graph_serving_beam8(spark, SF_SMOKE).collect()}
    w4 = {r.pid: r for r in knn_graph_serving_capstone(spark, SF_SMOKE).collect()}
    assert len(w16) == len(w8) == len(w4) == _KNNJ_PROBES
    for pid, r in w16.items():
        assert r.beam == _BEAM_W16 and r.n_hops == _BEAM_HOPS
        assert r.entry_id == w8[pid].entry_id  # same IVF seeding
        assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert r.n_touched >= w8[pid].n_touched
    mean16 = sum(r.recall_ppm for r in w16.values()) / len(w16)
    mean8 = sum(r.recall_ppm for r in w8.values()) / len(w8)
    assert mean16 > mean8

    rows = ann_frontier_report(spark, SF_SMOKE).collect()
    assert len(rows) == len(_FRONTIER_GRID) == 13
    keyed = {(r.build, r.serve, r.beam, r.n_hops): r for r in rows}
    assert len(keyed) == 13  # (build, serve, beam, hops) is unique
    for r in rows:
        assert r.n_probes == _KNNJ_PROBES
        assert r.recall_ppm == r.sum_overlap * 1000000 // (_KNNJ_K * r.n_probes)
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert 0 <= r.sum_overlap <= _KNNJ_K * r.n_probes

    def reconcile(frow, rung_rows):
        assert frow.sum_overlap == sum(x.n_overlap for x in rung_rows.values())
        assert frow.sum_touched == sum(x.n_touched for x in rung_rows.values())

    reconcile(keyed[("d8", "ivf_seeded", _BEAM_WIDTH, _BEAM_HOPS)], w4)
    reconcile(keyed[("d8", "ivf_seeded", _BEAM_W8, _BEAM_HOPS)], w8)
    reconcile(keyed[("d8", "ivf_seeded", _BEAM_W16, _BEAM_HOPS)], w16)
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_graph_serving_pruned,
    )
    pruned = {r.pid: r for r in knn_graph_serving_pruned(spark, SF_SMOKE).collect()}
    reconcile(keyed[("d8pr", "ivf_seeded", _BEAM_W8, _BEAM_HOPS)], pruned)
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        knn_graph_serving_adc,
    )
    adc = {r.pid: r for r in knn_graph_serving_adc(spark, SF_SMOKE).collect()}
    reconcile(keyed[("d8", "adc_w16", _BEAM_W16, _BEAM_HOPS)], adc)
    # the ADC row must navigate (no collapse) and stay in the same
    # band as its uncompressed twin; the sf0.01 measurement (69.8% vs
    # 86.5%, the ~16pt navigation loss) lives in the rung docstring —
    # at THIS 50-vector smoke corpus the two walks are noise-level
    # apart and ADC can even edge ahead (71 vs 69 overlap here: its
    # rerouted beam touched 115 more vertices), so the pin is a band,
    # not a one-sided claim
    adc_row = keyed[("d8", "adc_w16", _BEAM_W16, _BEAM_HOPS)]
    unc_row = keyed[("d8", "ivf_seeded", _BEAM_W16, _BEAM_HOPS)]
    assert adc_row.sum_overlap > 0
    assert adc_row.sum_overlap >= unc_row.sum_overlap // 2
    assert adc_row.sum_overlap <= unc_row.sum_overlap + 8
    # the hop-recovery probe: deepening the compressed walk never
    # loses touched vertices or recall vs its 4-hop twin
    deep = keyed[("d8", "adc_w16", _BEAM_W16, 10)]
    assert deep.sum_touched >= adc_row.sum_touched
    assert deep.sum_overlap >= adc_row.sum_overlap
    # the prune row carries the measured negative: never above the
    # unpruned d8 walk at the same width
    assert (
        keyed[("d8pr", "ivf_seeded", _BEAM_W8, _BEAM_HOPS)].sum_overlap
        <= keyed[("d8", "ivf_seeded", _BEAM_W8, _BEAM_HOPS)].sum_overlap
    )

    # width monotone in both axes on the d8 seeded 4-hop ladder
    ladder = [
        keyed[("d8", "ivf_seeded", b, _BEAM_HOPS)] for b in (4, 8, 16, 32)
    ]
    for lo, hi in zip(ladder, ladder[1:]):
        assert hi.sum_touched >= lo.sum_touched
        assert hi.sum_overlap >= lo.sum_overlap
    # deeper hops never lose touched vertices at the same width
    assert (
        keyed[("d8", "ivf_seeded", _BEAM_W16, 10)].sum_touched
        >= keyed[("d8", "ivf_seeded", _BEAM_W16, _BEAM_HOPS)].sum_touched
    )
    # one edge count per build; denser builds carry more edges
    per_build = {}
    for r in rows:
        per_build.setdefault(r.build, set()).add(r.build_edges)
    assert all(len(v) == 1 for v in per_build.values())
    assert next(iter(per_build["k3"])) < next(iter(per_build["d8"]))


def test_serving_pruned_is_beam8_walk_and_negative_finding_holds(spark):
    """The RobustPrune rung must be the beam8 walk with only the graph
    swapped (same IVF entries per probe, same width/hops/grading), and
    the measured NEGATIVE must hold on the deterministic corpus: the
    alpha=1 (RNG-rule) pruned graph never LIFTS mean serving recall
    over the unpruned degree-8 walk (sf0.01: 52.1% → 47.9%; sf0.001:
    53.1% → 45.8%) — pinned two-sided-ish (no lift AND no collapse) so
    either a prune bug destroying the graph or a drift 'improving' the
    finding fails loudly."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _BEAM_W8,
        _KNNJ_K,
        _KNNJ_PROBES,
        knn_graph_serving_beam8,
        knn_graph_serving_pruned,
    )
    from tests.conftest import SF_SMOKE

    pr = {r.pid: r for r in knn_graph_serving_pruned(spark, SF_SMOKE).collect()}
    b8 = {r.pid: r for r in knn_graph_serving_beam8(spark, SF_SMOKE).collect()}
    assert len(pr) == len(b8) == _KNNJ_PROBES
    for pid, r in pr.items():
        assert r.beam == _BEAM_W8 and r.n_hops == _BEAM_HOPS
        assert r.entry_id == b8[pid].entry_id  # same shared-fit seeding
        assert r.recall_ppm == r.n_overlap * 1000000 // _KNNJ_K
        assert 0 <= r.n_overlap <= _KNNJ_K
    mean_pr = sum(r.recall_ppm for r in pr.values()) / len(pr)
    mean_b8 = sum(r.recall_ppm for r in b8.values()) / len(b8)
    # the finding: pruning never lifts; and the pruned graph still
    # serves (no collapse below half the unpruned walk's recall)
    assert mean_pr <= mean_b8, (mean_pr, mean_b8)
    assert mean_pr >= mean_b8 * 0.5, (mean_pr, mean_b8)


def test_ivf_drift_report_reconciles_and_is_bounded(spark):
    """Drift-report invariants recomputed from the slices themselves:
    cells partition both slices exactly (counts sum to the split
    sizes), shares/drift/means follow the integer formulas, the alert
    predicate is exactly the stated disjunction, and the codebook fits
    on the OLD slice only (its k-row output covers every assignment)."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _DRIFT_OLD_BUCKETS,
        _DRIFT_QERR_DEN,
        _DRIFT_QERR_NUM,
        _DRIFT_SHARE_PERMILLE,
        _DRIFT_Z2,
        _K,
        knn_ivf_drift_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    import hashlib

    rows = knn_ivf_drift_report(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= _K
    ids = [r.vec_id for r in load_table(spark, SF_SMOKE, "embeddings").select("vec_id").collect()]
    t_old = sum(
        1 for v in ids
        if int(hashlib.md5(str(v).encode()).hexdigest()[0], 16) < _DRIFT_OLD_BUCKETS
    )
    t_new = len(ids) - t_old
    assert sum(r.n_old for r in rows) == t_old
    assert sum(r.n_new for r in rows) == t_new
    for r in rows:
        assert r.share_old_permille == r.n_old * 1000 // t_old
        assert r.share_new_permille == r.n_new * 1000 // t_new
        assert r.drift_permille == abs(r.share_new_permille - r.share_old_permille)
        if r.n_old == 0:
            assert r.qerr_old_mean == -1
        if r.n_new == 0:
            assert r.qerr_new_mean == -1
        p_pm = (r.n_old + r.n_new) * 1000 // (t_old + t_new)
        want_noise = (_DRIFT_Z2 * p_pm * (1000 - p_pm)) // max(t_old, 1) + (
            _DRIFT_Z2 * p_pm * (1000 - p_pm)
        ) // max(t_new, 1)
        assert r.occ_noise_permille2 == want_noise
        expect_alert = (
            r.drift_permille >= _DRIFT_SHARE_PERMILLE
            and r.drift_permille**2 > r.occ_noise_permille2
        ) or (
            r.qerr_old_mean > 0
            and r.qerr_new_mean > 0
            and r.qerr_new_mean * _DRIFT_QERR_DEN > r.qerr_old_mean * _DRIFT_QERR_NUM
        )
        assert r.alert == expect_alert
    # the md5 split is stationary by construction: with the bar sized
    # to the binomial noise, the drift-free corpus must read QUIET
    assert not any(r.alert for r in rows)


def test_ivf_drift_planted_skew_still_alerts(spark):
    """The 4σ-scaled occupancy bar must stay SENSITIVE: feed the
    production drift logic (the _drift_frame helper the query itself
    calls) a new slice where one cell's arriving mass is tripled —
    real drift, not sampling noise — and demand the skewed cell
    alerts while the stationary twin of the same frames stays quiet
    on the occupancy axis."""
    from pyspark.sql import functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _DRIFT_OLD_BUCKETS,
        _assign,
        _drift_frame,
        _K,
        _load_vectors,
        _update,
    )
    from tests.conftest import SF_SMOKE

    vectors = _load_vectors(spark, SF_SMOKE)
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1),
        )
        - 1
    )
    old = vectors.filter(bucket < _DRIFT_OLD_BUCKETS).localCheckpoint()
    new = vectors.filter(bucket >= _DRIFT_OLD_BUCKETS).localCheckpoint()

    # which cell will we skew? assign the new slice with the SAME fit
    # the helper performs and pick the most populous cell
    seeds = (
        old.orderBy("vec_id")
        .limit(_K)
        .select(F.col("vec_id").alias("c"), F.col("x").alias("mu"))
    )
    cb = _update(_assign(old, seeds)).localCheckpoint()
    counts = _assign(new, cb).groupBy("c").count().collect()
    target = max(counts, key=lambda r: r["count"])["c"]

    in_cell = _assign(new, cb).filter(F.col("c") == target).select("vec_id", "x")
    extra = in_cell.union(in_cell).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "x"
    )
    skewed = new.union(extra)

    quiet = {r.cell_id: r for r in _drift_frame(old, new).collect()}
    loud = {r.cell_id: r for r in _drift_frame(old, skewed).collect()}
    # stationary twin: no occupancy alert anywhere (qerr axis untouched)
    for r in quiet.values():
        assert not (
            r.drift_permille >= 20 and r.drift_permille**2 > r.occ_noise_permille2
        ), r
    # planted twin: the skewed cell fires on the occupancy axis
    t = loud[target]
    assert t.drift_permille >= 20
    assert t.drift_permille**2 > t.occ_noise_permille2
    assert t.alert


def test_robust_prune_matches_pure_python_replay(spark):
    """Both engines express RobustPrune with the same unrolled
    selection/dominance formulas, so engine-vs-oracle matching cannot
    catch a shared-formula bug (the BPE delimiter lesson). Replay the
    prune in pure Python from the collected candidate frame — greedy:
    take the nearest remaining candidate, drop every remaining c with
    d²(s,c) ≤ d²(p,c), repeat to degree R — and demand the identical
    edge set."""
    from pyspark.sql import functions as F

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_D8,
        _KNNJ_NPROBE,
        _PRUNE_K,
        _PRUNE_R,
        _descent_round,
        _fit_codebook,
        _knn_multiprobe_pairs,
        _load_vectors,
        _robust_prune_edges,
    )
    from tests.conftest import SF_SMOKE

    vectors = _load_vectors(spark, SF_SMOKE)
    cb = _fit_codebook(vectors)
    engine = set(
        (r.vec_id, r.neighbor_id)
        for r in _robust_prune_edges(spark, SF_SMOKE, vectors, cb).collect()
    )

    mp = (
        _knn_multiprobe_pairs(spark, SF_SMOKE, vectors, cb, k=_KNNJ_D8, nprobe=_KNNJ_NPROBE)
        .select("vec_id", "neighbor_id")
        .localCheckpoint()
    )
    cand = _descent_round(vectors, mp, k=_PRUNE_K).collect()
    x = {r.vec_id: r.x for r in vectors.collect()}

    by_p: dict[int, list] = {}
    for r in cand:
        by_p.setdefault(r.vec_id, []).append((r.l2sq_micro, r.neighbor_id))

    def d2(a, b):
        return sum((ai - bi) * (ai - bi) for ai, bi in zip(x[a], x[b]))

    replay = set()
    for p, cands in by_p.items():
        rem = sorted(cands)  # (dpc, cid) — the election order
        for _ in range(_PRUNE_R):
            if not rem:
                break
            sdpc, sid = rem[0]
            replay.add((p, sid))
            rem = [(dpc, cid) for dpc, cid in rem[1:] if d2(sid, cid) > dpc]
    assert engine == replay
    assert replay  # non-vacuous


def test_pq_reconstruct_matches_pure_python_replay(spark):
    """Both engines express the PQ fit/encode with the same formulas
    (seed subvectors, one truncating-integer-mean Lloyd round,
    (d, code) argmin), so engine-vs-oracle matching cannot catch a
    shared-formula bug (the BPE delimiter lesson). Replay the whole
    reconstruction in pure Python from the collected micro-unit
    vectors and demand identical arrays."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _ADC_DSUB,
        _ADC_KS,
        _ADC_M,
        _load_vectors,
        _pq_reconstruct,
    )
    from tests.conftest import SF_SMOKE

    vectors = _load_vectors(spark, SF_SMOKE).localCheckpoint()
    xs = {r.vec_id: list(r.x) for r in vectors.collect()}
    got = {r.vec_id: list(r.x) for r in _pq_reconstruct(vectors).collect()}
    assert set(got) == set(xs)

    def tdiv(a: int, b: int) -> int:  # Spark div / DuckDB //: truncate
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def sub(v, j):
        return v[j * _ADC_DSUB : (j + 1) * _ADC_DSUB]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for j in range(_ADC_M):
        seeds = {c: sub(xs[c], j) for c in xs if c < _ADC_KS}
        # assign every subvector to its (d, code)-argmin seed
        members: dict[int, list] = {}
        for v, x in xs.items():
            s = sub(x, j)
            code = min(seeds, key=lambda c: (d2(s, seeds[c]), c))
            members.setdefault(code, []).append(s)
        # one Lloyd round: truncating integer mean per surviving code
        cw1 = {
            c: [tdiv(sum(m[i] for m in ms), len(ms)) for i in range(_ADC_DSUB)]
            for c, ms in members.items()
        }
        # encode against the updated codebook
        for v, x in xs.items():
            s = sub(x, j)
            code = min(cw1, key=lambda c: (d2(s, cw1[c]), c))
            assert got[v][j * _ADC_DSUB : (j + 1) * _ADC_DSUB] == cw1[code], (
                v, j, code,
            )


def test_adc_rung_identity_codes_equal_beam16(spark, monkeypatch):
    """The ADC rung is beam16 with ONE variable changed — the walk's
    resident coordinates. Pin that: with the reconstruction forced to
    the identity, knn_graph_serving_adc must reproduce the graded
    beam16 rung row-for-row (same entries, same touched counts, same
    best/recall), so the ~16pt gap the docstring reports can only
    ever come from the compression, not from the re-rank plumbing."""
    import efficient_llm_data_wrangling_spark.queries.clustering as C
    from tests.conftest import SF_SMOKE

    monkeypatch.setattr(C, "_pq_reconstruct", lambda v: v.select("vec_id", "x"))
    from tests.conftest import fresh_build

    # fresh build: the patched reconstruction must be OBSERVED (the
    # session build memo would return the unpatched frame)
    adc = sorted(
        tuple(r) for r in fresh_build(C.knn_graph_serving_adc, spark, SF_SMOKE).collect()
    )
    w16 = sorted(tuple(r) for r in C.knn_graph_serving_beam16(spark, SF_SMOKE).collect())
    assert adc == w16


def test_filtered_serving_ladder_bookkeeping_and_cliff(spark):
    """Filtered-serving ladder invariants recomputed from scratch:
    every allowed-set size matches a pure-python md5 recount, the
    integer recall/touched formulas hold, the allowed subgraph and
    the walk's footprint shrink monotonically with selectivity, and
    the measured CLIFF is pinned — recall collapses between the 50%
    and 25% rungs (the mean-allowed-degree story in the docstring)
    while the 75% rung stays within 25pt of the unfiltered walk."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _FILT_BOUNDS,
        _KNNJ_K,
        _KNNJ_PROBES,
        knn_graph_serving_filtered,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.bucket_bound: r for r in knn_graph_serving_filtered(spark, SF_SMOKE).collect()}
    assert sorted(rows) == sorted(_FILT_BOUNDS)

    ids = [r.vec_id for r in load_table(spark, SF_SMOKE, "embeddings").select("vec_id").collect()]
    buckets = {v: int(hashlib.md5(str(v).encode()).hexdigest()[0], 16) for v in ids}
    for m, r in rows.items():
        assert r.n_allowed == sum(1 for b in buckets.values() if b < m)
        assert r.n_probes == _KNNJ_PROBES
        assert 0 < r.n_exact <= _KNNJ_K * r.n_probes
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert r.recall_ppm == r.sum_overlap * 1000000 // r.n_exact
        assert 0 <= r.sum_overlap <= r.n_exact
    ladder = [rows[m] for m in sorted(_FILT_BOUNDS, reverse=True)]
    for hi, lo in zip(ladder, ladder[1:]):
        assert hi.n_allowed > lo.n_allowed
        assert hi.allowed_edges > lo.allowed_edges
        assert hi.sum_touched >= lo.sum_touched
    # the cliff direction (magnitude is SF-dependent: 34pt at sf0.01,
    # 8pt on this smoke corpus): the 25% rung strictly loses vs 50%,
    # and sits below the top rung too
    assert rows[4].recall_ppm < rows[8].recall_ppm
    assert rows[4].recall_ppm < rows[12].recall_ppm
    # the top rung still navigates: over half of exact filtered found
    assert rows[12].recall_ppm >= 500_000


def test_filtered_rebuilt_ladder_removes_the_cliff(spark):
    """The rebuilt arm must (a) keep the same bookkeeping invariants
    as the shared arm, (b) build all edges INSIDE the filter (both
    endpoints allowed — recomputed from a pure-python md5 recount),
    and (c) actually answer the shared ladder's cliff: at and below
    the 25% rung the rebuilt graph's recall strictly beats the
    shared graph's, and the rebuilt ladder never cliffs (every rung
    ≥ the shared arm's worst rung)."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _FILT_BOUNDS,
        _KNNJ_K,
        _KNNJ_PROBES,
        knn_graph_serving_filtered,
        knn_graph_serving_filtered_rebuilt,
    )
    from tests.conftest import SF_SMOKE

    shared = {r.bucket_bound: r for r in knn_graph_serving_filtered(spark, SF_SMOKE).collect()}
    rebuilt = {r.bucket_bound: r for r in knn_graph_serving_filtered_rebuilt(spark, SF_SMOKE).collect()}
    assert sorted(rebuilt) == sorted(_FILT_BOUNDS)
    for m, r in rebuilt.items():
        assert r.n_allowed == shared[m].n_allowed
        assert r.n_probes == _KNNJ_PROBES
        assert r.n_exact == shared[m].n_exact  # same exact filtered truth
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert r.recall_ppm == r.sum_overlap * 1000000 // r.n_exact
        # a rebuilt degree-8 graph over n vertices carries at most
        # n*8 directed-deduped undirected edges... bounded by 2*8*n
        assert 0 < r.allowed_edges <= 16 * r.n_allowed
    # (c) the cliff answer: strictly better at the cliff rung and below
    for m in (4, 2, 1):
        assert rebuilt[m].recall_ppm > shared[m].recall_ppm, m
    worst_shared = min(r.recall_ppm for r in shared.values())
    assert all(r.recall_ppm > worst_shared for r in rebuilt.values())


def test_incremental_insert_reconciles_with_beam16_and_splits_recall(spark):
    """The rebuilt control arm must aggregate EXACTLY the graded
    beam16 rung's per-probe rows (same build, same entries, same
    walk); every derived column must recompute from its parts; the
    arrival split must be bounded by its parts; and the small-corpus
    finding must hold at the smoke SF: insertion walks on a small
    standing graph are near-exhaustive, so the maintained graph beats
    the single-descent-round rebuild."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        knn_graph_incremental_insert,
        knn_graph_serving_beam16,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.variant: r for r in knn_graph_incremental_insert(spark, SF_SMOKE).collect()}
    assert set(rows) == {"incremental", "rebuilt"}
    inc, reb = rows["incremental"], rows["rebuilt"]
    # shared corpus facts agree across arms
    for col in ("n_standing", "n_arrivals", "n_probes", "n_exact_arrival"):
        assert getattr(inc, col) == getattr(reb, col), col
    assert inc.n_standing > 0 and inc.n_arrivals > 0
    assert 0 < inc.n_exact_arrival <= _KNNJ_K * inc.n_probes
    for r in (inc, reb):
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert r.recall_ppm == r.sum_overlap * 1_000_000 // (_KNNJ_K * r.n_probes)
        assert (
            r.arrival_recall_ppm
            == r.sum_overlap_arrival * 1_000_000 // r.n_exact_arrival
        )
        assert r.sum_overlap_arrival <= r.sum_overlap
        assert r.sum_overlap_arrival <= r.n_exact_arrival
        assert r.sum_overlap <= _KNNJ_K * r.n_probes
    # the control arm IS the graded beam16 rung, aggregated
    b16 = knn_graph_serving_beam16(spark, SF_SMOKE).collect()
    assert reb.n_probes == len(b16)
    assert reb.sum_touched == sum(r.n_touched for r in b16)
    assert reb.sum_overlap == sum(r.n_overlap for r in b16)
    # the small-corpus flip: walk-based insertion's near-exhaustive
    # out-edge election beats the approximate descent-round rebuild
    assert inc.recall_ppm > reb.recall_ppm
    assert inc.arrival_recall_ppm > reb.arrival_recall_ppm


def test_delete_consolidate_erasure_guarantee_and_parity(spark):
    """The erasure audit column must read ZERO on both arms (no edge
    touches an erased vertex — the DSAR guarantee), derived columns
    must recompute, the consolidation must be LOCAL (far fewer new
    edges than the rebuild), and the two arms must serve within a
    10-point recall band of each other (the parity finding)."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        knn_graph_delete_consolidate,
    )
    from tests.conftest import SF_SMOKE

    rows = {
        r.variant: r for r in knn_graph_delete_consolidate(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"consolidated", "rebuilt"}
    con, reb = rows["consolidated"], rows["rebuilt"]
    for col in ("n_survivors", "n_deleted", "n_probes"):
        assert getattr(con, col) == getattr(reb, col), col
    assert con.n_survivors > 0 and con.n_deleted > 0
    for r in (con, reb):
        # the erasure guarantee: no surviving edge touches an erased id
        assert r.n_edges_to_erased == 0
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert r.recall_ppm == r.sum_overlap * 1_000_000 // (_KNNJ_K * r.n_probes)
        assert 0 < r.n_new_edges < r.build_edges
    # locality: the bridge repair elects fewer new edges than a full
    # rebuild introduces (1.96x fewer at the smoke SF, 2.0x at sf0.01)
    assert con.n_new_edges < reb.n_new_edges
    # parity: the two maintenance answers serve within a 10pt band
    assert abs(con.recall_ppm - reb.recall_ppm) < 100_000


def test_insert_consolidate_reconciles_and_pins_the_negative(spark):
    """The consolidation rung's ``incremental`` arm must aggregate to
    EXACTLY the insert rung's incremental arm (same maintained graph,
    same entries, same walk — the ladder reconciliation); derived
    columns must recompute from their parts; and the honest negative
    must hold at the smoke SF: NEITHER graph-only repair (descent /
    re-walk) beats the un-consolidated maintained graph on overall
    recall — the proximity-vs-navigability trade the prune rung
    found, re-found in maintenance."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _KNNJ_K,
        knn_graph_incremental_insert,
        knn_graph_insert_consolidate,
    )
    from tests.conftest import SF_SMOKE

    rows = {
        r.variant: r for r in knn_graph_insert_consolidate(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"incremental", "consolidate_descent", "consolidate_rewalk"}
    inc = rows["incremental"]
    # ladder reconciliation: the shared arm equals the insert rung's
    ins = {
        r.variant: r for r in knn_graph_incremental_insert(spark, SF_SMOKE).collect()
    }["incremental"]
    assert inc.asDict() == ins.asDict()
    for r in rows.values():
        # shared corpus facts + derived-column recomputation
        assert r.n_standing == inc.n_standing and r.n_arrivals == inc.n_arrivals
        assert r.n_exact_arrival == inc.n_exact_arrival
        assert r.mean_touched_milli == r.sum_touched * 1000 // r.n_probes
        assert r.recall_ppm == r.sum_overlap * 1_000_000 // (_KNNJ_K * r.n_probes)
        assert (
            r.arrival_recall_ppm
            == r.sum_overlap_arrival * 1_000_000 // r.n_exact_arrival
        )
        assert r.sum_overlap_arrival <= min(r.sum_overlap, r.n_exact_arrival)
        # degree-8 re-elections keep the edge count in the same band
        assert 0 < r.build_edges <= 16 * (r.n_standing + r.n_arrivals)
    # the pinned negative: no repair pass beats the maintained graph
    assert rows["consolidate_descent"].recall_ppm <= inc.recall_ppm
    assert rows["consolidate_rewalk"].recall_ppm <= inc.recall_ppm
    # and the re-walk repair stays the gentler of the two losses here
    assert (
        rows["consolidate_rewalk"].recall_ppm
        >= rows["consolidate_descent"].recall_ppm
    )


def test_adaboost_replays_in_pure_python(spark):
    """Full pure-Python replay of the boosting loop at the smoke SF:
    feature grid, weighted candidate errors with the polarity-flip
    identity, (e, j, g, pol) election, portable-ln alpha (bit-exact
    double replay), rational half-mass reweighting, and the ensemble
    score walk — all three round rows must match; the half-mass
    invariant must hold after every reweight."""
    import math

    from efficient_llm_data_wrangling_spark.functions.portable_math import LN2_SQL
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _ADA_GRID,
        _ADA_ROUNDS,
        _ADA_W0,
        _DIMS,
        adaboost_stump_rounds,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    got = {r.round: r for r in adaboost_stump_rounds(spark, SF_SMOKE).collect()}
    assert set(got) == set(range(1, _ADA_ROUNDS + 1))

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding", "label"
    ).collect()
    rows = [
        (
            r.vec_id,
            [math.floor(float(e) * 1_000_000 + 0.5) for e in r.embedding],
            1 if r.label == 0 else -1,
        )
        for r in emb
    ]
    ln2 = float(LN2_SQL.split("'")[1])

    def lnint(v: int) -> float:
        b = v.bit_length()
        m = v / float(1 << (b - 1))
        z = (m - 1.0) / (m + 1.0)
        z2 = z * z
        acc = 1.0 / 31.0
        for k in range(29, 0, -2):
            acc = 1.0 / k + z2 * acc
        return float(b - 1) * ln2 + 2.0 * (z * acc)

    mn = [min(x[j] for _, x, _ in rows) for j in range(_DIMS)]
    mx = [max(x[j] for _, x, _ in rows) for j in range(_DIMS)]
    grid = [
        (j + 1, g, mn[j] + (mx[j] - mn[j]) * (g + 1) // (_ADA_GRID + 1))
        for j in range(_DIMS)
        for g in range(_ADA_GRID)
    ]
    w = {vid: _ADA_W0 for vid, _, _ in rows}
    score = {vid: 0.0 for vid, _, _ in rows}
    for rnd in range(1, _ADA_ROUNDS + 1):
        S = sum(w.values())
        cands = []
        for j, g, t in grid:
            ep = sum(
                w[vid]
                for vid, x, y in rows
                if (1 if x[j - 1] > t else -1) != y
            )
            cands.append((ep, j, g, 1, t))
            cands.append((S - ep, j, g, -1, t))
        e, j, g, pol, t = min(cands, key=lambda c: (c[0], c[1], c[2], c[3]))
        alpha = 0.5 * (lnint(S - e) - lnint(max(e, 1)))
        nse = 0
        for vid, x, y in rows:
            pred = pol if x[j - 1] > t else -pol
            if pred != y:
                nse += 1
                w[vid] = w[vid] * S // (2 * max(e, 1))
            else:
                w[vid] = w[vid] * S // (2 * max(S - e, 1))
            score[vid] += alpha * pred
        nee = sum(1 for vid, _, y in rows if y * score[vid] <= 0)
        r = got[rnd]
        assert r.feat_j == j and r.threshold == t and r.polarity == pol
        assert r.total_weight == S and r.weighted_err == e
        assert r.weighted_err_permille == e * 1000 // S
        assert r.alpha_micro == math.floor(alpha * 1_000_000 + 0.5)
        assert r.n_stump_errors == nse
        assert r.n_ensemble_errors == nee
        # the half-mass invariant (exact up to per-row truncation)
        wrong_mass = sum(
            w[vid]
            for vid, x, y in rows
            if (pol if x[j - 1] > t else -pol) != y
        )
        assert abs(wrong_mass * 2 - sum(w.values())) <= 2 * len(rows)


def test_pca_power_iteration_replays_in_pure_python(spark):
    """All 8 iteration rows must recompute exactly from the collected
    embeddings: milli-unit covariance, the power-of-two rescale with
    sign-aware truncating shifts, integer matvecs, IEEE-sqrt
    normalization, and every ppm bookkeeping column."""
    import math

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _PCA_GIGA,
        _PCA_ITERS,
        _PCA_SHIFT,
        _PCA_SHIFT3,
        _PCA_V0,
        pca_power_iteration_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.iter: r for r in pca_power_iteration_report(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").select("embedding").collect()
    X = [[math.floor(float(e) * 1000 + 0.5) for e in r.embedding] for r in emb]
    n, dims = len(X), len(X[0])
    mu = [sum(x[j] for x in X) for j in range(dims)]
    S = [[sum(x[i] * x[j] for x in X) for j in range(dims)] for i in range(dims)]
    C = [[n * S[i][j] - mu[i] * mu[j] for j in range(dims)] for i in range(dims)]
    mx = max(abs(c) for r_ in C for c in r_)
    k2 = 1 if mx < 1 << 20 else 1 << (mx // (1 << 20)).bit_length()
    tz = lambda v, s: -((-v) // s) if v < 0 else v // s  # noqa: E731
    cp = [[tz(C[i][j], k2) for j in range(dims)] for i in range(dims)]
    tr = sum(cp[i][i] for i in range(dims))
    v = [_PCA_V0] * dims
    for it in range(1, _PCA_ITERS + 1):
        w = [sum(cp[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        nrm = math.sqrt(float(sum(tz(x, _PCA_SHIFT) ** 2 for x in w))) * _PCA_SHIFT
        vn = [math.floor(x / nrm * _PCA_GIGA + 0.5) for x in w]
        r = rows[it]
        assert r.pc1_share_ppm == math.floor(nrm / _PCA_GIGA / tr * 1e6 + 0.5)
        top = min(range(dims), key=lambda j: (-abs(vn[j]), j))
        assert r.top_axis == top + 1
        n2 = sum(tz(x, _PCA_SHIFT3) ** 2 for x in vn)
        assert r.top_axis_share_ppm == math.floor(
            float(tz(vn[top], _PCA_SHIFT3) * tz(vn[top], _PCA_SHIFT3)) / n2 * 1e6 + 0.5
        )
        dt = sum(tz(a, _PCA_SHIFT3) * tz(b, _PCA_SHIFT3) for a, b in zip(vn, v))
        na = n2
        nb = sum(tz(b, _PCA_SHIFT3) ** 2 for b in v)
        assert r.cos2_prev_ppm == math.floor(
            float(dt) * float(dt) / (float(na) * float(nb)) * 1e6 + 0.5
        )
        v = vn
    assert len(rows) == _PCA_ITERS


def test_layered_entries_replay_in_pure_python(spark):
    """The HNSW-style entry election must replay exactly: upper-layer
    membership, exact degree-4 kNN edges, the beam-1 greedy descent
    from the layer's min id, and the per-probe landing vertex."""
    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _BEAM_HOPS,
        _KNNJ_PROBES,
        _LAYER_D,
        _LAYER_STRIDE,
        _layered_entries,
        _load_vectors,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    vectors = _load_vectors(spark, SF_SMOKE)
    pb = vectors.filter(F.col("vec_id") < _KNNJ_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("x").alias("px")
    )
    got = {r.pid: r.v0 for r in _layered_entries(vectors, pb).collect()}
    X = {r.vec_id: list(r.x) for r in vectors.collect()}
    up = sorted(
        v for v in X if v >= _KNNJ_PROBES and v % _LAYER_STRIDE == 0
    )

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(X[a], X[b]))

    adj = {}
    for a in up:
        nn = sorted((d2(a, b), b) for b in up if b != a)[:_LAYER_D]
        adj[a] = [b for _, b in nn]
    und = {a: set() for a in up}
    for a, ns in adj.items():
        for b in ns:
            und[a].add(b)
            und[b].add(a)
    e0 = min(up)
    for pid in range(_KNNJ_PROBES):
        def dq(v):
            return sum((p - q) * (p - q) for p, q in zip(X[v], X[pid]))

        touched = {e0: dq(e0)}
        best = e0
        for _ in range(_BEAM_HOPS):
            for v in und[best]:
                touched.setdefault(v, dq(v))
            best = min(touched, key=lambda v: (touched[v], v))
        assert got[pid] == best, pid
    assert len(got) == _KNNJ_PROBES
