"""Connected components (operators/graph.py): exact component labels
on hand-built graphs, including the convergence-speed contract."""

from __future__ import annotations

from efficient_llm_data_wrangling_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components_and_self_loop(spark):
    # component {1,2,3,4} chained, component {10,11}, self-loop {20}
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_long_path_converges(spark):
    # a 64-node path exercises pointer jumping (plain propagation
    # would need 64 rounds; the max_iter=50 cap still converges)
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_star_and_cycle(spark):
    star = [(100, i) for i in range(101, 106)]
    cycle = [(7, 8), (8, 9), (9, 7)]
    got = _cc(spark, star + cycle)
    assert {got[i] for i in range(100, 106)} == {100}
    assert {got[i] for i in (7, 8, 9)} == {7}


def test_cc_checkpoints_are_spill_capable(spark):
    """Storage posture (billion-edge regime, see module docstring):
    every block the CC loop persists — the symmetrized edge list and
    the per-round label checkpoints — must be MEMORY_AND_DISK, i.e.
    spill-capable: an edge list bigger than executor memory degrades
    to disk instead of OOM. Runs the real graded query's doubling
    graph at the largest test SF so the checkpoints actually hold
    multi-partition data."""
    from efficient_llm_data_wrangling_spark.queries.analytics import (
        connected_components_halving,
    )
    from tests.conftest import SF_CORRECT

    sc = spark.sparkContext
    sc._jsc.sc().cleaner().get()  # ensure the context is live
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    connected_components_halving(spark, SF_CORRECT).count()
    infos = [i for i in sc._jsc.sc().getRDDStorageInfo() if i.id() not in before]
    assert infos, "CC run persisted no blocks — checkpoints disappeared?"
    for info in infos:
        lvl = info.storageLevel()
        assert lvl.useDisk(), f"RDD {info.id()} persisted without spill: {lvl}"


def test_cc_matches_union_find_on_random_graphs(spark):
    """Property check: the distributed algorithm agrees with a plain
    union-find on pseudo-random graphs (fixed seeds — deterministic)."""
    import random

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    for seed in (7, 42, 99):
        rng = random.Random(seed)
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        expect = union_find(edges)
        # canonicalize union-find roots to component minima
        comps = {}
        for node, root in expect.items():
            comps.setdefault(root, []).append(node)
        want = {n_: min(members) for root, members in comps.items() for n_ in members}
        assert _cc(spark, edges) == want, f"seed {seed}"
