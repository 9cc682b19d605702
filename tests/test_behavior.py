"""Property tests for behavioral-analytics queries (the oracle
checks values; these re-derive semantics from first principles)."""

from __future__ import annotations


def test_anomaly_zscore_matches_float_reference(spark):
    """The cross-multiplied integer predicate must agree with the
    straightforward float z-score on every event (no boundary case in
    the data sits exactly on |z| = 3, so float reference is safe)."""
    import statistics

    from efficient_llm_data_wrangling_spark.queries.behavior import (
        event_anomaly_zscore,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user: dict[int, list[tuple[int, int]]] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.event_id, round(r.value * 100)))
    want = {}
    for user, rows in per_user.items():
        vals = [v for _, v in rows]
        n = len(vals)
        mu = sum(vals) / n
        var = sum((v - mu) ** 2 for v in vals) / n
        for eid, v in rows:
            want[eid] = n >= 2 and var > 0 and (v - mu) ** 2 > 9 * var
    got = {r.event_id: r.is_outlier for r in event_anomaly_zscore(spark, SF_SMOKE).collect()}
    assert got == want


def test_behavior_signature_similarity_masks_and_jaccard(spark):
    """Fingerprints must match a Python recompute of per-user
    transition sets, and every reported pair's Jaccard must be the
    exact popcount ratio of those masks."""
    from collections import defaultdict

    from efficient_llm_data_wrangling_spark.queries.behavior import (
        _BHV_TOPK,
        _BHV_TYPES,
        behavior_signature_similarity,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = sorted(
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    ti = {t: i for i, t in enumerate(_BHV_TYPES)}
    masks: dict = defaultdict(int)
    for a, b in zip(ev, ev[1:]):
        if a.user_id == b.user_id:
            masks[a.user_id] |= 1 << (ti[a.event_type] * 5 + ti[b.event_type])
    by_mask: dict = defaultdict(int)
    for m in masks.values():
        by_mask[m] += 1

    rows = behavior_signature_similarity(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= _BHV_TOPK
    jacs = [r.jaccard_milli for r in rows]
    assert jacs == sorted(jacs, reverse=True)
    for r in rows:
        assert r.mask_a in by_mask and r.mask_b in by_mask
        assert r.n_users_a == by_mask[r.mask_a]
        assert r.n_users_b == by_mask[r.mask_b]
        inter = bin(r.mask_a & r.mask_b).count("1")
        union = bin(r.mask_a | r.mask_b).count("1")
        assert r.jaccard_milli == inter * 1000 // union
        assert inter > 0  # blocking admits only bit-sharing pairs


def test_markov_holdout_reconciles(spark):
    """Holdout-eval invariants: correct counts bounded by the test-pair
    count, permille arithmetic exact, and the test split non-empty
    (the md5 12/4 bucket split must actually hold users out)."""
    from efficient_llm_data_wrangling_spark.queries.behavior import (
        markov_holdout_accuracy,
    )
    from tests.conftest import SF_SMOKE

    r = markov_holdout_accuracy(spark, SF_SMOKE).collect()[0]
    assert r.n_test_pairs > 0
    for correct, permille in (
        (r.n_correct_markov, r.markov_permille),
        (r.n_correct_mode, r.mode_permille),
    ):
        assert 0 <= correct <= r.n_test_pairs
        assert permille == correct * 1000 // r.n_test_pairs
