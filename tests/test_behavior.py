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
