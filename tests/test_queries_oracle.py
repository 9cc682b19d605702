"""Every registered query runs and hash-matches its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import compare  # noqa: E402

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: must run
        return
    odf = duck.execute(spec.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_driver_grade_window_is_exactly_full():
    """The driver grades the first 50 queries() entries. The pinned
    priority list must (a) name only real queries — _ordered_names
    raises otherwise — and (b) hold exactly 50 names, so no graded
    slot is wasted and no pinned query silently falls outside the
    window (the r3 post-pin-additions failure mode)."""
    from efficient_llm_data_wrangling_spark.registry import (
        DRIVER_GRADE_PRIORITY,
        _ordered_names,
    )

    names = _ordered_names()
    assert len(DRIVER_GRADE_PRIORITY) == 50
    assert len(set(DRIVER_GRADE_PRIORITY)) == 50
    assert names[:50] == list(DRIVER_GRADE_PRIORITY)


def test_bench_line_fits_driver_tail_at_any_size():
    """bench.py's printed line must stay inside the driver's ~2000-char
    stdout tail no matter how many headliners accumulate (BENCH_r03-r05
    were blinded by an over-long line; r6's fix asserted at the finish
    line, which ADVICE r6 flagged as its own failure mode). The
    degradation must keep the driver-contract fields."""
    import json

    from bench import HEADLINE, fit_line

    # current shape (r9: interleaved calibration fields + the two
    # freshest driver-chained summaries) fits untruncated
    payload = {
        "metric": "headline_queries_total", "value": 1.0, "unit": "sec",
        "queries": {n: 1.234 for n in HEADLINE}, "sf": 0.1,
        "calibration_sec": 0.3, "calibration_n": 39,
        "vs_r7_driver": {"median": 1.0, "max": 1.0, "max_query": "x", "n": 1},
        "vs_r8_driver": {"median": 1.0, "max": 1.0, "max_query": "x", "n": 1},
    }
    line = fit_line(dict(payload))
    assert len(line) < 1900 and "queries" in json.loads(line)

    # pathological growth: 300 headliners — must degrade, never explode
    payload["queries"] = {f"query_name_{i:03d}": 1.234 for i in range(300)}
    line = fit_line(dict(payload))
    assert len(line) < 1900
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "sf"):
        assert key in parsed
    assert parsed.get("truncated") is True


def test_ivm_rollup_retraction_identity_and_max_flag(spark):
    """The IVM identities must hold row-by-row (maintained = base −
    erased for count and sum), the max flag must agree with a direct
    comparison of erased-max vs base-max, and max_surviving must
    differ from max_base exactly on invalidated groups."""
    from efficient_llm_data_wrangling_spark.queries.etl import ivm_erasure_rollup
    from tests.conftest import SF_SMOKE

    rows = ivm_erasure_rollup(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    invalidated = 0
    for r in rows:
        assert r.n_maintained == r.n_base - r.n_erased
        assert r.sum_maintained_cents == r.sum_base_cents - r.sum_erased_cents
        assert r.max_surviving_cents <= r.max_base_cents
        if r.max_invalidated:
            invalidated += 1
            assert r.max_surviving_cents < r.max_base_cents
        else:
            assert r.max_surviving_cents == r.max_base_cents
    # the smoke corpus exercises the invalidation path
    assert invalidated >= 1


def test_schema_drift_replays_and_planted_drift_alerts(spark):
    """The stationary corpus must read quiet (both drift bars), every
    derived column must recompute from a pure Python replay (including
    the class-appropriate domain probes), and a planted drift through
    the SAME shared template — a field going half-null, an enum
    exploding into free text, and a continuous column jumping out of
    range — must trip exactly the right bars."""
    from pyspark.sql import functions as F

    from efficient_llm_data_wrangling_spark.queries.etl import (
        _SDRIFT_CAT,
        _SDRIFT_NEW_DAYS,
        _sdrift_sql,
        schema_drift_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.column_name: r for r in schema_drift_report(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "value", "props", "ts"
    ).collect()
    days = [int(r.ts.timestamp()) // 86400 for r in ev]
    cut = max(days) - _SDRIFT_NEW_DAYS + 1
    old = [r for r, d in zip(ev, days) if d < cut]
    new = [r for r, d in zip(ev, days) if d >= cut]
    for col, r in rows.items():
        n_o, n_n = len(old), len(new)
        nn_o = sum(1 for x in old if x[col] is not None)
        nn_n = sum(1 for x in new if x[col] is not None)
        ov = {x[col] for x in old if x[col] is not None}
        nv = {x[col] for x in new if x[col] is not None}
        assert (r.n_old, r.n_new) == (n_o, n_n)
        assert r.null_old_pm == (n_o - nn_o) * 1000 // n_o
        assert r.null_new_pm == (n_n - nn_n) * 1000 // n_n
        assert (r.ndv_old, r.ndv_new) == (len(ov), len(nv))
        if col in _SDRIFT_CAT:
            assert r.n_unseen_new == len(nv - ov)
            assert r.unseen_share_pm == len(nv - ov) * 1000 // max(len(nv), 1)
            assert r.n_oor_new == -1 and r.oor_new_pm == -1
        else:
            oor = sum(1 for x in new if x[col] is not None
                      and not (min(ov) <= x[col] <= max(ov)))
            assert r.n_oor_new == oor
            assert r.oor_new_pm == oor * 1000 // max(nn_n, 1)
            assert r.n_unseen_new == -1 and r.unseen_share_pm == -1
        assert not r.null_drift and not r.domain_drift, col  # stationary
    # planted drift through the SAME template
    base = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "value", "props"
    )
    base.createOrReplaceTempView("__sdold")
    planted = base.select(
        "user_id",
        # enum explodes into free text: unseen-share step
        F.concat(F.col("event_type"), F.col("user_id").cast("string")).alias(
            "event_type"
        ),
        # continuous column jumps out of the corpus range
        (F.col("value") + F.lit(1e9)).alias("value"),
        # field goes dark for half the rows: null-rate step
        F.when(F.col("user_id") % 2 == 0, F.col("props")).alias("props"),
    )
    planted.createOrReplaceTempView("__sdnew")
    prows = {r.column_name: r for r in spark.sql(_sdrift_sql("div")).collect()}
    assert prows["props"].null_drift and not prows["props"].domain_drift
    assert prows["event_type"].domain_drift and not prows["event_type"].null_drift
    assert prows["value"].domain_drift and not prows["value"].null_drift
    assert not prows["user_id"].null_drift and not prows["user_id"].domain_drift
