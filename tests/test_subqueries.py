"""Plan-shape properties of the decorrelated subquery family: scalar
subqueries must broadcast one row (never a real cartesian), tiny
aggregates must broadcast on the join-back, and the correlated-agg
join must reuse the aggregation's partitioning instead of shuffling
the fact twice. Values are covered by the DuckDB oracles."""

from __future__ import annotations

from efficient_llm_data_wrangling_spark.queries.subqueries import (
    argmin_part_per_type,
    correlated_avg_qty_filter,
    having_large_orders,
    nested_agg_nations_above_avg,
    scalar_subquery_acctbal,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scalar_subquery_broadcasts_one_row(spark):
    plan = _plan(scalar_subquery_acctbal(spark, SF_SMOKE))
    # the 1-row scalar side arrives via broadcast nested-loop, and the
    # NOT EXISTS decorrelates to a left-anti join
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_argmin_joins_back_via_broadcast_hash(spark):
    plan = _plan(argmin_part_per_type(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_correlated_avg_reuses_agg_partitioning(spark):
    """The join-back keys on l_partkey — the same key the aggregate
    hashed on. The fact table must be exchanged at most once on that
    key: one shuffle feeds both the agg and the join."""
    from tests.conftest import fresh_build

    plan = _plan(fresh_build(correlated_avg_qty_filter, spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(l_partkey") <= 1


def test_nested_agg_broadcasts_global_scalar(spark):
    plan = _plan(nested_agg_nations_above_avg(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_having_filter_runs_before_join_back(spark):
    """The quantity-threshold filter must apply directly to the
    aggregate output (before the join-back), and the lineitem scan
    must be pruned to the two referenced columns."""
    import re

    plan = _plan(having_large_orders(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # filter node sits immediately on the aggregate, threshold folded
    assert re.search(
        r"Filter \(isnotnull\(total_qty#\d+\) AND \(total_qty#\d+ > 250\.00\)\)\n[\s:]*\+- HashAggregate",
        plan,
    ), plan
    m = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem", plan)
    assert m and len(m.group(1).split(",")) == 2, m.group(1) if m else plan


def test_rolling_7d_window_is_trailing_and_exact(spark):
    """Brute-force one user: every row's trailing stats must equal the
    count/sum of that user's events in [sec - 7d, sec]."""
    from efficient_llm_data_wrangling_spark.queries.temporal import (
        _ROLL_SEC,
        rolling_user_value_7d,
    )
    from tests.conftest import SF_SMOKE

    rows = rolling_user_value_7d(spark, SF_SMOKE).collect()
    assert rows
    uid = rows[0].user_id
    mine = [r for r in rows if r.user_id == uid]
    secs = sorted(r.sec for r in mine)
    for r in mine:
        expect_n = sum(1 for s in secs if r.sec - _ROLL_SEC <= s <= r.sec)
        assert r.n_7d == expect_n
