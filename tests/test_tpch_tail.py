"""TPC-H tail family: plan-shape pins (the scale-critical physical
properties) plus value-level spot checks the oracles can't express.

Each test asserts the physical plan Catalyst MUST pick for the query
to survive a 100× scale-up — semi/anti join strategies, broadcast
dimension joins, pre-join predicate derivation from disjunctions."""

from __future__ import annotations

import pyspark.sql.functions as F

from efficient_llm_data_wrangling_spark.queries.tpch_tail import (
    disjunctive_part_revenue,
    order_priority_late_exists,
    priority_line_counts,
    promo_revenue_ratio,
    supplier_cnt_by_part_attrs,
    waiting_supplier_orders,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_lowers_to_semi_join(spark):
    plan = _plan(order_priority_late_exists(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    # the correlated date comparison must ride the join as a residual
    # condition, not force a fanout join + post-dedup
    assert "HashAggregate" in plan


def test_q12_single_join_single_agg(spark):
    from tests.conftest import fresh_build

    df = fresh_build(priority_line_counts, spark, SF_SMOKE)
    plan = _plan(df)
    # one pass: the high/low split is conditional aggregation, never a
    # union of two scans
    assert plan.count("FileScan parquet") == 2  # lineitem + orders, once each
    rows = {r["l_linestatus"]: r for r in df.collect()}
    for r in rows.values():
        assert r["high_line_count"] >= 0 and r["low_line_count"] >= 0


def test_q14_broadcasts_part_dim(spark):
    plan = _plan(promo_revenue_ratio(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q14_ppm_is_exact_integer(spark):
    row = promo_revenue_ratio(spark, SF_SMOKE).collect()[0]
    assert 0 <= row["promo_ppm"] <= 1_000_000
    # ppm consistent with the double-valued revenues (loose float check)
    approx = 1e6 * row["promo_revenue"] / row["total_revenue"]
    assert abs(row["promo_ppm"] - approx) < 2

def test_q16_exclusion_is_broadcast_anti_join(spark):
    plan = _plan(supplier_cnt_by_part_attrs(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q19_derives_prejoin_filters(spark):
    """Catalyst must factor scan-eligible conjuncts out of the OR:
    the part scan must carry a pushed filter on p_brand/p_size (the
    union of branch constants), not scan every part."""
    plan = _plan(disjunctive_part_revenue(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "p_brand" in plan.split("FileScan")[0] or "In(p_brand" in plan


def test_q21_is_single_lineitem_pass(spark):
    """The double-correlated EXISTS/NOT-EXISTS folds into ONE
    per-order aggregate: lineitem must be scanned exactly once (no
    self-joins of the fact table)."""
    from tests.conftest import fresh_build

    plan = _plan(fresh_build(waiting_supplier_orders, spark, SF_SMOKE))
    assert plan.count("FileScan parquet") == 3  # lineitem, orders, supplier — once each


def test_q21_sole_late_supplier_semantics(spark):
    """Brute-force re-derivation at smoke scale: every reported
    (supplier, count) must match the per-order definition."""
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")
    supp = {r["s_suppkey"]: r["s_name"] for r in load_table(spark, SF_SMOKE, "supplier").collect()}
    rows = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
        .collect()
    )
    per_order: dict[int, tuple[set, set]] = {}
    for r in rows:
        supps, late = per_order.setdefault(r["l_orderkey"], (set(), set()))
        supps.add(r["l_suppkey"])
        if (r["l_shipdate"] - r["o_orderdate"]).days > 30:
            late.add(r["l_suppkey"])
    expected: dict[str, int] = {}
    for supps, late in per_order.values():
        if len(supps) > 1 and len(late) == 1:
            name = supp[next(iter(late))]
            expected[name] = expected.get(name, 0) + 1
    got = {r["s_name"]: r["numwait"] for r in waiting_supplier_orders(spark, SF_SMOKE).collect()}
    assert got == expected
