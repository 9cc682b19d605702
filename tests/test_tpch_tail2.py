"""Plan-shape pins for the TPC-H tail batch 2 (Q5/Q7/Q8/Q9/Q10/Q13/
Q15 shapes): dimensions must broadcast, facts shuffle once per
aggregation key, top-k runs as TakeOrdered, the outer join preserves
zero-order customers."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_all_dims_single_fact_shuffle(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_tail2 import (
        local_supplier_volume,
    )

    plan = _plan(local_supplier_volume(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan  # dims never sort-merge
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q10_topk_is_take_ordered(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_tail2 import (
        returned_item_customers,
    )

    plan = _plan(returned_item_customers(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "revenue_u" in plan  # exact-integer ordering key, not the double


def test_q13_left_join_preserves_zero_order_customers(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_tail2 import (
        customer_order_distribution,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    rows = {r.c_count: r.custdist for r in customer_order_distribution(spark, SF_SMOKE).collect()}
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(rows.values()) == n_cust  # every customer lands in a bucket


def test_q15_returns_all_max_ties(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_tail2 import (
        top_supplier_revenue,
    )

    rows = top_supplier_revenue(spark, SF_SMOKE).collect()
    assert rows
    assert len({r.total_revenue_u for r in rows}) == 1  # all rows share the max


def test_q6_filters_reach_the_scan(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_tail2 import (
        forecast_revenue_change,
    )

    from tests.conftest import fresh_build

    plan = _plan(fresh_build(forecast_revenue_change, spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1][:400], plan
    assert "Exchange SinglePartition" in plan  # 1-row final aggregate only
    assert plan.count("Exchange") == 1
