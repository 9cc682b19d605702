"""Pins for the deterministic partsupp surrogate and the Q11/Q20/Q9
shapes built on it: the surrogate is exactly 4 distinct supplier slots
per part with in-range keys, identical across engines by construction;
the query plans keep dimensions broadcast and never go cartesian."""

from __future__ import annotations

from tests.conftest import SF_CORRECT, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_surrogate_is_4_distinct_in_range_slots_per_part(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        partsupp_surrogate,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    ps = partsupp_surrogate(spark, SF_CORRECT)
    n_part = load_table(spark, SF_CORRECT, "part").count()
    n_supp = load_table(spark, SF_CORRECT, "supplier").count()
    assert ps.count() == 4 * n_part
    # slots are distinct per part (no double-counted stock in Q11) and
    # land inside the contiguous supplier key space
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_part
    import pyspark.sql.functions as F

    bad = ps.filter((F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_supp)).count()
    assert bad == 0
    # integer stock/cost domains (cost in cents, ≥ 1.00)
    dom = ps.agg(
        F.min("ps_availqty"), F.max("ps_availqty"), F.min("ps_supplycost_c")
    ).collect()[0]
    assert dom[0] >= 1 and dom[1] <= 9999 and dom[2] >= 100


def test_surrogate_plan_has_no_cartesian_and_no_shuffle(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        partsupp_surrogate,
    )

    plan = _plan(partsupp_surrogate(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan  # 1-row scalar joins broadcast
    # dimension-derived: no Exchange beyond the 1-row count aggregate
    assert plan.count("Exchange hashpartitioning") == 0


def test_q11_share_filter_joins_a_one_row_broadcast(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        tpch_q11_important_stock,
    )

    df = tpch_q11_important_stock(spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows  # non-degenerate at the graded scale
    assert all(r.value_u > 0 for r in rows)


def test_q20_excess_stock_nonempty_at_graded_scale(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        tpch_q20_excess_stock,
    )

    df = tpch_q20_excess_stock(spark, SF_CORRECT)
    plan = _plan(df)
    # the supplier election is semi-join shaped, not a distinct-join
    assert "LeftSemi" in plan
    assert df.count() > 0


def test_q9_joins_partsupp_on_the_pair_key(spark):
    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        profit_by_nation_year,
    )

    df = profit_by_nation_year(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # ps joins broadcast at test scale; the pair key appears in a
    # single BroadcastHashJoin condition
    assert "BroadcastHashJoin [l_partkey" in plan or "BroadcastHashJoin [knownnotnull" in plan or plan.count("BroadcastHashJoin") >= 3


def test_q2_returns_all_min_cost_ties_per_part(spark):
    from collections import defaultdict

    from efficient_llm_data_wrangling_spark.queries.tpch_partsupp import (
        tpch_q2_min_cost_supplier,
    )

    rows = tpch_q2_min_cost_supplier(spark, SF_CORRECT).collect()
    assert rows
    by_part = defaultdict(list)
    for r in rows:
        by_part[r.ps_partkey].append(r.ps_supplycost_c)
    # every returned row carries its part's single minimum cost
    for costs in by_part.values():
        assert len(set(costs)) == 1
