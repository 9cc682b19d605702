"""Property-based checks (hypothesis): the scalable re-formulations
must agree with their naive single-node definitions on arbitrary small
inputs — the operator-level analogue of the DuckDB oracles."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import sampling as SAMP
from efficient_llm_data_wrangling_spark.queries.etl import upsert_by_key

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(
    vals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 5)), min_size=1, max_size=40
    )
)
def test_global_rank_equals_global_window(spark, vals):
    """range-exchange + local rank + offsets == the single-partition
    global window, for any data and any tie structure broken by a
    second key."""
    rows = [(i, a, b) for i, (a, b) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["rn"]
        for r in SAMP.global_rank(df, ["a", "b", "id"], out_col="rn").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("a", "b", "id"))
        ).collect()
    }
    assert got == want


@_slow
@given(
    base=st.dictionaries(st.integers(0, 20), st.integers(0, 99), max_size=15),
    delta=st.dictionaries(st.integers(0, 20), st.integers(100, 199), max_size=15),
)
def test_upsert_delta_wins_base_survives(spark, base, delta):
    bdf = spark.createDataFrame(list(base.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    ddf = spark.createDataFrame(list(delta.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    got = {r["k"]: r["v"] for r in upsert_by_key(bdf, ddf, "k").collect()}
    want = {**base, **delta}
    assert got == want
