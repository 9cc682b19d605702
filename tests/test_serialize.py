"""Row-serialization operators (P2/P3/P4, data_utils.py:63-101)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators.serialize import (
    select_suffixed,
    serialize_keyed,
    serialize_values,
    with_text_column,
)


def test_serialize_keyed_nan_and_trim(spark):
    df = spark.createDataFrame([("  a  ", None, 3)], "x string, y string, z int")
    out = df.select(serialize_keyed(["x", "y", "z"]).alias("t")).first()["t"]
    assert out == "x: a ^ y: nan ^ z: 3"


def test_serialize_values_custom_sep(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    out = df.select(serialize_values(["x", "y"], sep_tok="|", nan_tok="?").alias("t")).first()["t"]
    assert out == "a|?"


def test_select_suffixed_strips(spark):
    df = spark.createDataFrame([(1, "x", "y")], "id_A int, name_A string, name_B string")
    a = select_suffixed(df, "A")
    assert a.columns == ["id", "name"]
    assert a.first()["name"] == "x"


def test_with_text_column_keeps_row(spark):
    df = spark.createDataFrame([(1, "p")], "id int, name string")
    out = with_text_column(df, ["name"], style="keyed")
    assert out.columns == ["id", "name", "text"]
    assert out.first()["text"] == "name: p"
