"""Distributed function application (functions/apply.py, G4–G7)."""

from __future__ import annotations

import pytest

from efficient_llm_data_wrangling_spark.functions.apply import (
    NOT_EXECUTABLE,
    accuracy_of,
    apply_function,
    is_executable,
    validate_function,
)

UPPER = "def string_transformation(s):\n    return s.upper()\n"
BOOM = "def string_transformation(s):\n    raise ValueError('boom')\n"
LISTY = "def string_transformation(s):\n    return s.split('-')\n"
HALF = (
    "def string_transformation(s):\n"
    "    return s.upper() if s < 'c' else s\n"
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "text string")


def test_apply_basic(spark):
    out = apply_function(_df(spark, ["ab", "cd"]), UPPER, task="data_transformation")
    assert [r["pred"] for r in out.orderBy("text").collect()] == ["AB", "CD"]


def test_apply_error_sentinel(spark):
    out = apply_function(_df(spark, ["x"]), BOOM, task="data_transformation")
    assert out.first()["pred"] == NOT_EXECUTABLE  # function_generator.py:147


def test_apply_error_null_mode(spark):
    out = apply_function(
        _df(spark, ["x"]), BOOM, task="data_transformation", error_sentinel=None
    )
    assert out.first()["pred"] is None


def test_apply_list_output_flattens(spark):
    out = apply_function(_df(spark, ["a-b-c"]), LISTY, task="data_transformation")
    assert out.first()["pred"] == "a b c"  # utils.py:89-90 semantics


def test_is_executable_probe(spark):
    ok, _ = is_executable(_df(spark, ["x"]), UPPER, task="data_transformation")
    bad, msg = is_executable(_df(spark, ["x"]), BOOM, task="data_transformation")
    assert ok and not bad


def test_validate_function_gates(spark):
    demos = spark.createDataFrame(
        [("a", "A"), ("b", "B"), ("d", "d")], "text string, label_str string"
    )
    # HALF uppercases a,b but not d → demo acc 3/3? 'd'→'d' matches — 100%
    verdict, acc = validate_function(demos, None, HALF, task="data_transformation")
    assert verdict == "ok" and acc == 1.0
    # BOOM fails the executability probe
    verdict, acc = validate_function(demos, None, BOOM, task="data_transformation")
    assert verdict == "not_executable"
    # supervision gate: HALF scores 0 on uppercase-only supervision
    sup = spark.createDataFrame([("x", "X!")], "text string, label_str string")
    verdict, _ = validate_function(demos, sup, HALF, task="data_transformation")
    assert verdict == "not_general"


def test_accuracy_of(spark):
    df = spark.createDataFrame(
        [("a", "A"), ("b", "WRONG")], "text string, label_str string"
    )
    assert accuracy_of(df, UPPER, task="data_transformation") == pytest.approx(0.5)


def test_unknown_task_raises(spark):
    with pytest.raises(ValueError, match="unknown task"):
        apply_function(_df(spark, ["x"]), UPPER, task="nope")
