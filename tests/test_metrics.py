"""Comparator unit fixtures (FIXTURES.md §6) — the exact semantics of
the reference's golden comparator (utils.py:20-128), quirks included."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import metrics as M

CASES = [
    # (pred, gold, expect_match, why)
    ("Yes", "yes", True, "case-insensitive"),
    ("  yes  ", "yes", True, "trimmed"),
    ("no", "yes", False, "plain mismatch, no numbers"),
    ("1.50", "1.52", True, "within 0.021"),
    ("1.50", "1.53", False, "outside 0.021"),
    ("1/4", "1.01 4.02", True, "dead fraction branch: extracts [1,4]"),
    ("1/4", "0.26", False, "NOT 0.25: regex group never captures '/'"),
    ("-1.5", "1.5", True, "sign dropped by group capture"),
    ("a 1.0 b 2.0", "1.01", True, "zip truncates to shorter side"),
    (None, "", True, "None → empty string"),
    ("Not excutable", "yes", False, "error sentinel never matches"),
    ("3 out of 5", "3.01 4.99", True, "multiple numbers, both within"),
    ("abc", "abc", True, "exact non-numeric"),
    ("", "0", False, "empty pred has no numbers"),
]


@pytest.mark.parametrize("pred,gold,expect,why", CASES)
def test_answers_match(spark, pred, gold, expect, why):
    df = spark.createDataFrame([(pred, gold)], "pred string, gold string")
    got = df.select(M.answers_match(F.col("pred"), F.col("gold")).alias("m")).first()["m"]
    assert got == expect, why


def test_list_pred_flattening(spark):
    # utils.py:89-90 — list predictions joined with spaces
    df = spark.createDataFrame([(["a", "b"], "a b")], "pred array<string>, gold string")
    got = df.select(
        M.answers_match(M.flatten_answer(F.col("pred")), F.col("gold")).alias("m")
    ).first()["m"]
    assert got is True


def test_confusion_metrics_guards(spark):
    # all-'no' gold → tp=0, fp=0 → prec=0/max(1,0)=0 (reference guard)
    df = spark.createDataFrame(
        [("no", "no"), ("yes", "no"), ("no", "no")], "pred string, label_str string"
    )
    row = M.confusion_metrics(df, "pred", "label_str").first()
    assert row["tp"] == 0 and row["tn"] == 2 and row["fp"] == 1 and row["fn"] == 0
    assert row["prec"] == 0.0 and row["rec"] == 0.0 and row["f1"] == 0.0
    assert row["acc"] == pytest.approx(2 / 3)


def test_trial_stats_population_std(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    row = M.trial_stats(df, "v").first()
    assert row["mean"] == pytest.approx(2.0)
    # np.std is population std (ddof=0) → sqrt(2/3)
    assert row["std"] == pytest.approx((2 / 3) ** 0.5)
