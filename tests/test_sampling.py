"""Sampling/balancing operators (A6/A7, O4/O5, P11) — determinism and
cut semantics."""

from __future__ import annotations

from efficient_llm_data_wrangling_spark.operators import sampling as S


def _toy(spark):
    rows = [(i, "yes" if i % 3 == 0 else "no") for i in range(30)]
    return spark.createDataFrame(rows, "id int, label string")


def test_sample_k_seeded_exact_and_deterministic(spark):
    df = _toy(spark)
    a = sorted(r["id"] for r in S.sample_k_seeded(df, 5, seed=7).collect())
    b = sorted(r["id"] for r in S.sample_k_seeded(df, 5, seed=7).collect())
    assert len(a) == 5 and a == b


def test_stratified_sample_caps_per_label(spark):
    df = _toy(spark)
    out = S.stratified_sample_seeded(df, "label", 4, seed=1).collect()
    by = {}
    for r in out:
        by.setdefault(r["label"], []).append(r["id"])
    assert len(by["yes"]) == 4 and len(by["no"]) == 4


def test_class_balance_matches_min_class(spark):
    df = _toy(spark)  # 10 yes, 20 no
    out = S.class_balance_seeded(df, "label", seed=3).collect()
    by = {}
    for r in out:
        by.setdefault(r["label"], 0)
        by[r["label"]] += 1
    assert by == {"yes": 10, "no": 10}


def test_split_head_rest_partition(spark):
    df = _toy(spark)
    train, test = S.split_head_rest(df, 3, "id")
    train_ids = sorted(r["id"] for r in train.collect())
    assert train_ids == [0, 1, 2]
    assert test.count() == 27


def test_top_up_concat(spark):
    df = _toy(spark)
    base = df.filter("id < 2")
    out = S.top_up_concat(base, df.filter("id >= 10"), target=5, key="id")
    assert out.count() == 5
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 10, 11, 12]


def test_shuffle_seeded_is_permutation(spark):
    df = _toy(spark)
    out = [r["id"] for r in S.shuffle_seeded(df, seed=5).collect()]
    assert sorted(out) == list(range(30))
    out2 = [r["id"] for r in S.shuffle_seeded(df, seed=5).collect()]
    assert out == out2
