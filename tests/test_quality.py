"""Data-quality operators (operators/quality.py): one-pass expectation
suites and profiles, approx-vs-exact distinct bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from efficient_llm_data_wrangling_spark.operators import quality as Q
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_expectation_counts_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in Q.expectation_counts(
            df, [("nonneg", F.col("v") >= 0), ("has_v", F.col("v").isNotNull())]
        ).collect()
    }
    # NULL >= 0 evaluates to NULL -> counts as a violation, not a pass
    assert out["nonneg"] == (3, 2)
    assert out["has_v"] == (3, 1)


def test_expectation_counts_single_job(spark):
    """All rules must fold into one aggregate: a single scan node."""
    o = load_table(spark, SF_SMOKE, "orders")
    df = Q.expectation_counts(
        o,
        [("a", F.col("o_totalprice") >= 0), ("b", F.col("o_custkey").isNotNull())],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_profile_columns_approx_within_bounds(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    prof = {r["column"]: r for r in Q.profile_columns(
        o, ["o_orderstatus", "o_custkey"]
    ).collect()}
    exact = o.agg(
        F.countDistinct("o_orderstatus").alias("s"),
        F.countDistinct("o_custkey").alias("c"),
    ).collect()[0]
    assert prof["o_orderstatus"]["n_nulls"] == 0
    assert abs(prof["o_orderstatus"]["approx_distinct"] - exact["s"]) <= max(
        2, 0.05 * exact["s"]
    )
    assert abs(prof["o_custkey"]["approx_distinct"] - exact["c"]) <= max(
        2, 0.05 * exact["c"]
    )
    assert prof["o_custkey"]["n_rows"] == o.count()


def test_observed_metrics_piggyback_on_action(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders")
    out, obs = Q.observed(
        o,
        "write_metrics",
        {
            "n": F.count(F.lit(1)),
            "null_keys": F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
            "max_price": F.max("o_totalprice"),
        },
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "observed"))
    got = obs.get
    assert got["n"] == o.count()
    assert got["null_keys"] == 0
    assert got["max_price"] > 0


def test_embedding_norms_match_numpy(spark):
    """Exact recompute: per-label norm-milli stats from numpy over the
    raw vectors (same left-to-right fold order as the query)."""
    import math

    from efficient_llm_data_wrangling_spark.queries.quality import (
        embedding_norm_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    per_label: dict[int, list[int]] = {}
    for r in emb:
        acc = 0.0
        for x in r.embedding:
            acc = acc + float(x) * float(x)
        milli = math.floor(math.sqrt(acc) * 1000.0 + 0.5)
        per_label.setdefault(r.label, []).append(milli)
    got = {r.label: r for r in embedding_norm_report(spark, SF_SMOKE).collect()}
    for label, millis in per_label.items():
        g = got[label]
        assert g.n_vecs == len(millis)
        assert g.norm_milli_min == min(millis)
        assert g.norm_milli_max == max(millis)
        assert g.norm_milli_mean == sum(millis) // len(millis)
        assert g.n_zero_vecs == sum(1 for m in millis if m == 0)


def test_quality_rank_fusion_replays_in_pure_python(spark):
    """Min-tie ranks and the fused RRF score must recompute exactly
    from the emitted signal values; rank 1 under each signal must be
    held by a best-value doc, and the fused ordering must not
    degenerate to any single signal's ordering (the reason an
    ensemble exists)."""
    from efficient_llm_data_wrangling_spark.queries.quality import (
        _RRF_K,
        quality_rank_fusion,
    )
    from tests.conftest import SF_SMOKE

    rows = quality_rank_fusion(spark, SF_SMOKE).collect()
    assert rows

    def min_rank(vals, v, descending):
        better = sum(1 for x in vals if (x > v if descending else x < v))
        return better + 1

    reps = [r.rep_milli for r in rows]
    bigs = [r.bigram_milli for r in rows]
    chds = [r.chardiv_milli for r in rows]
    for r in rows:
        assert r.r_rep == min_rank(reps, r.rep_milli, False)
        assert r.r_bigram == min_rank(bigs, r.bigram_milli, False)
        assert r.r_chardiv == min_rank(chds, r.chardiv_milli, True)
        want = (
            10**9 // (_RRF_K + r.r_rep)
            + 10**9 // (_RRF_K + r.r_bigram)
            + 10**9 // (_RRF_K + r.r_chardiv)
        )
        assert r.rrf_micro == want
    fused = sorted(rows, key=lambda r: (-r.rrf_micro, r.doc_id))
    for single in ("r_rep", "r_bigram", "r_chardiv"):
        by_single = sorted(rows, key=lambda r: (getattr(r, single), r.doc_id))
        assert [r.doc_id for r in fused] != [r.doc_id for r in by_single]


def test_dq_quarantine_split_reconciles_with_expectation_counts(spark):
    """The quarantine manifest must reconcile with the counting gate:
    per-rule bit tallies equal dq_expectations_orders' violation
    counts, reasons decode the mask in rule order, and no clean row
    leaks into quarantine (every mask is non-zero and within range)."""
    from efficient_llm_data_wrangling_spark.queries.quality import (
        _DQ_RULES_SQL,
        dq_expectations_orders,
        dq_quarantine_split,
    )
    from tests.conftest import SF_SMOKE

    rows = dq_quarantine_split(spark, SF_SMOKE).collect()
    gate = {r.rule: r for r in dq_expectations_orders(spark, SF_SMOKE).collect()}
    names = [name for name, _ in _DQ_RULES_SQL]
    assert set(gate) == set(names)
    bit_tallies = {name: 0 for name in names}
    for r in rows:
        assert 0 < r.reason_mask < (1 << len(names))
        decoded = [n for i, n in enumerate(names) if r.reason_mask & (1 << i)]
        assert r.reasons == ",".join(decoded)
        for n in decoded:
            bit_tallies[n] += 1
    for name in names:
        assert bit_tallies[name] == gate[name].n_violations, name
    # the suite plants price_cap violations, so the path is exercised
    assert bit_tallies["price_cap"] > 0
    assert len(rows) <= sum(bit_tallies.values())


def test_conformal_prediction_replays_in_pure_python(spark):
    """The report row must recompute exactly from the collected
    documents: exact-rational least squares, integer residual
    numerators, the finite-sample k election (including the
    unbounded-interval branch when k > n_cal), and coverage."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.quality import (
        _CFM_CAL_MOD,
        conformal_prediction_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    [r] = conformal_prediction_report(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    data = [
        (
            d.doc_id,
            len([t for t in d.text.split(" ") if t]),
            int(d.n_chars),
            int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:8], 16) % _CFM_CAL_MOD,
        )
        for d in docs
    ]
    tr = [(x, y) for _, x, y, b in data if b not in (3, 4)]
    ca = [(x, y) for _, x, y, b in data if b == 3]
    te = [(x, y) for _, x, y, b in data if b == 4]
    n = len(tr)
    sx, sy = sum(x for x, _ in tr), sum(y for _, y in tr)
    sxx, sxy = sum(x * x for x, _ in tr), sum(x * y for x, y in tr)
    d_ = n * sxx - sx * sx
    d_ = d_ if d_ > 0 else 1
    bn, an = n * sxy - sx * sy, sy * sxx - sx * sxy
    res = sorted(abs(y * d_ - an - bn * x) for x, y in ca)
    k = (90 * (len(ca) + 1) + 99) // 100
    unbounded = k > len(ca)
    q = res[min(k, len(ca)) - 1]
    cov = sum(
        1 for x, y in te if unbounded or abs(y * d_ - an - bn * x) <= q
    )
    assert (r.n_train, r.n_cal, r.n_test) == (n, len(ca), len(te))
    assert r.slope_micro == math.floor(bn / d_ * 1e6 + 0.5)
    assert r.intercept_micro == math.floor(an / d_ * 1e6 + 0.5)
    assert r.interval_unbounded == int(unbounded)
    if unbounded:
        assert r.half_width_milli_chars == -1
    else:
        assert r.half_width_milli_chars == math.floor(q / d_ * 1000 + 0.5)
    assert r.n_covered == cov
    assert r.coverage_permille == cov * 1000 // len(te)
    assert r.target_permille == 900
