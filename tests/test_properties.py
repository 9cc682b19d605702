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


# ---------------------------------------------------------------------------
# Golden comparator ≡ reference semantics (utils.py:20-107), property-based
# ---------------------------------------------------------------------------

import re as _re


def _ref_extract(s: str) -> list[float]:
    """Faithful reimplementation of the reference's number extraction
    (fast_ai_wrangler/utils/utils.py:38-61): findall returns the GROUP
    capture, so signs are dropped and the fraction alternative is dead
    code (digits before '/' match the first alternative)."""
    caps = _re.findall(r"[-+]?([0-9]*\.?[0-9]+|[0-9]+\/[0-9]+)", s)
    out = []
    for c in caps:
        if "/" in c:  # unreachable in practice; kept for fidelity
            a, b = c.split("/")
            out.append(float(a) / float(b))
        else:
            out.append(float(c))
    return out


def _ref_match(pred, gold, tol=0.021) -> bool:
    p = ("" if pred is None else str(pred)).lower().strip()
    g = ("" if gold is None else str(gold)).lower().strip()
    if p == g:
        return True
    np_, ng = _ref_extract(p), _ref_extract(g)
    if not np_ or not ng:
        return False
    return all(abs(a - b) <= tol for a, b in zip(np_, ng))


_answer_text = st.text(
    alphabet="0123456789./+- aby\t\n\r\x0b\x0c\x1c\x85\xa0 　", min_size=0, max_size=18
)


@_slow
@given(pairs=st.lists(st.tuples(_answer_text, _answer_text), min_size=1, max_size=60))
def test_comparator_matches_reference_semantics(spark, pairs):
    """The column-expression comparator must agree with a from-first-
    principles Python port of the reference's utils.py on ARBITRARY
    strings — numbers, fractions, signs, whitespace, mixed junk —
    not just the curated fixture cases."""
    from efficient_llm_data_wrangling_spark.operators import metrics as M

    rows = [(i, p, g) for i, (p, g) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, pred string, gold string")
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", M.answers_match(F.col("pred"), F.col("gold")).alias("m")
        ).collect()
    }
    for i, (p, g) in enumerate(pairs):
        assert got[i] == _ref_match(p, g), (p, g, got[i])


@given(st.integers(min_value=1, max_value=2**53 - 1))
@settings(max_examples=300, deadline=None)
def test_lnint_series_tracks_math_log(v):
    """The bit-portable integer-ln series must track true ln within
    ~1e-13 relative over the full 53-bit domain (the docstring's
    accuracy claim, fuzzed). Evaluated in pure Python with the same
    operation order as the SQL template — IEEE doubles both ways."""
    import math

    from efficient_llm_data_wrangling_spark.functions.portable_math import LN2_SQL

    ln2 = float(LN2_SQL.split("'")[1])
    b = v.bit_length()
    m = v / float(1 << (b - 1))
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    acc = 1.0 / 31.0
    for k in range(29, 0, -2):
        acc = 1.0 / k + z2 * acc
    got = float(b - 1) * ln2 + 2.0 * (z * acc)
    want = math.log(v)
    assert abs(got - want) <= 1e-13 * max(1.0, abs(want)) + 1e-13


@_slow
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(1, 5),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_rounds_match_pure_python_reference(spark, words):
    """The delimiter-string BPE round (pair count → winner → greedy
    leftmost merge) must agree with a direct list-based Python
    implementation of Sennrich's algorithm for any word/count multiset
    over a tiny alphabet (maximally collision- and tie-prone)."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BPE_D,
        _bpe_apply_merge,
        _bpe_pair_counts,
    )

    # collapse duplicate words (the engine operates on the type table)
    types: dict[str, int] = {}
    for w, c in words:
        types[w] = types.get(w, 0) + c

    # --- pure-Python reference on symbol lists -------------------------
    py_syms = {w: [ch for ch in w] for w in types}

    def py_round():
        counts: dict[tuple, int] = {}
        for w, syms in py_syms.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + types[w]
        if not counts:
            return None
        win = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        for w, syms in py_syms.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == win:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            py_syms[w] = out
        return win

    # --- engine on the delimited-string representation -----------------
    sdf = spark.createDataFrame(
        [("".join(_BPE_D + ch + _BPE_D for ch in w), c) for w, c in types.items()],
        "sym string, cnt long",
    )
    for _ in range(3):
        pc = _bpe_pair_counts(sdf)
        win_rows = (
            pc.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b")).limit(1).collect()
        )
        py_win = py_round()
        if not win_rows:
            assert py_win is None
            break
        assert (win_rows[0].a, win_rows[0].b) == py_win
        win_df = spark.createDataFrame(
            [(win_rows[0].a, win_rows[0].b)], "a string, b string"
        )
        sdf = _bpe_apply_merge(sdf, win_df)
    got = sorted(
        (tuple(x for x in r.sym.split(_BPE_D) if x), r.cnt) for r in sdf.collect()
    )
    want = sorted((tuple(syms), types[w]) for w, syms in py_syms.items())
    assert got == want


def test_kmv_distinct_calibration_replays_in_pure_python(spark):
    """The KMV estimator must recompute exactly from the collected
    events: per event_type, distinct md5-prefix hashes, k-th smallest,
    (k-1)*2^32 // h_k (exact fallback when fewer than k), and the
    permille error bookkeeping."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _KMV_K,
        _KMV_SPACE,
        kmv_distinct_calibration,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = kmv_distinct_calibration(spark, SF_SMOKE).collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id").collect()
    users: dict[str, set[int]] = {}
    for r in ev:
        users.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        us = users[r.event_type]
        assert r.exact_users == len(us)
        hs = sorted({int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) for u in us})
        if len(hs) >= _KMV_K:
            want = (_KMV_K - 1) * _KMV_SPACE // hs[_KMV_K - 1]
        else:
            want = len(us)
        assert r.kmv_users == want
        assert r.err_permille == abs(want - len(us)) * 1000 // len(us)
    assert len(rows) == len(users)


def test_sample_quantile_calibration_replays_in_pure_python(spark):
    """The sampled-quantile estimator must recompute exactly from the
    collected orders: md5 1/8 sample rule, ceil-rank election on both
    the sample and the full data, true-rank probe, and the permille
    error bookkeeping — and the error must respect the trivial DKW
    sanity cap for the observed sample sizes."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _SQC_QMS,
        sample_quantile_calibration,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = sample_quantile_calibration(spark, SF_SMOKE).collect()
    assert rows
    ords = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    full: dict[str, list[int]] = {}
    samp: dict[str, list[int]] = {}
    for r in ords:
        cents = int(round(r.o_totalprice * 100))
        full.setdefault(r.o_orderpriority, []).append(cents)
        if int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[0], 16) < 2:
            samp.setdefault(r.o_orderpriority, []).append(cents)

    def elect(vals: list[int], qm: int) -> int:
        vals = sorted(vals)
        return vals[(len(vals) * qm + 99) // 100 - 1]

    assert len(rows) == len(full) * len(_SQC_QMS)
    for r in rows:
        f, s = sorted(full[r.g]), sorted(samp[r.g])
        assert (r.n, r.n_sample) == (len(f), len(s))
        assert r.est_cents == elect(s, r.qm)
        assert r.exact_cents == elect(f, r.qm)
        rank_le = sum(1 for v in f if v <= r.est_cents)
        assert r.rank_err_permille == abs(rank_le * 1000 // len(f) - r.qm * 10)
        # 4-sigma binomial sanity: a sampling/rank bug lands far outside
        sigma = (r.qm * (1000 - r.qm) / 1000 / r.n_sample) ** 0.5 * 1000
        assert r.rank_err_permille <= 4 * sigma + 1000 / r.n_sample + 10


def test_quantile_replicate_spread_replays_in_pure_python(spark):
    """Every replicate election, the median-of-replicates, and the
    rank-space spread must recompute exactly from the collected
    orders; the median must sit inside [min, max] and the spread must
    cover the calibration query's single-sample estimate band."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _QRS_REPS,
        _SQC_QMS,
        quantile_replicate_spread,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = quantile_replicate_spread(spark, SF_SMOKE).collect()
    assert rows
    ords = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    full: dict[str, list[int]] = {}
    reps: dict[tuple[str, int], list[int]] = {}
    for r in ords:
        cents = int(round(r.o_totalprice * 100))
        full.setdefault(r.o_orderpriority, []).append(cents)
        bh = int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[0], 16)
        if bh < _QRS_REPS:
            reps.setdefault((r.o_orderpriority, bh), []).append(cents)

    def elect(vals, qm):
        vals = sorted(vals)
        return vals[(len(vals) * qm + 99) // 100 - 1]

    assert len(rows) == len(full) * len(_SQC_QMS)
    for r in rows:
        ests = sorted(
            elect(reps[(r.g, i)], r.qm) for i in range(_QRS_REPS) if (r.g, i) in reps
        )
        assert r.n_reps == len(ests)
        assert (r.est_min, r.est_max) == (ests[0], ests[-1])
        assert r.est_median == ests[(len(ests) * 50 + 99) // 100 - 1]
        assert r.est_min <= r.est_median <= r.est_max
        f = full[r.g]
        span = sum(1 for v in f if r.est_min < v <= r.est_max)
        assert r.spread_rank_permille == span * 1000 // len(f)
        assert 0 <= r.spread_rank_permille <= 1000


def test_join_cardinality_estimate_replays_and_flags_empty_sample(spark):
    """Pure-Python replay of every leg at the smoke SF: per-key
    frequency products for exact cardinality, the md5 1/16 key-domain
    sample for the estimate, and the derived error column; the
    events self-join must exhibit the documented small-domain failure
    (zero sampled keys ⇒ estimate 0) that n_keys_sampled exists to
    flag."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _JCE_LEGS,
        _JCE_RATE,
        join_cardinality_estimate,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.join_name: r for r in join_cardinality_estimate(spark, SF_SMOKE).collect()}
    assert set(rows) == {name for name, *_ in _JCE_LEGS}

    def bucket(v) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[0], 16)

    for name, a_tbl, a_key, b_tbl, b_key in _JCE_LEGS:
        ca: dict = {}
        for x in load_table(spark, SF_SMOKE, a_tbl).select(a_key).collect():
            ca[x[0]] = ca.get(x[0], 0) + 1
        cb: dict = {}
        for x in load_table(spark, SF_SMOKE, b_tbl).select(b_key).collect():
            cb[x[0]] = cb.get(x[0], 0) + 1
        exact = sum(c * cb.get(k, 0) for k, c in ca.items())
        sampled = [k for k in ca if bucket(k) == 0]
        est = _JCE_RATE * sum(
            ca[k] * cb.get(k, 0) for k in sampled if k in cb
        )
        r = rows[name]
        assert r.n_keys_sampled == len(sampled)
        assert r.exact_rows == exact
        assert r.est_rows == est
        assert r.abs_err_permille == abs(est - exact) * 1000 // max(exact, 1)
    # the documented small-domain failure mode at the smoke SF
    ev = rows["events_user_selfjoin"]
    assert ev.n_keys_sampled == 0 and ev.est_rows == 0
    assert ev.abs_err_permille == 1000


def test_equidepth_selectivity_replays_and_population_finding_holds(spark):
    """Pure-Python replay of the equi-depth estimator at the smoke SF:
    rank bucketing, per-bucket value ranges, within-bucket
    interpolation, and the derived error column; plus the
    population-conditional finding — at ~16 rows/bucket the equal-count
    histogram is WORSE than the fixed grid on the narrow slab."""
    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _PSEL_B,
        predicate_selectivity_equidepth,
        predicate_selectivity_estimate,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = {
        r.pred_name: r
        for r in predicate_selectivity_equidepth(spark, SF_SMOKE).collect()
    }
    cents = sorted(
        (r.c, r.k)
        for r in load_table(spark, SF_SMOKE, "orders")
        .select(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("c"),
            F.col("o_orderkey").alias("k"),
        )
        .collect()
    )
    n = len(cents)
    vals = [c for c, _ in cents]
    mn, mx = vals[0], vals[-1]
    span = mx - mn + 1
    preds = {
        "mid_quarter": (mn + span * 3 // 8, mn + span * 5 // 8 - 1),
        "top_decile": (mn + span * 9 // 10, mx),
        "narrow_slab": (mn + span // 2, mn + span // 2 + span // 100),
    }
    buckets: dict[int, list[int]] = {}
    for i, v in enumerate(vals):
        buckets.setdefault(i * _PSEL_B // n, []).append(v)
    for name, (lo, hi) in preds.items():
        est = 0
        for bv in buckets.values():
            lo_b, hi_b, cnt = min(bv), max(bv), len(bv)
            ov = max(0, min(hi, hi_b) - max(lo, lo_b) + 1)
            est += cnt * ov // (hi_b - lo_b + 1)
        exact = sum(1 for v in vals if lo <= v <= hi)
        r = rows[name]
        assert (r.lo_cents, r.hi_cents) == (lo, hi)
        assert r.est_rows == est
        assert r.exact_rows == exact
        assert r.abs_err_permille == abs(est - exact) * 1000 // max(exact, 1)
    # population-conditional finding at the smoke SF: thin buckets lose
    width = {
        r.pred_name: r
        for r in predicate_selectivity_estimate(spark, SF_SMOKE).collect()
    }
    assert (
        rows["narrow_slab"].abs_err_permille
        > width["narrow_slab"].abs_err_permille
    )


def test_join_order_plan_replays_dp_in_pure_python(spark):
    """Full pure-Python replay of the Selinger rung at the smoke SF:
    base counts, sampled/true pair products, chain-walk true subset
    cardinalities, fixed-point selectivities, the left-to-right
    independence-model extension, and BOTH DP arms with their
    tie-breaks — every one of the 10 output rows must match
    bit-for-bit (the shared-formula guard). The measured findings must
    hold: all plans agree, and the nation edge exhibits the
    deterministic small-domain zero-sample degeneracy."""
    import hashlib
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _JOP_SCALE,
        join_order_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.subset: r for r in join_order_plan(spark, SF_SMOKE).collect()}
    assert len(rows) == 10

    def col(t, c):
        return [x[0] for x in load_table(spark, SF_SMOKE, t).select(c).collect()]

    def bucket(v) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[0], 16)

    nk = Counter(col("nation", "n_nationkey"))
    c_nat = col("customer", "c_nationkey")
    c_cust = col("customer", "c_custkey")
    o_cust = col("orders", "o_custkey")
    o_ord = col("orders", "o_orderkey")
    l_ord = col("lineitem", "l_orderkey")
    n_n, n_c, n_o, n_l = len(nk), len(c_nat), len(o_cust), len(l_ord)
    ck, ok, lk = Counter(c_cust), Counter(o_ord), Counter(l_ord)
    cnat_by_cust = Counter()
    for natk, custk in zip(c_nat, c_cust):
        cnat_by_cust[custk] += nk.get(natk, 0)

    def sampled_product(ca: Counter, cb: Counter) -> int:
        return 16 * sum(
            ca[k] * cb.get(k, 0) for k in ca if bucket(k) == 0
        )

    p_nc = sampled_product(nk, Counter(c_nat))
    p_co = sampled_product(ck, Counter(o_cust))
    p_ol = sampled_product(ok, lk)
    t_nc = sum(nk.get(k, 0) for k in c_nat)
    t_co = sum(ck.get(k, 0) for k in o_cust)
    t_ol = sum(ok.get(k, 0) * c for k, c in lk.items())
    t_nco = sum(cnat_by_cust.get(k, 0) for k in o_cust)
    t_col = sum(ck.get(cu, 0) * lk.get(od, 0) for cu, od in zip(o_cust, o_ord))
    t_ncol = sum(
        cnat_by_cust.get(cu, 0) * lk.get(od, 0) for cu, od in zip(o_cust, o_ord)
    )
    S = _JOP_SCALE
    f_nc, f_co, f_ol = (
        p_nc * S // (n_n * n_c),
        p_co * S // (n_c * n_o),
        p_ol * S // (n_o * n_l),
    )
    e_nc = n_n * n_c * f_nc // S
    e_co = n_c * n_o * f_co // S
    e_ol = n_o * n_l * f_ol // S
    e_nco = e_nc * n_o * f_co // S
    e_col = e_co * n_l * f_ol // S
    e_ncol = e_nco * n_l * f_ol // S
    o_nc = "N,C" if n_n < n_c else "C,N"
    o_co = "C,O" if n_c <= n_o else "O,C"
    o_ol = "O,L" if n_o < n_l else "L,O"

    def step3(c_a, o_a, c_b, o_b, card):
        cost = min(c_a, c_b) + card
        if c_a < c_b:
            order = o_a
        elif c_b < c_a:
            order = o_b
        else:
            order = min(o_a, o_b)
        return cost, order

    c_nco, o_nco = step3(e_nc, o_nc + ",O", e_co, o_co + ",N", e_nco)
    c_col, o_col = step3(e_co, o_co + ",L", e_ol, o_ol + ",C", e_col)
    ct_nco, ot_nco = step3(t_nc, o_nc + ",O", t_co, o_co + ",N", t_nco)
    ct_col, ot_col = step3(t_co, o_co + ",L", t_ol, o_ol + ",C", t_col)
    c_ncol, o_ncol = step3(c_nco, o_nco + ",L", c_col, o_col + ",N", e_ncol)
    ct_ncol, ot_ncol = step3(ct_nco, ot_nco + ",L", ct_col, ot_col + ",N", t_ncol)

    expected = {
        "N": (1, n_n, n_n, 0, 0, "N", "N"),
        "C": (1, n_c, n_c, 0, 0, "C", "C"),
        "O": (1, n_o, n_o, 0, 0, "O", "O"),
        "L": (1, n_l, n_l, 0, 0, "L", "L"),
        "NC": (2, e_nc, t_nc, e_nc, t_nc, o_nc, o_nc),
        "CO": (2, e_co, t_co, e_co, t_co, o_co, o_co),
        "OL": (2, e_ol, t_ol, e_ol, t_ol, o_ol, o_ol),
        "NCO": (3, e_nco, t_nco, c_nco, ct_nco, o_nco, ot_nco),
        "COL": (3, e_col, t_col, c_col, ct_col, o_col, ot_col),
        "NCOL": (4, e_ncol, t_ncol, c_ncol, ct_ncol, o_ncol, ot_ncol),
    }
    for subset, (nt, ec, tc, ecost, tcost, eo, to) in expected.items():
        r = rows[subset]
        assert r.n_tables == nt, subset
        assert r.est_card == ec, subset
        assert r.true_card == tc, subset
        assert r.est_cost == ecost, subset
        assert r.true_cost == tcost, subset
        assert r.est_order == eo, subset
        assert r.true_order == to, subset
        assert r.card_err_permille == abs(ec - tc) * 1000 // max(tc, 1), subset
        assert r.plans_agree == int(eo == to), subset
    # the measured findings: full agreement, and the nation edge's
    # deterministic zero-sample degeneracy (25-key domain, 1/16 slice)
    assert all(r.plans_agree == 1 for r in rows.values())
    assert p_nc == 0 and rows["NC"].est_card == 0
    assert rows["NCOL"].true_order == "N,C,O,L"


def test_bloom_semijoin_prune_replays_in_pure_python(spark):
    """Pure-Python replay of the runtime filter at the smoke SF: md5
    positions, bit sets, per-key pass verdicts, row-count joins, and
    both derived permille columns for BOTH filter sizes; the bloom
    guarantee (no false negatives: pass ⊇ true matches) must hold."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _BLOOM_K,
        _BLOOM_SIZES,
        bloom_semijoin_prune_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.m_bits: r for r in bloom_semijoin_prune_report(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_BLOOM_SIZES)

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).collect()
    line = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()
    dim = {r.o_orderkey for r in orders if r.o_orderpriority == "1-URGENT"}
    fact_counts: dict = {}
    for r in line:
        fact_counts[r.l_orderkey] = fact_counts.get(r.l_orderkey, 0) + 1
    n_fact = sum(fact_counts.values())
    n_match = sum(n for k, n in fact_counts.items() if k in dim)

    def pos(key, i, m):
        return int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16) % m

    for m in _BLOOM_SIZES:
        bits = {pos(k, i, m) for k in dim for i in range(_BLOOM_K)}
        passing = {
            k
            for k in fact_counts
            if all(pos(k, i, m) in bits for i in range(_BLOOM_K))
        }
        # the bloom guarantee: no false negatives
        assert dim & set(fact_counts) <= passing
        n_pass = sum(fact_counts[k] for k in passing)
        r = rows[m]
        assert r.k_hashes == _BLOOM_K
        assert r.n_dim_keys == len(dim)
        assert r.bits_set == len(bits)
        assert r.n_fact_rows == n_fact
        assert r.n_pass_rows == n_pass
        assert r.n_match_rows == n_match
        assert r.n_false_positive_rows == n_pass - n_match
        assert r.fp_measured_permille == (n_pass - n_match) * 1000 // max(
            n_fact - n_match, 1
        )
        bpm = len(bits) * 1000 // m
        assert r.fp_expected_permille == bpm * bpm * bpm // 1_000_000


def test_hll_distinct_calibration_replays_in_pure_python(spark):
    """The HLL estimator must recompute exactly from the collected
    events: 64 registers from the md5-prefix hash (top 6 bits index,
    26-bit rho field), dyadic indicator sum, alpha_64 * m^2 / Z with
    the linear-counting fallback, floor'd — including which regime
    fired."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _HLL_LIN_BAR,
        _HLL_M,
        _HLL_WBITS,
        _HLL_WMOD,
        hll_distinct_calibration,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = hll_distinct_calibration(spark, SF_SMOKE).collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id").collect()
    users: dict[str, set[int]] = {}
    for r in ev:
        users.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        us = users[r.event_type]
        assert r.exact_users == len(us)
        regs: dict[int, int] = {}
        for h in {int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) for u in us}:
            j, w = h // _HLL_WMOD, h % _HLL_WMOD
            rho = _HLL_WBITS + 1 - (w.bit_length() if w else 0)
            regs[j] = max(regs.get(j, 0), rho)
        v = _HLL_M - len(regs)
        zz = sum(1.0 / (1 << mj) for mj in sorted(regs.values())) + float(v)
        e_raw = 0.709 * (_HLL_M * _HLL_M) / zz
        if e_raw <= float(_HLL_LIN_BAR) and v > 0:
            # math.log is not the portable ln, but the two agree far
            # below the floor's resolution at these magnitudes
            e_fin, regime = _HLL_M * math.log(_HLL_M / v), "linear"
        else:
            e_fin, regime = e_raw, "raw"
        assert r.regime == regime
        assert r.hll_users == math.floor(e_fin)
        assert r.err_permille == abs(math.floor(e_fin) - len(us)) * 1000 // len(us)
    assert len(rows) == len(users)


def test_wordpiece_train_rounds_replays_in_pure_python(spark):
    """The WordPiece winners must recompute exactly from the corpus:
    word-type histogram, delimited-string greedy-leftmost merges, and
    per round the (score DESC, a, b) election with score = pair /
    (cnt_a * cnt_b) as one IEEE division of exact ints."""
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _WP_ROUNDS,
        wordpiece_train_rounds,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = wordpiece_train_rounds(spark, SF_SMOKE).orderBy("merge_round").collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    types: Counter = Counter()
    for r in docs:
        for t in r.text.split(" "):
            if t:
                types[t] += 1
    d = "\x1f"
    syms = {w: "".join(d + ch + d for ch in w) for w in types}
    got = {r.merge_round: r for r in rows}
    for rnd in range(1, _WP_ROUNDS + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, s in syms.items():
            ss = [x for x in s.split(d) if x]
            cnt = types[w]
            for x in ss:
                sc[x] += cnt
            for i in range(len(ss) - 1):
                pc[(ss[i], ss[i + 1])] += cnt
        if not pc:
            assert rnd not in got
            break
        (wa, wb), wp = min(
            pc.items(), key=lambda kv: (-(kv[1] / (sc[kv[0][0]] * sc[kv[0][1]])), kv[0])
        )
        r = got[rnd]
        assert (r.a, r.b, r.pair_count) == (wa, wb, wp)
        assert (r.cnt_a, r.cnt_b) == (sc[wa], sc[wb])
        assert r.score == wp / (sc[wa] * sc[wb])
        pat, rep = d + wa + d + d + wb + d, d + wa + wb + d
        syms = {w: s.replace(pat, rep) for w, s in syms.items()}
    assert len(rows) == min(_WP_ROUNDS, len(got))


def test_maxscore_pruning_report_replays_in_pure_python(spark):
    """df / n_matching / skippable bookkeeping replay exactly; the
    score bounds and theta replay through math.log to 1e-9 (the
    portable ln agrees with libm far below that); the safety claim
    n_topk_skipped == 0 must hold."""
    import math

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
        maxscore_pruning_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = maxscore_pruning_report(spark, SF_SMOKE).collect()
    assert len(rows) == len(_BM25_TERMS)
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    toks = [[t for t in r.text.split(" ") if t] for r in docs]
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks) / n
    tf = [{t: ts.count(t) for t in _BM25_TERMS} for ts in toks]
    df = {t: sum(1 for x in tf if x[t] > 0) for t in _BM25_TERMS}
    idf = {t: math.log(2 * n + 2) - math.log(2 * df[t] + 1) for t in _BM25_TERMS}

    def contrib(t, x, dl):
        return idf[t] * (x[t] * (_BM25_K1 + 1.0)) / (
            x[t] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        )

    match = [
        (i, x, len(ts))
        for i, (x, ts) in enumerate(zip(tf, toks))
        if sum(x.values()) > 0
    ]
    scores = sorted(
        (sum(contrib(t, x, dl) for t in _BM25_TERMS) for _, x, dl in match),
        reverse=True,
    )
    theta = min(scores[: _BM25_TOPK])
    ub = {
        t: max(contrib(t, x, dl) for _, x, dl in match) for t in _BM25_TERMS
    }
    n_skip = sum(
        1
        for _, x, dl in match
        if sum(ub[t] for t in _BM25_TERMS if x[t] > 0) < theta
    )
    for r in rows:
        assert r.df == df[r.term]
        assert abs(r.ub_6 - ub[r.term]) < 1e-6
        assert abs(r.theta_6 - theta) < 1e-6
        assert r.n_matching == len(match)
        assert r.n_skippable == n_skip
        assert r.skippable_permille == r.n_skippable * 1000 // r.n_matching
        assert r.n_topk_skipped == 0
    # essential split: cumulative UB in ascending order crosses theta
    byub = sorted(rows, key=lambda r: (r.ub_6, r.term))
    cum = 0.0
    for r in byub:
        cum += ub[r.term]
        assert r.essential == (cum >= theta - 1e-9)


def test_gaussian_nb_holdout_replays_in_pure_python(spark):
    """Both arms of the NB report must recompute exactly from the
    collected embeddings: micro-unit ints, seed-centroid cell
    assignment, md5 3:1 split, exact sufficient statistics, micro-nat
    term rounding, y-asc argmax, and the confusion bookkeeping. The
    variance guard a <= 0 must never fire on this data."""
    import hashlib
    import math
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _GNB_CELLS,
        gaussian_nb_holdout_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = gaussian_nb_holdout_report(spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = {
        r.vec_id: [math.floor(float(e) * 1000000 + 0.5) for e in r.embedding]
        for r in emb
    }
    lab = {r.vec_id: int(r.label) for r in emb}
    dims = len(next(iter(X.values())))
    mu = {c: X[c] for c in sorted(X) if c < _GNB_CELLS}
    cell = {
        v: min(
            mu,
            key=lambda c: (sum((x - m) ** 2 for x, m in zip(X[v], mu[c])), c),
        )
        for v in X
    }
    is_train = {
        v: int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 4 < 3 for v in X
    }
    got = {(r.target, r.y_true, r.y_pred): r for r in rows}
    for target, y in (("label", lab), ("cell", cell)):
        tr = [v for v in X if is_train[v]]
        te = [v for v in X if not is_train[v]]
        stats = {}
        for c in set(y.values()):
            vs = [X[v] for v in tr if y[v] == c]
            if not vs:
                continue
            n = len(vs)
            stats[c] = [
                (n, sum(col), sum(x * x for x in col))
                for col in zip(*vs)
            ]
        pri = Counter(y[v] for v in tr)
        nt = len(tr)
        pm = {
            c: math.floor((math.log(pri[c]) - math.log(nt)) * 1e6 + 0.5) for c in pri
        }
        conf: Counter = Counter()
        n_correct = 0
        mlabel = min(pri, key=lambda c: (-pri[c], c))
        n_major = sum(1 for v in te if y[v] == mlabel)
        for v in te:
            best = None
            for c, st in stats.items():
                tot = 0
                for (n, sx, sxx), xv in zip(st, X[v]):
                    a = n * sxx - sx * sx
                    assert a > 0  # guard must not fire
                    q = float(n * xv - sx)
                    t = -0.5 * math.log(a) + math.log(n) - 0.5 * (q * q) / float(a)
                    tot += math.floor(t * 1e6 + 0.5)
                tot += pm[c]
                if best is None or (tot, -c) > (best[0], -best[1]):
                    best = (tot, c)
            conf[(y[v], best[1])] += 1
            n_correct += y[v] == best[1]
        for (yt, yp), n in conf.items():
            r = got[(target, yt, yp)]
            assert r.n_vecs == n
            assert r.n_test == len(te)
            assert r.n_correct == n_correct
            assert r.accuracy_permille == n_correct * 1000 // len(te)
            assert r.baseline_permille == n_major * 1000 // len(te)
        assert sum(conf.values()) == len(te)
    assert len(rows) == sum(
        1 for k in got
    )


def test_kneser_ney_bigram_lm_replays_in_pure_python(spark):
    """Both model rows must recompute exactly from the collected
    documents: md5 split, train counts, Ney discount, exact-rational
    KN and Laplace numerators/denominators, micro-nat rounding, and
    the heldout-weighted averages."""
    import hashlib
    import math
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.corpusops import (
        kneser_ney_bigram_lm,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.model: r for r in kneser_ney_bigram_lm(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    tr_bg: Counter = Counter()
    he_bg: Counter = Counter()
    vocab = set()
    for r in docs:
        ts = [t for t in r.text.split(" ") if t]
        train = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 4 < 3
        if train:
            vocab.update(ts)
        if len(ts) < 2:
            continue
        for a, b in zip(ts, ts[1:]):
            (tr_bg if train else he_bg)[(a, b)] += 1
    ca = Counter()
    n1a = Counter()
    ncb = Counter()
    for (a, b), c in tr_bg.items():
        ca[a] += c
        n1a[a] += 1
        ncb[b] += 1
    nct = len(tr_bg)
    dn = sum(1 for c in tr_bg.values() if c == 1)
    dd = dn + 2 * sum(1 for c in tr_bg.values() if c == 2)
    dd = dd if dd > 0 else 1
    v = len(vocab)
    kn_sum = lap_sum = n_tot = 0
    for (a, b), n in he_bg.items():
        cb = tr_bg.get((a, b), 0)
        if a not in ca:
            knn, knd = ncb.get(b, 0) + 1, nct + v
        else:
            knn = max(cb * dd - dn, 0) * (nct + v) + dn * n1a[a] * (ncb.get(b, 0) + 1)
            knn = knn if knn > 0 else 1
            knd = ca[a] * dd * (nct + v)
        kn_sum += n * math.floor((math.log(knn) - math.log(knd)) * 1e6 + 0.5)
        lap_sum += n * math.floor(
            (math.log(cb + 1) - math.log(ca.get(a, 0) + v)) * 1e6 + 0.5
        )
        n_tot += n
    for model, s in (("kneser_ney", kn_sum), ("laplace", lap_sum)):
        r = rows[model]
        assert r.discount_micro == dn * 1000000 // dd
        assert r.n_heldout_bigrams == n_tot
        assert r.n_heldout_types == len(he_bg)
        # SQL div truncates toward zero; Python // floors
        want = s // n_tot if s >= 0 else -((-s) // n_tot)
        assert r.avg_logprob_micro == want


def test_label_propagation_replays_in_pure_python(spark):
    """Both method rows must recompute exactly from the doc_id set:
    bridged-clique graph, 4 synchronous LPA rounds (count DESC, label
    ASC ties), 4 min-label rounds, convergence flags, and the
    split/merge audit vs the closed-form ground truth."""
    from collections import Counter, defaultdict

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _LPA_G,
        _LPA_ROUNDS,
        label_propagation_communities,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.method: r for r in label_propagation_communities(spark, SF_SMOKE).collect()}
    ids = [r.doc_id for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()]
    gk = {v: v // _LPA_G for v in ids}
    groups = defaultdict(list)
    for v in ids:
        groups[gk[v]].append(v)
    # degenerate tails (size 1-2) are excluded from the vertex set
    groups = {g: m for g, m in groups.items() if len(m) >= 3}
    ids = [v for v in ids if gk[v] in groups]
    edges = []
    for mem in groups.values():
        edges += [(a, b) for a in mem for b in mem if a != b]
    reps = {g: min(m) for g, m in groups.items()}
    bridges = [
        (reps[g], reps[g + 1]) for g in sorted(groups) if g % 3 == 0 and g + 1 in groups
    ]
    for a, b in bridges:
        edges += [(a, b), (b, a)]

    def audit(lab):
        bygroup = defaultdict(set)
        bycomm = defaultdict(set)
        for v, L in lab.items():
            bygroup[gk[v]].add(L)
            bycomm[L].add(gk[v])
        return (
            len(set(lab.values())),
            sum(1 for s in bygroup.values() if len(s) > 1),
            sum(1 for s in bycomm.values() if len(s) > 1),
        )

    lab = {v: v for v in ids}
    for _ in range(_LPA_ROUNDS):
        prev = lab
        nbr = defaultdict(Counter)
        for s, d in edges:
            nbr[d][prev[s]] += 1
        lab = {v: min(nbr[v], key=lambda L: (-nbr[v][L], L)) for v in ids}
    changed = sum(1 for v in ids if lab[v] != prev[v])
    r = rows["lpa"]
    nc, ns, nm = audit(lab)
    assert (r.n_nodes, r.n_edges_directed, r.n_bridges) == (len(ids), len(edges), len(bridges))
    assert (r.n_communities, r.n_split_groups, r.n_merged_communities) == (nc, ns, nm)
    assert r.n_changed_last_round == changed == 0

    lab = {v: v for v in ids}
    for _ in range(_LPA_ROUNDS):
        prev = lab
        nbr = {}
        for s, d in edges:
            nbr[d] = min(nbr.get(d, prev[d]), prev[s])
        lab = {v: min(prev[v], nbr.get(v, prev[v])) for v in ids}
    changed = sum(1 for v in ids if lab[v] != prev[v])
    r = rows["minlabel_cc"]
    nc, ns, nm = audit(lab)
    assert (r.n_communities, r.n_split_groups, r.n_merged_communities) == (nc, ns, nm)
    assert r.n_changed_last_round == changed == 0
    assert r.n_merged_communities == r.n_bridges  # every bridge chains


def test_fim_span_transform_replays_in_pure_python(spark):
    """Every row must recompute exactly from the collected documents:
    the three md5 draws, the min/max span election, and the PSM
    reassembly (including empty prefix/middle/suffix edges)."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        _FIM_RATE_PCT,
        fim_span_transform,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.doc_id: r for r in fim_span_transform(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    saw_apply = saw_skip = saw_empty_edge = False
    for d in docs:
        ts = [t for t in d.text.split(" ") if t]
        n = len(ts)
        u = lambda tag: int(  # noqa: E731
            hashlib.md5(f"{d.doc_id}:{tag}".encode()).hexdigest()[:8], 16
        )
        applied = u("fimp") % 100 < _FIM_RATE_PCT
        s, e = sorted((u("fim1") % (n + 1), u("fim2") % (n + 1)))
        r = rows[d.doc_id]
        assert r.fim_applied == applied and r.n_tokens == n
        if applied:
            assert (r.span_start, r.span_end, r.n_middle) == (s, e, e - s)
            want = (
                "<PRE>" + " ".join(ts[:s]) + "<SUF>" + " ".join(ts[e:])
                + "<MID>" + " ".join(ts[s:e])
            )
            assert r.out_text == want
            saw_apply = True
            saw_empty_edge = saw_empty_edge or s == 0 or e == n or s == e
        else:
            assert (r.span_start, r.span_end, r.n_middle) == (0, 0, 0)
            assert r.out_text == d.text
            saw_skip = True
    assert saw_apply and saw_skip and saw_empty_edge


def test_range_partition_plan_replays_in_pure_python(spark):
    """All six rows must recompute exactly from the collected orders:
    md5 sample, order-statistic boundaries, (lo, hi] assignment, both
    hash arms, and the skew bookkeeping."""
    import hashlib
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.layout import (
        _RPP_P,
        _RPP_SAMPLE_MOD,
        range_partition_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {(r.arm, r.method): r for r in range_partition_plan(spark, SF_SMOKE).collect()}
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).collect()
    u32 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16)  # noqa: E731
    arms = {
        "price": [(r.o_orderkey, round(float(r.o_totalprice) * 100)) for r in o],
        "priority": [(r.o_orderkey, int(r.o_orderpriority[0])) for r in o],
    }
    for arm, kvs in arms.items():
        smp = sorted(
            kv for k, kv in kvs if u32(f"{k}:rps:{arm}") % _RPP_SAMPLE_MOD == 0
        )
        m = len(smp)
        bs = [smp[max((i * m) // _RPP_P, 1) - 1] for i in range(1, _RPP_P)]
        counts = {"range_sampled": Counter(), "hash_key": Counter(), "hash_row": Counter()}
        for k, kv in kvs:
            pid = _RPP_P
            for i, b in enumerate(bs, 1):
                lo = bs[i - 2] if i >= 2 else None
                if (lo is None or kv > lo) and kv <= b:
                    pid = i
                    break
            counts["range_sampled"][pid] += 1
            counts["hash_key"][u32(f"{kv}:hk") % _RPP_P] += 1
            counts["hash_row"][u32(f"{k}:hr:{arm}") % _RPP_P] += 1
        for method, c in counts.items():
            r = rows[(arm, method)]
            total = sum(c.values())
            assert r.n_partitions_nonempty == len(c)
            assert (r.max_rows, r.min_rows, r.total_rows) == (max(c.values()), min(c.values()), total)
            ideal = total // _RPP_P
            assert r.skew_permille == (max(c.values()) - ideal) * 1000 // ideal


def test_cusum_changepoint_replays_in_pure_python(spark):
    """All arm x event_type rows must recompute exactly from the
    collected events: daily counts, the planted step, the closed-form
    CUSUM (cum minus clamped prefix-min), bar, alarms, and delays —
    and the closed form must equal the textbook recursion."""
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.temporal import (
        _CUSUM_BASE_DAYS,
        _CUSUM_STEP_DAY,
        cusum_changepoint_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    import datetime

    rows = {(r.arm, r.event_type): r for r in cusum_changepoint_report(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    daily: Counter = Counter()
    for r in ev:
        d = (r.ts.date() - datetime.date(2024, 1, 1)).days + 1
        daily[(r.event_type, d)] += 1
    types = sorted({t for t, _ in daily})
    days = sorted({d for _, d in daily})
    for arm in ("raw", "planted"):
        for t in types:
            x = {
                d: (
                    daily[(t, d)] + daily[(t, d)] // 2
                    if arm == "planted" and d >= _CUSUM_STEP_DAY
                    else daily[(t, d)]
                )
                for d in days
            }
            s0 = sum(v for d, v in x.items() if d <= _CUSUM_BASE_DAYS)
            mon = [d for d in days if d > _CUSUM_BASE_DAYS]
            # textbook recursion
            s_rec, mx, first = 0, 0, None
            cum, mn = 0, 0
            for d in mon:
                dd = 100 * x[d] - 11 * s0
                s_rec = max(0, s_rec + dd)
                cum += dd
                mn = min(mn, cum)
                assert s_rec == cum - min(0, mn)  # closed form == recursion
                mx = max(mx, s_rec)
                if first is None and s_rec > 20 * s0:
                    first = d
            r = rows[(arm, t)]
            assert r.n_days_monitored == len(mon)
            assert r.baseline_mean_centi == s0 * 100 // _CUSUM_BASE_DAYS
            assert r.max_cusum_centi == mx
            assert r.alarm_bar_centi == 20 * s0
            assert r.alarm_fired == (first is not None)
            assert r.first_alarm_day == (first if first is not None else -1)
            want_delay = (
                first - _CUSUM_STEP_DAY
                if arm == "planted" and first is not None
                else -1
            )
            assert r.detection_delay_days == want_delay
    assert len(rows) == 2 * len(types)


def test_pareto_skyline_replays_by_brute_force(spark):
    """Both arms must equal the O(n^2) dominance definition computed
    in pure Python (weak dominance, one strict coordinate), including
    equal-(size, price) twins co-surviving; ranks and counts too."""
    from efficient_llm_data_wrangling_spark.queries.analytics import pareto_skyline_parts
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    from decimal import Decimal

    got = {}
    for r in pareto_skyline_parts(spark, SF_SMOKE).collect():
        got.setdefault(r.arm, []).append(r)
    parts = [
        (r.p_partkey, int(r.p_size), int(Decimal(str(round(r.p_retailprice, 2))) * 100))
        for r in load_table(spark, SF_SMOKE, "part").collect()
    ]
    for arm, sgn in (("premium", -1), ("compact", 1)):
        # dominance: q beats p iff q is <= on both normalized axes and < on one
        want = []
        for k, s, c in parts:
            dominated = any(
                (sgn * s2 <= sgn * s and c2 <= c) and (sgn * s2 < sgn * s or c2 < c)
                for _, s2, c2 in parts
            )
            if not dominated:
                want.append((s, k, c))
        want.sort()
        rows = sorted(got[arm], key=lambda r: (r.p_size, r.p_partkey))
        assert [(r.p_size, r.p_partkey, r.price_centi) for r in rows] == want
        assert [r.skyline_rank for r in rows] == list(range(1, len(want) + 1))
        assert all(r.n_skyline_parts == len(want) for r in rows)


def test_sketch_merge_replays_in_pure_python(spark):
    """Both sketch rows must recompute exactly from the collected
    documents: per-source HLL registers / KMV k-sets, the merge
    (register max-of-max; k smallest of the union of k-sets), the
    rebuild from the global distinct stream, the zero-mismatch
    identity, and both floor'd estimates."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.analytics import (
        _HLL_LIN_BAR,
        _HLL_M,
        _HLL_WBITS,
        _HLL_WMOD,
        _KMV_K,
        _KMV_SPACE,
        sketch_merge_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.sketch: r for r in sketch_merge_report(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    per_src: dict[str, set[int]] = {}
    for r in docs:
        h = int(hashlib.md5(r.text.encode()).hexdigest()[:8], 16)
        per_src.setdefault(r.source, set()).add(h)
    glob = set().union(*per_src.values())

    def hll_regs(hs):
        regs: dict[int, int] = {}
        for h in hs:
            j, w = h // _HLL_WMOD, h % _HLL_WMOD
            rho = _HLL_WBITS + 1 - (w.bit_length() if w else 0)
            regs[j] = max(regs.get(j, 0), rho)
        return regs

    def hll_est(regs):
        v = _HLL_M - len(regs)
        zz = sum(1.0 / (1 << mj) for mj in sorted(regs.values())) + float(v)
        e_raw = 0.709 * (_HLL_M * _HLL_M) / zz
        if e_raw <= float(_HLL_LIN_BAR) and v > 0:
            return math.floor(_HLL_M * math.log(_HLL_M / v))
        return math.floor(e_raw)

    merged: dict[int, int] = {}
    for hs in per_src.values():
        for j, mj in hll_regs(hs).items():
            merged[j] = max(merged.get(j, 0), mj)
    rebuilt = hll_regs(glob)
    r = rows["hll"]
    assert merged == rebuilt and r.n_structure_mismatch == 0
    assert r.merged_estimate == hll_est(merged)
    assert r.rebuilt_estimate == hll_est(rebuilt)

    kmv_merged = sorted(set().union(*[set(sorted(hs)[:_KMV_K]) for hs in per_src.values()]))[:_KMV_K]
    kmv_rebuilt = sorted(glob)[:_KMV_K]
    r = rows["kmv"]
    assert kmv_merged == kmv_rebuilt and r.n_structure_mismatch == 0
    assert r.merged_estimate == (_KMV_K - 1) * _KMV_SPACE // max(kmv_merged)
    assert r.rebuilt_estimate == (_KMV_K - 1) * _KMV_SPACE // max(kmv_rebuilt)

    for r in rows.values():
        assert r.n_sources == len(per_src)
        assert r.exact_distinct == len(glob)
        assert r.estimates_equal is True
        assert r.err_permille_merged == abs(r.merged_estimate - len(glob)) * 1000 // len(glob)


def test_fellegi_sunter_replays_in_pure_python(spark):
    """The linkage report must recompute exactly from the collected
    customers: planted twins (md5 coins), nation-block pairs,
    smoothed m/u counts, micro-nat weights (+-1 micro vs math.log —
    the portable-ln tolerance), and both arms' confusion counts
    rebuilt from the engine's own integer weights."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.curation import fellegi_sunter_linkage
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    from decimal import Decimal

    out = fellegi_sunter_linkage(spark, SF_SMOKE).collect()
    rows = {(r.arm, r.field): r for r in out}
    assert len(rows) == 6

    def coin(k, tag):
        return int(hashlib.md5(f"fs:{k}:{tag}".encode()).hexdigest()[:8], 16)

    rot = {"AUTOMOBILE": "BUILDING", "BUILDING": "FURNITURE", "FURNITURE": "HOUSEHOLD",
           "HOUSEHOLD": "MACHINERY", "MACHINERY": "AUTOMOBILE"}
    cust = load_table(spark, SF_SMOKE, "customer").collect()
    base = [
        (r.c_custkey, r.c_name, r.c_nationkey, r.c_mktsegment,
         math.floor(Decimal(str(round(r.c_acctbal, 2))) / 1000))
        for r in cust
    ]
    # twin tuple: (orig key, nation, name, seg, bkt)
    twins = [
        (k, nat,
         name if coin(k, "nm") % 10 < 7 else name.upper(),
         seg if coin(k, "sg") % 10 < 9 else rot[seg],
         bkt if coin(k, "ab") % 10 < 8 else bkt + 1)
        for (k, name, nat, seg, bkt) in base
        if coin(k, "pk") % 5 == 0
    ]
    pairs = [
        (int(tk == k), int(tname == name), int(tseg == seg), int(tbkt == bkt))
        for (k, name, nat, seg, bkt) in base
        for (tk, tnat, tname, tseg, tbkt) in twins
        if nat == tnat
    ]
    n_pairs, n_m = len(pairs), sum(p[0] for p in pairs)
    n_u = n_pairs - n_m
    stats = {}
    for i, f in ((1, "name"), (2, "segment"), (3, "acctbal_kbucket")):
        a_m = sum(p[i] for p in pairs if p[0])
        a_u = sum(p[i] for p in pairs if not p[0])
        stats[f] = (a_m, a_u)
        r = rows[("lr_positive", f)]
        assert r.n_pairs == n_pairs and r.n_true_matches == n_m
        assert r.m_permille == (a_m + 1) * 1000 // (n_m + 2)
        assert r.u_permille == (a_u + 1) * 1000 // (n_u + 2)
        wa = math.floor(math.log(((a_m + 1) * (n_u + 2)) / ((a_u + 1) * (n_m + 2))) * 1e6 + 0.5)
        wd = math.floor(math.log(((n_m + 1 - a_m) * (n_u + 2)) / ((n_u + 1 - a_u) * (n_m + 2))) * 1e6 + 0.5)
        assert abs(r.w_agree_micro - wa) <= 1 and abs(r.w_disagree_micro - wd) <= 1
    # confusion from the ENGINE's integer weights (exact replay)
    w = {f: (rows[("lr_positive", f)].w_agree_micro, rows[("lr_positive", f)].w_disagree_micro)
         for f in ("name", "segment", "acctbal_kbucket")}
    t_bayes = rows[("prior_odds", "name")].threshold_micro
    assert abs(t_bayes - math.floor(math.log(n_u / n_m) * 1e6 + 0.5)) <= 1
    for arm, thr in (("lr_positive", 0), ("prior_odds", t_bayes)):
        pred = tp = 0
        for ism, agn, ags, agb in pairs:
            s = (w["name"][0] if agn else w["name"][1]) \
                + (w["segment"][0] if ags else w["segment"][1]) \
                + (w["acctbal_kbucket"][0] if agb else w["acctbal_kbucket"][1])
            if s > thr:
                pred += 1
                tp += ism
        r = rows[(arm, "name")]
        assert r.n_predicted_matches == pred and r.n_true_positives == tp
        assert r.precision_permille == (tp * 1000 // pred if pred else -1)
        assert r.recall_permille == tp * 1000 // n_m


def test_cross_validation_replays_in_pure_python(spark):
    """All five fold rows must recompute exactly from the collected
    embeddings: cell assignment, md5 'cv:' folds, global-minus-fold
    sufficient statistics (the subtraction trick), micro-nat scoring
    with y-asc argmax, per-fold confusion, and the exact-integer
    mean/spread/variance across folds."""
    import hashlib
    import math
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.clustering import (
        _CV_K,
        _GNB_CELLS,
        cross_validation_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.fold: r for r in cross_validation_report(spark, SF_SMOKE).collect()}
    assert len(rows) == _CV_K
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = {
        r.vec_id: [math.floor(float(e) * 1000000 + 0.5) for e in r.embedding]
        for r in emb
    }
    mu = {c: X[c] for c in sorted(X) if c < _GNB_CELLS}
    y = {
        v: min(
            mu,
            key=lambda c: (sum((x - m) ** 2 for x, m in zip(X[v], mu[c])), c),
        )
        for v in X
    }
    fold = {
        v: int(hashlib.md5(f"cv:{v}".encode()).hexdigest()[:8], 16) % _CV_K
        for v in X
    }
    classes = sorted(set(y.values()))
    # global stats per (class, dim)
    dims = len(next(iter(X.values())))
    gstat = {
        c: [
            (len(vs), sum(col), sum(x * x for x in col))
            for col in zip(*vs)
        ]
        for c, vs in ((c, [X[v] for v in X if y[v] == c]) for c in classes)
    }
    accs = []
    for f in range(_CV_K):
        # train stats by subtraction
        stats = {}
        nls = {}
        for c in classes:
            fvs = [X[v] for v in X if y[v] == c and fold[v] == f]
            fst = [
                (len(fvs), sum(col), sum(x * x for x in col))
                for col in (zip(*fvs) if fvs else [[]] * dims)
            ]
            st = []
            for (gn, gsx, gsxx), (fn, fsx, fsxx) in zip(gstat[c], fst):
                n = gn - fn
                sx = gsx - fsx
                a = n * (gsxx - fsxx) - sx * sx
                st.append((max(n, 1), sx, max(a, 1)))
            stats[c] = st
            nls[c] = max(len([v for v in X if y[v] == c and fold[v] != f]), 1)
        nt = sum(nls.values())
        pm = {
            c: math.floor((math.log(nls[c]) - math.log(nt)) * 1e6 + 0.5)
            for c in classes
        }
        te = [v for v in X if fold[v] == f]
        mlabel = min(nls, key=lambda c: (-nls[c], c))
        n_major = sum(1 for v in te if y[v] == mlabel)
        n_correct = 0
        for v in te:
            best = None
            for c in classes:
                tot = 0
                for (n, sx, a), xv in zip(stats[c], X[v]):
                    q = float(n * xv - sx)
                    t = -0.5 * math.log(a) + math.log(n) - 0.5 * (q * q) / float(a)
                    tot += math.floor(t * 1e6 + 0.5)
                tot += pm[c]
                if best is None or (tot, -c) > (best[0], -best[1]):
                    best = (tot, c)
            n_correct += y[v] == best[1]
        r = rows[f]
        assert r.n_test == len(te)
        assert r.n_train == len(X) - len(te)
        assert r.n_correct == n_correct
        assert r.accuracy_permille == n_correct * 1000 // len(te)
        assert r.baseline_permille == n_major * 1000 // len(te)
        accs.append(n_correct * 1000 // len(te))
    sa, sa2 = sum(accs), sum(a * a for a in accs)
    for r in rows.values():
        assert r.mean_accuracy_permille == sa // _CV_K
        assert r.spread_permille == max(accs) - min(accs)
        assert r.var25_permille2 == _CV_K * sa2 - sa * sa


def test_isotonic_calibration_replays_against_pava(spark):
    """The minimax closed form must equal the textbook PAVA run with
    exact Fractions, in BOTH directions — plus the planted scorer,
    bucket stats, floors, violation counts, SSE, and the election."""
    import hashlib
    from collections import defaultdict
    from fractions import Fraction

    from efficient_llm_data_wrangling_spark.queries.quality import (
        _ISO_BW,
        _ISO_NOISE,
        _ISO_SHIFT,
        isotonic_calibration_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    out = isotonic_calibration_report(spark, SF_SMOKE).collect()
    rows = {(r.direction, r.bucket): r for r in out}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        y = int(r.lang == "en")
        score = int(hashlib.md5(f"iso:{r.doc_id}".encode()).hexdigest()[:8], 16) % _ISO_NOISE + _ISO_SHIFT * y
        a = agg[score // _ISO_BW]
        a[0] += 1
        a[1] += y
    bks = sorted(agg)
    ns = [agg[b][0] for b in bks]
    ss = [agg[b][1] for b in bks]

    def pava(ws, vs):
        # blocks of (weight, sum) pooled while out of order
        blocks = []
        for w, v in zip(ws, vs):
            blocks.append([w, v])
            while len(blocks) > 1 and Fraction(blocks[-2][1], blocks[-2][0]) > Fraction(blocks[-1][1], blocks[-1][0]):
                w2, v2 = blocks.pop()
                blocks[-1][0] += w2
                blocks[-1][1] += v2
        # expand each pooled block back to its input points
        fit = []
        i = 0
        for w, v in blocks:
            cnt = 0
            acc = 0
            while acc < w:
                acc += ws[i + cnt]
                cnt += 1
            fit += [Fraction(v, w)] * cnt
            i += cnt
        return fit

    fit_inc = pava(ns, ss)
    fit_dec = list(reversed(pava(list(reversed(ns)), list(reversed(ss)))))
    for direction, fit in (("increasing", fit_inc), ("decreasing", fit_dec)):
        raw_v = iso_v = sse = 0
        accs = []
        for idx, b in enumerate(bks):
            r = rows[(direction, b)]
            n, s = agg[b]
            raw_micro = s * 1000000 // n
            iso_micro = (fit[idx].numerator * 1000000) // fit[idx].denominator
            assert r.n_docs == n and r.n_pos == s
            assert r.raw_rate_micro == raw_micro
            assert r.iso_rate_micro == iso_micro
            accs.append((n, s, raw_micro, iso_micro))
            sse += n * (raw_micro - iso_micro) ** 2
        for (n, s, _, im), (n2, s2, _, im2) in zip(accs, accs[1:]):
            if direction == "increasing":
                raw_v += s * n2 > s2 * n
                iso_v += im > im2
            else:
                raw_v += s * n2 < s2 * n
                iso_v += im < im2
        r0 = rows[(direction, bks[0])]
        assert r0.n_raw_violations == raw_v
        assert r0.n_iso_violations == iso_v == 0
        assert r0.fit_sse == sse
    inc_sse = rows[("increasing", bks[0])].fit_sse
    dec_sse = rows[("decreasing", bks[0])].fit_sse
    for (d, _), r in rows.items():
        want = (
            r.fit_sse < (dec_sse if d == "increasing" else inc_sse)
            or (inc_sse == dec_sse and d == "increasing")
        )
        assert r.is_winner == want
    assert len(out) == 2 * len(bks)


def test_bellman_ford_replays_in_pure_python(spark):
    """Every route row must recompute exactly from the collected fact
    tables: min-price edge distillation in centi-cents, 4 relaxation
    rounds, hop-of-final-cost election, direct-edge comparison."""
    from decimal import Decimal

    from efficient_llm_data_wrangling_spark.queries.temporal import (
        _BF_HOPS,
        bellman_ford_trade_paths,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {
        (r.src_nation, r.dst_nation): r
        for r in bellman_ford_trade_paths(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    ).collect()
    orders = {r.o_orderkey: r.o_custkey
              for r in load_table(spark, SF_SMOKE, "orders").collect()}
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF_SMOKE, "customer").collect()}
    supp = {r.s_suppkey: r.s_nationkey
            for r in load_table(spark, SF_SMOKE, "supplier").collect()}
    name = {r.n_nationkey: r.n_name
            for r in load_table(spark, SF_SMOKE, "nation").collect()}
    edges: dict[tuple[int, int], int] = {}
    for r in li:
        src = cust[orders[r.l_orderkey]]
        dst = supp[r.l_suppkey]
        pc = int(Decimal(str(round(r.l_extendedprice, 2))) * 100)
        k = (src, dst)
        if k not in edges or pc < edges[k]:
            edges[k] = pc
    ks = sorted(name)
    d = [{(s, s): 0 for s in ks}]
    for _ in range(_BF_HOPS):
        prev = d[-1]
        cur = dict(prev)
        for (u, v), w in edges.items():
            for s in ks:
                if (s, u) in prev:
                    c = prev[(s, u)] + w
                    if (s, v) not in cur or c < cur[(s, v)]:
                        cur[(s, v)] = c
        d.append(cur)
    fin = d[_BF_HOPS]
    assert len(rows) == len(fin)
    for (s, v), c in fin.items():
        r = rows[(name[s], name[v])]
        assert r.cost_centi == c
        hops = next(i for i in range(_BF_HOPS + 1) if d[i].get((s, v)) == c)
        assert r.hops == hops
        w = edges.get((s, v))
        assert r.direct_centi == w
        want_sav = w - c if (w is not None and w > c) else None
        assert r.indirect_savings_centi == want_sav


def test_sorted_neighborhood_replays_in_pure_python(spark):
    """All three pass rows must recompute exactly from the collected
    documents: planted corpus, both sort keys, rank-window candidate
    pairs, exact shingle Jaccard, truth set, recall."""
    from efficient_llm_data_wrangling_spark.queries.scale import (
        _SNM_KLEN,
        _SNM_W,
        sorted_neighborhood_dedup,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r["pass"]: r for r in sorted_neighborhood_dedup(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang").collect()
    corpus = [(r.doc_id, r.text, r.lang) for r in docs]
    corpus += [(d + 1000000, t, g) for d, t, g in corpus[: len(docs)] if d % 7 == 0]
    for d, t, g in [(d, t, g) for d, t, g in corpus[: len(docs)] if d % 10 == 0]:
        toks = t.split(" ")
        keep = max(len(toks) - 5, 3)
        corpus.append((d + 2000000, " ".join(toks[:keep]), g))

    def sh(t):
        toks = t.split(" ")
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(n)}

    sets = {d: sh(t) for d, t, _ in corpus}
    lang = {d: g for d, _, g in corpus}

    def jac(a, b):
        return len(sets[a] & sets[b]) / len(sets[a] | sets[b])

    truth = sum(
        1
        for i, (a, _, ga) in enumerate(corpus)
        for b, _, gb in corpus[i + 1 :]
        if ga == gb and jac(a, b) >= 0.8
    )
    pairs_by_pass = {}
    for p, key in (
        ("prefix", lambda t: t[:_SNM_KLEN]),
        ("suffix", lambda t: t[::-1][:_SNM_KLEN]),
    ):
        order = sorted(((key(t), d) for d, t, _ in corpus))
        prs = set()
        for i in range(len(order)):
            for off in range(1, _SNM_W + 1):
                if i + off < len(order):
                    a, b = order[i][1], order[i + off][1]
                    prs.add((min(a, b), max(a, b)))
        pairs_by_pass[p] = prs
    pairs_by_pass["union"] = pairs_by_pass["prefix"] | pairs_by_pass["suffix"]
    for p, prs in pairs_by_pass.items():
        r = rows[p]
        ver = [(a, b) for a, b in prs if jac(a, b) >= 0.8]
        found = sum(1 for a, b in ver if lang[a] == lang[b])
        assert r.n_candidate_pairs == len(prs)
        assert r.n_verified_pairs == len(ver)
        assert r.n_truth_found == found
        assert r.n_truth_pairs == truth
        assert r.recall_permille == found * 1000 // truth


def test_feature_hashing_replays_in_pure_python(spark):
    """All four dimension rungs must recompute exactly from the
    collected documents: the wordNgrams=3 feature burst, the type
    histogram, md5 buckets, and every occupancy/collision column."""
    import hashlib
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        _FH_DIMS,
        feature_hashing_collision_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.dims: r for r in feature_hashing_collision_report(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_FH_DIMS)
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    ty: Counter = Counter()
    for r in docs:
        toks = r.text.split(" ")
        feats = list(toks)
        feats += [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        feats += [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        ty.update(f for f in feats if f != "")
    for d in _FH_DIMS:
        bk: dict[int, list[int]] = {}
        for w, c in ty.items():
            b = int(hashlib.md5(f"fh:{w}".encode()).hexdigest()[:8], 16) % d
            bk.setdefault(b, []).append(c)
        n_types = len(ty)
        mass = sum(ty.values())
        shared_t = sum(len(v) for v in bk.values() if len(v) > 1)
        shared_m = sum(sum(v) for v in bk.values() if len(v) > 1)
        r = rows[d]
        assert r.n_types == n_types
        assert r.n_buckets_used == len(bk)
        assert r.load_milli == n_types * 1000 // d
        assert r.n_types_shared == shared_t
        assert r.type_collision_permille == shared_t * 1000 // n_types
        assert r.mass_collision_permille == shared_m * 1000 // mass
        assert r.max_bucket_types == max(len(v) for v in bk.values())


def test_rouge_pair_separation_replays_in_pure_python(spark):
    """All four (arm, n) rows must recompute exactly from the
    collected documents: mutant construction, partner election,
    clipped-count overlap, rational F1, micro floors, aggregates."""
    from collections import Counter, defaultdict

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        rouge_pair_separation,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {(r.arm, r.n): r for r in rouge_pair_separation(spark, SF_SMOKE).collect()}
    docs = sorted(
        load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang").collect(),
        key=lambda r: r.doc_id,
    )
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append((r.doc_id, r.text))
    pairs = {"paraphrase": [], "random": []}
    for g, ds in by_lang.items():
        for i, (d, t) in enumerate(ds):
            if d % 10 != 0:
                continue
            toks = t.split(" ")
            cand = " ".join(toks[: max(len(toks) - 5, 3)])
            partner = ds[i + 1][1] if i + 1 < len(ds) else ds[0][1]
            pairs["paraphrase"].append((cand, t))
            pairs["random"].append((cand, partner))

    def grams(t, n):
        toks = t.split(" ")
        return Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))

    for arm, ps in pairs.items():
        for n in (1, 2):
            pm = rm = fm = 0
            fs = []
            for cand, ref in ps:
                gc, gr = grams(cand, n), grams(ref, n)
                o = sum(min(c, gr[g]) for g, c in gc.items())
                nc, nr = sum(gc.values()), sum(gr.values())
                p = o * 1000000 // nc
                r_ = o * 1000000 // nr
                f = 2 * o * 1000000 // (nc + nr)
                pm += p
                rm += r_
                fm += f
                fs.append(f)
            r = rows[(arm, n)]
            assert r.n_pairs == len(ps)
            assert r.mean_p_micro == pm // len(ps)
            assert r.mean_r_micro == rm // len(ps)
            assert r.mean_f1_micro == fm // len(ps)
            assert r.min_f1_micro == min(fs)
            assert r.max_f1_micro == max(fs)
    for n in (1, 2):
        assert (
            rows[("paraphrase", n)].separation_micro
            == -rows[("random", n)].separation_micro
            == rows[("paraphrase", n)].mean_f1_micro - rows[("random", n)].mean_f1_micro
        )
        assert rows[("paraphrase", n)].mean_p_micro == 1000000  # prefix identity


def test_ldp_randomized_response_replays_in_pure_python(spark):
    """Both epsilon arms must recompute exactly from the collected
    documents: md5 keep/replace coins, the k-RR report, the debiased
    clamped estimator, per-value errors, TV, and max error."""
    import hashlib
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.corpusops import (
        _LDP_ARMS,
        ldp_randomized_response,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {(r.odds_ratio, r.lang): r for r in ldp_randomized_response(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    langs = sorted({r.lang for r in docs})
    idx = {g: i for i, g in enumerate(langs)}
    k = len(langs)
    n = len(docs)
    true = Counter(r.lang for r in docs)

    def u32(tag, d, a):
        return int(hashlib.md5(f"{tag}:{d}:{a}".encode()).hexdigest()[:8], 16)

    for a in _LDP_ARMS:
        obs = Counter()
        for r in docs:
            if u32("ldpk", r.doc_id, a) % (a + k - 1) < a:
                obs[idx[r.lang]] += 1
            else:
                obs[(idx[r.lang] + 1 + u32("ldpr", r.doc_id, a) % (k - 1)) % k] += 1
        hats = {}
        for g in langs:
            c = obs[idx[g]]
            hats[g] = max(c * (a + k - 1) - n, 0) // (a - 1)
        tv = sum(abs(hats[g] - true[g]) for g in langs) * 1000 // (2 * n)
        mx = max(abs(hats[g] - true[g]) * 1000 // true[g] for g in langs)
        for g in langs:
            r = rows[(a, g)]
            assert r.arm == f"eps_ln{a}"
            assert r.n_true == true[g]
            assert r.n_obs == obs[idx[g]]
            assert r.n_hat == hats[g]
            assert r.err_permille == abs(hats[g] - true[g]) * 1000 // true[g]
            assert r.tv_permille == tv
            assert r.max_err_permille == mx
    assert len(rows) == len(_LDP_ARMS) * k


def test_forecast_backtest_mase_replays_in_pure_python(spark):
    """Every (event_type, model) row must recompute exactly from the
    collected events: spine-filled daily counts, the 2/3 cut, scaled
    one-step errors for all three models, integer MAE/MASE floors,
    and the deterministic election."""
    import datetime
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.temporal import (
        _MASE_SEASON,
        forecast_backtest_mase,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    s = _MASE_SEASON
    rows = {(r.event_type, r.model): r for r in forecast_backtest_mase(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    daily: Counter = Counter()
    for r in ev:
        daily[(r.event_type, (r.ts.date() - datetime.date(2024, 1, 1)).days + 1)] += 1
    types = sorted({t for t, _ in daily})
    days = sorted({d for _, d in daily})
    t0 = max(days) * 2 // 3
    best = {}
    for t in types:
        x = {d: daily[(t, d)] for d in days}
        seq = [x[d] for d in days]
        idx = {d: i for i, d in enumerate(days)}
        s_in = n_in = 0
        for d in days:
            i = idx[d]
            if i >= 1 and d <= t0:
                s_in += abs(seq[i] - seq[i - 1])
                n_in += 1
        models = {}
        for name, scale in (("naive", 1), (f"seasonal_naive", 1), (f"ma{s}", s)):
            sa = nt = 0
            for d in days:
                i = idx[d]
                if d <= t0:
                    continue
                if name == "naive":
                    if i < 1:
                        continue
                    sa += abs(seq[i] - seq[i - 1])
                elif name == "seasonal_naive":
                    if i < s:
                        continue
                    sa += abs(seq[i] - seq[i - s])
                else:
                    if i < s:
                        continue
                    sa += abs(s * seq[i] - sum(seq[i - s : i]))
                nt += 1
            models[name] = (nt, sa, scale)
        for name, (nt, sa, scale) in models.items():
            r = rows[(t, name)]
            assert r.n_test == nt
            assert r.mae_milli == sa * 1000 // (scale * nt)
            assert r.mase_milli == sa * n_in * 1000 // (scale * nt * s_in)
        best[t] = min(
            (rows[(t, m)].mase_milli, m) for m in models
        )[1]
    for (t, m), r in rows.items():
        assert r.is_best == (m == best[t])


def test_ab_test_chi_square_replays_in_pure_python(spark):
    """Both experiment arms must recompute exactly from the collected
    events: user-grain variant/effect coins, the purchase-share
    conversion, 2x2 cells, the fixed-shape double chi-square floored
    to micro, and the significance decision."""
    import hashlib
    import math
    from collections import Counter

    from efficient_llm_data_wrangling_spark.queries.behavior import (
        _AB_CRIT_MICRO,
        ab_test_chi_square,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.arm: r for r in ab_test_chi_square(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    tot: Counter = Counter()
    pur: Counter = Counter()
    for r in ev:
        tot[r.user_id] += 1
        pur[r.user_id] += r.event_type == "purchase"

    def u32(tag, u):
        return int(hashlib.md5(f"{tag}:{u}".encode()).hexdigest()[:8], 16)

    users = [
        (u32("abv", u) % 2, int(4 * pur[u] >= tot[u]), u32("abe", u) % 5)
        for u in tot
    ]
    for arm in ("null", "planted"):
        a = b = c = d = 0
        for v, conv, ecoin in users:
            cv = 1 if (arm == "planted" and v == 1 and ecoin == 0) else conv
            if v == 0:
                a += cv
                b += 1 - cv
            else:
                c += cv
                d += 1 - cv
        chi = (
            float(a + b + c + d)
            * (float(a) * float(d) - float(b) * float(c))
            * (float(a) * float(d) - float(b) * float(c))
        ) / (float(a + b) * float(c + d) * float(a + c) * float(b + d))
        r = rows[arm]
        assert (r.n_control_conv, r.n_control_nonconv) == (a, b)
        assert (r.n_variant_conv, r.n_variant_nonconv) == (c, d)
        assert r.control_rate_milli == a * 1000 // (a + b)
        assert r.variant_rate_milli == c * 1000 // (c + d)
        assert r.lift_milli == c * 1000 // (c + d) - a * 1000 // (a + b)
        assert r.chi2_micro == math.floor(chi * 1000000)
        assert r.significant == (r.chi2_micro > _AB_CRIT_MICRO)


def test_bootstrap_ci_replays_in_pure_python(spark):
    """Both metric rows must recompute exactly from the collected
    documents: the md5 index draws, per-resample exact mean/median
    elections, the order-statistic CI, the CLT half-width, and the
    width meter."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.quality import (
        _BS_B,
        _BS_KLO,
        bootstrap_ci_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.metric: r for r in bootstrap_ci_report(spark, SF_SMOKE).collect()}
    docs = sorted(
        load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect(),
        key=lambda r: r.doc_id,
    )
    vs = [r.n_chars for r in docs]
    n = len(vs)
    ests = {"mean": [], "median": []}
    for b in range(_BS_B):
        draw = [
            vs[int(hashlib.md5(f"bs:{b}:{i}".encode()).hexdigest()[:8], 16) % n]
            for i in range(n)
        ]
        ests["mean"].append(sum(draw) * 1000 // n)
        ests["median"].append(sorted(draw)[(n + 1) // 2 - 1] * 1000)
    point = {
        "mean": sum(vs) * 1000 // n,
        "median": sorted(vs)[(n + 1) // 2 - 1] * 1000,
    }
    sv, svv = sum(vs), sum(v * v for v in vs)
    hw = math.floor(
        1.959963984540054
        * math.sqrt((n * svv - sv * sv) / (n * n * (n - 1)))
        * 1000
    )
    for m in ("mean", "median"):
        srt = sorted(ests[m])
        lo, hi = srt[_BS_KLO - 1], srt[_BS_B - _BS_KLO]
        r = rows[m]
        assert r.point_milli == point[m]
        assert (r.ci_lo_milli, r.ci_hi_milli) == (lo, hi)
        assert r.ci_width_milli == hi - lo
        assert r.point_inside == (lo <= point[m] <= hi)
        assert r.n_docs == n and r.n_resamples == _BS_B
        if m == "mean":
            assert r.classical_hw_milli == hw
            assert r.width_vs_clt_milli == (hi - lo) * 1000 // (2 * hw)
        else:
            assert r.classical_hw_milli is None
            assert r.width_vs_clt_milli is None
