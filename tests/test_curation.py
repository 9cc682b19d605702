"""Semantic properties of the curation/temporal families that the
DuckDB oracle equality alone doesn't pin down: Bloom's no-false-
negative guarantee, decontamination vs a brute-force python check,
quantization error bounds, cluster-canonical closure properties, and
PageRank mass accounting."""

from __future__ import annotations

import hashlib
import math

import pytest

from efficient_llm_data_wrangling_spark.queries.curation import (
    bloom_dedup_documents,
    decontaminate_ngram_overlap,
    dedup_cluster_canonical,
    quantize_embeddings_int8,
)
from efficient_llm_data_wrangling_spark.queries.scale import _corpus_with_dups
from efficient_llm_data_wrangling_spark.queries.temporal import (
    interpolate_gaps_events,
    pagerank_trade_network,
    weighted_sample_orders,
)
from tests.conftest import SF_SMOKE


def test_bloom_no_false_negatives(spark):
    """Every probe whose text exists in the reference corpus MUST be a
    bloom hit — the structural Bloom guarantee, independent of m/k."""
    rows = bloom_dedup_documents(spark, SF_SMOKE).collect()
    assert rows, "probe set must be non-empty"
    exact_hits = [r for r in rows if r.exact_hit]
    assert exact_hits, "planted clones must produce exact hits"
    assert all(r.bloom_hit for r in exact_hits)
    # the planted mutants guarantee non-member probes exist; at m=4096,
    # k=3 with ~250 ref keys most non-members must be rejected
    non_members = [r for r in rows if not r.exact_hit]
    rejected = [r for r in non_members if not r.bloom_hit]
    assert len(rejected) > len(non_members) // 2


def test_decontaminate_matches_bruteforce(spark):
    """Spark's hashed-gram overlap equals a direct python 5-gram set
    intersection over the same split rule."""
    docs = {
        r.doc_id: r.text
        for r in _corpus_with_dups(spark, SF_SMOKE).collect()
        if r.doc_id < 1_000_000
    }

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[0], 16)

    def grams(text: str) -> set[str]:
        toks = [t for t in text.split(" ") if t]
        return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}

    test_grams = set().union(
        *(grams(t) for i, t in docs.items() if bucket(i) == 15), set()
    )
    expected = {
        i: len(grams(t) & test_grams) for i, t in docs.items() if bucket(i) < 13
    }
    got = {
        r.doc_id: r.n_overlap
        for r in decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_quantize_error_bound(spark):
    """Dequantized values are within half a quantization step of the
    original: |q/127*scale - x| <= scale/254 (+ float eps)."""
    rows = quantize_embeddings_int8(spark, SF_SMOKE).limit(2000).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    assert rows
    for r in rows:
        x = emb[r.vec_id][r.i]
        assert abs(r.q) <= 127
        if r.scale > 0:
            assert abs(r.q / 127.0 * r.scale - x) <= r.scale / 254.0 + 1e-9


def test_cluster_canonical_closure(spark):
    """Canonical labels are closed (the canonical of a canonical is
    itself) and every cluster's canonical is its minimum member."""
    rows = dedup_cluster_canonical(spark, SF_SMOKE).collect()
    canon = {r.doc_id: r.canonical_id for r in rows}
    assert rows
    for r in rows:
        assert canon[r.canonical_id] == r.canonical_id, "canonical must be a fixpoint"
        assert r.canonical_id <= r.doc_id
        assert r.is_canonical == (r.canonical_id == r.doc_id)
    # planted exact clones (doc_id % 7 == 0 -> +1e6) must share a cluster
    clones = [r for r in rows if r.doc_id >= 1_000_000 and r.doc_id < 2_000_000]
    assert clones
    assert all(r.canonical_id == r.doc_id - 1_000_000 or not r.is_canonical for r in clones)
    assert not any(r.is_canonical for r in clones), "clone never beats its original's id"


def test_pagerank_mass_conservation(spark):
    """Integer nano-unit ranks: total mass stays within the bounded
    loss of dangling nodes + per-node integer-floor truncation."""
    rows = pagerank_trade_network(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    total = sum(r.rank_nano for r in rows)
    # upper bound: exact conservation (1e9); lower: minus dangling mass
    # (none expected on the dense trade graph) and <= 2 nano per node
    # per iteration of floor loss across 3 iterations
    assert total <= 1_000_000_000
    assert total >= 1_000_000_000 - 25 * 3 * 200  # generous floor-loss envelope
    assert all(r.rank_nano > 0 for r in rows)


def test_pagerank_broadcast_guard_regimes(spark):
    """The |V|-row iteration vectors broadcast under the size guard and
    degrade to keyed-shuffle joins above it — both regimes planned, and
    both producing identical ranks (partitioning must never change the
    integer math)."""
    from tests.conftest import fresh_build

    # fresh build: a memoized frame may already be executed, whose plan
    # string is the final AQE form the shape assertions don't expect
    small = fresh_build(pagerank_trade_network, spark, SF_SMOKE)
    p_small = _plan(small)
    assert "BroadcastHashJoin" in p_small and "Cartesian" not in p_small

    big = pagerank_trade_network(spark, SF_SMOKE, broadcast_max_v=0)
    p_big = _plan(big)
    # with the guard off every rank/deg/incoming join shuffles instead;
    # dim-table broadcasts in the edge distillation may legitimately stay
    assert "SortMergeJoin" in p_big or "ShuffledHashJoin" in p_big
    assert "Cartesian" not in p_big

    a = {(r.nationkey, r.rank_nano) for r in small.collect()}
    b = {(r.nationkey, r.rank_nano) for r in big.collect()}
    assert a == b


def test_weighted_sample_prefers_heavy_rows(spark):
    """ES sampling with w = o_totalprice must over-represent expensive
    orders: the sampled mean price exceeds the population mean."""
    sample = weighted_sample_orders(spark, SF_SMOKE).collect()
    assert len(sample) == 100
    pop = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").agg({"o_totalprice": "avg"}).first()[0]
    smean = sum(r.o_totalprice for r in sample) / len(sample)
    assert smean > pop, f"weighted sample mean {smean} should exceed population {pop}"
    # keys are valid ES keys: ln(u)/w <= 0
    assert all(r.sample_key <= 0 for r in sample)


def test_interpolation_is_linear_between_neighbors(spark):
    """On gap days, the filled value lies strictly between (or at) the
    neighboring observed values — linearity's monotone envelope."""
    rows = interpolate_gaps_events(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    gaps_checked = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        # first/last spine rows are always observed days
        assert series[0].was_present and series[-1].was_present
        present_vals = [r.value_milli_cents for r in series if r.was_present]
        lo, hi = min(present_vals), max(present_vals)
        for r in series:
            if not r.was_present:
                gaps_checked += 1
                assert lo - 1000 <= r.value_milli_cents <= hi + 1000
    assert gaps_checked > 0, "fixture must contain gap days"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_curation_plan_shapes(spark):
    """Scale posture of the new family: quantization is shuffle-free,
    mixture sampling is exactly one keyed shuffle, the composed
    pipeline dedups in ≤2 shuffles, and decontamination broadcasts the
    eval-gram side — never a cartesian anywhere."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        corpus_curation_pipeline,
        mixture_sample_by_source,
    )

    shuffles = lambda p: p.count("Exchange hashpartitioning")  # noqa: E731
    p = _plan(quantize_embeddings_int8(spark, SF_SMOKE))
    assert shuffles(p) == 0 and "Cartesian" not in p
    p = _plan(mixture_sample_by_source(spark, SF_SMOKE))
    assert shuffles(p) == 1 and "Cartesian" not in p
    p = _plan(corpus_curation_pipeline(spark, SF_SMOKE))
    assert shuffles(p) <= 2 and "Cartesian" not in p
    p = _plan(decontaminate_ngram_overlap(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p and "Cartesian" not in p


def test_late_curation_plan_shapes(spark):
    """Scale posture of the last three curation queries: PII redaction
    is pure scan-side regexp codegen (zero shuffles), blocklist
    filtering shuffles only (doc_id, word) hits plus the count-back
    join on doc_id, and segment dedup shuffles the 16-byte seg-hash
    for first-occurrence election plus the doc_id count-back — no
    cartesian anywhere."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        blocklist_filter_documents,
        pii_redact_documents,
        segment_dedup_corpus,
    )

    shuffles = lambda p: p.count("Exchange hashpartitioning")  # noqa: E731
    p = _plan(pii_redact_documents(spark, SF_SMOKE))
    assert shuffles(p) == 0 and "Cartesian" not in p
    p = _plan(blocklist_filter_documents(spark, SF_SMOKE))
    assert shuffles(p) <= 2 and "Cartesian" not in p
    p = _plan(segment_dedup_corpus(spark, SF_SMOKE))
    assert shuffles(p) <= 2 and "Cartesian" not in p


@pytest.mark.parametrize("k", [3])
def test_bloom_positions_stable(k):
    """The double-hash position schedule is a pure function of the MD5
    hex — pin one known vector so accidental re-parameterization of
    (m, k) or the nibble layout fails loudly."""
    h = hashlib.md5(b"anchor").hexdigest()
    m = 4096
    h1 = int(h[0:4], 16) % m
    h2 = int(h[4:8], 16) % m
    pos = [(h1 + j * h2) % m for j in range(k)]
    assert pos == [(h1 + j * h2) % m for j in range(k)]
    assert len({p for p in pos}) >= 1 and all(0 <= p < m for p in pos)


def test_temporal_behavior_plan_shapes(spark):
    """Scale posture of the temporal/behavior families: SCD2 and the
    OLS trend are single-shuffle; winsorization is one window shuffle
    plus a broadcast bounds join; weighted sampling is shuffle-free
    TakeOrdered; nothing anywhere goes cartesian."""
    from efficient_llm_data_wrangling_spark.queries.behavior import (
        funnel_view_click_purchase,
        markov_event_transitions,
    )
    from efficient_llm_data_wrangling_spark.queries.analytics import (
        groupwise_trend_orders,
        winsorize_prices,
    )
    from efficient_llm_data_wrangling_spark.queries.temporal import (
        pagerank_trade_network,
        scd2_status_history,
        weighted_sample_orders,
    )

    shuffles = lambda p: p.count("Exchange hashpartitioning")  # noqa: E731
    p = _plan(scd2_status_history(spark, SF_SMOKE))
    assert shuffles(p) == 1, "both SCD2 windows must share one exchange"
    p = _plan(groupwise_trend_orders(spark, SF_SMOKE))
    assert shuffles(p) == 1, "sufficient statistics are one partial-agg groupBy"
    p = _plan(winsorize_prices(spark, SF_SMOKE))
    assert shuffles(p) == 1 and "BroadcastHashJoin" in p
    p = _plan(weighted_sample_orders(spark, SF_SMOKE))
    assert shuffles(p) == 0 and "TakeOrdered" in p
    for q in (funnel_view_click_purchase, markov_event_transitions, pagerank_trade_network):
        assert "Cartesian" not in _plan(q(spark, SF_SMOKE))


def test_temperature_weights_normalize_and_flatten(spark):
    """Alpha-sampling invariants: weights sum to 1 (up to fold
    rounding), every weight is positive, and α=½ FLATTENS the mixture —
    the max/min weight ratio must not exceed sqrt(max/min count)."""
    import math

    from efficient_llm_data_wrangling_spark.queries.curation import (
        temperature_mixture_weights,
    )
    from tests.conftest import SF_SMOKE

    rows = temperature_mixture_weights(spark, SF_SMOKE).collect()
    assert rows
    s = sum(r.weight_6 for r in rows)
    assert abs(s - 1.0) < 1e-4  # round-6 per-row truncation accumulates
    assert all(r.weight_6 > 0 for r in rows)
    hi, lo = max(rows, key=lambda r: r.n_docs), min(rows, key=lambda r: r.n_docs)
    assert hi.weight_6 / lo.weight_6 <= math.sqrt(hi.n_docs / lo.n_docs) + 1e-6
    total = sum(r.n_docs for r in rows)
    assert abs(sum(r.expected_docs for r in rows) - total) <= len(rows)


def test_release_manifest_invariants(spark):
    """The release manifest's internal accounting must reconcile:
    per-source attrition is monotone (raw ≥ admitted ≥ capped), the
    domain cap is actually enforced (n_capped ≤ 30% of the admitted
    total), manifest doc counts roll up to exactly the capped corpus,
    weights are a sub-unit permille distribution, and shard ids stay
    inside the fan-out."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        _REL_CAP_PCT,
        _REL_SHARDS,
        corpus_release_manifest,
    )
    from tests.conftest import SF_SMOKE

    rows = corpus_release_manifest(spark, SF_SMOKE).collect()
    assert rows
    per_source = {}
    for r in rows:
        assert r.split in {"train", "valid", "test"}
        assert 0 <= r.shard_id < _REL_SHARDS
        assert r.n_docs > 0 and r.n_tokens > 0
        per_source.setdefault(r.source, []).append(r)
    admitted_total = sum({r.source: r.n_admitted for r in rows}.values())
    weights = 0
    for source, srows in per_source.items():
        r0 = srows[0]
        # per-source scalars replicate identically across the source's rows
        assert all(
            (r.n_raw, r.n_admitted, r.n_capped, r.weight_permille)
            == (r0.n_raw, r0.n_admitted, r0.n_capped, r0.weight_permille)
            for r in srows
        )
        assert r0.n_raw >= r0.n_admitted >= r0.n_capped >= 0
        assert r0.n_capped <= admitted_total * _REL_CAP_PCT // 100
        # manifest cells partition the capped survivors of the source
        assert sum(r.n_docs for r in srows) == r0.n_capped
        weights += r0.weight_permille
    # floor division loses at most 1 permille per source
    assert 1000 - len(per_source) <= weights <= 1000


def test_release_delta_reconciles(spark):
    """Every arriving batch doc lands in exactly one outcome bucket,
    v2 = v1 + newly admitted, and the planted population guarantees
    both dup rejects (clones) and admissions exist somewhere."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        release_delta_report,
    )
    from tests.conftest import SF_SMOKE

    rows = release_delta_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_dup_rejected + r.n_quality_rejected + r.n_new_admitted == r.n_batch
        assert r.v2_docs == r.v1_docs + r.n_new_admitted
        assert (r.delta_tokens > 0) == (r.n_new_admitted > 0)
    assert sum(r.n_dup_rejected for r in rows) > 0  # clones must be caught


def test_fuzzy_decontamination_catches_every_planted_leak(spark):
    """Every test-split document re-enters the train side truncated
    (the planted leak, id+3e6); the fuzzy pass must flag each leak
    against its origin test doc at J ≥ 500 milli, and every flagged
    row's Jaccard must recompute exactly from the portable hash sets."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.curation import (
        _FUZZY_J_MILLI,
        decontaminate_minhash_fuzzy,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    rows = decontaminate_minhash_fuzzy(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    bucket = {
        r.doc_id: int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[0], 16)
        for r in docs
    }
    test_ids = {d for d, b in bucket.items() if b == 15}
    assert test_ids, "smoke corpus has no test-split docs"

    def h32(text: str) -> set[int]:
        toks = text.split(" ")
        n = max(len(toks) - 2, 1)
        sh = {" ".join(toks[i : i + 3]) for i in range(n)}
        return {
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh
        }

    texts = {r.doc_id: r.text for r in docs}

    def trimmed(text: str) -> str:
        toks = text.split(" ")
        return " ".join(toks[: max(len(toks) - 5, 3)])

    flagged = {(r.train_id, r.test_id) for r in rows}
    for tid in test_ids:
        assert (-(tid + 1), tid) in flagged, f"planted leak for {tid} missed"
    for r in rows:
        assert r.test_id in test_ids
        assert r.planted_leak == (r.train_id < 0)
        left = (
            h32(trimmed(texts[-r.train_id - 1]))
            if r.train_id < 0
            else h32(texts[r.train_id])
        )
        right = h32(texts[r.test_id])
        want = len(left & right) * 1000 // len(left | right)
        assert r.jaccard_milli == want
        assert r.jaccard_milli >= _FUZZY_J_MILLI
        if r.train_id >= 0:
            assert bucket[r.train_id] < 13


def test_semantic_decontamination_catches_every_planted_paraphrase(spark):
    """Every test-split vector re-enters the train side under the
    fixed rotation mix (the planted paraphrase, id −(vec_id+1)); the semantic
    pass must flag each against its origin vector at cosine >= 0.8,
    and every flagged cosine must recompute bit-for-bit from the
    house left-to-right double fold."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        decontaminate_semantic_cosine,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table

    rows = decontaminate_semantic_cosine(spark, SF_SMOKE).collect()
    assert rows
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    bucket = {
        v: int(hashlib.md5(str(v).encode()).hexdigest()[0], 16) for v in vecs
    }
    test_ids = {v for v, b in bucket.items() if b == 15}
    assert test_ids, "smoke corpus has no test-split vectors"

    def cos(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    def perturb(v):
        n = len(v)
        return [v[i] + 0.25 * v[(i + 1) % n] for i in range(n)]

    flagged = {(r.train_id, r.test_id) for r in rows}
    for tid in test_ids:
        assert (-(tid + 1), tid) in flagged, f"planted paraphrase for {tid} missed"
    for r in rows:
        assert r.test_id in test_ids
        assert r.planted_leak == (r.train_id < 0)
        left = (
            perturb(vecs[-r.train_id - 1])
            if r.train_id < 0
            else vecs[r.train_id]
        )
        want = cos(left, vecs[r.test_id])
        assert r.cosine == want, (r.train_id, r.test_id, r.cosine, want)
        assert r.cosine >= 0.8
    # on this corpus the natural cross-split maximum is 0.474, so the
    # flagged set IS the planted set — the guard band the threshold
    # relies on (a natural row appearing here would mean the corpus
    # drifted under the 0.8 bar and the docstring's claim is stale)
    assert len(rows) == len(test_ids)
    assert all(r.planted_leak for r in rows)


def test_corpus_novelty_curve_replays_and_saturates(spark):
    """The per-decile first-occurrence accounting must recompute from
    a pure-Python replay of the shingle space, novelty must be a valid
    permille of occurrences, decile 0 must be (near-)fully novel, and
    the tail decile must sit well below the head — the saturation
    shape the curve exists to show."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        _NOVELTY_DECILES,
        corpus_novelty_curve,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = sorted(corpus_novelty_curve(spark, SF_SMOKE).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(_NOVELTY_DECILES))
    docs = sorted(
        load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect(),
        key=lambda d: d.doc_id,
    )
    n = len(docs)

    def shingle_hashes(text):
        toks = text.split(" ")
        w = max(len(toks) - 2, 1)
        sh = {" ".join(toks[i : i + 3]) for i in range(w)}
        return {int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh}

    seen: set[int] = set()
    occ = [0] * _NOVELTY_DECILES
    novel = [0] * _NOVELTY_DECILES
    nd = [0] * _NOVELTY_DECILES
    for i, d in enumerate(docs):
        dec = i * _NOVELTY_DECILES // n
        hs = shingle_hashes(d.text)
        nd[dec] += 1
        occ[dec] += len(hs)
        fresh = hs - seen
        novel[dec] += len(fresh)
        seen |= fresh
    for r in rows:
        assert (r.n_docs, r.n_gram_occ, r.n_novel_grams) == (
            nd[r.decile],
            occ[r.decile],
            novel[r.decile],
        )
        assert r.novelty_permille == novel[r.decile] * 1000 // occ[r.decile]
        assert 0 <= r.novelty_permille <= 1000
    assert rows[0].novelty_permille == max(r.novelty_permille for r in rows)
    assert rows[0].novelty_permille >= 900
    assert rows[-1].novelty_permille < rows[0].novelty_permille


def test_epoch_repeat_plan_replays_and_burden_falls_on_small_sources(spark):
    """Every allocation/epoch division must recompute from a pure
    Python replay, the budget must reconcile (allocations sum to the
    4x budget within |sources| floor losses), and the structural
    finding must hold: every flagged source is smaller than every
    unflagged one (temperature upweighting puts the repeat burden on
    the smallest sources)."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        _EPOCH_BUDGET_X,
        _EPOCH_RISK_MILLI,
        epoch_repeat_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = epoch_repeat_plan(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    tok = {}
    for d in docs:
        tok[d.source] = tok.get(d.source, 0) + len([t for t in d.text.split(" ") if t])
    isq = {s: int(math.floor(math.sqrt(float(n)))) for s, n in tok.items()}
    isq_sum = sum(isq.values())
    corpus = sum(tok.values())
    assert len(rows) == len(tok)
    for r in rows:
        n, q = tok[r.source], isq[r.source]
        assert r.n_tokens == n
        assert r.weight_permille == q * 1000 // isq_sum
        alloc = corpus * _EPOCH_BUDGET_X * q // isq_sum
        assert r.alloc_tokens == alloc
        assert r.epochs_milli == alloc * 1000 // n
        assert r.repeat_risk == (r.epochs_milli > _EPOCH_RISK_MILLI)
    total_alloc = sum(r.alloc_tokens for r in rows)
    budget = corpus * _EPOCH_BUDGET_X
    assert budget - len(rows) * (budget // isq_sum + 1) <= total_alloc <= budget
    risky = [r.n_tokens for r in rows if r.repeat_risk]
    safe = [r.n_tokens for r in rows if not r.repeat_risk]
    assert risky and safe, "the 4-epoch line must split this corpus"
    assert max(risky) < min(safe)


def test_unimax_plan_replays_and_caps_bind_on_smallest(spark):
    """The water-fill election must recompute bit-for-bit from a pure
    Python replay of the documented closed form, every language must
    respect the epoch cap (the UniMax guarantee), the budget must
    reconcile exactly (Σ alloc + leftover = budget), the capped set
    must be an ascending-cap prefix, and the uniform comparison column
    must show the over-repetition the cap prevents."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        _UNIMAX_BUD_D,
        _UNIMAX_BUD_N,
        _UNIMAX_E,
        unimax_mixture_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = unimax_mixture_plan(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").select("lang", "text").collect()
    tok: dict[str, int] = {}
    for d in docs:
        tok[d.lang] = tok.get(d.lang, 0) + len([t for t in d.text.split(" ") if t])
    assert len(rows) == len(tok)
    corpus = sum(tok.values())
    budget = corpus * _UNIMAX_BUD_N // _UNIMAX_BUD_D
    ordered = sorted(tok.items(), key=lambda kv: (kv[1] * _UNIMAX_E, kv[0]))
    caps = [n * _UNIMAX_E for _, n in ordered]
    n = len(caps)
    # closed-form capped-prefix election (monotone because caps ascend)
    k, c = 0, 0
    for r in range(1, n + 1):
        if caps[r - 1] * (n - r + 1) + c <= budget:
            k = r
        c += caps[r - 1]
    capped_mass = sum(caps[:k])
    level = (budget - capped_mass) // (n - k) if k < n else None
    leftover = budget - capped_mass - (level or 0) * (n - k)
    expect = {
        lang: (caps[i] if i < k else level) for i, (lang, _) in enumerate(ordered)
    }
    by_lang = {r.lang: r for r in rows}
    for i, (lang, ntok) in enumerate(ordered):
        r = by_lang[lang]
        assert r.n_tokens == ntok
        assert r.cap_tokens == caps[i]
        assert r.capped == (i < k)
        assert r.alloc_tokens == expect[lang]
        assert r.epochs_milli == expect[lang] * 1000 // ntok
        assert r.water_level == level
        assert r.leftover_tokens == leftover
        assert r.uniform_epochs_milli == budget // n * 1000 // ntok
        # the UniMax guarantee: no language past the epoch cap
        assert r.epochs_milli <= _UNIMAX_E * 1000
        if r.capped:
            assert r.epochs_milli == _UNIMAX_E * 1000
    assert sum(r.alloc_tokens for r in rows) + leftover == budget
    # the election must be non-trivial on this corpus: both sides exist
    assert 0 < k < n, f"water-fill must split this corpus, got k={k}/{n}"
    # uniform sampling would over-repeat the smallest language
    assert max(r.uniform_epochs_milli for r in rows) > _UNIMAX_E * 1000


def test_cluster_size_report_reconciles_with_canonical(spark):
    """The size histogram must reconcile exactly with the canonical
    labeling it tabulates: Σ n_docs = corpus size, Σ n_redundant =
    the canonical query's non-canonical row count, and every derived
    per-mille recomputes; the planted-dup corpus must show both
    singletons and at least one multi-doc family."""
    from efficient_llm_data_wrangling_spark.queries.curation import (
        dedup_cluster_canonical,
        dup_cluster_size_report,
    )
    from tests.conftest import SF_SMOKE

    rows = dup_cluster_size_report(spark, SF_SMOKE).collect()
    assert rows
    canon = dedup_cluster_canonical(spark, SF_SMOKE).collect()
    n_total = len(canon)
    n_non_canonical = sum(1 for r in canon if not r.is_canonical)
    assert sum(r.n_docs for r in rows) == n_total
    assert sum(r.n_redundant for r in rows) == n_non_canonical
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_redundant == (r.cluster_size - 1) * r.n_clusters
        assert r.corpus_share_permille == r.n_docs * 1000 // n_total
        assert r.redundant_share_permille == r.n_redundant * 1000 // n_total
    sizes = {r.cluster_size for r in rows}
    assert 1 in sizes and max(sizes) >= 2
