"""Round-4 corpus-quality / retrieval / PQ family: behavioral
invariants plus the house plan-shape pins (shuffle budgets, broadcast
expectations, no cartesians, no Python UDFs in any hot path)."""

from __future__ import annotations

import hashlib

from efficient_llm_data_wrangling_spark.queries.scale import (
    knn_ivf_pq,
    pq_encode_embeddings,
)
from efficient_llm_data_wrangling_spark.queries.textquality import (
    _DOMAIN_CAP,
    bm25_top_docs,
    doc_quality_linear_scorer,
    domain_cap_documents,
    gopher_quality_filter,
    length_percentile_filter_documents,
    shard_assign_documents,
    substring_dedup_windows,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(p: str) -> int:
    return p.count("Exchange hashpartitioning")


def test_gopher_rules_recompute(spark):
    """One document's counters recomputed in plain Python must match
    the column math exactly."""
    rows = {r.doc_id: r for r in gopher_quality_filter(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(5).collect()
    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        r = rows[d.doc_id]
        assert r.n_words == len(toks)
        assert r.mean_len_milli == (sum(len(t) for t in toks) * 1000) // len(toks)
        assert r.stopword_hits == sum(1 for t in toks if t in stop)
        assert r.alpha_pct == (100 * sum(1 for t in toks if t.isalpha() and t.islower())) // len(toks)


def test_domain_cap_counts(spark):
    """Each source keeps exactly min(cap, |source|) documents."""
    rows = domain_cap_documents(spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, grp in by_src.items():
        kept = sum(1 for r in grp if r.kept)
        assert kept == min(_DOMAIN_CAP, len(grp)), src
        assert sorted(r.rk for r in grp) == list(range(1, len(grp) + 1))


def test_linear_scorer_hash_weights(spark):
    """Spot-check the hashed-feature weight math against hashlib."""
    rows = {r.doc_id: r for r in doc_quality_linear_scorer(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(3).collect()

    def w(feat: str) -> int:
        return int(hashlib.md5(feat.encode()).hexdigest()[:4], 16) % 17 - 8

    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        uni = sum(w(t) for t in toks)
        bi = sum(w(f"{a}_{b}") for a, b in zip(toks, toks[1:])) if len(toks) >= 2 else 0
        r = rows[d.doc_id]
        assert (r.uni_score, r.bi_score, r.score, r.keep) == (uni, bi, uni + bi, uni + bi >= 0)


def test_substring_dedup_conservation(spark):
    """Unique windows + duplicated windows = total windows, and the
    number of first-occurrence windows equals the distinct hash count."""
    rows = substring_dedup_windows(spark, SF_SMOKE).collect()
    total = sum(r.n_windows for r in rows)
    dups = sum(r.n_dup_windows for r in rows)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    uniq = set()
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        for i in range(len(toks) - 15 + 1):
            uniq.add(" ".join(toks[i : i + 15]))
    assert total - dups == len(uniq)
    assert all(0 <= r.dup_pct <= 100 for r in rows)


def test_length_percentile_bounds(spark):
    """Kept docs lie inside per-source [p10, p90]; bounds are attained
    corpus values."""
    rows = length_percentile_filter_documents(spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for grp in by_src.values():
        lens = sorted(x.n_chars for x in grp)
        lo, hi = grp[0].lo, grp[0].hi
        assert lo in lens and hi in lens and lo <= hi
        for r in grp:
            assert r.kept == (lo <= r.n_chars <= hi)


def test_shard_assignment_covers_corpus(spark):
    rows = shard_assign_documents(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(0 <= r.shard < 64 for r in rows)
    assert all(r.min_doc <= r.max_doc for r in rows)


def test_bm25_ranking_properties(spark):
    """Scores are non-increasing, every hit contains a query term, and
    a doc with more matched terms at similar length outranks a
    zero-match doc by construction (already excluded)."""
    rows = bm25_top_docs(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25_6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.tf1 + r.tf2 + r.tf3 > 0 for r in rows)


def test_pq_codes_shape(spark):
    rows = pq_encode_embeddings(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(rows) == n_vecs * 8
    assert all(0 <= r.code < 8 and 0 <= r.subspace < 8 for r in rows)
    # a centroid's own subvector is its nearest codeword: vec_id k < 8
    # must encode to code == k in every subspace
    for r in rows:
        if r.vec_id < 8:
            assert r.code == r.vec_id, (r.vec_id, r.subspace, r.code)


def test_ivf_pq_rerank_is_exact(spark):
    """The final cosine ordering is exact over the shortlist: top-10
    descending, the query's own vector first (it lives in a probed
    cell by construction)."""
    rows = knn_ivf_pq(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert rows[0].vec_id == 1 and abs(rows[0].cosine - 1.0) < 1e-12
    assert all(r.adc_6 >= 0 for r in rows)


def test_textquality_plan_shapes(spark):
    """Scale posture: the scan-side analytics (Gopher rules, linear
    scorer) are shuffle-free; the cap and shard manifest are one keyed
    shuffle; substring dedup stays within the segment-dedup budget;
    percentile filtering broadcasts its per-source bounds; BM25
    broadcasts its 1-row stats and compiles top-k to TakeOrdered; PQ
    broadcasts the codeword table. No cartesians, no Python UDFs."""
    from tests.conftest import fresh_build

    # fresh builds throughout: a memoized frame may already be
    # executed, whose plan string is the final AQE form
    for df, max_shuffles in [
        (fresh_build(gopher_quality_filter, spark, SF_SMOKE), 0),
        (fresh_build(doc_quality_linear_scorer, spark, SF_SMOKE), 0),
        (fresh_build(domain_cap_documents, spark, SF_SMOKE), 1),
        (fresh_build(shard_assign_documents, spark, SF_SMOKE), 1),
        (fresh_build(substring_dedup_windows, spark, SF_SMOKE), 2),
        (fresh_build(length_percentile_filter_documents, spark, SF_SMOKE), 2),
    ]:
        p = _plan(df)
        assert _shuffles(p) <= max_shuffles, p[:2000]
        assert "Cartesian" not in p and "EvalPython" not in p

    p = _plan(fresh_build(bm25_top_docs, spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "TakeOrdered" in p and "Cartesian" not in p and "EvalPython" not in p

    p = _plan(fresh_build(pq_encode_embeddings, spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p and "Cartesian" not in p and "EvalPython" not in p

    p = _plan(knn_ivf_pq(spark, SF_SMOKE))
    assert "Cartesian" not in p and "EvalPython" not in p


def test_vocab_coverage_conservation(spark):
    """Coverage-report invariants: per-lang token totals sum to the
    corpus token count, OOV never exceeds the total, and the per-mille/
    milli units are the exact integer divisions of their parts."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _toks_col,
        vocab_coverage_by_lang,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = vocab_coverage_by_lang(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents")
    corpus_toks = docs.select(F.explode(_toks_col()).alias("t")).count()
    assert sum(r.tok_total for r in rows) == corpus_toks
    for r in rows:
        assert 0 <= r.oov_total <= r.tok_total
        assert r.oov_permille == r.oov_total * 1000 // r.tok_total
        assert r.toks_per_doc_milli == r.tok_total * 1000 // r.n_docs


def test_span_manifest_disjoint_and_covers_dups(spark):
    """Merged removal regions must be strictly disjoint per document,
    well-formed (start < end), and each region must cover at least one
    duplicated window's span width (>= the 15-word window's chars)."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        span_removal_manifest,
    )
    from tests.conftest import SF_SMOKE

    rows = sorted(
        span_removal_manifest(spark, SF_SMOKE).collect(),
        key=lambda r: (r.doc_id, r.span_start),
    )
    assert rows
    prev_end: dict[int, int] = {}
    for r in rows:
        assert r.span_start < r.span_end
        assert r.n_windows >= 1
        # a 15-word window is at least 15 single-char words + 14 seps
        assert r.span_end - r.span_start >= 29
        if r.doc_id in prev_end:
            assert r.span_start > prev_end[r.doc_id]
        prev_end[r.doc_id] = r.span_end


def test_bpe_merge_replace_is_greedy_leftmost(spark):
    """The delimiter-string replace must implement Sennrich's greedy
    leftmost non-overlapping merge: "aaa" with merge (a,a) becomes
    (aa)a — one merge, never two overlapping — and boundary symbols
    never match inside multi-char symbols ("ba c" must not merge
    (a,c))."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BPE_D,
        _bpe_apply_merge,
        _bpe_pair_counts,
    )

    d = _BPE_D

    def sym(*symbols):
        return "".join(d + s + d for s in symbols)

    syms = spark.createDataFrame(
        [(sym("a", "a", "a"), 1), (sym("ba", "c"), 1), (sym("a", "a", "a", "a"), 1)],
        "sym string, cnt long",
    )
    win = spark.createDataFrame([("a", "a")], "a string, b string")
    merged = {r.sym: r.cnt for r in _bpe_apply_merge(syms, win).collect()}
    assert sym("aa", "a") in merged  # greedy leftmost: (aa)a
    assert sym("ba", "c") in merged  # untouched: no (a,c) inside "ba"
    # the full-bracketing regression: CONSECUTIVE self-overlapping
    # occurrences must both merge ("a a a a" → "(aa)(aa)"); the old
    # shared-middle-delimiter encoding merged only the first
    assert sym("aa", "aa") in merged

    # pair counts after the merge see the NEW symbols
    pc = {
        (r.a, r.b): r.pair_count
        for r in _bpe_pair_counts(
            spark.createDataFrame([(sym("aa", "a"), 3)], "sym string, cnt long")
        ).collect()
    }
    assert pc == {("aa", "a"): 3}


def test_bpe_round_plan_is_jvm_side(spark):
    """One un-checkpointed training round (pair count → winner →
    merge apply) must plan with zero Python operators and no
    cartesian product — the per-round work the trainer repeats."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _bpe_apply_merge,
        _bpe_pair_counts,
        _toks_col,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    types = (
        docs.select(F.explode(_toks_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    syms = types.select(
        F.regexp_replace(F.col("tok"), "(.)", "\x1f$1\x1f").alias("sym"),
        "cnt",
    )
    pc = _bpe_pair_counts(syms)
    win = pc.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b")).limit(1)
    plan = _bpe_apply_merge(syms, win)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_train_rounds_monotone_and_consistent(spark):
    """The merge table must have one row per round, and each round's
    winning pair count can only shrink or hold as merges consume
    pairs it overlaps — never grow (new pairs created by a merge are
    strict sub-contexts of existing occurrences)."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BPE_ROUNDS,
        bpe_train_rounds,
    )
    from tests.conftest import SF_SMOKE

    rows = sorted(bpe_train_rounds(spark, SF_SMOKE).collect(), key=lambda r: r.merge_round)
    assert [r.merge_round for r in rows] == list(range(1, _BPE_ROUNDS + 1))
    assert all(r.pair_count > 0 for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.pair_count <= prev.pair_count


def test_bpe_encode_compresses_and_is_consistent(spark):
    """Encoder invariants: BPE token counts never exceed the
    character-unit baseline (merges only shrink), every doc with >= 1
    token appears, and the per-mille saving matches the integer
    arithmetic of its own row."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _toks_col,
        bpe_encode_documents,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = bpe_encode_documents(spark, SF_SMOKE).collect()
    n_docs_with_toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.size(_toks_col()).alias("n"))
        .filter(F.col("n") >= 1)
        .count()
    )
    assert len(rows) == n_docs_with_toks
    assert any(r.n_bpe_tokens < r.n_char_units for r in rows)  # merges bit
    for r in rows:
        assert 0 < r.n_bpe_tokens <= r.n_char_units
        assert r.saved_permille == (r.n_char_units - r.n_bpe_tokens) * 1000 // r.n_char_units


def test_calibration_buckets_partition_the_corpus(spark):
    """Bucket counts must sum to the document count, rates must match
    their own row's integer arithmetic, and score extrema must respect
    the bucket ordering (min_score of a higher bucket > max_score of a
    lower one for unclamped interior buckets)."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _CAL_HI,
        _CAL_LO,
        scorer_calibration_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = sorted(
        scorer_calibration_report(spark, SF_SMOKE).collect(), key=lambda r: r.bucket
    )
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert _CAL_LO <= r.bucket <= _CAL_HI
        assert 0 <= r.n_pass <= r.n_docs
        assert r.pass_permille == r.n_pass * 1000 // r.n_docs
        assert r.min_score <= r.max_score
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_score < hi.min_score


def test_bpe_coverage_bounds(spark):
    """Fertility is ≥ 1000 milli (every word is ≥ 1 symbol), the
    fully-merged share is a sub-population, and token totals
    reconcile with the per-doc encode view."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        bpe_encode_documents,
        bpe_vocab_coverage_report,
    )
    from tests.conftest import SF_SMOKE

    rows = bpe_vocab_coverage_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.fertility_milli >= 1000
        assert 0 <= r.n_fully_merged <= r.n_words
        assert r.fully_merged_permille == r.n_fully_merged * 1000 // r.n_words
    total = sum(r.n_bpe_tokens for r in rows)
    per_doc = bpe_encode_documents(spark, SF_SMOKE).agg(
        {"n_bpe_tokens": "sum"}
    ).collect()[0][0]
    assert total == per_doc


def test_shard_balance_report_replays_and_orders(spark):
    """Every policy's per-shard byte sums must recompute from a pure
    Python replay of the three assignment rules, all shards must be
    non-empty, and the measured ordering that the docstring's decision
    rule rests on must hold (striped strictly tightest spread)."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _SBR_SHARDS,
        shard_balance_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.policy: r for r in shard_balance_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {"hash", "contiguous", "striped"}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    n = len(docs)

    def tally(assign):
        b = {}
        for d in docs:
            s = assign(d)
            b[s] = b.get(s, 0) + d.n_chars
        return b

    by_id = {d.doc_id: i for i, d in enumerate(sorted(docs, key=lambda d: d.doc_id))}
    by_size = {
        d.doc_id: i
        for i, d in enumerate(sorted(docs, key=lambda d: (-d.n_chars, d.doc_id)))
    }
    tallies = {
        "hash": tally(
            lambda d: int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:4], 16)
            % _SBR_SHARDS
        ),
        "contiguous": tally(lambda d: by_id[d.doc_id] * _SBR_SHARDS // n),
        "striped": tally(lambda d: by_size[d.doc_id] % _SBR_SHARDS),
    }
    for policy, b in tallies.items():
        r = rows[policy]
        assert r.n_shards == len(b) == _SBR_SHARDS
        mean = sum(b.values()) // len(b)
        assert (r.mean_bytes, r.max_bytes, r.min_bytes) == (
            mean,
            max(b.values()),
            min(b.values()),
        )
        assert r.imbalance_permille == max(b.values()) * 1000 // mean
        assert r.spread_permille == (max(b.values()) - min(b.values())) * 1000 // mean
        assert r.imbalance_permille >= 1000
    assert (
        rows["striped"].spread_permille
        < rows["contiguous"].spread_permille
        < rows["hash"].spread_permille
    )
    assert rows["striped"].imbalance_permille == min(
        r.imbalance_permille for r in rows.values()
    )


def test_zipf_exponent_report_replays_in_pure_python(spark):
    """The OLS statistics must recompute from a pure-Python replay of
    word counts -> top-K rank election -> portable-ln regression, and
    the honest verdict must hold: this corpus's template lexicon does
    NOT obey Zipf (shallow slope, near-zero r-squared)."""
    import math

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _ZIPF_TOPK,
        zipf_exponent_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    row = zipf_exponent_report(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    counts = {}
    for d in docs:
        for w in d.text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOPK]
    n = len(top)
    assert row.n_fit == n
    # python floats replay the portable series' LIMIT; math.log is a
    # different series, so compare the fit loosely but decisively
    xs = [math.log(i + 1) for i in range(n)]
    ys = [math.log(c) for _, c in top]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(row.slope_micro / 1e6 - slope) < 5e-4
    assert abs(row.r2_micro / 1e6 - r2) < 5e-4
    # the honest verdict: template lexicon, not natural language
    assert -0.6 < row.slope_micro / 1e6 < 0
    assert row.r2_micro / 1e6 < 0.5


def test_unigram_round_matches_pure_python_replay(spark):
    """Full from-first-principles replay of the unigram-LM round at
    the smoke SF: tokenization, word-type histogram, substring seed
    vocabulary, the bit-portable integer-ln piece costs, the Viterbi
    DP with smallest-predecessor ties, backpointer walk, hard-EM
    counts, corpus objective, fertility, and re-estimated costs — the
    engine and the oracle share every formula, so only an independent
    replay can catch a shared-formula bug."""
    from efficient_llm_data_wrangling_spark.functions.portable_math import LN2_SQL
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _UNI_MAXLEN,
        _UNI_MAXPIECE,
        unigram_lm_tokenizer_round,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.piece: r for r in unigram_lm_tokenizer_round(spark, SF_SMOKE).collect()}
    assert rows

    ln2 = float(LN2_SQL.split("'")[1])

    def lnint(v: int) -> float:
        b = v.bit_length()
        m = v / float(1 << (b - 1))
        z = (m - 1.0) / (m + 1.0)
        z2 = z * z
        acc = 1.0 / 31.0
        for k in range(29, 0, -2):
            acc = 1.0 / k + z2 * acc
        return float(b - 1) * ln2 + 2.0 * (z * acc)

    import math

    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    freq: dict[str, int] = {}
    for d in docs:
        for t in d.text.split(" "):
            if t and 1 <= len(t) <= _UNI_MAXLEN:
                freq[t] = freq.get(t, 0) + 1
    seed: dict[str, int] = {}
    for w, f in freq.items():
        for j in range(len(w)):
            for piece_len in range(1, _UNI_MAXPIECE + 1):
                if j + piece_len <= len(w):
                    seed[w[j : j + piece_len]] = (
                        seed.get(w[j : j + piece_len], 0) + f
                    )
    tot = sum(seed.values())
    cost = {
        p: int(math.floor((lnint(tot) - lnint(c)) * 1_000_000 + 0.5))
        for p, c in seed.items()
    }
    vcount: dict[str, int] = {}
    nll = 0
    pieces_tok = 0
    total_tokens = 0
    for w, f in freq.items():
        L = len(w)
        dp = [0] + [None] * L
        bp = [None] * (L + 1)
        for i in range(1, L + 1):
            best, bj = None, None
            for j in range(max(0, i - _UNI_MAXPIECE), i):
                c = dp[j] + cost[w[j:i]]
                if best is None or c < best:  # strict: smallest j wins ties
                    best, bj = c, j
            dp[i], bp[i] = best, bj
        nll += f * dp[L]
        total_tokens += f
        cur = L
        segs = []
        while cur > 0:
            segs.append(w[bp[cur] : cur])
            cur = bp[cur]
        pieces_tok += f * len(segs)
        for s in segs:
            vcount[s] = vcount.get(s, 0) + f
    vtot = sum(vcount.values())
    fertility = pieces_tok * 1000 // total_tokens
    assert len(rows) == len(seed)
    for p, r in rows.items():
        assert r.seed_count == seed[p]
        assert r.seed_cost_micro == cost[p]
        assert r.viterbi_count == vcount.get(p, 0)
        assert r.kept == (p in vcount)
        if p in vcount:
            assert r.new_cost_micro == int(
                math.floor((lnint(vtot) - lnint(vcount[p])) * 1_000_000 + 0.5)
            )
        else:
            assert r.new_cost_micro == -1
        assert r.corpus_nll_micro == nll
        assert r.fertility_milli == fertility
    # the Kudo shape: most seed pieces die in one hard-EM round
    assert 0 < len(vcount) < len(seed) // 2


def test_rm3_expansion_matches_pure_python_replay(spark):
    """Full from-first-principles replay of both RM3 rounds at the
    smoke SF: inverted index, portable-ln idf, micro-rounded
    contributions, feedback election, RM1 expansion vote, integer
    interpolation, and both ranked lists — plus the movement property
    (expansion changes the top-k but keeps continuity)."""
    import math

    from efficient_llm_data_wrangling_spark.functions.portable_math import LN2_SQL
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _RM3_ALPHA,
        _RM3_EXP,
        _RM3_FB,
        _RM3_TOPK,
        bm25_rm3_expansion,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = bm25_rm3_expansion(spark, SF_SMOKE).collect()
    got = {
        v: [(r.rk, r.doc_id, r.score_micro) for r in sorted(rows, key=lambda x: x.rk) if r.variant == v]
        for v in ("bm25", "rm3")
    }
    ln2 = float(LN2_SQL.split("'")[1])

    def lnint(v: int) -> float:
        b = v.bit_length()
        m = v / float(1 << (b - 1))
        z = (m - 1.0) / (m + 1.0)
        z2 = z * z
        acc = 1.0 / 31.0
        for k in range(29, 0, -2):
            acc = 1.0 / k + z2 * acc
        return float(b - 1) * ln2 + 2.0 * (z * acc)

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    inv: dict[int, dict[str, int]] = {}
    dl: dict[int, int] = {}
    for d in docs:
        toks = [x for x in d.text.split(" ") if x]
        dl[d.doc_id] = len(toks)
        tf: dict[str, int] = {}
        for x in toks:
            tf[x] = tf.get(x, 0) + 1
        inv[d.doc_id] = tf
    n = len(docs)
    avgdl = float(sum(dl.values())) / float(n)
    df: dict[str, int] = {}
    for tfs in inv.values():
        for term in tfs:
            df[term] = df.get(term, 0) + 1

    def contrib(doc: int, term: str) -> int:
        tf = inv[doc][term]
        idf = lnint(2 * n + 2) - lnint(2 * df[term] + 1)
        sat = (tf * (_BM25_K1 + 1.0)) / (
            tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl[doc] / avgdl)
        )
        return int(math.floor(idf * sat * 1_000_000 + 0.5))

    def score(doc: int, q: dict[str, int]) -> int:
        return sum(w * contrib(doc, t) for t, w in q.items() if t in inv[doc])

    q1 = {t: 1 for t in _BM25_TERMS}
    s1 = {d: score(d, q1) for d in inv if any(t in inv[d] for t in q1)}
    fb = sorted(s1, key=lambda d: (-s1[d], d))[:_RM3_FB]
    rm1: dict[str, int] = {}
    for d in fb:
        for t, tf in inv[d].items():
            if t not in q1:
                rm1[t] = rm1.get(t, 0) + tf * s1[d]
    expt = sorted(rm1, key=lambda t: (-rm1[t], t))[:_RM3_EXP]
    q2 = {t: _RM3_ALPHA for t in _BM25_TERMS}
    q2.update({t: 1 for t in expt})
    s2 = {d: score(d, q2) for d in inv if any(t in inv[d] for t in q2)}
    top1 = sorted(s1, key=lambda d: (-s1[d], d))[:_RM3_TOPK]
    top2 = sorted(s2, key=lambda d: (-s2[d], d))[:_RM3_TOPK]
    assert got["bm25"] == [(i + 1, d, s1[d]) for i, d in enumerate(top1)]
    assert got["rm3"] == [(i + 1, d, s2[d]) for i, d in enumerate(top2)]
    moved = set(top2) - set(top1)
    assert moved, "expansion must move the list"
    assert len(set(top1) & set(top2)) >= _RM3_TOPK // 2, "but keep continuity"


def test_preference_pairs_replay_and_structure(spark):
    """Pure-Python replay of the pairing at the smoke SF (scorer
    re-derived via hashlib, max-margin pairing, margin floor,
    same-text guard) plus the structural guarantees: every doc in at
    most one pair, margins non-negative, chosen outranks rejected."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _PP_MARGIN,
        preference_pairs_assembly,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = preference_pairs_assembly(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    ).collect()

    def w(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 17 - 8

    def score(text: str) -> int:
        toks = [t for t in text.split(" ") if t]
        s = sum(w(t) for t in toks)
        if len(toks) >= 2:
            s += sum(w(a + "_" + b) for a, b in zip(toks, toks[1:]))
        return s

    by_lang: dict = {}
    th = {}
    for d in docs:
        by_lang.setdefault(d.lang, []).append((score(d.text), d.doc_id))
        th[d.doc_id] = hashlib.md5(d.text.encode()).hexdigest()
    expected = {}
    for lang, ds in by_lang.items():
        ranked = sorted(ds, key=lambda t: (-t[0], t[1]))
        n = len(ranked)
        for r in range(1, n // 2 + 1):
            (cs, cid), (rs, rid) = ranked[r - 1], ranked[n - r]
            expected[(lang, r)] = (
                cid, rid, cs, rs, cs - rs,
                th[cid] == th[rid],
                cs - rs >= _PP_MARGIN and th[cid] != th[rid],
            )
    assert len(rows) == len(expected)
    used = set()
    for r in rows:
        e = expected[(r.lang, r.pair_rank)]
        assert (
            r.chosen_id, r.rejected_id, r.chosen_score, r.rejected_score,
            r.margin, r.same_text, r.kept,
        ) == e, (r.lang, r.pair_rank)
        assert r.margin >= 0
        assert r.chosen_id not in used and r.rejected_id not in used
        used.update((r.chosen_id, r.rejected_id))


def test_tokenizer_fertility_compare_reconciles_with_fits(spark):
    """The compare rows must reconcile exactly with the two fits'
    final symbol tables applied to the corpus word stream — and with
    each other on the shared word/char totals."""
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _BPE_D,
        _bpe_fit,
        _wp_fit,
        tokenizer_fertility_compare,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.tokenizer: r for r in tokenizer_fertility_compare(spark, SF_SMOKE).collect()}
    assert set(rows) == {"bpe", "wordpiece"}
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    words = [t for r in docs for t in r.text.split(" ") if t]
    for name, fit in (("bpe", _bpe_fit), ("wordpiece", _wp_fit)):
        _, syms = fit(spark, SF_SMOKE)
        nsym = {
            r.tok: len([x for x in r.sym.split(_BPE_D) if x]) for r in syms.collect()
        }
        r = rows[name]
        assert r.n_words == len(words)
        assert r.n_char_units == sum(len(w) for w in words)
        assert r.n_tokens == sum(nsym[w] for w in words)
        assert r.fertility_milli == r.n_tokens * 1000 // r.n_words
        assert r.saved_permille == (r.n_char_units - r.n_tokens) * 1000 // r.n_char_units
    assert rows["bpe"].n_tokens <= rows["wordpiece"].n_tokens  # the measured ranking
