"""Semantic properties of the training-prep operators that the value
oracles state but don't explain: chunks tile every token of every
document, and packs never exceed budget by more than one document."""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.queries.trainprep import (
    _BUDGET,
    _CHUNK,
    _STRIDE,
    chunk_documents_overlap,
    pack_documents_token_budget,
)
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_chunks_tile_documents_completely(spark):
    """Every token position lands in ≥1 chunk: chunk i covers
    [i·stride+1, i·stride+len_i]; consecutive chunks must overlap or
    touch, and the last chunk must end exactly at the doc's n."""
    chunks = chunk_documents_overlap(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
        )
        .filter(F.col("n") >= 1)
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        prev_end = 0
        for r in rows:
            start = r["chunk_id"] * _STRIDE + 1
            assert start <= prev_end + 1  # no gap
            assert r["n_chunk_tokens"] <= _CHUNK
            prev_end = start + r["n_chunk_tokens"] - 1
        assert prev_end == docs[doc_id]  # tail fully covered


def test_packs_respect_budget_modulo_one_doc(spark):
    """Greedy packing invariant: a pack's total exceeds the budget by
    at most its largest member (the doc that straddled the boundary),
    and pack ids are dense per source."""
    packs = (
        pack_documents_token_budget(spark, SF_SMOKE)
        .groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("biggest"))
        .collect()
    )
    assert packs
    for r in packs:
        assert r["total"] <= _BUDGET + r["biggest"], r
    by_source: dict[str, set] = {}
    for r in packs:
        by_source.setdefault(r["source"], set()).add(r["pack_id"])
    for ids in by_source.values():
        assert ids == set(range(len(ids)))  # dense, zero-based


def test_length_sorted_batching_never_pads_more(spark):
    """Token totals agree across policies, and length-sorted batching
    cannot pad more than arrival order: chunking a sorted sequence
    minimizes the sum of per-batch maxima over same-size batches."""
    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        batch_padding_report,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.strategy: r for r in batch_padding_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {"arrival", "length_sorted"}
    a, s = rows["arrival"], rows["length_sorted"]
    assert a.total_tokens == s.total_tokens
    assert a.n_batches == s.n_batches
    assert s.padded_tokens <= a.padded_tokens
    for r in (a, s):
        assert r.wasted_tokens == r.padded_tokens - r.total_tokens
        assert 0 <= r.waste_permille <= 1000


def test_domain_reweight_rounds_replays_in_pure_python(spark):
    """The full multiplicative-weights trace must replay exactly from
    the collected corpus: per-source floor-mean repetition loss, then
    4 rounds of mixture-loss / excess / floor-division reweighting —
    and the iteration must actually move weights in the excess
    direction (monotone per source across rounds)."""
    import pyspark.sql.functions as F

    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        _MW_EPS,
        _MW_ROUNDS,
        domain_reweight_rounds,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = domain_reweight_rounds(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    per_source: dict[str, list[int]] = {}
    for r in docs:
        toks = [t for t in r.text.split(" ") if t != ""]
        if not toks:
            continue
        rep = (len(toks) - len(set(toks))) * 1000 // len(toks)
        per_source.setdefault(r.source, []).append(rep)
    loss = {s: sum(v) // len(v) for s, v in per_source.items()}
    w = {s: 1_000_000 for s in loss}
    want = {}
    for rnd in range(1, _MW_ROUNDS + 1):
        ml = sum(w[s] * loss[s] for s in w) // sum(w.values())
        excess = {s: loss[s] - ml for s in w}
        # python // floors like DuckDB // and Spark div on these
        # non-negative products (w > 0, factor > 0 by construction)
        w = {s: w[s] * (1_000_000 + _MW_EPS * excess[s]) // 1_000_000 for s in w}
        for s in w:
            want[(rnd, s)] = (loss[s], excess[s], w[s])
    assert len(rows) == _MW_ROUNDS * len(loss)
    for r in rows:
        lm, em, wm = want[(r.round, r.source)]
        assert (r.loss_milli, r.excess_milli, r.weight_micro) == (lm, em, wm)
    # weights move monotonically in the (stable-signed) excess direction
    by_source: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r.round):
        by_source.setdefault(r.source, []).append(r)
    moved = 0
    for s, tr in by_source.items():
        signs = {1 if t.excess_milli > 0 else -1 if t.excess_milli < 0 else 0 for t in tr}
        if len(signs) == 1 and 0 not in signs:
            ws = [t.weight_micro for t in tr]
            assert ws == sorted(ws) or ws == sorted(ws, reverse=True)
            if ws[0] != ws[-1]:
                moved += 1
    assert moved > 0  # the control loop is not a fixed point on this corpus


def test_training_order_mixing_report_invariants(spark):
    """Per-policy invariants the oracle equality can't see: the
    policy ladder orders as measured (clustered worse than hashed
    worse-or-equal than interleaved arrival on max share; the reverse
    on distinct sources), shares recompute from a pure-Python replay
    of each ordering, and every share is a valid permille."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        _MIX_BLOCK,
        training_order_mixing_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.policy: r for r in training_order_mixing_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {"clustered", "arrival", "hashed"}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()

    def replay(order_key):
        ordered = [r.source for r in sorted(docs, key=order_key)]
        blocks = [
            ordered[i : i + _MIX_BLOCK] for i in range(0, len(ordered), _MIX_BLOCK)
        ]
        shares, srcs = [], []
        for b in blocks:
            counts = {}
            for s in b:
                counts[s] = counts.get(s, 0) + 1
            shares.append(max(counts.values()) * 1000 // len(b))
            srcs.append(len(counts))
        return blocks, shares, srcs

    keys = {
        "clustered": lambda r: (r.source, r.doc_id),
        "arrival": lambda r: (r.doc_id,),
        "hashed": lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id),
    }
    for policy, key in keys.items():
        blocks, shares, srcs = replay(key)
        r = rows[policy]
        assert r.n_blocks == len(blocks)
        assert r.mean_max_share_permille == sum(shares) // len(shares)
        assert r.worst_max_share_permille == max(shares)
        assert r.mean_sources_milli == sum(s * 1000 for s in srcs) // len(srcs)
        assert r.min_sources == min(srcs)
        assert 0 < r.worst_max_share_permille <= 1000
    # the ladder the report exists to show
    assert (
        rows["clustered"].worst_max_share_permille
        > rows["hashed"].worst_max_share_permille
        >= rows["arrival"].worst_max_share_permille
    )
    assert (
        rows["clustered"].min_sources
        < rows["hashed"].min_sources
        <= rows["arrival"].min_sources
    )


def test_source_ablation_report_replays_in_pure_python(spark):
    """Every LOO division boundary must recompute from the collected
    corpus, and the report must reconcile: shares sum to ~1000, every
    row shares the same corpus mean, and drop_improves is exactly the
    sign of delta_milli."""
    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        source_ablation_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = source_ablation_report(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    per = {}
    for d in docs:
        toks = [t for t in d.text.split(" ") if t]
        if not toks:
            continue
        rep = (len(toks) - len(set(toks))) * 1000 // len(toks)
        nd, nt, sr = per.get(d.source, (0, 0, 0))
        per[d.source] = (nd + 1, nt + len(toks), sr + rep)
    gn = sum(v[0] for v in per.values())
    gt = sum(v[1] for v in per.values())
    gs = sum(v[2] for v in per.values())
    assert len(rows) == len(per)
    for r in rows:
        nd, nt, sr = per[r.source]
        assert (r.n_docs, r.n_tokens) == (nd, nt)
        assert r.token_share_permille == nt * 1000 // gt
        assert r.src_mean_rep_milli == sr // nd
        assert r.corpus_mean_rep_milli == gs // gn
        assert r.loo_mean_rep_milli == (gs - sr) // (gn - nd)
        assert r.delta_milli == r.loo_mean_rep_milli - r.corpus_mean_rep_milli
        assert r.drop_improves == (r.delta_milli < 0)
    shares = sum(r.token_share_permille for r in rows)
    assert 1000 - len(rows) <= shares <= 1000


def test_skipgram_negative_sampling_replays_in_pure_python(spark):
    """Pure-Python replay at the smoke SF: positions, unigram counts,
    token-ordered cumulative intervals, the IEEE-sqrt subsampling
    verdicts, windowed pairs, and both md5 inverse-CDF negative draws
    — every output row must match; pair count must be exactly the
    in-bounds window size."""
    import hashlib
    import math

    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        _SG_NEGS,
        _SG_T,
        _SG_TWO32,
        _SG_WINDOW,
        skipgram_negative_sampling,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {
        (r.doc_id, r.pos, r.off): r
        for r in skipgram_negative_sampling(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()

    def u32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    seqs = {d.doc_id: [t for t in d.text.split(" ") if t] for d in docs}
    cnt: dict = {}
    for toks in seqs.values():
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
    T = sum(cnt.values())
    cum = []
    lo = 0
    for tok in sorted(cnt):
        cum.append((lo, lo + cnt[tok] - 1, tok))
        lo += cnt[tok]

    def pick(u: int) -> str:
        for a, b, tok in cum:
            if a <= u <= b:
                return tok
        raise AssertionError(u)

    tt = float(_SG_T)
    n_pairs = 0
    for doc_id, toks in seqs.items():
        keep = {}
        for i, tok in enumerate(toks):
            p = math.sqrt(tt * T / cnt[tok]) + tt * T / cnt[tok]
            keep[i] = (u32(f"{doc_id}:{i}:sub") / float(_SG_TWO32)) < p
        for i, tok in enumerate(toks):
            for off in _SG_WINDOW:
                j = i + off
                if not (0 <= j < len(toks)):
                    continue
                n_pairs += 1
                r = rows[(doc_id, i, off)]
                assert r.center == tok and r.context == toks[j]
                assert r.kept == (keep[i] and keep[j])
                for d in range(1, _SG_NEGS + 1):
                    u = u32(f"{doc_id}:{i}:{off}:neg{d}") % T
                    assert getattr(r, f"neg{d}") == pick(u), (doc_id, i, off, d)
    assert n_pairs == len(rows) > 0
