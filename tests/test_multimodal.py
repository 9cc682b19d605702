"""Multimodal binary-column operators: the byte-level properties the
DuckDB oracle can't state (blob byte access), checked against pure
Python on collected payloads."""

from __future__ import annotations

from efficient_llm_data_wrangling_spark.operators import multimodal as MM
from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _assets(spark, n=50):
    docs = load_table(spark, SF_SMOKE, "documents").limit(n)
    return MM.with_payload(docs)


def test_payload_roundtrip_header_and_body(spark):
    rows = _assets(spark).collect()
    assert rows
    for r in rows:
        buf = bytes(r["payload"])
        assert buf[:5] == MM.MAGIC
        w, h, c, body = MM._decode_payload(buf)
        assert (w, h, c) == (r["meta"]["width"], r["meta"]["height"], r["meta"]["channels"])
        assert body == len(buf) - MM.HEADER_LEN


def test_byte_histogram_matches_python(spark):
    assets = _assets(spark)
    got = {r["doc_id"]: list(r["features"]) for r in MM.byte_histogram_features(assets).collect()}
    for r in assets.collect():
        buf = bytes(r["payload"])[MM.HEADER_LEN :]
        want = [0] * 16
        for b in buf:
            want[b >> 4] += 1
        assert got[r["doc_id"]] == want


def test_frame_sample_prunes_relationally(spark):
    assets = _assets(spark)
    fr = MM.sample_frames(assets, every=7)
    got = {}
    for r in fr.collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for r in assets.collect():
        n = len(bytes(r["payload"])) - MM.HEADER_LEN
        assert sorted(got[r["doc_id"]]) == list(range(0, n, 7))


def test_decode_rejects_unknown_format():
    try:
        MM._decode_payload(b"NOTMAGICxxxxx")
    except ValueError:
        return
    raise AssertionError("expected ValueError for unknown payload format")


def test_audio_energy_matches_python_recompute(spark):
    """Exact per-frame PCM energy recompute: frames of 16 bytes, energy
    = sum (b-128)^2, peak = first max, trailing partial frame counted."""
    assets = _assets(spark)
    got = {r["doc_id"]: r for r in MM.audio_frame_energy(assets).collect()}
    for r in assets.collect():
        body = bytes(r["payload"])[MM.HEADER_LEN:]
        frames = [body[i : i + 16] for i in range(0, len(body), 16)]
        energies = [sum((b - 128) ** 2 for b in f) for f in frames]
        g = got[r["doc_id"]]
        assert g["n_frames"] == len(energies)
        assert g["total_energy"] == sum(energies)
        assert g["peak_energy"] == max(energies)
        assert g["peak_frame"] == energies.index(max(energies))


def test_phash_identical_bodies_collide_and_dedup_drops_clones(spark):
    """Byte-identical bodies must produce identical signatures, the
    planted clones must all be dropped (hamming 0 to their lower-id
    originals), and every original must be kept unless it has a
    lower-id near-dup."""
    from efficient_llm_data_wrangling_spark.queries.scale import (
        multimodal_phash_dedup,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.doc_id: r for r in multimodal_phash_dedup(spark, SF_SMOKE).collect()}
    clones = [d for d in rows if 1000000 <= d < 2000000]
    assert clones
    for d in clones:
        orig = rows[d - 1000000]
        c = rows[d]
        assert (c.b0, c.b1, c.b2, c.b3) == (orig.b0, orig.b1, orig.b2, orig.b3)
        assert not c.is_kept  # lower-id original exists at hamming 0


def test_phash_band_layout_pigeonholes_hamming_3():
    """With 64 bits in 4 bands, any pair at hamming ≤ 3 shares at
    least one identical band — the property that makes the band
    equi-join blocking EXACT for the ≤3 threshold."""
    import itertools

    from efficient_llm_data_wrangling_spark.operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_BLOCKS,
    )

    assert PHASH_BANDS * PHASH_BAND_BITS == PHASH_BLOCKS
    base = (123 << 48) | (456 << 32) | (789 << 16) | 321
    for flips in itertools.combinations(range(PHASH_BLOCKS), 3):
        other = base
        for b in flips:
            other ^= 1 << b
        shares = any(
            (base >> (k * PHASH_BAND_BITS)) & 0xFFFF
            == (other >> (k * PHASH_BAND_BITS)) & 0xFFFF
            for k in range(PHASH_BANDS)
        )
        assert shares


def test_phash_features_match_python_recompute(spark):
    """The Arrow-batched signature must equal a direct Python
    recompute of the block-mean bits from the same payload bytes."""
    from efficient_llm_data_wrangling_spark.operators.multimodal import (
        HEADER_LEN,
        PHASH_BLOCKS,
        phash_features,
        with_payload,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    sigs = {r.doc_id: r for r in phash_features(with_payload(docs)).collect()}
    for r in docs.select("doc_id", "text").collect():
        body = r.text.encode("utf-8")
        n = len(body)
        bands = [0, 0, 0, 0]
        if n:
            bs = [0] * PHASH_BLOCKS
            bc = [0] * PHASH_BLOCKS
            for j, byte in enumerate(body):
                blk = j * PHASH_BLOCKS // n
                bs[blk] += byte
                bc[blk] += 1
            total = sum(body)
            for b in range(PHASH_BLOCKS):
                if bs[b] * n > total * bc[b]:
                    bands[b // 16] |= 1 << (b % 16)
        s = sigs[r.doc_id]
        assert (s.b0, s.b1, s.b2, s.b3) == tuple(bands)
        assert s.n_body == n


def test_vad_segments_replay_from_payload_bytes(spark):
    """Segments must recompute from a pure-Python replay of the PCM
    framing + adaptive threshold + island grouping, and the island
    identities must reconcile: active frames = sum of segment lengths,
    longest <= active, and a doc with active frames has >= 1 segment."""
    from efficient_llm_data_wrangling_spark.operators.multimodal import (
        AUDIO_FRAME,
        HEADER_LEN,
    )
    from efficient_llm_data_wrangling_spark.queries.scale import (
        multimodal_vad_segments,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.doc_id: r for r in multimodal_vad_segments(spark, SF_SMOKE).collect()}
    assert rows
    # full replay for a deterministic subset via the payload itself
    from efficient_llm_data_wrangling_spark.operators.multimodal import with_payload

    payloads = {
        r.doc_id: bytes(r.payload)
        for r in with_payload(
            load_table(spark, SF_SMOKE, "documents")
        ).select("doc_id", "payload").limit(50).collect()
    }
    for doc_id, buf in payloads.items():
        body = buf[HEADER_LEN:]
        sq = [(b - 128) ** 2 for b in body]
        frames = [
            sum(sq[i : i + AUDIO_FRAME]) for i in range(0, len(sq), AUDIO_FRAME)
        ]
        r = rows[doc_id]
        assert r.n_frames == len(frames)
        mean_e = sum(frames) // len(frames)
        assert r.mean_e == mean_e
        active = [i for i, e in enumerate(frames) if e > mean_e]
        segs = []
        for i in active:
            if segs and i == segs[-1][-1] + 1:
                segs[-1].append(i)
            else:
                segs.append([i])
        assert r.n_active == len(active)
        assert r.n_segments == len(segs)
        assert r.longest_segment == (max(len(s) for s in segs) if segs else 0)
        assert r.active_permille == len(active) * 1000 // len(frames)
        assert r.longest_segment <= r.n_active
        assert (r.n_segments >= 1) == (r.n_active >= 1)
    assert payloads


def test_scene_cuts_replay_in_pure_python(spark):
    """Pure-Python (loop, no numpy) replay of the scene-cut chain at
    the smoke SF: frame chunking, nibble histograms, L1 deltas, the
    cut bar, and the longest-scene walk — every summary row must
    match; structural invariants (cuts <= boundaries, longest <=
    n_frames, sum >= max) must hold."""
    from efficient_llm_data_wrangling_spark.operators.multimodal import (
        SCENE_CUT_BAR,
        SCENE_FRAME,
    )
    from efficient_llm_data_wrangling_spark.queries.scale import (
        multimodal_scene_cuts,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.doc_id: r for r in multimodal_scene_cuts(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    n_checked = 0
    for d in docs:
        body = d.text.encode()
        nf = len(body) // SCENE_FRAME
        if nf < 1:
            assert d.doc_id not in rows
            continue
        hists = []
        for f in range(nf):
            h = [0] * 16
            for b in body[f * SCENE_FRAME : (f + 1) * SCENE_FRAME]:
                h[b >> 4] += 1
                h[b & 15] += 1
            hists.append(h)
        deltas = [
            sum(abs(a - b) for a, b in zip(hists[f], hists[f - 1]))
            for f in range(1, nf)
        ]
        cuts = [f for f in range(1, nf) if deltas[f - 1] >= SCENE_CUT_BAR]
        edges = [0] + cuts + [nf]
        r = rows[d.doc_id]
        assert r.n_frames == nf
        assert r.n_boundaries == nf - 1
        assert r.n_cuts == len(cuts)
        assert r.max_delta == (max(deltas) if deltas else 0)
        assert r.sum_delta == (sum(deltas) if deltas else 0)
        assert r.longest_scene_frames == max(
            b - a for a, b in zip(edges, edges[1:])
        )
        assert r.n_cuts <= r.n_boundaries
        assert r.longest_scene_frames <= r.n_frames
        assert r.sum_delta >= r.max_delta
        n_checked += 1
    assert n_checked == len(rows) > 0
