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
