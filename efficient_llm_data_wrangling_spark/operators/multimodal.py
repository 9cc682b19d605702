"""Multimodal (binary) column operators (driver north star; SURVEY.md
§7 Phase 4).

Design: image/audio/video assets are opaque ``binary`` payload columns
plus a typed metadata struct — the storage layout a 100 TB multimodal
corpus uses (payload in parquet binary / object-store refs, metadata
queryable without touching bytes). Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas``: the executor Python worker sees ``bytes`` objects per
row, exactly as it would with a real codec.

The container ships no image/audio libraries, so the *codec* step is
stubbed: :func:`_decode_payload` tries Pillow and falls back to a
deterministic header parse of our synthetic payload format. Everything
Spark-side — schema, binary Arrow transfer, batch iteration, partition
parallelism, metadata pruning — is real and tested. Swap
``_decode_payload`` for a real codec and nothing else changes.

Synthetic payload format (deterministic, built from the documents
table): ``b"ELLDW" + width(2B big-endian) + height(2B) + channels(1B) +
utf-8 text bytes``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from efficient_llm_data_wrangling_spark.session import ensure_parallelism

MAGIC = b"ELLDW"
HEADER_LEN = len(MAGIC) + 5  # magic + w(2) + h(2) + channels(1)


# ---------------------------------------------------------------------------
# Synthetic asset construction (payload + typed metadata)
# ---------------------------------------------------------------------------


def with_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach a deterministic binary payload + metadata struct to each
    row: width/height/channels derived from the id, payload = header ‖
    utf-8 text bytes. Pure column expressions (JVM-side) — the binary
    column is born distributed, never driver-materialized."""
    width = (F.col(id_col) % 64 + 8).cast("int")
    height = (F.col(id_col) % 48 + 8).cast("int")
    channels = (F.col(id_col) % 3 + 1).cast("int")

    def _be16(c: Column) -> Column:
        # 2-byte big-endian: chr(c div 256) ‖ chr(c mod 256)
        return F.concat(F.char(F.floor(c / 256).cast("int")), F.char(c % 256))

    header = F.concat(F.lit(MAGIC.decode("ascii")), _be16(width), _be16(height), F.char(channels))
    payload = F.encode(F.concat(header, F.col(text_col)), "utf-8")
    meta = F.struct(
        width.alias("width"), height.alias("height"), channels.alias("channels")
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


# ---------------------------------------------------------------------------
# Decode (mapInPandas over binary Arrow batches)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("body_bytes", T.LongType()),
    ]
)


def _decode_payload(buf: bytes) -> tuple[int, int, int, int]:
    """Codec stub: (width, height, channels, body_bytes).

    Tries Pillow first (absent in this container); falls back to the
    synthetic header parse. A real deployment replaces this function
    only — the Arrow/mapInPandas plumbing is codec-agnostic.
    """
    try:  # pragma: no cover - Pillow not installed here
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(buf))
        return img.width, img.height, len(img.getbands()), len(buf)
    except Exception:
        pass
    if buf[: len(MAGIC)] != MAGIC:
        raise ValueError("unknown payload format")
    w = int.from_bytes(buf[5:7], "big")
    h = int.from_bytes(buf[7:9], "big")
    c = buf[9]
    return w, h, c, len(buf) - HEADER_LEN


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode every payload to its intrinsic dimensions via
    ``mapInPandas`` — one Python worker pass, Arrow-batched binary in,
    small typed rows out (the decode never widens the data: payloads
    stay in the scan stage, only metadata flows on)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "body_bytes": [d[3] for d in decoded],
                }
            )

    return ensure_parallelism(assets).mapInPandas(decode, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction (byte histogram — a real, deterministic feature)
# ---------------------------------------------------------------------------

_N_BUCKETS = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.LongType())),
    ]
)


def byte_histogram_features(assets: DataFrame, n_buckets: int = _N_BUCKETS) -> DataFrame:
    """Per-asset ``n_buckets``-bin byte histogram over the payload body
    — a genuine (not stubbed) feature extractor with the exact batch
    shape a CNN-embedding UDF would have: binary Arrow in, fixed-width
    vector out."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                body = np.frombuffer(buf, dtype=np.uint8)[HEADER_LEN:]
                hist = np.bincount(body >> 4, minlength=n_buckets)[:n_buckets]
                feats.append(hist.astype("int64").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    return ensure_parallelism(assets).mapInPandas(featurize, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (stubbed codec, real metadata/flow semantics)
# ---------------------------------------------------------------------------


def resize_assets(assets: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize-to-fit: new dimensions are computed JVM-side from the
    metadata struct (aspect-preserving clamp to ``max_side``); the
    pixel resample itself is the stubbed codec step — payloads pass
    through unchanged with the metadata updated, which is exactly the
    flow (metadata transform + codec UDF) of a real resizer."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    new_w = F.greatest(F.lit(1), F.floor(w * scale)).cast("int")
    new_h = F.greatest(F.lit(1), F.floor(h * scale)).cast("int")
    meta = F.struct(
        new_w.alias("width"), new_h.alias("height"), F.col("meta.channels").alias("channels")
    )
    return assets.select("doc_id", "payload", meta.alias("meta"))


# ---------------------------------------------------------------------------
# Frame sampling (video-style payloads, pure relational)
# ---------------------------------------------------------------------------


def sample_frames(assets: DataFrame, every: int = 10) -> DataFrame:
    """Treat each asset as a frame sequence (one frame per body byte
    here; one per chunk in a real container format) and keep every
    ``every``-th frame index: ``sequence`` + ``explode`` — frame
    selection is relational, only the kept frames would ever hit the
    decode UDF. This ordering (prune-then-decode) is the part that
    matters at 100 TB."""
    n_frames = (F.length("payload") - HEADER_LEN).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every))
    return (
        assets.filter(n_frames > 0)
        .select("doc_id", n_frames.alias("n_frames"), F.explode(idx).alias("frame_idx"))
    )


# ---------------------------------------------------------------------------
# Audio: per-frame energy over the payload body as 8-bit PCM
# ---------------------------------------------------------------------------

AUDIO_FRAME = 16  # samples per frame (test-scale stand-in for e.g. 400)

AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak_frame", T.LongType()),
        T.StructField("peak_energy", T.LongType()),
        T.StructField("total_energy", T.LongType()),
    ]
)


def audio_frame_energy(assets: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Audio feature extraction with the exact batch shape a real
    librosa/torchaudio UDF has (binary Arrow in, per-asset scalars
    out): the payload body is interpreted as unsigned 8-bit PCM,
    framed at ``frame`` samples (trailing partial frame included),
    and each frame's energy is Σ(b−128)² — exact integers end to end,
    so the DuckDB oracle can recompute it from the hex of the same
    bytes. Peak election is first-max (lowest frame index on ties),
    matching a deterministic ``ORDER BY e DESC, f`` restatement.

    Scale: mapInPandas streams Arrow batches; output is 5 scalars per
    asset, so the wide payload never survives past this stage."""

    def energize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": pdf["doc_id"].values, "n_frames": [], "peak_frame": [],
                   "peak_energy": [], "total_energy": []}
            for buf in pdf["payload"]:
                body = np.frombuffer(buf, dtype=np.uint8)[HEADER_LEN:].astype(np.int64)
                sq = (body - 128) ** 2
                starts = np.arange(0, len(sq), frame)
                e = np.add.reduceat(sq, starts) if len(sq) else np.array([], dtype=np.int64)
                out["n_frames"].append(len(e))
                out["peak_frame"].append(int(np.argmax(e)) if len(e) else -1)
                out["peak_energy"].append(int(e.max()) if len(e) else 0)
                out["total_energy"].append(int(sq.sum()))
            yield pd.DataFrame(out)

    return ensure_parallelism(assets).mapInPandas(energize, AUDIO_ENERGY_SCHEMA)


AUDIO_FRAME_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("f", T.LongType()),
        T.StructField("e", T.LongType()),
    ]
)


def audio_frames(assets: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Per-FRAME energy rows (doc_id, f, e) — the row-granularity twin
    of :func:`audio_frame_energy` for downstream relational DSP
    (VAD segmentation, silence trimming): same unsigned 8-bit PCM
    interpretation, same framing, same exact-integer energies, but
    frames survive as rows instead of collapsing to per-asset scalars.

    Scale: output is n_samples/frame rows per asset of 3 longs — the
    wide payload still never leaves this stage; downstream windows
    partition by doc_id (per-asset bounded)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fs, es = [], [], []
            for doc_id, buf in zip(pdf["doc_id"].values, pdf["payload"]):
                body = np.frombuffer(buf, dtype=np.uint8)[HEADER_LEN:].astype(np.int64)
                sq = (body - 128) ** 2
                starts = np.arange(0, len(sq), frame)
                e = np.add.reduceat(sq, starts) if len(sq) else np.array([], dtype=np.int64)
                ids.extend([doc_id] * len(e))
                fs.extend(range(len(e)))
                es.extend(int(x) for x in e)
            yield pd.DataFrame({"doc_id": ids, "f": fs, "e": es})

    return ensure_parallelism(assets).mapInPandas(frames, AUDIO_FRAME_ROWS_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (block-mean pHash over the payload body)
# ---------------------------------------------------------------------------

#: 64 signature bits carried as 4 × 16-bit band integers — BIGINT-safe
#: and sign-free on both engines (a single 64-bit value would put bit
#: 63 into the BIGINT sign), and the bands double as the pigeonhole
#: blocking key for hamming-bounded dedup.
PHASH_BLOCKS = 64
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BLOCKS // PHASH_BANDS

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
        T.StructField("n_body", T.LongType()),
    ]
)


def phash_features(assets: DataFrame) -> DataFrame:
    """Block-mean perceptual hash with the exact batch shape a real
    pHash/DCT UDF has (binary Arrow in, per-asset scalars out): the
    payload body is split into ``PHASH_BLOCKS`` index-balanced blocks
    (byte j → block j·B div n), and bit b is set iff block b's mean
    exceeds the body mean — compared cross-multiplied in exact
    integers (``sum_b·n > total·count_b``), so the DuckDB oracle can
    replay every bit from the hex of the same bytes. Empty blocks
    (n < B) compare 0 > 0 and stay clear, identically on both sides.

    Scale: one Arrow pass, 5 scalars out per asset; the signature is
    both the near-dup feature and its own blocking key."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": pdf["doc_id"].values, "b0": [], "b1": [], "b2": [],
                   "b3": [], "n_body": []}
            for buf in pdf["payload"]:
                body = np.frombuffer(buf, dtype=np.uint8)[HEADER_LEN:].astype(np.int64)
                n = len(body)
                bands = [0] * PHASH_BANDS
                if n:
                    blk = (np.arange(n, dtype=np.int64) * PHASH_BLOCKS) // n
                    bs = np.zeros(PHASH_BLOCKS, dtype=np.int64)
                    bc = np.zeros(PHASH_BLOCKS, dtype=np.int64)
                    np.add.at(bs, blk, body)
                    np.add.at(bc, blk, 1)
                    total = int(body.sum())
                    bits = bs * n > total * bc
                    for b in np.nonzero(bits)[0]:
                        bands[int(b) // PHASH_BAND_BITS] |= 1 << (
                            int(b) % PHASH_BAND_BITS
                        )
                out["b0"].append(bands[0])
                out["b1"].append(bands[1])
                out["b2"].append(bands[2])
                out["b3"].append(bands[3])
                out["n_body"].append(n)
            yield pd.DataFrame(out)

    return ensure_parallelism(assets).mapInPandas(featurize, PHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Video: scene-cut detection over per-frame nibble histograms
# ---------------------------------------------------------------------------

SCENE_FRAME = 16  # bytes per frame (test-scale stand-in for a real frame)
SCENE_CUT_BAR = 24  # L1 nibble-histogram delta declaring a cut (of max 64)

SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_boundaries", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("max_delta", T.LongType()),
        T.StructField("sum_delta", T.LongType()),
        T.StructField("longest_scene_frames", T.LongType()),
    ]
)


def scene_cut_summary(
    assets: DataFrame, frame: int = SCENE_FRAME, bar: int = SCENE_CUT_BAR
) -> DataFrame:
    """Per-asset scene segmentation: the payload body as a frame
    sequence ({frame} bytes/frame, trailing partial dropped), each
    frame featurized to its 16-bin nibble histogram, a CUT declared at
    every boundary whose L1 histogram delta reaches ``bar`` (of the
    2·{frame} max), summarized per asset (cut count, delta extremes,
    longest scene). numpy over Arrow batches in ``mapInPandas`` — the
    same worker pass a real codec's frame decode would ride; a real
    deployment swaps the byte-histogram featurizer for decoded-frame
    features and keeps every boundary/threshold/summary step."""
    import numpy as np

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[HEADER_LEN:]
                nf = len(body) // frame
                if nf < 1:
                    continue
                a = np.frombuffer(body[: nf * frame], dtype=np.uint8).reshape(
                    nf, frame
                )
                nib = np.concatenate([a >> 4, a & 15], axis=1)
                hist = np.stack(
                    [np.bincount(r, minlength=16) for r in nib]
                ).astype(np.int64)
                d = np.abs(np.diff(hist, axis=0)).sum(axis=1)
                cuts = np.nonzero(d >= bar)[0] + 1  # cut BEFORE frame f
                edges = np.concatenate([[0], cuts, [nf]])
                out.append(
                    (
                        int(doc_id),
                        nf,
                        max(nf - 1, 0),
                        int(len(cuts)),
                        int(d.max()) if len(d) else 0,
                        int(d.sum()) if len(d) else 0,
                        int(np.diff(edges).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in SCENE_SCHEMA.fields],
            )

    return ensure_parallelism(assets).mapInPandas(summarize, SCENE_SCHEMA)
