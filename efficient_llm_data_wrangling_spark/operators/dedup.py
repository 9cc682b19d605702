"""Deduplication operators for training-data pipelines (driver north
star; SURVEY.md §7 Phase 4).

Four families, all pure DataFrame ops (JVM-side, no Python in the hot
path), designed for the 100 TB regime:

* **exact** — group on ``(xxhash64(text), length(text))`` instead of
  the raw text: the shuffle carries 16 bytes per row, not documents.
* **MinHash + LSH** — shingle → 64 permutation-min hashes → banded
  signature buckets → bucket self-join → exact-Jaccard verification.
  The bucket join shuffles on (band, signature), which is uniformly
  distributed; nothing ever computes O(n²) pairs.
* **SimHash** — 64-bit fingerprint; Hamming-≤k pairs found with the
  pigeonhole segment trick (k+1 segments, at least one must match
  exactly), then exact popcount verification.
* **embedding cosine** — exact near-dup pairs under a blocking column;
  the scale path for unblocked data is the IVF/LSH route in
  operators/similarity.py.

Generalizes the reference's only similarity operation — the
LLM-synthesized entity-match J5 (fast_ai_wrangler/promptsTemplate.py:
30-48 mandates Jaccard/Levenshtein/cosine thresholds) — into
first-class relational operators without per-pair Python.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.session import ensure_parallelism

# ---------------------------------------------------------------------------
# Tokenization / shingling
# ---------------------------------------------------------------------------


def tokens(col: Column, sep: str = " ") -> Column:
    """Whitespace tokens (order preserved, empties dropped)."""
    return F.filter(F.split(col, sep), lambda t: t != "")


def shingles(tokens_col: Column, width: int = 3) -> Column:
    """Distinct word w-shingles: ``["a b c", "b c d", ...]``.

    Documents shorter than ``width`` words contribute their whole text
    as a single shingle so they can still match near-copies.
    """
    n = F.size(tokens_col)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - width + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, width)),
    )
    return F.array_distinct(windows)


def shingle_hashes(text_col: Column, width: int = 3) -> Column:
    """Distinct shingle set as 64-bit hashes (the dedup unit).

    Inline variant for ad-hoc use; the operators below go through
    :func:`_staged_shingle_hashes`, which evaluates the token split
    once per row instead of once per window.
    """
    return F.transform(shingles(tokens(text_col), width), lambda s: F.xxhash64(s))


def shingle_hashes32(text_col: Column, width: int = 3) -> Column:
    """Shingle hashes reduced to the 32-bit MinHash input space in the
    same pass (so downstream signature expressions consume a plain
    array column and never re-derive the shingles)."""
    return F.transform(
        shingles(tokens(text_col), width),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_HASH_SPACE)),
    )


def _staged_shingle_hashes(
    df: DataFrame,
    keep: list[Column],
    text_col: str,
    width: int,
    out: str,
    mod32: bool = False,
) -> DataFrame:
    """Tokens → shingle hashes staged as two Projects.

    The staging is load-bearing for performance: expressions nested
    inside higher-order-function lambdas are re-evaluated once per
    array element, so an inline token split under the window lambda of
    :func:`shingles` costs O(tokens) split evaluations per row —
    quadratic in document length. Materializing ``__t`` as a column
    makes each window an O(width) slice of a computed array. Catalyst's
    CollapseProject cannot undo this: the consumer references ``__t``
    twice (``size`` bound + slice lambda), and the rule only inlines
    non-trivial producer expressions referenced exactly once.
    """
    df = ensure_parallelism(df)
    toked = df.select(*keep, tokens(F.col(text_col)).alias("__t"))
    hashed = F.transform(shingles(F.col("__t"), width), lambda s: F.xxhash64(s))
    if mod32:
        hashed = F.transform(
            shingles(F.col("__t"), width),
            lambda s: F.pmod(F.xxhash64(s), F.lit(_HASH_SPACE)),
        )
    carried = [F.col(c) for c in toked.columns if c != "__t"]
    return toked.select(*carried, hashed.alias(out))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the kept
    (minimum) id and the duplicate count.

    Scale: groups on ``(xxhash64(text), length)`` so the shuffle key is
    constant-width; the raw text never moves. 128-bit-equivalent keying
    (hash + length) makes collisions astronomically unlikely; a
    paranoid exact variant would re-group survivors by text.
    """
    key = [F.xxhash64(F.col(text_col)).alias("__h"), F.length(text_col).alias("__len")]
    return (
        df.select(F.col(id_col), *key)
        .groupBy("__h", "__len")
        .agg(
            F.min(id_col).alias("doc_id_kept"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h", "__len")
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly the min-id row of every duplicate group."""
    kept = exact_dedup_groups(df, text_col, id_col).select(
        F.col("doc_id_kept").alias(id_col)
    )
    return df.join(kept, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE_P = 4294967311  # prime > 2^32
_HASH_SPACE = 1 << 32


def _coefficients(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    # a,b < 2^30 keeps a*x + b inside int64 for x < 2^32
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(num_hashes)]


def minhash_signature(
    hashes32_col: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """Array of ``num_hashes`` permutation minima over the (32-bit)
    shingle-hash set: ``min_i((a_i*x + b_i) mod P)``.

    ONE pass over the shingle array: ``aggregate`` folds each shingle
    hash into a 64-wide running-minimum accumulator via ``zip_with``
    against the (constant-folded) coefficient array. Deterministic for
    a given seed on any cluster layout; min is commutative, so element
    order (and therefore partitioning) never changes the result.

    This fold IS the measured-fastest shape (r8 interleaved A/B at
    sf0.01 and sf0.1, 64 and 256 lanes): the r7 "unroll HOFs" result
    (3.5× on the pairwise-distance path) does not transfer here
    because the outer ``aggregate`` is irreducible — shingle count is
    per-document dynamic — so every alternative keeps at least one
    interpreted lambda dispatch per shingle. Refuted alternatives:
    (a) unrolling the inner ``zip_with`` into ``num_hashes`` explicit
    ``least(element_at(acc,i), …)`` terms — 1.25-1.6× SLOWER (the
    unrolled interpreted expression tree costs more than zip_with's
    specialized array walk); (b) explode + ``num_hashes`` codegen'd
    ``min()`` aggregates (:func:`minhash_signatures`) — 2-2.5× slower
    and growing with data (per-shingle-row hash-map probe + wide
    buffer-row traffic beats the arithmetic it saves)."""
    coefs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _coefficients(num_hashes, seed)
        ]
    )
    init = F.array_repeat(F.lit(_MERSENNE_P).cast("long"), num_hashes)
    return F.aggregate(
        hashes32_col,
        init,
        lambda acc, x: F.zip_with(
            acc,
            coefs,
            lambda m, c: F.least(m, F.pmod(c["a"] * x + c["b"], F.lit(_MERSENNE_P))),
        ),
    )


def minhash_signatures(
    hashed: DataFrame,
    keys: list[str],
    hashes_col: str,
    num_hashes: int = 64,
    seed: int = 42,
    sig_col: str = "__sig",
) -> DataFrame:
    """Per-key MinHash signature via codegen'd ``min()`` aggregates:
    explode the shingle-hash array, evaluate every lane's
    ``(a_i*x + b_i) mod P`` inline in whole-stage codegen, and take
    ``num_hashes`` map-side-combinable minima in ONE hash aggregate.
    Bit-identical to :func:`minhash_signature` (same coefficients,
    same formula, min over the same set — pinned by test).

    NOT the pipeline default: the r8 interleaved A/B (sf0.01 + sf0.1,
    64 + 256 lanes, signature stage isolated) measured this 2-2.5×
    slower than the zip_with fold, with the gap GROWING in data size
    (64-lane data-cost delta sf0.01→sf0.1: fold +0.05 s, agg +1.5 s)
    — the per-shingle-row hash-map probe and 256-slot buffer-row
    update cost more than the interpreted lambda dispatch it removes.
    Kept (tested, bit-identical) for the one regime the fold cannot
    serve: documents whose shingle array is too large to hold in a
    single row value, where exploding is mandatory. Partial
    aggregation completes map-side (each document's shingles live in
    one input row), so the exchange moves exactly one
    ``num_hashes × 8 B`` signature row per document.
    """
    x = F.col("__x")
    aggs = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE_P))).alias(f"__m{i}")
        for i, (a, b) in enumerate(_coefficients(num_hashes, seed))
    ]
    return (
        hashed.select(*keys, F.explode(F.col(hashes_col)).alias("__x"))
        .groupBy(*keys)
        .agg(*aggs)
        .select(
            *keys,
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias(sig_col),
        )
    )


def lsh_bucket_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """One 64-bit bucket key per band: hash of the band's signature
    slice, salted with the band index so buckets from different bands
    never collide.

    Inline ``F.array``-of-per-band-expressions variant, viable only at
    small ``bands``: each band is a separate xxhash64+slice expression
    in ONE projection, so at 128 bands the generated Java method blows
    past Janino's 64 KB limit and the whole stage silently drops to
    interpreted evaluation (observed: 5-10x slowdown on
    dedup_threshold_sweep). :func:`minhash_candidate_pairs` therefore
    explodes the band INDEX and hashes one slice per exploded row —
    constant-size codegen at any band count; this helper remains for
    ad-hoc narrow-band use."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(band),
                F.concat_ws(",", F.slice(signature, band * rows_per_band + 1, rows_per_band)),
            )
            for band in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_width: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    block_col: str | None = None,
) -> DataFrame:
    """LSH candidate pairs (left_id < right_id), deduplicated across
    bands. ``block_col`` adds a hard blocking predicate (e.g. lang).

    Scale: the only shuffle is the groupBy-free self-join on the
    exploded (bucket) key — uniform unless the corpus contains massive
    duplicate clusters, in which case AQE skew-join splits them.
    """
    rows_per_band = num_hashes // bands
    keys = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    # staged projections (see _staged_shingle_hashes): tokens, shingle
    # hashes, signature, and bucket keys each materialize once per row.
    # The zip_with fold is the measured-fastest signature shape (r8
    # interleaved A/B) — see minhash_signature / minhash_signatures.
    hashed = _staged_shingle_hashes(df, keys, text_col, shingle_width, "__h32", mod32=True)
    signed = hashed.select(
        *keys, minhash_signature(F.col("__h32"), num_hashes, seed).alias("__sig")
    )
    # Explode the band INDEX, then hash ONE signature slice per
    # exploded row. The inline alternative (lsh_bucket_keys: `bands`
    # xxhash64+slice expressions in one projection) overflows Janino's
    # 64 KB method limit at wide-band configs (the 128-band threshold
    # sweep) and silently drops the stage to interpreted evaluation.
    # Here codegen size is constant in `bands`, and the Generate node
    # between the signature projection and the bucket projection
    # blocks CollapseProject, so __sig is still computed once per
    # input row (not once per band). Same key values as the inline
    # variant: xxhash64(band:int, concat_ws(',', slice)).
    exploded = signed.select(
        *keys,
        F.col("__sig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
    ).select(
        *keys,
        F.xxhash64(
            F.col("__band"),
            F.concat_ws(
                ",",
                F.slice(F.col("__sig"), F.col("__band") * rows_per_band + 1, F.lit(rows_per_band)),
            ),
        ).alias("__bucket"),
    )
    # DataFrame.alias + qualified refs: building the equi-condition
    # from the same lineage (left["__bucket"] == right["__bucket"])
    # resolves correctly today but trips Spark's "trivially true
    # equals predicate" self-join warning and is version-fragile.
    left = exploded.alias("__lsh_l")
    right = exploded.alias("__lsh_r")
    cond = [
        F.col("__lsh_l.__bucket") == F.col("__lsh_r.__bucket"),
        F.col(f"__lsh_l.{id_col}") < F.col(f"__lsh_r.{id_col}"),
    ]
    if block_col:
        cond.append(F.col(f"__lsh_l.{block_col}") == F.col(f"__lsh_r.{block_col}"))
    return (
        left.join(right, cond)
        .select(
            F.col(f"__lsh_l.{id_col}").alias("left_id"),
            F.col(f"__lsh_r.{id_col}").alias("right_id"),
        )
        .distinct()
    )


def verify_pairs_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_width: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs → only
    true near-duplicates survive. Joins the (small) shingle-set frame
    twice; Jaccard is array_intersect/array_union size arithmetic."""
    sets = _staged_shingle_hashes(
        df, [F.col(id_col).alias("__id")], text_col, shingle_width, "__sh"
    )
    a = sets.select(F.col("__id").alias("left_id"), F.col("__sh").alias("__sh_a"))
    b = sets.select(F.col("__id").alias("right_id"), F.col("__sh").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    jac = inter.cast("double") / union
    return (
        pairs.join(a, "left_id")
        .join(b, "right_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_width: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    block_col: str | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified at
    ``threshold``. bands=16 × rows=4 puts the s-curve knee near
    J≈0.5 with ~1-3e-8 miss probability at J≥0.9."""
    cands = minhash_candidate_pairs(
        df, id_col, text_col, shingle_width, num_hashes, bands, seed, block_col
    )
    return verify_pairs_jaccard(cands, df, id_col, text_col, shingle_width, threshold)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked) — the oracle-friendly baseline
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    threshold: float = 0.8,
    shingle_width: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs within blocks. O(pairs per
    block) — correct but only viable with strong blocking; the LSH
    variant above is the unblocked scale path."""
    sets = _staged_shingle_hashes(
        df, [F.col(id_col), F.col(block_col)], text_col, shingle_width, "__sh"
    )
    a = sets.select(
        F.col(id_col).alias("left_id"), F.col(block_col).alias("__blk"), F.col("__sh").alias("__sh_a")
    )
    b = sets.select(
        F.col(id_col).alias("right_id"), F.col(block_col).alias("__blk2"), F.col("__sh").alias("__sh_b")
    )
    jac = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double") / F.size(
        F.array_union("__sh_a", "__sh_b")
    )
    return (
        a.join(b, (F.col("__blk") == F.col("__blk2")) & (F.col("left_id") < F.col("right_id")))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array: per-bit majority vote over the
    xxhash64 of each distinct token, entirely as expression-tree
    bit arithmetic. Inline variant — the 64 bit-votes re-evaluate the
    token-hash expression; operators stage the hashes as a column and
    call :func:`_simhash_from_hashes` instead."""
    return _simhash_from_hashes(
        F.transform(F.array_distinct(tokens_col), lambda t: F.xxhash64(t))
    )


def _simhash_from_hashes(hashes: Column) -> Column:
    """Per-bit majority vote over a (pre-computed) token-hash array."""
    n = F.size(hashes)
    bits = []
    for bit in range(64):
        mask = 1 << bit if bit < 63 else -(1 << 63)
        # the lambda is applied eagerly by F.filter, so capturing the
        # loop-local mask is safe
        ones = F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(mask)) != 0))
        bits.append(
            F.when(ones * 2 >= n, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(F.lit(0).cast("long"))
        )
    total = bits[0]
    for b in bits[1:]:
        total = total.bitwiseOR(b)
    return total


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — Hamming distance between two 64-bit
    fingerprints (bit_count is a JVM built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, 64-bit SimHash) per document, with the token-hash array
    staged as a real column so the 64 bit-vote filters read it instead
    of re-hashing the tokens per bit (HOF lambdas re-evaluate nested
    expressions per element — see the module docstring)."""
    df = ensure_parallelism(df)
    hashed = df.select(
        F.col(id_col),
        F.transform(F.array_distinct(tokens(F.col(text_col))), lambda t: F.xxhash64(t)).alias(
            "__th"
        ),
    )
    return hashed.select(F.col(id_col), _simhash_from_hashes(F.col("__th")).alias("__sim"))


def near_dup_pairs_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming ≤ k via the pigeonhole
    segment join: split the fingerprint into k+1 segments; any pair
    within distance k agrees exactly on ≥1 segment, so the self-join
    key is (segment_index, segment_value) — never O(n²)."""
    segments = max_hamming + 1
    width = 64 // segments
    sim = simhash_fingerprints(df, id_col, text_col)
    seg_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                F.shiftrightunsigned(F.col("__sim"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for i in range(segments)
        ]
    )
    exploded = sim.select(F.col(id_col), F.col("__sim"), F.explode(seg_keys).alias("__seg"))
    left = exploded.select(
        F.col(id_col).alias("left_id"), F.col("__sim").alias("__sim_a"), "__seg"
    )
    right = exploded.select(
        F.col(id_col).alias("right_id"), F.col("__sim").alias("__sim_b"), "__seg"
    )
    return (
        left.join(right, ["__seg"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", hamming64(F.col("__sim_a"), F.col("__sim_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double
    precision with a fixed left-to-right accumulation order (identical
    across engines — see registry.py conventions)."""
    da = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(da, F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    nb = F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def near_dup_pairs_embedding(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact cosine near-dup pairs within blocks. For unblocked
    corpora use similarity.ivf_top_k / random-hyperplane LSH instead."""
    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    base = df.select(*cols)
    a = base.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("__va"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    b = base.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("__vb"),
        *([F.col(block_col).alias("__blk2")] if block_col else []),
    )
    cond = F.col("left_id") < F.col("right_id")
    if block_col:
        cond = cond & (F.col("__blk") == F.col("__blk2"))
    return (
        a.join(b, cond)
        .withColumn("cosine", cosine_sim(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("left_id", "right_id", "cosine")
    )
