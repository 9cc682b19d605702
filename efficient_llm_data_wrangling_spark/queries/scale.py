"""Scale-pipeline queries: dedup, similarity search, text analysis
(driver north star; SURVEY.md §7 Phase 4).

Oracle strategy: the DuckDB side recomputes the *logical* semantics
(exact Jaccard, exact cosine argmax/top-k, quality formulas) while the
Spark side runs the *scale* physical strategy (hash-key dedup, LSH
bucket joins, IVF probing). When both agree bit-for-bit, the physical
optimization is proven semantics-preserving — the core claim of each
operator.

Float convention (registry.py): every double derives from the same
fold shape on both engines — Spark ``aggregate(…, 0.0D, +)`` ≡ DuckDB
``list_reduce(list_prepend(0.0D, …), +)`` — so values match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import dedup as D
from efficient_llm_data_wrangling_spark.operators import similarity as SIM
from efficient_llm_data_wrangling_spark.operators import multimodal as MM
from efficient_llm_data_wrangling_spark.operators import text as TX
from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Shared corpus-with-duplicates construction (both engines)
# ---------------------------------------------------------------------------

#: documents ∪ exact clones (doc_id%7, +1e6) ∪ 5-words-dropped mutants
#: (doc_id%10, +2e6) — plants known exact and near duplicates.
_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - 5, 3)], ' '),
         lang
  FROM documents WHERE doc_id % 10 = 0
)
"""


def _corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    clones = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    toks = F.split("text", " ")
    trimmed = F.concat_ws(
        " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(3)))
    )
    mutants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), trimmed.alias("text"), "lang"
    )
    return docs.unionByName(clones).unionByName(mutants)


#: DuckDB 3-word shingle set of a text column (mirrors operators.dedup.shingles).
def _shingles_sql(text_expr: str = "text", width: int = 3) -> str:
    return (
        f"list_distinct([array_to_string(toks[i:i+{width - 1}], ' ') "
        f"for i in range(1, greatest(len(toks) - {width - 1}, 1) + 1)])"
    ).replace("toks", f"string_split({text_expr}, ' ')")


#: DuckDB cosine with the exact Spark fold shape (see module docstring).
def _fold_sum(terms: str) -> str:
    return f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {terms}), (x, y) -> x + y)"


def _cos_sql(a: str, b: str) -> str:
    dot = _fold_sum(f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in range(1, len({a}) + 1)]")
    na = _fold_sum(f"[CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) for i in range(1, len({a}) + 1)]")
    nb = _fold_sum(f"[CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in range(1, len({b}) + 1)]")
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

_EXACT_ORACLE = f"""
WITH {_CORPUS_SQL.strip()}
SELECT min(doc_id) AS doc_id_kept, CAST(count(*) AS BIGINT) AS dup_count
FROM corpus GROUP BY text
"""


@query("dedup_exact_documents", oracle=_EXACT_ORACLE, tags=("dedup", "bench"))
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: group on (xxhash64(text), length) so the
    shuffle never carries document bodies; oracle groups on raw text —
    agreement proves the hash-key strategy loses nothing."""
    tune(spark)
    return D.exact_dedup_groups(_corpus_with_dups(spark, sf_dir))


_JACCARD_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
sets AS (
  SELECT doc_id, lang, {_shingles_sql()} AS sh FROM corpus
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-dup pairs (threshold 0.8)
    within language blocks — the blocked-exact baseline the LSH variant
    must reproduce."""
    tune(spark)
    return D.ngram_jaccard_pairs(
        _corpus_with_dups(spark, sf_dir), block_col="lang", threshold=0.8
    )


@query("dedup_minhash_lsh", oracle=_JACCARD_ORACLE, tags=("dedup", "bench"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) candidate generation + exact verification
    at 0.8 — same OUTPUT as dedup_ngram_jaccard (same oracle!), found
    without enumerating O(n²) pairs: the physical plan shuffles only
    (band, signature) buckets. The s-curve at J=0.8 gives miss
    probability ≈ 3e-8 per pair, so equality with the exact oracle is
    expected deterministically on this corpus."""
    tune(spark)
    return D.near_dup_pairs_minhash(
        _corpus_with_dups(spark, sf_dir), block_col="lang", threshold=0.8
    )


# ---------------------------------------------------------------------------
# MinHash sketch calibration (portable md5 permutation family)
# ---------------------------------------------------------------------------

_CAL_LANES = 64
_CAL_BANDS = 16
_CAL_ROWS = _CAL_LANES // _CAL_BANDS


def _hexint_sql(expr: str, start: int, width: int) -> str:
    """Local twin of curation._hexint_sql (curation imports from this
    module, so importing it back would be circular): big-endian integer
    value of ``width`` hex chars of ``expr`` from 1-based ``start`` —
    DuckDB's spelling of Spark ``conv(substring(h, start, width), 16, 10)``."""
    terms = [
        f"(instr('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1) * {16 ** (width - 1 - i)}"
        for i in range(width)
    ]
    return "(" + " + ".join(terms) + ")"


def _perm_min_sql(a: int, b: int) -> str:
    return (
        f"list_aggregate([(({a} * x + {b}) % {D._MERSENNE_P}) for x in h], 'min')"
    )


#: the 64-lane portable signature over a column named ``h`` — embeds
#: the literal (a, b) coefficients, so any CTE that exposes the hashed
#: shingle set as ``h`` can replay the exact Spark signature.
_CAL_SIG_SQL = "[" + ", ".join(
    _perm_min_sql(a, b) for a, b in D._coefficients(_CAL_LANES, 42)
) + "]"


def _h32_sql(text_expr: str = "text") -> str:
    """DuckDB: the distinct 32-bit md5-prefix shingle-hash set of a
    text expression (the portable twin of :func:`_portable_minhash`'s
    ``h`` column)."""
    return (
        f"list_distinct([CAST({_hexint_sql('md5(s)', 1, 8)} AS BIGINT)"
        f" for s in {_shingles_sql(text_expr)}])"
    )


def _portable_minhash(df: DataFrame, keep: list[str], text_col: str = "text") -> DataFrame:
    """(keep…, h, sig): hashed shingle set + 64-lane signature in the
    PORTABLE md5 permutation family — identical ``(a·x+b) mod P``
    formula and coefficients as the production xxhash64 pipeline, but
    with 32-bit md5-prefix shingle hashes so DuckDB replays the
    signature bit-for-bit (``_h32_sql`` / ``_CAL_SIG_SQL``). Shared by
    the sketch-calibration report and the fuzzy decontamination pass.
    Same staging discipline as ``_staged_shingle_hashes``: tokens and
    hashes each materialize once per row."""
    t = df.select(*keep, D.tokens(F.col(text_col)).alias("__t"))
    md5h = lambda s: F.conv(  # noqa: E731 — the portable 32-bit shingle hash
        F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10
    ).cast("long")
    sh = t.select(
        *keep,
        F.array_distinct(F.transform(D.shingles(F.col("__t"), 3), md5h)).alias("h"),
    )
    return sh.select(
        *keep, "h", D.minhash_signature(F.col("h"), _CAL_LANES, 42).alias("sig")
    )


_CAL_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
sh AS (
  SELECT doc_id, lang, {_h32_sql()} AS h
  FROM corpus
),
sg AS (
  SELECT doc_id, lang, h, {_CAL_SIG_SQL} AS sig FROM sh
),
bnd AS (
  SELECT doc_id, lang, b.b AS band,
         array_to_string(sig[(b.b * {_CAL_ROWS} + 1):(b.b * {_CAL_ROWS} + {_CAL_ROWS})], ',') AS key
  FROM sg, (SELECT unnest(range(0, {_CAL_BANDS})) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
  FROM bnd a JOIN bnd b
    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
   AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.left_id, c.right_id,
         len(list_filter(range(1, {_CAL_LANES} + 1),
                         i -> sa.sig[i] = sb.sig[i])) AS matches,
         len(list_intersect(sa.h, sb.h)) AS inter,
         len(list_distinct(list_concat(sa.h, sb.h))) AS uni
  FROM cand c
  JOIN sg sa ON sa.doc_id = c.left_id
  JOIN sg sb ON sb.doc_id = c.right_id
),
milli AS (
  SELECT (matches * 1000) // {_CAL_LANES} AS est_milli,
         (inter * 1000) // uni AS exact_milli
  FROM scored
)
SELECT CAST(least(exact_milli // 100, 9) AS BIGINT) AS jaccard_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(abs(est_milli - exact_milli)) AS BIGINT) AS sum_abs_err_milli,
       CAST(max(abs(est_milli - exact_milli)) AS BIGINT) AS max_abs_err_milli,
       CAST(sum(CASE WHEN est_milli > exact_milli THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
       CAST(sum(CASE WHEN est_milli < exact_milli THEN 1 ELSE 0 END) AS BIGINT) AS n_under
FROM milli GROUP BY 1
"""


@query("minhash_error_calibration", oracle=_CAL_ORACLE, tags=("dedup", "sketch"))
def minhash_error_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact calibration of the MinHash estimator: over the
    LSH candidate pairs of the planted-duplicate corpus, compare the
    {_CAL_LANES}-permutation estimate (``matches/{_CAL_LANES}``, in
    exact floor-milli) against the exact Jaccard of the hashed shingle
    sets it estimates, and report per exact-Jaccard decile the pair
    count, summed/max absolute error, and the over/under split — the
    study that decides whether {_CAL_LANES} permutations are enough
    before trusting the sketch at a threshold (expected σ ≈
    √(J(1−J)/{_CAL_LANES}) ≈ 60 milli at J=0.5, shrinking toward both
    ends — the report shows exactly that shape).

    The pipeline's production minhash (``dedup_minhash_lsh``) hashes
    shingles and bands with xxhash64, which has no DuckDB twin — its
    oracle therefore proves candidate-generation losslessness against
    exact Jaccard but cannot replay the ESTIMATE. This query swaps in
    the portable md5 permutation family (identical ``(a·x+b) mod P``
    formula and literal coefficients, 32-bit md5-prefix shingle
    hashes, raw signature-slice band keys) so BOTH engines replay
    signatures, banding, candidates, and the estimate bit-for-bit —
    the error report itself is what the driver hash-grades.

    Scale: identical posture to ``dedup_minhash_lsh`` — the only
    shuffle is the (lang, band, key) self-join on exploded band keys;
    signatures fold map-side ({_CAL_LANES}×8 B per doc); the exact
    re-verify touches only candidate pairs; the report is ≤10 rows.
    """
    tune(spark)
    corpus = _corpus_with_dups(spark, sf_dir)
    sg = _portable_minhash(corpus, ["doc_id", "lang"]).localCheckpoint(eager=False)
    bnd = sg.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), F.lit(_CAL_BANDS - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "lang",
        "band",
        F.array_join(
            F.transform(
                F.slice("sig", F.col("band") * _CAL_ROWS + 1, _CAL_ROWS),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("key"),
    )
    a = bnd.select(
        F.col("lang").alias("__lg"), "band", "key", F.col("doc_id").alias("left_id")
    )
    b = bnd.select(
        F.col("lang").alias("__lg"), "band", "key", F.col("doc_id").alias("right_id")
    )
    cand = (
        a.join(b, ["__lg", "band", "key"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    sa = sg.select(F.col("doc_id").alias("left_id"), F.col("h").alias("__ha"), F.col("sig").alias("__sa"))
    sb = sg.select(F.col("doc_id").alias("right_id"), F.col("h").alias("__hb"), F.col("sig").alias("__sb"))
    scored = (
        cand.join(sa, "left_id")
        .join(sb, "right_id")
        .select(
            F.size(
                F.filter(F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda v: v)
            ).alias("matches"),
            F.size(F.array_intersect("__ha", "__hb")).alias("inter"),
            F.size(F.array_union("__ha", "__hb")).alias("uni"),
        )
    )
    milli = scored.select(
        F.expr(f"(matches * 1000) div {_CAL_LANES}").alias("est_milli"),
        F.expr("(inter * 1000) div uni").alias("exact_milli"),
    )
    err = F.abs(F.col("est_milli") - F.col("exact_milli"))
    return milli.groupBy(
        F.least(F.expr("exact_milli div 100"), F.lit(9)).cast("long").alias("jaccard_band")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(err).alias("sum_abs_err_milli"),
        F.max(err).alias("max_abs_err_milli"),
        F.sum(F.when(F.col("est_milli") > F.col("exact_milli"), 1).otherwise(0)).alias("n_over"),
        F.sum(F.when(F.col("est_milli") < F.col("exact_milli"), 1).otherwise(0)).alias("n_under"),
    )


_SIMHASH_ORACLE = f"""
WITH {_CORPUS_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS recall_ok, TRUE AS precision_ok
FROM corpus
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("dedup",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 near-dup pairs (Hamming ≤ 3) via pigeonhole segment
    join, driver-gated by its exactness guarantee: any pair within
    Hamming k agrees on ≥1 of k+1 fingerprint segments, so the
    pigeonhole candidate set must EQUAL the brute-force O(n²) Hamming
    scan — computed here over the staged fingerprints (two longs per
    pair, never the text) and restated as booleans the DuckDB oracle
    asserts (xxhash64 itself has no DuckDB twin). ``recall_ok`` =
    no brute pair missing, ``precision_ok`` = no extra pair; hash-green
    ⟺ the segment join is provably lossless on this corpus."""
    tune(spark)
    corpus = _corpus_with_dups(spark, sf_dir)
    pigeon = D.near_dup_pairs_simhash(corpus, max_hamming=3)
    sims = D.simhash_fingerprints(corpus)
    a = sims.select(F.col("doc_id").alias("left_id"), F.col("__sim").alias("__sa"))
    b = sims.select(F.col("doc_id").alias("right_id"), F.col("__sim").alias("__sb"))
    brute = (
        a.join(b, F.col("left_id") < F.col("right_id"))
        .filter(D.hamming64(F.col("__sa"), F.col("__sb")) <= 3)
        .select("left_id", "right_id")
    )
    both = brute.withColumn("__src", F.lit("b")).join(
        pigeon.select("left_id", "right_id").withColumn("__src2", F.lit("p")),
        ["left_id", "right_id"],
        "full_outer",
    )
    checks = both.agg(
        (F.count(F.when(F.col("__src").isNull(), 1)) == 0).alias("precision_ok"),
        (F.count(F.when(F.col("__src2").isNull(), 1)) == 0).alias("recall_ok"),
    )
    n = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    return n.crossJoin(checks).select("n_docs", "recall_ok", "precision_ok")


_EMB_DUP_ORACLE = f"""
SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       {_cos_sql("a.embedding", "b.embedding")} AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos_sql("a.embedding", "b.embedding")} >= 0.35
"""


@query("dedup_embedding_cosine", oracle=_EMB_DUP_ORACLE, tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥ 0.35) blocked by label —
    double-precision fold identical on both engines, so even the float
    threshold decisions agree exactly."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return D.near_dup_pairs_embedding(emb, threshold=0.35, block_col="label")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKEN_ORACLE = r"""
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
FROM documents
"""


@query("text_token_counts", oracle=_TOKEN_ORACLE, tags=("text",))
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-style pre-token counts as scan-speed
    expressions (no UDF)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


_QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) / length(text)
         ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
    CAST(len(list_intersect(list_distinct(list_transform(toks, x -> lower(x))),
         ['the','a','an','and','or','of','to','in','is','it'])) AS BIGINT) AS stopword_hits,
    CASE WHEN len(toks) > 0
         THEN CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a,b) -> a + b) AS DOUBLE) / len(toks)
         ELSE CAST(0 AS DOUBLE) END AS avg_word_len
  FROM t
)
SELECT doc_id, n_tokens, n_chars, punct_ratio, stopword_hits, avg_word_len,
  (CAST(n_tokens BETWEEN 10 AND 1000 AS INT) + CAST(punct_ratio <= 0.2 AS INT)
   + CAST(stopword_hits >= 1 AS INT)) / CAST(3.0 AS DOUBLE) AS quality_score
FROM f
"""


@query("text_quality_documents", oracle=_QUALITY_ORACLE, tags=("text", "bench"))
def text_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style cheap quality features + composite score, pure
    expressions; oracle restates every formula."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.with_quality_score(docs).drop("text")


_LEX = {lang: list(lex) for lang, lex in TX.LANG_LEXICONS.items()}


def _lex_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LEX[lang])
    return f"len(list_intersect(toks, [{words}]))"


_LANGID_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
    list_distinct(list_transform(
      list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''), x -> lower(x))) AS toks
  FROM documents
), s AS (
  SELECT doc_id,
    {_lex_sql("de")} AS h_de, {_lex_sql("en")} AS h_en, {_lex_sql("es")} AS h_es,
    {_lex_sql("fr")} AS h_fr, {_lex_sql("zh")} AS h_zh
  FROM t
)
SELECT doc_id,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) <= 0 THEN 'und'
       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
       WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
       WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
       WHEN h_fr >= h_zh THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM s
"""


@query("text_lang_id", oracle=_LANGID_ORACLE, tags=("text",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID with deterministic alphabetical
    tie-break (first max wins) — oracle restates the argmax as nested
    comparisons."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.detect_language(F.col("text")).alias("lang_pred"))


_FPRINT_ORACLE = """
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, cp) -> (acc * 31 + cp) % 2147483647) AS fingerprint
FROM documents
"""


@query("text_fingerprint", oracle=_FPRINT_ORACLE, tags=("text",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint — engine-portable
    (same fold, same value in any SQL dialect)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(v) for v in row["embedding"]]


_KNN_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, {_cos_sql("e.embedding", "q.qv")} AS cosine
FROM embeddings e, q
ORDER BY cosine DESC, e.vec_id
LIMIT 10
"""


@query("knn_brute_force", oracle=_KNN_ORACLE, tags=("similarity", "bench"))
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the vec_id=0 query vector — one scan,
    per-partition top-k merge (TakeOrderedAndProject), no global sort."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_top_k(emb, _query_vector(spark, sf_dir), k=10)


_N_CELLS = 8
_IVF_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_N_CELLS}),
probes AS (
  SELECT cid FROM (
    SELECT c.cid, {_cos_sql("q.qv", "c.cvec")} AS sim FROM c, q
  ) ORDER BY sim DESC, cid LIMIT 2
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN c
  ) WHERE rn = 1
)
SELECT a.vec_id, {_cos_sql("a.embedding", "q.qv")} AS cosine
FROM assigned a, q
WHERE a.cell_id IN (SELECT cid FROM probes)
ORDER BY cosine DESC, a.vec_id
LIMIT 10
"""


@query("knn_ivf", oracle=_IVF_ORACLE, tags=("similarity",))
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF two-stage ANN: 8 deterministic centroids (vec_id<8), probe
    the 2 nearest to the vec_id=1 query, exact top-10 within probed
    cells. The oracle replays assignment + probing relationally —
    agreement proves the pruned search returns exactly the pruned-space
    optimum."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < _N_CELLS)
        .select("vec_id", "embedding")
        .collect()
    ]
    cents.sort(key=lambda c: c[0])
    return SIM.ivf_top_k(emb, cents, _query_vector(spark, sf_dir, vec_id=1), k=10, n_probe=2)


_LSH_KNN_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_vectors, CAST(10 AS BIGINT) AS k,
       TRUE AS self_found, TRUE AS recall_ok, TRUE AS rerank_exact
FROM embeddings
"""


@query("knn_hyperplane_lsh", oracle=_LSH_KNN_ORACLE, tags=("similarity",))
def knn_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (16 planes × 6 OR'd tables, Hamming ≤
    5 probe) with exact cosine re-rank, driver-gated on its quality
    contract vs the exact brute-force top-10 (the Gaussian plane
    constants have no SQL twin, so the oracle restates the bounds):
    ``self_found`` — the query's own vector (Hamming 0 in every table)
    is returned with cosine 1; ``recall_ok`` — recall@10 ≥ 0.7
    (measured 0.8–1.0 across sf0.001/0.01/0.1 with this fixed seed;
    multi-table amplification drives P(miss) down geometrically);
    ``rerank_exact`` — every hit's cosine equals the brute-force value
    bit-for-bit (the re-rank is exact, only candidate generation is
    approximate)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = _query_vector(spark, sf_dir)
    lsh = SIM.hyperplane_lsh_top_k(
        emb, qvec, k=10, n_planes=16, max_hamming=5, n_tables=6
    ).select(F.col("vec_id"), F.col("cosine").alias("__lc"))
    brute = SIM.brute_force_top_k(emb, qvec, k=10).select(
        F.col("vec_id"), F.col("cosine").alias("__bc")
    )
    hits = brute.join(lsh, "vec_id")
    checks = lsh.agg(
        F.coalesce(
            F.max(
                F.when((F.col("vec_id") == 0) & (F.abs(F.col("__lc") - 1.0) < 1e-12), True)
            ),
            F.lit(False),
        ).alias("self_found")
    ).crossJoin(
        hits.agg(
            (F.count(F.lit(1)) >= 7).alias("recall_ok"),
            F.coalesce(
                F.max(F.abs(F.col("__lc") - F.col("__bc"))) < 1e-15, F.lit(False)
            ).alias("rerank_exact"),
        )
    )
    n = emb.agg(F.count(F.lit(1)).alias("n_vectors"), F.lit(10).cast("long").alias("k"))
    return n.crossJoin(checks).select(
        "n_vectors", "k", "self_found", "recall_ok", "rerank_exact"
    )


# ---------------------------------------------------------------------------
# Multimodal (binary payload) family
# ---------------------------------------------------------------------------

#: HEADER_LEN bytes of synthetic header before the utf-8 body.
_MM_DECODE_ORACLE = """
SELECT doc_id,
       CAST(10 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(doc_id % 64 + 8 AS INT) AS width,
       CAST(doc_id % 48 + 8 AS INT) AS height,
       CAST(doc_id % 3 + 1 AS INT) AS channels,
       CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes
FROM documents
"""


@query("multimodal_decode", oracle=_MM_DECODE_ORACLE, tags=("multimodal",))
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode via mapInPandas: payloads are built
    JVM-side (header ‖ utf-8 body), shipped to Python workers as Arrow
    binary batches, and parsed by the (stub) codec. The oracle
    recomputes every decoded field from first principles — proving the
    bytes that crossed the Arrow boundary round-tripped exactly."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_assets(MM.with_payload(docs))


_MM_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(greatest(1, floor((doc_id % 64 + 8) *
            least(1.0, 32.0 / greatest(doc_id % 64 + 8, doc_id % 48 + 8)))) AS INT) AS width,
       CAST(greatest(1, floor((doc_id % 48 + 8) *
            least(1.0, 32.0 / greatest(doc_id % 64 + 8, doc_id % 48 + 8)))) AS INT) AS height,
       CAST(doc_id % 3 + 1 AS INT) AS channels
FROM documents
"""


@query("multimodal_resize_meta", oracle=_MM_RESIZE_ORACLE, tags=("multimodal",))
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize-to-fit(32): the dimension math runs
    JVM-side on the metadata struct (the codec resample is the stubbed
    step); payloads never leave the scan stage."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    resized = MM.resize_assets(MM.with_payload(docs))
    return resized.select("doc_id", "meta.width", "meta.height", "meta.channels")


_MM_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_frames,
       CAST(unnest(range(0, octet_length(encode(text)), 10)) AS INT) AS frame_idx
FROM documents
WHERE octet_length(encode(text)) > 0
"""


@query("multimodal_frame_sample", oracle=_MM_FRAMES_ORACLE, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling as pure relational sequence+explode —
    frame pruning happens BEFORE any decode UDF would run, which is the
    ordering that matters when the payload column is 100 TB."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return MM.sample_frames(MM.with_payload(docs), every=10)


_MM_HIST_ORACLE = """
WITH hx AS (
  SELECT doc_id, to_hex(encode(text)) AS h FROM documents
),
nib AS (
  SELECT hx.doc_id,
         CAST(strpos('0123456789ABCDEF', substr(hx.h, CAST(t.p AS BIGINT), 1)) - 1
              AS BIGINT) AS bin
  FROM hx, unnest(range(1, length(hx.h) + 1, 2)) AS t(p)
)
SELECT hx.doc_id,
       {bins}
FROM hx LEFT JOIN nib ON hx.doc_id = nib.doc_id
GROUP BY hx.doc_id
""".format(
    bins=",\n       ".join(
        "CAST(count(*) FILTER (WHERE nib.bin = {i}) AS BIGINT) AS bin_{i:02d}".format(
            i=i
        )
        for i in range(16)
    )
)


_MM_AUDIO_ORACLE = """
WITH hx AS (SELECT doc_id, to_hex(encode(text)) AS h FROM documents),
b AS (
  SELECT doc_id,
         CAST(t.p AS BIGINT) AS bi,
         (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 1 AS BIGINT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 2 AS BIGINT), 1)) - 1) AS byte
  FROM hx, unnest(range(0, length(h) // 2)) AS t(p)
),
fr AS (
  SELECT doc_id, bi // 16 AS f,
         CAST(sum((byte - 128) * (byte - 128)) AS BIGINT) AS e
  FROM b GROUP BY 1, 2
),
pk AS (
  SELECT doc_id, f, e,
         row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, f) AS rn
  FROM fr
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         CAST(sum(e) AS BIGINT) AS total_energy
  FROM fr GROUP BY doc_id
)
SELECT agg.doc_id, agg.n_frames, CAST(pk.f AS BIGINT) AS peak_frame,
       pk.e AS peak_energy, agg.total_energy
FROM agg JOIN pk ON agg.doc_id = pk.doc_id AND pk.rn = 1
"""


@query("multimodal_audio_energy", oracle=_MM_AUDIO_ORACLE, tags=("multimodal",))
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over the binary payload column: body
    bytes as unsigned 8-bit PCM, framed at 16 samples, per-frame energy
    Σ(b−128)² — exact integers end to end, so the oracle recomputes the
    identical frames from ``to_hex(encode(text))``. Peak election is
    first-max (ORDER BY e DESC, f), deterministic on both engines. The
    Arrow-batched ``mapInPandas`` has the exact shape a librosa UDF
    would have; only 5 scalars per asset survive the stage — the
    payload never widens past the scan (the invariant that matters at
    100 TB of audio)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return MM.audio_frame_energy(MM.with_payload(docs))


@query("multimodal_byte_histogram", oracle=_MM_HIST_ORACLE, tags=("multimodal",))
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin byte histogram per payload body — a real (non-stub)
    Arrow-batched feature extractor with the exact shape of an
    embedding UDF, flattened to 16 scalar ``bin_NN`` columns (the
    driver's pandas canonicalizer can't hash array cells). The payload
    body after the 10-byte header is exactly ``encode(text, 'utf-8')``
    and each bin is ``byte >> 4`` — the high hex nibble — so the DuckDB
    oracle recomputes the identical histogram from
    ``to_hex(encode(text))``'s odd-position characters."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.byte_histogram_features(MM.with_payload(docs))
    return feats.select(
        "doc_id",
        *[F.col("features")[i].alias(f"bin_{i:02d}") for i in range(16)],
    )


_PHASH_HAM = 3  # near-dup iff hamming(sig_a, sig_b) ≤ 3

_MM_PHASH_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
hx AS (
  SELECT doc_id, to_hex(encode(text)) AS h FROM corpus
  WHERE octet_length(encode(text)) > 0
),
by AS (
  SELECT doc_id,
         CAST(t.p AS BIGINT) AS j,
         CAST(length(h) // 2 AS BIGINT) AS n,
         (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 1 AS BIGINT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 2 AS BIGINT), 1)) - 1) AS byte
  FROM hx, unnest(range(0, length(h) // 2)) AS t(p)
),
bsum AS (
  SELECT doc_id, n, j * 64 // n AS b,
         CAST(sum(byte) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM by GROUP BY 1, 2, 3
),
tt AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS total FROM bsum GROUP BY 1),
bandv AS (
  SELECT bs.doc_id, bs.b // 16 AS k,
         CAST(sum(CASE WHEN bs.s * bs.n > t.total * bs.c
                       THEN 1 << CAST(bs.b % 16 AS INT) ELSE 0 END) AS BIGINT) AS v
  FROM bsum bs JOIN tt t USING (doc_id) GROUP BY 1, 2
),
ph AS (
  SELECT doc_id,
         CAST(coalesce(sum(CASE WHEN k = 0 THEN v END), 0) AS BIGINT) AS b0,
         CAST(coalesce(sum(CASE WHEN k = 1 THEN v END), 0) AS BIGINT) AS b1,
         CAST(coalesce(sum(CASE WHEN k = 2 THEN v END), 0) AS BIGINT) AS b2,
         CAST(coalesce(sum(CASE WHEN k = 3 THEN v END), 0) AS BIGINT) AS b3
  FROM bandv GROUP BY doc_id
),
pairs AS (
  SELECT DISTINCT x.doc_id AS aid, y.doc_id AS bid
  FROM bandv x JOIN bandv y ON x.k = y.k AND x.v = y.v AND x.doc_id < y.doc_id
),
ham AS (
  SELECT p.bid
  FROM pairs p JOIN ph pa ON pa.doc_id = p.aid JOIN ph pb ON pb.doc_id = p.bid
  WHERE bit_count(xor(pa.b0, pb.b0)) + bit_count(xor(pa.b1, pb.b1))
      + bit_count(xor(pa.b2, pb.b2)) + bit_count(xor(pa.b3, pb.b3)) <= {_PHASH_HAM}
),
dropped AS (SELECT DISTINCT bid FROM ham)
SELECT ph.doc_id, ph.b0, ph.b1, ph.b2, ph.b3,
       d.bid IS NULL AS is_kept
FROM ph LEFT JOIN dropped d ON ph.doc_id = d.bid
"""


@query("multimodal_phash_dedup", oracle=_MM_PHASH_ORACLE, tags=("multimodal", "dedup"))
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup dedup over the binary payload column — the
    missing multimodal member of the dedup family: a block-mean
    perceptual hash (64 bits as 4×16-bit bands, computed in the same
    Arrow-batched ``mapInPandas`` shape a real pHash/DCT UDF has, every
    bit integer-exact so the oracle replays it from hex), then
    hamming-bounded near-dup blocking. Pigeonhole makes the blocking
    EXACT, not approximate: hamming ≤ {_PHASH_HAM} over 4 bands forces
    at least one identical band, so the band equi-join provably covers
    every qualifying pair. Runs over the planted-duplicates corpus the
    dedup family shares (``_corpus_with_dups``): every clone's body is
    byte-identical to its original, so its signature collides at
    hamming 0 and the manifest provably drops it. Output is the
    admission manifest (doc_id, signature bands, is_kept) — dropped
    iff a lower-id neighbor within hamming {_PHASH_HAM} exists.

    Scale: signatures are 4 small ints per asset (the payload never
    survives the feature stage); the dedup shuffles only
    (band_idx, band_value) keys — the simhash pigeonhole posture —
    and verification is integer xor/popcount on candidate pairs.
    """
    tune(spark)
    docs = _corpus_with_dups(spark, sf_dir).filter(F.length("text") > 0)
    # signature table materialized once: the band explode (both join
    # sides) and the final manifest all consume it, and its lineage
    # carries the Python feature stage
    ph = MM.phash_features(MM.with_payload(docs)).localCheckpoint(eager=False)
    bands = ph.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("k", "v"),
    )
    x = bands.select(F.col("doc_id").alias("aid"), "k", "v")
    y = bands.select(F.col("doc_id").alias("bid"), "k", "v")
    pairs = (
        x.join(y, ["k", "v"])
        .filter(F.col("aid") < F.col("bid"))
        .select("aid", "bid")
        .distinct()
    )
    pa = ph.select(
        F.col("doc_id").alias("aid"),
        *[F.col(c).alias(f"__a{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    pb = ph.select(
        F.col("doc_id").alias("bid"),
        *[F.col(c).alias(f"__b{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    hd = sum(
        F.bit_count(F.expr(f"__a{c} ^ __b{c}")) for c in ("b0", "b1", "b2", "b3")
    )
    dropped = (
        pairs.join(pa, "aid")
        .join(pb, "bid")
        .filter(hd <= _PHASH_HAM)
        .select("bid")
        .distinct()
    )
    return ph.join(
        dropped.withColumnRenamed("bid", "doc_id").withColumn("__hit", F.lit(1)),
        "doc_id",
        "left",
    ).select(
        "doc_id", "b0", "b1", "b2", "b3", F.col("__hit").isNull().alias("is_kept")
    )


from efficient_llm_data_wrangling_spark.functions import portable_math as _PM

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS __n FROM documents),
base AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfx.df, nrel.__n
  FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN nrel
  WHERE tf.doc_id < 50
),
{_PM.duck_lnint_ctes("base", "s0", "__n + 1", "__lnn_")},
{_PM.duck_lnint_ctes("s0", "s1", "df + 1", "__lnd_")}
SELECT doc_id, term, tf, df,
       round(tf * ((({_PM.lnint_sql("__lnn_")}) - ({_PM.lnint_sql("__lnd_")}))
                   + CAST(1 AS DOUBLE)), 6) AS tfidf
FROM s1
"""


@query("text_tfidf", oracle=_TFIDF_ORACLE, tags=("text",))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF, fully relational (explode → groupBy → broadcast
    df/N back). The oracle recomputes the identical formula; the idf
    ``ln`` uses the bit-portable integer series (libm-independent at
    any scale — functions/portable_math.py). Restricted to doc_id < 50
    to keep the compare set bounded (the plan is identical at any
    cardinality)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = TX.tf_idf(docs)
    return out.filter(F.col("doc_id") < 50)


_CENTROID_ORACLE = """
WITH e AS (
  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT label,
       CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / count(*) / 1000000.0 AS centroid
FROM e GROUP BY label, dim
"""


@query("centroid_embeddings_by_label", oracle=_CENTROID_ORACLE, tags=("similarity", "agg"))
def centroid_embeddings_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the building block
    of IVF coarse quantization and k-means (the assignment step's
    cluster update). Cross-row float sums are accumulation-order-
    dependent, so each component is summed as exact integer
    micro-units (round(v·1e6)) — order-free and bit-identical in both
    engines — then divided back out in double.

    Scale: posexplode is a generator (rows × dims, no shuffle until
    the agg); one partial-combined shuffle keyed (label, dim). The
    1e-6 quantization is far below any ANN-relevant signal.
    """
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        e.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.round(F.col("v").cast("double") * 1000000).cast("long")).alias("_s"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            (F.col("_s").cast("double") / F.col("n_vecs") / 1000000.0).alias("centroid"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) family: encoder + IVF-PQ pipeline
# ---------------------------------------------------------------------------

#: 64-dim embeddings → 8 subspaces × 8 dims; the codebook per subspace
#: is the corresponding subvector of the 8 deterministic IVF centroids
#: (vec_id < 8) — no training loop, the exact storage/compute shape of
#: a trained PQ with k=8 codewords per subspace.
_PQ_M = 8
_PQ_DSUB = 8


def _fold_l2(a: list[float], b: list[float]) -> float:
    """Driver-side twin of the engines' squared-L2 left fold —
    identical IEEE ops in identical order (the probe-selection
    precedent), so a value computed here is bit-equal to the SQL
    ``aggregate(zip_with(...))`` over the same doubles."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _l2sq_sql(a: str, b: str, n: int = _PQ_DSUB) -> str:
    """DuckDB squared-L2 with the Spark fold shape: elementwise terms
    in index order, left-fold sum from 0.0."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"[({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) for i in range(1, {n + 1})]), "
        f"(acc, x) -> acc + x)"
    )


_PQ_ENCODE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sub AS (
  SELECT vec_id, j, v[(j * {_PQ_DSUB} + 1):(j * {_PQ_DSUB} + {_PQ_DSUB})] AS s
  FROM e, unnest(range({_PQ_M})) AS u(j)
),
cs AS (
  SELECT vec_id AS code, j, v[(j * {_PQ_DSUB} + 1):(j * {_PQ_DSUB} + {_PQ_DSUB})] AS cs
  FROM e, unnest(range({_PQ_M})) AS u(j)
  WHERE vec_id < {_PQ_M}
),
d AS (
  SELECT sub.vec_id, sub.j, cs.code, {_l2sq_sql("sub.s", "cs.cs")} AS dist
  FROM sub JOIN cs USING (j)
)
SELECT vec_id, CAST(j AS INT) AS subspace,
       CAST((min({{'d': dist, 'c': code}})).c AS INT) AS code
FROM d GROUP BY vec_id, j
"""


@query("pq_encode_embeddings", oracle=_PQ_ENCODE_ORACLE, tags=("similarity", "pq"))
def pq_encode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoder: each 64-dim vector becomes 8
    one-byte codes — per subspace, the index of the nearest codeword by
    exact squared-L2 (ties to the smaller code). 8 bytes per vector is
    the 32× compression that makes billion-scale ANN indexes fit in
    RAM (Jégou et al. 2011); the distances are computed identically on
    both engines (same elementwise order, same left fold), so the
    argmin — elected via lexicographic (dist, code) struct min — is
    bit-deterministic.

    Scale: subvectors explode to rows × m (a generator, no shuffle);
    the 64-row codeword table broadcasts; the argmin is one partial-
    aggregated shuffle on (vec_id, subspace). At 100 TB the same plan
    streams: nothing driver-side, nothing quadratic.
    """
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    sub = e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), "
                f"j -> slice(v, j * {_PQ_DSUB} + 1, {_PQ_DSUB}))"
            )
        ).alias("j", "s"),
    )
    cs = (
        e.filter(F.col("vec_id") < _PQ_M)
        .select(
            F.col("vec_id").alias("code"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_PQ_M - 1}), "
                    f"j -> slice(v, j * {_PQ_DSUB} + 1, {_PQ_DSUB}))"
                )
            ).alias("j", "cs"),
        )
    )
    d = sub.join(F.broadcast(cs), "j").select(
        "vec_id",
        "j",
        "code",
        F.expr(
            "aggregate(zip_with(s, cs, (x, y) -> (x - y) * (x - y)), "
            "cast(0 as double), (acc, x) -> acc + x)"
        ).alias("dist"),
    )
    return (
        d.groupBy("vec_id", "j")
        .agg(F.min(F.struct("dist", "code")).alias("mk"))
        .select(
            "vec_id",
            F.col("j").cast("int").alias("subspace"),
            F.col("mk.code").cast("int").alias("code"),
        )
    )


_IVF_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
c AS (SELECT vec_id AS k, v AS cv FROM e WHERE vec_id < {_PQ_M}),
dc AS (
  SELECT e.vec_id, c.k, {_l2sq_sql("e.v", "c.cv", 64)} AS d
  FROM e CROSS JOIN c
),
cell AS (
  SELECT vec_id, CAST((min({{'d': d, 'k': k}})).k AS INT) AS cell
  FROM dc GROUP BY vec_id
),
probe AS (
  SELECT c.k FROM q CROSS JOIN c
  ORDER BY {_l2sq_sql("q.qv", "c.cv", 64)}, c.k
  LIMIT 2
),
cand AS (
  SELECT e.vec_id, e.v, cell.cell
  FROM e JOIN cell USING (vec_id)
  WHERE cell.cell IN (SELECT k FROM probe)
),
sub AS (
  SELECT vec_id, j, v[(j * {_PQ_DSUB} + 1):(j * {_PQ_DSUB} + {_PQ_DSUB})] AS s
  FROM cand, unnest(range({_PQ_M})) AS u(j)
),
cs AS (
  SELECT vec_id AS code, j, v[(j * {_PQ_DSUB} + 1):(j * {_PQ_DSUB} + {_PQ_DSUB})] AS cs
  FROM e, unnest(range({_PQ_M})) AS u(j)
  WHERE vec_id < {_PQ_M}
),
codes AS (
  SELECT sub.vec_id, sub.j,
         (min({{'d': {_l2sq_sql("sub.s", "cs.cs")}, 'c': cs.code}})).c AS code
  FROM sub JOIN cs USING (j)
  GROUP BY sub.vec_id, sub.j
),
jdist AS (
  SELECT codes.vec_id, codes.j,
         {_l2sq_sql("q.qv[(codes.j * %d + 1):(codes.j * %d + %d)]"
                    % (_PQ_DSUB, _PQ_DSUB, _PQ_DSUB), "cs.cs")} AS dj
  FROM codes JOIN cs ON codes.j = cs.j AND codes.code = cs.code
  CROSS JOIN q
),
adc AS (
  SELECT vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(dj ORDER BY j)),
                     (acc, x) -> acc + x) AS adc
  FROM jdist GROUP BY vec_id
),
shortlist AS (
  SELECT adc.vec_id, adc.adc FROM adc ORDER BY adc.adc, adc.vec_id LIMIT 50
)
SELECT s.vec_id, cand.cell, round(s.adc, 6) AS adc_6,
       {_cos_sql("cand.v", "q.qv")} AS cosine
FROM shortlist s
JOIN cand USING (vec_id)
CROSS JOIN q
ORDER BY cosine DESC, s.vec_id
LIMIT 10
"""


@query("knn_ivf_pq", oracle=_IVF_PQ_ORACLE, tags=("similarity", "pq"))
def knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the workhorse of billion-scale ANN (Jégou et al. 2011;
    the FAISS IVFPQ layout): coarse-quantize every vector to its
    nearest of 8 cells, probe the 2 cells nearest the query, rank the
    probed candidates by asymmetric distance (query subvector ↔ the
    candidate's PQ codeword, summed over the 8 subspaces in fixed
    order), shortlist the top-50 by (ADC, vec_id), then re-rank the
    shortlist by exact cosine for the final top-10. Every distance on
    both engines uses the identical elementwise order and left fold,
    ADC sums subspaces in j order, and all ties break on the id — so
    the whole pipeline, approximation and all, replays bit-for-bit
    relationally.

    Scale: the codebook (8 centroids / 64 codewords) broadcasts;
    assignment and encoding are generator-explodes + one keyed shuffle
    each; ADC touches only probed cells (≈ n_probe/n_cells of the
    data); the exact re-rank touches 50 rows. The driver holds just
    the 8 collected centroids (house precedent: knn_ivf).
    """
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in e.filter(F.col("vec_id") < _PQ_M).collect()
    ]
    cents.sort(key=lambda t: t[0])
    # the query vector (vec_id = 1 < m) already sits in the collected
    # codebook — re-collecting it was a second full scan job (guide §1)
    qv = next(list(v) for k, v in cents if k == 1)

    # probe selection on the driver over the 8 collected centroids —
    # same left-fold arithmetic as the SQL twin, tie to smaller k
    def _l2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    probes = sorted(range(_PQ_M), key=lambda k: (_l2(qv, cents[k][1]), k))[:2]

    # every literal below is emitted as ONE parsed SQL string (the
    # per-element F.lit form cost ~6 py4j round-trips per value — the
    # r12 _scored_literal_codebook lesson); CAST('<repr>' AS DOUBLE)
    # string-parses to the bit-identical double the collect returned
    def _d(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    def _darr(vals) -> str:
        return "array(" + ", ".join(_d(x) for x in vals) + ")"

    cb = F.expr("array(" + ", ".join(_darr(vec) for _, vec in cents) + ")")
    dcell = F.expr(
        f"transform(sequence(0, {_PQ_M - 1}), k -> "
        "aggregate(zip_with(v, element_at(cb, k + 1), (x, y) -> (x - y) * (x - y)), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )
    assigned = (
        e.withColumn("cb", cb)
        .withColumn("dcell", dcell)
        .select(
            "vec_id",
            "v",
            (F.expr("array_position(dcell, array_min(dcell))").cast("int") - F.lit(1)).alias(
                "cell"
            ),
        )
    )
    cand = assigned.filter(F.col("cell").isin(*[int(p) for p in probes]))

    # PQ-encode + ADC against the ALREADY-COLLECTED codebook, entirely
    # scan-side (the stream gates' literal-codebook posture): the old
    # form exploded candidates x8 subspaces, broadcast-joined the 64
    # codewords TWICE and paid a (vec_id, j) shuffle + a collect_list
    # shuffle for arithmetic whose operands are all codebook-sized
    # constants. cst[j][code] is the codeword subvector (same
    # slice(v, j*dsub+1, dsub) doubles); djt[j][code] is the
    # query-to-codeword subdistance, precomputed on the driver with the
    # IDENTICAL left fold the SQL twin runs (the probe-selection _l2
    # precedent — Python and the JVM evaluate the same IEEE ops in the
    # same order). Per row: 8 array_min elections over 8-codeword
    # scored arrays, then the j-ordered dj fold — no joins, no
    # exchanges; the whole query is one pass over the probed cells
    # plus two TakeOrdered reductions (guide §2.4: remove shuffles
    # outright).
    cst = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                _darr(vec[j * _PQ_DSUB : (j + 1) * _PQ_DSUB]) for _, vec in cents
            )
            + ")"
            for j in range(_PQ_M)
        )
        + ")"
    )
    djt = [
        [
            _fold_l2(qv[j * _PQ_DSUB : (j + 1) * _PQ_DSUB], vec[j * _PQ_DSUB : (j + 1) * _PQ_DSUB])
            for _, vec in cents
        ]
        for j in range(_PQ_M)
    ]
    djt_txt = "array(" + ", ".join(_darr(row) for row in djt) + ")"
    # per subspace j: the same (dist, code) struct-min election the
    # grouped F.min ran, as array_min over the literal codewords; dj is
    # the table lookup at the elected code; adc sums dj in j order with
    # the same 0.0-seeded left fold as the collect_list form
    adc = F.expr(
        f"aggregate(transform(sequence(0, {_PQ_M - 1}), j -> "
        f"element_at(element_at({djt_txt}, j + 1), CAST((array_min("
        f"transform(sequence(0, {_PQ_M - 1}), c -> struct("
        "aggregate(zip_with("
        f"slice(v, j * {_PQ_DSUB} + 1, {_PQ_DSUB}), "
        f"element_at(element_at({cst}, j + 1), c + 1), "
        "(x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, x) -> acc + x) AS dist, "
        "CAST(c AS BIGINT) AS code)))).code AS INT) + 1)), "
        "cast(0 as double), (acc, dj) -> acc + dj)"
    )
    qarr = F.expr(_darr(qv))
    cosine = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x) / "
        "(sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)) * "
        "sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)))"
    )
    shortlist = (
        cand.select("vec_id", "cell", adc.alias("adc"), "v")
        .orderBy("adc", "vec_id")
        .limit(50)
    )
    return (
        shortlist.withColumn("qv", qarr)
        .select(
            "vec_id",
            "cell",
            F.round(F.col("adc"), 6).alias("adc_6"),
            cosine.alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


_LANG_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANGID_ORACLE}),
j AS (
  SELECT d.lang, p.lang_pred FROM documents d JOIN pred p USING (doc_id)
),
cm AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM j GROUP BY lang, lang_pred
),
tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_total FROM j GROUP BY lang)
SELECT cm.lang, cm.lang_pred, cm.n_docs,
       cm.n_docs * 1000 // tot.lang_total AS share_permille
FROM cm JOIN tot USING (lang)
"""


@query("lang_confusion_report", oracle=_LANG_CONFUSION_ORACLE, tags=("text", "quality"))
def lang_confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-audit confusion matrix for the heuristic language
    ID: predicted vs labeled language with per-cell counts and
    row-share in exact per-mille — the acceptance report a pipeline
    publishes before trusting a lang filter to route documents (CCNet
    audits its fastText LID exactly this way). Composes the graded
    ``text_lang_id`` prediction column directly.

    Scale: the prediction is scan-side column math (no shuffle); the
    matrix is one |langs|²-bounded aggregate plus a broadcast of the
    |langs|-row totals.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pred = text_lang_id(spark, sf_dir)
    j = docs.select("doc_id", "lang").join(pred, "doc_id")
    # the |langs|²-bounded matrix is materialized once — it carries
    # the corpus-sized prediction join, and both the row totals and
    # the final select consume it
    cm = (
        j.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    # row totals roll up from the matrix itself — re-aggregating `j`
    # would run the corpus join a second time
    tot = cm.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("lang_total"))
    return cm.join(F.broadcast(tot), "lang").select(
        "lang",
        "lang_pred",
        "n_docs",
        F.expr("n_docs * 1000L div lang_total").alias("share_permille"),
    )


# ---------------------------------------------------------------------------
# Audio VAD segmentation (gaps-and-islands DSP over frame energies)
# ---------------------------------------------------------------------------

_VAD_ORACLE = """
WITH hx AS (SELECT doc_id, to_hex(encode(text)) AS h FROM documents),
b AS (
  SELECT doc_id,
         CAST(t.p AS BIGINT) AS bi,
         (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 1 AS BIGINT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substr(h, CAST(2 * t.p + 2 AS BIGINT), 1)) - 1) AS byte
  FROM hx, unnest(range(0, length(h) // 2)) AS t(p)
),
fr AS (
  SELECT doc_id, bi // 16 AS f,
         CAST(sum((byte - 128) * (byte - 128)) AS BIGINT) AS e
  FROM b GROUP BY 1, 2
),
m AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         CAST(sum(e) // count(*) AS BIGINT) AS mean_e
  FROM fr GROUP BY doc_id
),
act AS (
  SELECT fr.doc_id, fr.f,
         fr.f - row_number() OVER (PARTITION BY fr.doc_id ORDER BY fr.f) AS isl
  FROM fr JOIN m ON fr.doc_id = m.doc_id
  WHERE fr.e > m.mean_e
),
seg AS (
  SELECT doc_id, isl, CAST(count(*) AS BIGINT) AS seg_len
  FROM act GROUP BY doc_id, isl
),
pa AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(max(seg_len) AS BIGINT) AS longest_segment,
         CAST(sum(seg_len) AS BIGINT) AS n_active
  FROM seg GROUP BY doc_id
)
SELECT m.doc_id, m.n_frames, m.mean_e,
       coalesce(pa.n_active, 0) AS n_active,
       coalesce(pa.n_segments, 0) AS n_segments,
       coalesce(pa.longest_segment, 0) AS longest_segment,
       CAST(coalesce(pa.n_active, 0) * 1000 // m.n_frames AS BIGINT)
         AS active_permille
FROM m LEFT JOIN pa ON m.doc_id = pa.doc_id
"""


@query("multimodal_vad_segments", oracle=_VAD_ORACLE, tags=("multimodal", "window"))
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over the audio payloads — the
    relational DSP step between raw-audio feature extraction and a
    speech-only training corpus (what a 100 TB audio pipeline runs to
    DROP silence before the expensive ASR/codec stage): frames above
    the asset's own mean energy (adaptive threshold — the energy-gate
    VAD baseline) grouped into contiguous speech segments by the
    gaps-and-islands rank trick (island = f − rank(f) over active
    frames). Per asset: frames, adaptive threshold, active frames,
    segment count, longest segment, and active share in exact
    permille — the numbers that size the post-trim corpus. Frame
    energies come from the Arrow-batched :func:`operators.multimodal.
    audio_frames` (same PCM interpretation as the graded
    ``multimodal_audio_energy``, frames surviving as 3-long rows);
    the oracle recomputes every frame from the hex of the same bytes.

    Scale: the payload never leaves the frame extractor; islands use
    per-ASSET windows (bounded by frames-per-asset, never a global
    window), and the two reductions are keyed partial aggregates.
    """
    tune(spark)
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    fr = MM.audio_frames(MM.with_payload(docs)).localCheckpoint(eager=False)
    m = fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.expr("CAST(sum(e) div count(*) AS BIGINT)").alias("mean_e"),
    )
    act = (
        fr.join(m, "doc_id")
        .filter(F.col("e") > F.col("mean_e"))
        .select(
            "doc_id",
            "f",
            (
                F.col("f")
                - F.row_number().over(Window.partitionBy("doc_id").orderBy("f"))
            ).alias("isl"),
        )
    )
    seg = act.groupBy("doc_id", "isl").agg(F.count(F.lit(1)).cast("long").alias("seg_len"))
    pa = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.max("seg_len").cast("long").alias("longest_segment"),
        F.sum("seg_len").cast("long").alias("n_active"),
    )
    return (
        m.join(pa, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            "mean_e",
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce("longest_segment", F.lit(0)).cast("long").alias("longest_segment"),
            F.expr(
                "CAST(coalesce(n_active, 0) * 1000 div n_frames AS BIGINT)"
            ).alias("active_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Binary (1-bit) quantization retrieval — the quantization ladder's floor
# ---------------------------------------------------------------------------

_BINQ_PROBES = 32  # the graded fixed probe set (vec_id < 32)
_BINQ_K = 3  # neighbors graded per probe (the ladder's recall@3)
_BINQ_C = 32  # binary shortlist size the re-rank arm rescores exactly


def _binq_oracle() -> str:
    micro = (
        "[CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        " for i in range(1, len(embedding) + 1)]"
    )
    w1 = (
        "list_sum([CASE WHEN x[i] * nv > s[i] THEN (CAST(1 AS BIGINT) << (i - 1))"
        " ELSE CAST(0 AS BIGINT) END for i in range(1, 33)])"
    )
    w2 = (
        "list_sum([CASE WHEN x[i + 32] * nv > s[i + 32]"
        " THEN (CAST(1 AS BIGINT) << (i - 1))"
        " ELSE CAST(0 AS BIGINT) END for i in range(1, 33)])"
    )
    return f"""
WITH xs AS (
  SELECT vec_id, {micro} AS x, embedding FROM embeddings
),
nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM xs),
su AS (
  SELECT list(sj ORDER BY j) AS s FROM (
    SELECT j.j AS j, CAST(sum(a.x[j.j]) AS BIGINT) AS sj
    FROM xs a CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j
    GROUP BY j.j
  )
),
w AS (
  SELECT vec_id, embedding,
         {w1} AS w1, {w2} AS w2
  FROM xs CROSS JOIN nv CROSS JOIN su
),
pb AS (SELECT vec_id AS pid, embedding AS pv, w1 AS pw1, w2 AS pw2
       FROM w WHERE vec_id < {_BINQ_PROBES}),
hm AS (
  SELECT p.pid, c.vec_id,
         CAST(bit_count(xor(p.pw1, c.w1)) + bit_count(xor(p.pw2, c.w2))
              AS BIGINT) AS hamming
  FROM pb p JOIN w c ON c.vec_id <> p.pid
),
sl AS (
  SELECT pid, vec_id, hamming, rn FROM (
    SELECT pid, vec_id, hamming,
           row_number() OVER (PARTITION BY pid ORDER BY hamming, vec_id) AS rn
    FROM hm
  ) WHERE rn <= {_BINQ_C}
),
bt AS (SELECT pid, vec_id, hamming, rn FROM sl WHERE rn <= {_BINQ_K}),
rr AS (
  SELECT pid, vec_id, hamming, rn FROM (
    SELECT s.pid, s.vec_id, s.hamming,
           row_number() OVER (
             PARTITION BY s.pid
             ORDER BY {_cos_sql("c.embedding", "p.pv")} DESC, s.vec_id) AS rn
    FROM sl s
    JOIN pb p ON p.pid = s.pid
    JOIN embeddings c ON c.vec_id = s.vec_id
  ) WHERE rn <= {_BINQ_K}
),
ex AS (
  SELECT pid, vec_id FROM (
    SELECT p.pid, c.vec_id,
           row_number() OVER (
             PARTITION BY p.pid
             ORDER BY {_cos_sql("c.embedding", "p.pv")} DESC, c.vec_id) AS rn
    FROM pb p JOIN embeddings c ON c.vec_id <> p.pid
  ) WHERE rn <= {_BINQ_K}
),
ovb AS (
  SELECT b.pid, CAST(count(*) AS BIGINT) AS n
  FROM bt b JOIN ex e ON b.pid = e.pid AND b.vec_id = e.vec_id
  GROUP BY b.pid
),
ovr AS (
  SELECT b.pid, CAST(count(*) AS BIGINT) AS n
  FROM rr b JOIN ex e ON b.pid = e.pid AND b.vec_id = e.vec_id
  GROUP BY b.pid
)
SELECT p.pid, 'binary_top{_BINQ_K}' AS variant,
       CAST({_BINQ_K} AS BIGINT) AS k,
       CAST(16 AS BIGINT) AS bytes_per_vector,
       CAST(0 AS BIGINT) AS n_reranked,
       b.vec_id AS best_neighbor_id,
       b.hamming AS best_hamming,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(o.n, 0) * 1000000 // {_BINQ_K} AS BIGINT) AS recall_ppm
FROM pb p
JOIN bt b ON b.pid = p.pid AND b.rn = 1
LEFT JOIN ovb o ON o.pid = p.pid
UNION ALL
SELECT p.pid, 'shortlist{_BINQ_C}_rerank' AS variant,
       CAST({_BINQ_K} AS BIGINT) AS k,
       CAST(16 AS BIGINT) AS bytes_per_vector,
       CAST({_BINQ_C} AS BIGINT) AS n_reranked,
       b.vec_id AS best_neighbor_id,
       b.hamming AS best_hamming,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(o.n, 0) * 1000000 // {_BINQ_K} AS BIGINT) AS recall_ppm
FROM pb p
JOIN rr b ON b.pid = p.pid AND b.rn = 1
LEFT JOIN ovr o ON o.pid = p.pid
"""


@query(
    "knn_binary_hamming",
    oracle=_binq_oracle(),
    tags=("similarity", "scale", "sketch"),
)
def knn_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY (1-bit) quantization retrieval — the quantization
    ladder's FLOOR, completing int8 (``quantize_embeddings_int8``) and
    8×8 PQ (``knn_ivf_pq`` / the ADC serving rung) with the cheapest
    representation vector search has: one bit per dimension against
    the per-dim corpus mean (threshold election by exact
    cross-multiplication ``x_j·n > Σ_j`` — no division semantics to
    match), packed into two BIGINT words = 16 bytes/vector, ranked by
    Hamming distance via xor+popcount (engine-specific spellings,
    identical integer semantics). Two arms against the exact cosine
    top-{_BINQ_K}: the codes as a STANDALONE ranker, and the
    production posture — binary shortlist of {_BINQ_C}, exact re-rank
    of the shortlist only.

    Measured honest floor: standalone, 16-byte codes keep only
    19.8%/20.8% recall@3 (sf0.001/sf0.01) — at 64 dims the sign bits
    carry too little angular information and best-neighbor Hamming
    crowds around 20/64, so 1-bit is NOT a ranker here, unlike int8
    and PQ which hold recall at this dimensionality. As a FILTER it
    earns its bytes: re-ranking just the top-{_BINQ_C} codes (6.4% of
    the corpus at sf0.01) recovers 68.7%/61.5% — the binary stage
    discards 93% of candidates while keeping two-thirds of the true
    neighbors. Read-off: binary quantization's production assumption
    is the 1024+-dim regime where sign-bit concentration holds; at 64
    dims budget either more bits per dim (int8/PQ) or a larger
    shortlist.

    Scale: the index is 16 bytes/vector — a billion vectors fit in
    16 GB of RAM, the reason this rung exists; threshold election is
    one map-side-combinable per-dim sum; the probe scan is
    xor+popcount arithmetic (SIMD in a real engine) over the packed
    words with per-partition top-C heaps; exact cosine touches only
    {_BINQ_C} rows/probe in the re-rank arm (the full-corpus exact
    arm is grading cost only).
    """
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    xs = emb.select(
        "vec_id",
        "embedding",
        F.expr(
            "transform(embedding,"
            " e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        ).alias("x"),
    ).localCheckpoint(eager=False)
    nv = xs.agg(F.count(F.lit(1)).cast("long").alias("nv"))
    su = (
        xs.select(F.posexplode("x").alias("j0", "v"))
        .groupBy("j0")
        .agg(F.sum("v").cast("long").alias("sj"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(j0, sj))), t -> t.sj)"
            ).alias("s")
        )
    )
    word = (
        "aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> acc +"
        " CASE WHEN element_at(x, i + {off}) * nv > element_at(s, i + {off})"
        " THEN shiftleft(CAST(1 AS BIGINT), i - 1) ELSE CAST(0 AS BIGINT) END)"
    )
    w = (
        xs.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(su))
        .select(
            "vec_id",
            "embedding",
            F.expr(word.format(off=0)).alias("w1"),
            F.expr(word.format(off=32)).alias("w2"),
        )
        .localCheckpoint(eager=False)
    )
    pb = w.filter(F.col("vec_id") < _BINQ_PROBES).select(
        F.col("vec_id").alias("pid"),
        F.col("embedding").alias("pv"),
        F.col("w1").alias("pw1"),
        F.col("w2").alias("pw2"),
    )
    hm = (
        w.join(F.broadcast(pb), F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "vec_id",
            F.expr("CAST(bit_count(pw1 ^ w1) + bit_count(pw2 ^ w2) AS BIGINT)").alias(
                "hamming"
            ),
        )
    )
    from pyspark.sql import Window as W

    wb = W.partitionBy("pid").orderBy(F.asc("hamming"), F.asc("vec_id"))
    sl = (
        hm.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= _BINQ_C)
        .localCheckpoint(eager=False)
    )
    bt = sl.filter(F.col("rn") <= _BINQ_K)
    from efficient_llm_data_wrangling_spark.operators.dedup import cosine_sim

    # re-rank arm: exact cosine over the binary shortlist only
    wr = W.partitionBy("pid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    rr = (
        sl.join(emb.select("vec_id", F.col("embedding").alias("cv")), "vec_id")
        .join(F.broadcast(pb.select("pid", "pv")), "pid")
        .select(
            "pid", "vec_id", "hamming",
            cosine_sim(F.col("cv"), F.col("pv")).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _BINQ_K)
        .localCheckpoint(eager=False)
    )
    we = W.partitionBy("pid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    ex = (
        emb.select("vec_id", F.col("embedding").alias("cv"))
        .join(F.broadcast(pb.select("pid", "pv")), F.col("vec_id") != F.col("pid"))
        .select("pid", "vec_id", cosine_sim(F.col("cv"), F.col("pv")).alias("cosine"))
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= _BINQ_K)
        .select("pid", "vec_id")
        .localCheckpoint(eager=False)
    )
    out: DataFrame | None = None
    for variant, arm, nrr in (
        (f"binary_top{_BINQ_K}", bt, 0),
        (f"shortlist{_BINQ_C}_rerank", rr, _BINQ_C),
    ):
        ov = (
            arm.join(ex, ["pid", "vec_id"])
            .groupBy("pid")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        row = (
            pb.select("pid")
            .join(
                arm.filter(F.col("rn") == 1).select("pid", "vec_id", "hamming"),
                "pid",
            )
            .join(F.broadcast(ov), "pid", "left")
            .select(
                "pid",
                F.lit(variant).alias("variant"),
                F.lit(_BINQ_K).cast("long").alias("k"),
                F.lit(16).cast("long").alias("bytes_per_vector"),
                F.lit(nrr).cast("long").alias("n_reranked"),
                F.col("vec_id").alias("best_neighbor_id"),
                F.col("hamming").alias("best_hamming"),
                F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_overlap"),
                F.expr(f"coalesce(n, 0) * 1000000L div {_BINQ_K}").alias(
                    "recall_ppm"
                ),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


_MM_SCENE_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, to_hex(encode(text)) AS h,
         (octet_length(encode(text)) // {MM.SCENE_FRAME}) AS nf
  FROM documents
  WHERE octet_length(encode(text)) >= {MM.SCENE_FRAME}
),
nib AS (
  SELECT doc_id, nf,
         CAST(t.i AS BIGINT) // {2 * MM.SCENE_FRAME} AS f,
         strpos('0123456789ABCDEF', substr(h, CAST(t.i + 1 AS BIGINT), 1)) - 1 AS bin
  FROM hx, unnest(range(0, nf * {2 * MM.SCENE_FRAME})) AS t(i)
),
hist AS (
  SELECT doc_id, nf, f, bin, CAST(count(*) AS BIGINT) AS c
  FROM nib GROUP BY 1, 2, 3, 4
),
dense AS (
  SELECT hx.doc_id, hx.nf, fr.f, b.bin, COALESCE(h.c, 0) AS c
  FROM hx
  CROSS JOIN unnest(range(0, 16)) AS b(bin)
  JOIN LATERAL (SELECT unnest(range(0, hx.nf)) AS f) fr ON true
  LEFT JOIN hist h
    ON h.doc_id = hx.doc_id AND h.f = fr.f AND h.bin = b.bin
),
delta AS (
  SELECT a.doc_id, a.nf, a.f,
         CAST(sum(abs(a.c - p.c)) AS BIGINT) AS d
  FROM dense a JOIN dense p
    ON a.doc_id = p.doc_id AND a.bin = p.bin AND p.f = a.f - 1
  WHERE a.f >= 1
  GROUP BY 1, 2, 3
),
cuts AS (
  SELECT doc_id, f FROM delta WHERE d >= {MM.SCENE_CUT_BAR}
),
edges AS (
  SELECT doc_id, f FROM cuts
  UNION ALL
  SELECT doc_id, 0 FROM hx
  UNION ALL
  SELECT doc_id, nf FROM hx
),
scenes AS (
  SELECT doc_id, f - lag(f) OVER (PARTITION BY doc_id ORDER BY f) AS slen
  FROM edges
),
longest AS (
  SELECT doc_id, CAST(max(slen) AS BIGINT) AS longest_scene_frames
  FROM scenes WHERE slen IS NOT NULL GROUP BY doc_id
),
agg AS (
  SELECT doc_id,
         CAST(max(d) AS BIGINT) AS max_delta,
         CAST(sum(d) AS BIGINT) AS sum_delta,
         CAST(sum(CASE WHEN d >= {MM.SCENE_CUT_BAR} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cuts
  FROM delta GROUP BY doc_id
)
SELECT hx.doc_id,
       CAST(hx.nf AS BIGINT) AS n_frames,
       CAST(greatest(hx.nf - 1, 0) AS BIGINT) AS n_boundaries,
       CAST(COALESCE(a.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(a.max_delta, 0) AS BIGINT) AS max_delta,
       CAST(COALESCE(a.sum_delta, 0) AS BIGINT) AS sum_delta,
       l.longest_scene_frames
FROM hx
LEFT JOIN agg a ON hx.doc_id = a.doc_id
JOIN longest l ON hx.doc_id = l.doc_id
"""


@query("multimodal_scene_cuts", oracle=_MM_SCENE_ORACLE, tags=("multimodal", "scale"))
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-CUT detection over the frame stream — the video-curation
    step the frame-sample rung points at (a training pipeline samples
    frames PER SCENE, not per fixed stride, so segmentation comes
    first): payload body as {MM.SCENE_FRAME}-byte frames, per-frame
    16-bin nibble histogram, a cut at every boundary whose L1 delta
    reaches {MM.SCENE_CUT_BAR}/64 (the bar sits at the ~p95 of real
    boundary deltas, so cuts mark genuine byte-content shifts), and
    the per-asset summary a curation pass consumes (cut count, delta
    extremes, longest scene). The featurize-diff-threshold-summarize
    chain runs as ONE numpy-over-Arrow ``mapInPandas`` pass — exactly
    where a real codec's decoded-frame features would ride; swapping
    the featurizer is the only deployment change, the stubbed-decode
    discipline of the whole multimodal family.

    Scale: one worker pass over the payload column, no shuffle at all
    (the summary is computed inside the pass, per asset); the oracle's
    relational replay (dense per-frame histograms + self-join deltas)
    is the grading path only. Frame features are 16 ints/frame — the
    100 TB payload column never leaves the scan in decoded form.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return MM.scene_cut_summary(MM.with_payload(docs))


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (SNM) — the OTHER blocking discipline,
# measured against the exact truth the LSH rung reproduces
# ---------------------------------------------------------------------------

_SNM_W = 5  # window size (candidate pairs per record per pass)
_SNM_KLEN = 24  # sort-key prefix length (characters)

_SNM_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
sets AS (
  SELECT doc_id, lang, text, {_shingles_sql()} AS sh FROM corpus
),
keyed AS (
  SELECT 'prefix' AS pass, substr(text, 1, {_SNM_KLEN}) AS k, doc_id, lang, sh
  FROM sets
  UNION ALL
  SELECT 'suffix', substr(reverse(text), 1, {_SNM_KLEN}), doc_id, lang, sh
  FROM sets
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY pass, k, doc_id) AS rn FROM keyed
),
prs AS (
  SELECT a.pass, least(a.doc_id, b.doc_id) AS l,
         greatest(a.doc_id, b.doc_id) AS r,
         CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS sl,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sh, b.sh))) AS j
  FROM ranked a JOIN ranked b
    ON b.pass = a.pass AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_W}
),
allp AS (
  SELECT pass, l, r, sl, j FROM prs
  UNION ALL
  SELECT 'union', l, r, sl, j FROM (SELECT DISTINCT l, r, sl, j FROM prs) u
),
tr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_truth FROM sets a
  JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
)
SELECT p.pass, CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN p.j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_verified_pairs,
       CAST(sum(CASE WHEN p.j >= 0.8 AND p.sl = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_truth_found,
       t.n_truth AS n_truth_pairs,
       CAST(sum(CASE WHEN p.j >= 0.8 AND p.sl = 1 THEN 1 ELSE 0 END)
            * 1000 AS BIGINT) // t.n_truth AS recall_permille
FROM allp p CROSS JOIN tr t
GROUP BY p.pass, t.n_truth
"""


@query("sorted_neighborhood_dedup", oracle=_SNM_ORACLE, tags=("dedup",))
def sorted_neighborhood_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood method (Hernandez/Stolfo, SIGMOD 1995) —
    the OTHER classic blocking discipline, measured on the same
    planted corpus and against the same exact-Jaccard(0.8) truth the
    MinHash-LSH rung reproduces deterministically: sort the corpus by
    a cheap key, compare each record only to its {5} successors, so
    candidates are O(n*w) (vs LSH's bucket joins) and the sort IS the
    shuffle. TWO KEY PASSES run through shared machinery — 'prefix'
    (first {24} chars: the planted mutants truncate the TAIL, so
    originals and mutants share the key and sort adjacent) and
    'suffix' (first {24} of the REVERSED text: blind to tail
    truncation by construction) — plus their union, the multi-pass
    posture production SNM actually runs.

    Measured (sf0.01 / sf0.1): the prefix pass finds EVERY truth
    pair (recall 1000 permille on 132 / 1,287 truth pairs) from only
    3,095 / 31,060 candidate pairs — vs the ~1.5M / 61M same-lang
    pairs the exact truth join enumerates; the suffix pass finds
    mostly the exact clones (recall 545 / 557 — tail truncation
    moves a mutant's reversed key arbitrarily far down the sort),
    and the union adds ZERO truth pairs over prefix alone — the
    measured multi-pass lesson: a second key pays only when it is
    orthogonal to the mutation locus, and the right FIRST key (the
    end the generator never edits) does all the work. The verified
    set also surfaces 30 / 269 CROSS-language J>=0.8 pairs the
    lang-blocked truth excludes (the blocking-key blind spot,
    visible in n_verified > n_truth_found). LSH needs no key
    knowledge — that is the trade: SNM is O(n*w) and key-smart,
    LSH is O(n*bands) and mutation-agnostic.

    Scale: the Spark side ranks with ``sampling.global_rank`` (range
    exchange + per-partition rank + driver offsets — NEVER a
    single-partition global window), then turns the w-neighborhood
    into {5} EQUI-joins on rank (rn + off = rn2, one shuffle on rn)
    — the range-join-as-explode trick, no inequality join, no
    cartesian. Verification is exact Jaccard on the O(n*w) candidate
    pairs only. The oracle pays one O(n^2)-within-lang truth join —
    the calibration cost, exactly what SNM exists to avoid.
    """
    tune(spark)
    from efficient_llm_data_wrangling_spark.operators import sampling as SAMP

    corpus = _corpus_with_dups(spark, sf_dir)
    sets = corpus.select(
        "doc_id",
        "lang",
        "text",
        D.shingles(F.split("text", " ")).alias("sh"),
    )
    keyed = sets.select(
        F.lit("prefix").alias("pass"),
        F.substring("text", 1, _SNM_KLEN).alias("k"),
        "doc_id",
        "lang",
        "sh",
    ).unionByName(
        sets.select(
            F.lit("suffix").alias("pass"),
            F.substring(F.reverse(F.col("text")), 1, _SNM_KLEN).alias("k"),
            "doc_id",
            "lang",
            "sh",
        )
    )
    ranked = SAMP.global_rank(keyed, ["pass", "k", "doc_id"], out_col="rn")
    offs = spark.range(1, _SNM_W + 1).select(F.col("id").alias("off"))
    a = ranked.select("pass", "rn", "doc_id", "lang", "sh")
    b = ranked.select(
        F.col("pass").alias("pass2"),
        F.col("rn").alias("rn2"),
        F.col("doc_id").alias("doc_id2"),
        F.col("lang").alias("lang2"),
        F.col("sh").alias("sh2"),
    )
    # the w-neighborhood as W equi-joins: rn + off = rnj, one shuffle
    prs = (
        a.join(F.broadcast(offs))
        .select("pass", "doc_id", "lang", "sh", (F.col("rn") + F.col("off")).alias("rnj"))
        .join(
            b.withColumnRenamed("rn2", "rnj").withColumnRenamed("pass2", "pass"),
            ["pass", "rnj"],
        )
        .select(
            "pass",
            F.least("doc_id", "doc_id2").alias("l"),
            F.greatest("doc_id", "doc_id2").alias("r"),
            F.when(F.col("lang") == F.col("lang2"), 1).otherwise(0).alias("sl"),
            (
                F.size(F.array_intersect("sh", "sh2")).cast("double")
                / F.size(F.array_union("sh", "sh2"))
            ).alias("j"),
        )
    )
    allp = prs.unionByName(
        prs.select("l", "r", "sl", "j").distinct().select(
            F.lit("union").alias("pass"), "l", "r", "sl", "j"
        )
    )
    truth = D.ngram_jaccard_pairs(corpus, block_col="lang", threshold=0.8)
    tr = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    found = F.sum(F.when((F.col("j") >= 0.8) & (F.col("sl") == 1), 1).otherwise(0))
    return (
        allp.crossJoin(F.broadcast(tr))
        .groupBy("pass", "n_truth")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            F.sum(F.when(F.col("j") >= 0.8, 1).otherwise(0))
            .cast("long")
            .alias("n_verified_pairs"),
            found.cast("long").alias("n_truth_found"),
        )
        .select(
            "pass",
            "n_candidate_pairs",
            "n_verified_pairs",
            "n_truth_found",
            F.col("n_truth").alias("n_truth_pairs"),
            F.expr("n_truth_found * 1000 div n_truth").alias("recall_permille"),
        )
    )
