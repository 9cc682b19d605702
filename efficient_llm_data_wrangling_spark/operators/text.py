"""Text-analysis operators for training-data pipelines (driver north
star; SURVEY.md §7 Phase 4): language ID, quality scoring, token
counting, document fingerprinting.

Everything is JVM expression-tree work (split/filter/aggregate/regex):
a single whole-stage-codegen'd projection per document, no Python, no
shuffle — these run at parquet-scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


def token_count(col: Column) -> Column:
    """Whitespace token count (empties dropped)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


#: A BPE-flavoured word/number/punctuation splitter: word runs, digit
#: runs, or single non-space symbols — the pre-tokenization regex shape
#: used by GPT-style BPE vocabularies.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (letters runs / digit runs /
    punctuation singletons)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

#: Tiny English stopword core — enough signal for ratio features.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features, the classic
    cheap quality filters (C4/Gopher-style) as pure expressions."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    n_chars = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    stop_hits = F.size(F.array_intersect(F.transform(toks, F.lower), F.array(*[F.lit(s) for s in STOPWORDS])))
    avg_word_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tok.cast("bigint"),
        "n_chars": n_chars.cast("bigint"),
        "punct_ratio": F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0),
        "stopword_hits": stop_hits.cast("bigint"),
        "avg_word_len": avg_word_len,
    }


def with_quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality_score"
) -> DataFrame:
    """Composite 0-1 quality score: token-count band + low punctuation
    + stopword presence, equally weighted. Deterministic and
    relational, so thresholds can push into the scan."""
    feats = quality_features(F.col(text_col))
    in_band = (feats["n_tokens"] >= 10) & (feats["n_tokens"] <= 1000)
    low_punct = feats["punct_ratio"] <= 0.2
    has_stop = feats["stopword_hits"] >= 1
    score = (
        in_band.cast("double") + low_punct.cast("double") + has_stop.cast("double")
    ) / F.lit(3.0)
    out = df
    for name, expr in feats.items():
        out = out.withColumn(name, expr)
    return out.withColumn(out_col, score)


# ---------------------------------------------------------------------------
# Language identification (lexicon-hit heuristic)
# ---------------------------------------------------------------------------

#: Minimal high-frequency function-word lexicons. Real systems use
#: character n-gram profiles; the operator shape (score-per-language →
#: argmax with deterministic tie-break) is identical.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def lang_scores(col: Column) -> dict[str, Column]:
    toks = F.transform(F.filter(F.split(col, r"\s+"), lambda t: t != ""), F.lower)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in lex])))
        for lang, lex in LANG_LEXICONS.items()
    }


def detect_language(col: Column, default: str = "und") -> Column:
    """Argmax language by lexicon hits; deterministic alphabetical
    tie-break; ``und`` when nothing matches."""
    scores = lang_scores(col)
    best_score: Column = F.lit(-1).cast("int")
    best_lang: Column = F.lit(default)
    for lang in sorted(scores):  # alphabetical ⇒ first max wins
        hit = scores[lang]
        better = hit > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, hit).otherwise(best_score)
    return F.when(best_score <= 0, F.lit(default)).otherwise(best_lang)


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling hash)
# ---------------------------------------------------------------------------

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
FINGERPRINT_BASE = 31


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over the document's characters:
    ``h = (h*31 + codepoint) mod (2^31-1)``.

    int64-safe (h < 2^31, h*31+cp < 2^36) and engine-portable: the
    same fold in any SQL dialect produces the same value, which makes
    it the cheap cross-system document identity for pipeline handoffs.
    """
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * FINGERPRINT_BASE + F.ascii(ch), F.lit(FINGERPRINT_MOD)),
    )


# ---------------------------------------------------------------------------
# TF-IDF (relational — explode/groupBy/broadcast-join, no ML black box)
# ---------------------------------------------------------------------------


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Smoothed TF-IDF per (document, term):
    ``tf · (ln((N+1)/(df+1)) + 1)`` (sklearn's smooth_idf formula).

    Fully relational: explode → two groupBys → broadcast joins of the
    (small) document-frequency and N relations back onto term
    frequencies. At 100 TB the only big shuffle is the (doc_id, term)
    aggregation, which is the irreducible one; df/N are vocabulary- and
    scalar-sized."""
    from efficient_llm_data_wrangling_spark.session import ensure_parallelism

    toks = ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
        ).alias("term"),
    )
    from efficient_llm_data_wrangling_spark.functions import portable_math as PM

    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_rel = docs.agg(F.count(F.lit(1)).alias("__n"))
    # smoothed idf ln((N+1)/(df+1)) = lnint(N+1) - lnint(df+1) via the
    # bit-portable integer-ln series (libm-independent at any scale)
    staged = tf.join(F.broadcast(df_rel), "term").crossJoin(F.broadcast(n_rel))
    staged = PM.stage_spark_lnint(staged, "__n + 1", "__lnn_")
    staged = PM.stage_spark_lnint(staged, "df + 1", "__lnd_")
    idf = F.expr(
        f"(({PM.lnint_sql('__lnn_')}) - ({PM.lnint_sql('__lnd_')})) + CAST(1 AS DOUBLE)"
    )
    return (
        staged
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
