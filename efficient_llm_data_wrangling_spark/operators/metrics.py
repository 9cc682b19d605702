"""Comparator + evaluation metrics (SURVEY.md §2.4 A1–A5, §2.7 F7–F9).

Faithful column-expression re-implementation of the reference's golden
comparator and confusion-matrix metrics (fast_ai_wrangler/utils/
utils.py:20-128), including its quirks — which downstream scoring
depends on:

* the numeric-extraction regex ``[-+]?([0-9]*\\.?[0-9]+|[0-9]+/[0-9]+)``
  captures only the group, so signs are DROPPED (utils.py:49-50);
* the fraction alternative is DEAD CODE: the first alternative always
  wins at any digit position, so ``"1/4"`` extracts ``[1.0, 4.0]``
  (verified against CPython ``re.findall``); the a/b evaluation branch
  (utils.py:54-56) is reproduced for structural parity but can never
  trigger, exactly as in the reference;
* tolerance compare zips element-wise and ignores surplus elements on
  the longer side (utils.py:32-34, Python ``zip`` truncation);
* ``prec = tp / max(1, tp+fp)`` and ``f1 = 2pr / max(1, p+r)`` use
  ``max(1, ·)`` guards (utils.py:124-127);
* list predictions are joined with spaces, ``None`` → ``""``
  (utils.py:89-94).

Everything is a JVM column expression (regexp_extract_all / transform /
zip_with / aggregate) — a single whole-stage-codegen'd pass followed by
one global aggregate; no Python UDFs, so this scores 100 TB of
predictions at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: utils.py:49 — group captures magnitude only (sign dropped, faithfully).
NUMBER_PATTERN = r"[-+]?([0-9]*\.?[0-9]+|[0-9]+\/[0-9]+)"

TOLERANCE = 0.021  # utils.py:20

#: CPython ``str.strip()`` whitespace set (chars where ``str.isspace()``
#: is True): ASCII \t\n\v\f\r + space, the C0 separators \x1c-\x1f,
#: \x85 (NEL), and the Unicode space separators. ``F.trim`` strips ONLY
#: ASCII space — a tab-padded answer would mis-score (r1 property-test
#: counterexample: pred='', gold='\t').
_PY_STRIP_CHARS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(map(chr, range(0x2000, 0x200B)))
    + "\u2028\u2029\u202f\u205f\u3000"
)


def py_strip(col: Column) -> Column:
    """Exact column-expression twin of CPython ``str.strip()``
    (utils.py:88,95) — strips the full Unicode whitespace set, unlike
    ``F.trim`` (ASCII space only). ``btrim`` over the explicit char set
    is a JVM-native set-membership trim — no regex engine in the hot
    scan; BMP-wide equivalence with ``str.strip()`` is property-tested
    in tests/test_properties.py."""
    return F.btrim(col, F.lit(_PY_STRIP_CHARS))


def normalize_answer(col: Column) -> Column:
    """utils.py:89-95 — None→'', strip, lower (array inputs: join first
    with :func:`flatten_answer`)."""
    return F.lower(py_strip(F.coalesce(col.cast("string"), F.lit(""))))


def flatten_answer(col: Column) -> Column:
    """utils.py:89-90 — list predictions joined with single spaces."""
    return F.array_join(col.cast("array<string>"), " ")


def extract_numbers(col: Column) -> Column:
    """F7 — all numeric magnitudes in a string as array<double>, with
    fractions evaluated (utils.py:38-61)."""
    tokens = F.regexp_extract_all(col, F.lit(NUMBER_PATTERN), 1)
    return F.transform(
        tokens,
        lambda x: F.when(
            x.contains("/"),
            F.element_at(F.split(x, "/"), 1).cast("double")
            / F.element_at(F.split(x, "/"), 2).cast("double"),
        ).otherwise(x.cast("double")),
    )


def numbers_within_tolerance(a: Column, b: Column, tolerance: float = TOLERANCE) -> Column:
    """F8 — element-wise |a-b| ≤ tolerance over two number arrays,
    truncating to the shorter (utils.py:20-35 via Python zip)."""
    n = F.least(F.size(a), F.size(b))
    pa, pb = F.slice(a, 1, n), F.slice(b, 1, n)
    return F.forall(F.zip_with(pa, pb, lambda x, y: F.abs(x - y) <= F.lit(tolerance)), lambda v: v)


def answers_match(pred: Column, gold: Column, tolerance: float = TOLERANCE) -> Column:
    """The full golden comparator (utils.py:97-107): case-insensitive
    trimmed equality, else numeric-tolerance fallback when BOTH sides
    contain numbers."""
    p, g = normalize_answer(pred), normalize_answer(gold)
    exact = p == g
    np_, ng = extract_numbers(p), extract_numbers(g)
    both = (F.size(np_) > 0) & (F.size(ng) > 0)
    return exact | (both & numbers_within_tolerance(np_, ng, tolerance))


def with_match(df: DataFrame, pred_col: str = "pred", gold_col: str = "label_str", out_col: str = "crc") -> DataFrame:
    return df.withColumn(out_col, answers_match(F.col(pred_col), F.col(gold_col)))


def confusion_metrics(
    df: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "label_str",
    group_by: list[str] | None = None,
) -> DataFrame:
    """A3 — one aggregate pass → tp/tn/fp/fn/crc/total + prec/rec/acc/f1
    with the reference's exact guard semantics (utils.py:83-128).

    ``group_by`` generalizes the reference (which only computes global
    metrics) to per-task/per-trial grouping; pass None for the faithful
    single-row global version. Map-side partial aggregation makes this a
    single shuffle of one row per group at any scale.
    """
    crc = answers_match(F.col(pred_col), F.col(gold_col))
    gold_norm = normalize_answer(F.col(gold_col))
    is_yes, is_no = gold_norm == "yes", gold_norm == "no"
    one = F.lit(1)
    agg = [
        F.sum(F.when(is_yes & crc, one).otherwise(0)).alias("tp"),
        F.sum(F.when(is_no & crc, one).otherwise(0)).alias("tn"),
        F.sum(F.when(is_no & ~crc, one).otherwise(0)).alias("fp"),
        F.sum(F.when(is_yes & ~crc, one).otherwise(0)).alias("fn"),
        F.sum(F.when(crc, one).otherwise(0)).alias("crc"),
        F.count(one).alias("total"),
    ]
    grouped = df.groupBy(*group_by) if group_by else df.groupBy()
    base = grouped.agg(*agg)
    prec = F.col("tp") / F.greatest(F.lit(1), F.col("tp") + F.col("fp"))
    rec = F.col("tp") / F.greatest(F.lit(1), F.col("tp") + F.col("fn"))
    base = base.withColumn("prec", prec).withColumn("rec", rec)
    f1 = (2 * F.col("prec") * F.col("rec")) / F.greatest(F.lit(1.0), F.col("prec") + F.col("rec"))
    return base.withColumn("acc", F.col("crc") / F.col("total")).withColumn("f1", f1)


def accuracy(df: DataFrame, pred_col: str = "pred", gold_col: str = "label_str") -> DataFrame:
    """A4 — fraction of rows matching under the golden comparator
    (fast_ai_wrangler/function_generator.py:8-34)."""
    crc = answers_match(F.col(pred_col), F.col(gold_col))
    return df.agg(F.avg(F.when(crc, 1.0).otherwise(0.0)).alias("acc"))


def label_counts(df: DataFrame, label_col: str = "label_str") -> DataFrame:
    """A1 — class counts (data_utils.py:339)."""
    return df.groupBy(label_col).count()


def min_class_count(df: DataFrame, label_col: str = "label_str") -> DataFrame:
    """A2 — size of the smallest class (data_utils.py:340)."""
    return label_counts(df, label_col).agg(F.min("count").alias("min_count"))


def trial_stats(df: DataFrame, value_col: str, group_by: list[str] | None = None) -> DataFrame:
    """A5 — mean/std across trials/tasks (run_wrangler.py:263-265 uses
    np.average/np.std, i.e. POPULATION std → ``stddev_pop``)."""
    grouped = df.groupBy(*group_by) if group_by else df.groupBy()
    return grouped.agg(
        F.avg(value_col).alias("mean"),
        F.stddev_pop(value_col).alias("std"),
    )
