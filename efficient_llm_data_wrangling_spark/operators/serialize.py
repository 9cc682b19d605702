"""Row→string serialization (SURVEY.md §2.2 P2/P3/P4).

The reference flattens whole structured rows into delimited strings
before any operator sees them (fast_ai_wrangler/utils/data_utils.py:
63-79 ``serialize_row``, :82-95 ``serialize_row_simple``, :98-101
``serialize_row_for_merge``). Here each variant is a pure Column
expression — JVM-side, whole-stage-codegen'd, no Python in the hot
path — usable on a 100 TB scan without a UDF.

Null semantics match the reference: NULL/NaN → ``nan_tok`` (default
``'nan'``), values trimmed, keyed style renders ``"col: value"`` pairs.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _clean(col: Column, nan_tok: str) -> Column:
    """cast→trim→nan_tok, the per-cell normalization of serialize_row
    (data_utils.py:72-75)."""
    return F.coalesce(F.trim(col.cast("string")), F.lit(nan_tok))


def serialize_keyed(
    cols: Sequence[tuple[str, Column]] | Sequence[str],
    sep_tok: str = "^",
    nan_tok: str = "nan",
) -> Column:
    """P2 — ``"name: value ^ name: value"`` (data_utils.py:63-79).

    ``cols`` is either column names or (display_name, Column) pairs
    (the pair form supports the suffix-stripped merge style P4).
    """
    parts = []
    for c in cols:
        name, col = (c, F.col(c)) if isinstance(c, str) else c
        parts.append(F.concat_ws(": ", F.lit(name), _clean(col, nan_tok)))
    return F.concat_ws(f" {sep_tok} ", *parts)


def serialize_values(
    cols: Sequence[str] | Sequence[Column],
    sep_tok: str = "^",
    nan_tok: str = "nan",
) -> Column:
    """P3 — values-only join on ``sep_tok`` (data_utils.py:82-95)."""
    cleaned = [_clean(F.col(c) if isinstance(c, str) else c, nan_tok) for c in cols]
    return F.concat_ws(sep_tok, *cleaned)


def select_suffixed(df: DataFrame, suffix: str) -> DataFrame:
    """P4 — keep columns ending in ``_<suffix>``, strip the suffix
    (data_utils.py:98-101 ``serialize_row_for_merge``)."""
    tail = f"_{suffix}"
    keep = [c for c in df.columns if c.endswith(tail)]
    return df.select([F.col(c).alias(c[: -len(tail)]) for c in keep])


def with_text_column(
    df: DataFrame,
    cols: Iterable[str] | None = None,
    style: str = "keyed",
    sep_tok: str = "^",
    nan_tok: str = "nan",
    out_col: str = "text",
) -> DataFrame:
    """Attach the canonical ``text`` column (FIXTURES.md §5) without
    touching the rest of the row."""
    use = list(cols) if cols is not None else list(df.columns)
    ser = serialize_keyed(use, sep_tok, nan_tok) if style == "keyed" else serialize_values(use, sep_tok, nan_tok)
    return df.withColumn(out_col, ser)
