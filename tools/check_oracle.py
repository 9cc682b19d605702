#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns). Exact equality required — floats too, since the
registry conventions guarantee identical arithmetic on both sides.

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from efficient_llm_data_wrangling_spark.sources.catalog import TABLES


def _kind(s: pd.Series) -> str:
    """Coarse type kind — int vs float drift between the Spark result
    and the oracle result is a DRIVER HASH FAILURE even when values
    compare equal (0 == 0.0): r1's dq_expectations/profile hash-reds
    were DuckDB HUGEINT union branches widening counts to float64."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: None if v is None else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_cell(v) -> str:
    """Driver-like canonical repr of one cell: preserves the int/float
    distinction (repr(0) != repr(0.0)) and object identity of strings."""
    if v is None:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool,)):
        return repr(bool(v))
    if isinstance(v, float):
        return repr(float(v))
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
        return _canon_cell(v.item())
    return repr(v)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash mimicking the driver: columns
    sorted by name, rows sorted, every cell repr'd type-sensitively."""
    import hashlib

    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    for c in sc:
        ks, ko = _kind(spark_df[c]), _kind(oracle_df[c])
        if ks != ko:
            # pandas transport artifact, not a real type split: a nullable
            # int column widens to float64 on whichever side carried the
            # NULLs — downgrade to a warning when the float side is
            # all-integral, the driver's own canonicalizer unifies these
            kinds = {ks, ko}
            floaty = spark_df[c] if ks == "float" else oracle_df[c]
            has_nulls = spark_df[c].isna().any() or oracle_df[c].isna().any()
            if (
                kinds == {"int", "float"}
                and has_nulls
                and floaty.dropna().map(lambda v: float(v).is_integer()).all()
            ):
                print(
                    f"  warn: column {c!r} int/float kind split is nullable-int "
                    f"widening (all float values integral) — ignoring"
                )
            else:
                problems.append(
                    f"column {c!r}: dtype kind spark={ks} oracle={ko} "
                    f"(driver hash would fail even if values compare equal)"
                )
    a, b = _normalize(spark_df), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)]
        if bad:
            i = bad[0]
            problems.append(
                f"column {c!r}: {len(bad)} mismatched values; first at sorted-row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}"
            )
    if not problems and value_hash(spark_df) != value_hash(oracle_df):
        problems.append("value_hash mismatch (type-sensitive repr hash) despite equal compare")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    _ensure_loaded()
    names = args.queries or sorted(REGISTRY)

    from efficient_llm_data_wrangling_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, args.sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
