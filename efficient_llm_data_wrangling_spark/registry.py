"""Query registry: every implemented operator exposes a named query
with an optional DuckDB oracle (the driver contract in
``__spark_entry__.py``).

Conventions that keep Spark↔DuckDB value-hashes identical:

* alias every computed column identically in both engines;
* never emit raw double aggregates — aggregate over ``decimal(18,2)``
  (exact, order-independent) and cast the final value to double with
  the same expression shape on both sides;
* derive doubles only through identical arithmetic on both sides;
* timestamps stay ``timestamp_ntz``/naive (the testdata parquet is
  NTZ, so no session-timezone skew);
* deterministic ORDER-insensitive output — no LIMIT without a total
  tiebreak ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a (spark, sf_dir) -> DataFrame builder under ``name``,
    with its DuckDB oracle SQL (None ⇒ rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (registration side effect)."""
    global _LOADED
    if _LOADED:
        return
    import efficient_llm_data_wrangling_spark.queries  # noqa: F401

    _LOADED = True
