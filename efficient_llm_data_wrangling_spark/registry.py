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


#: The driver grades the FIRST 50 queries in ``queries()`` order per
#: round (r1 graded registry slots 0-49 verbatim; r2 graded the pinned
#: window). This list pins the round-3 window: the 9 queries that have
#: never been inside any grading window first, then every query whose
#: last driver row pre-dates a fix (the comparator rewrite, the
#: array-output flattening) or whose oracle is new this round. Queries
#: not listed keep registry (import) order after these — refreshing the
#: longest-ungraded green rows with the remaining ~30 slots.
DRIVER_GRADE_PRIORITY: tuple[str, ...] = (
    # never graded in any round (r1 graded slots 0-49, r2 the pinned 50)
    "rollup_pricing",
    "cube_orders",
    "intersect_customers",
    "except_customers",
    "array_functions_lineitem",
    "sql_shipping_priority",
    "running_spend_per_customer",
    "from_json_events",
    "map_functions_orders",
    # driver rows pre-date the r2 comparator rewrite (py_strip) — re-grade
    "comparator_tolerance",
    "confusion_metrics",
    # array outputs flattened + oracles added this round (r2: driver crash)
    "approx_distinct_events",
    "multimodal_byte_histogram",
    # oracles added this round (r2: err:no_oracle)
    "approx_percentile_price",
    "dedup_simhash",
    "knn_hyperplane_lsh",
    # new in round 3 (curation + temporal families) — never graded
    "decontaminate_ngram_overlap",
    "bloom_dedup_documents",
    "dedup_cluster_canonical",
    "normalize_text_documents",
    "corpus_curation_pipeline",
    "top_bigrams_corpus",
    "mixture_sample_by_source",
    "quantize_embeddings_int8",
    "scd2_status_history",
    "interpolate_gaps_events",
    "mode_event_type_per_user",
    "weighted_sample_orders",
    "pagerank_trade_network",
    "regex_transform_dates",
    "winsorize_prices",
    "groupwise_trend_orders",
    "countmin_user_counts",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "markov_event_transitions",
    # new in round 3 (k-means + TPC-H tail families) — never graded
    "kmeans_lloyd_embeddings",
    "order_priority_late_exists",
    "priority_line_counts",
    "promo_revenue_ratio",
    "supplier_cnt_by_part_attrs",
    "disjunctive_part_revenue",
    "waiting_supplier_orders",
)


def _ordered_names() -> list[str]:
    missing = set(DRIVER_GRADE_PRIORITY) - set(REGISTRY)
    if missing:
        # a stale/typo'd name would otherwise silently shift which
        # queries fall inside the driver's 50-slot grading window
        raise AssertionError(f"DRIVER_GRADE_PRIORITY names not in REGISTRY: {sorted(missing)}")
    prioritized = list(DRIVER_GRADE_PRIORITY)
    rest = [n for n in REGISTRY if n not in DRIVER_GRADE_PRIORITY]
    return prioritized + rest


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: REGISTRY[name].builder for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (registration side effect)."""
    global _LOADED
    if _LOADED:
        return
    import efficient_llm_data_wrangling_spark.queries  # noqa: F401

    _LOADED = True
