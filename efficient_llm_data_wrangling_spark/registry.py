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
#: round (r1 graded registry slots 0-49 verbatim). This list pins the
#: round-2 window: the two r1 hash-fix queries first, then every family
#: that has never had a driver-green row (scale / streaming / subqueries
#: / trainprep / wrangler + the relational tail's north-star operators).
#: Queries not listed keep registry (import) order after these.
DRIVER_GRADE_PRIORITY: tuple[str, ...] = (
    # r1 hash-red, fixed this round — must re-grade
    "dq_expectations_orders",
    "profile_orders",
    # r1 err:no_oracle, oracle added this round — must re-grade
    "approx_percentile_price",
    # dedup / text / knn / multimodal / trainprep north-star families
    "dedup_exact_documents",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_token_counts",
    "text_quality_documents",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf",
    "knn_brute_force",
    "knn_ivf",
    "knn_hyperplane_lsh",
    "multimodal_decode",
    "multimodal_resize_meta",
    "multimodal_frame_sample",
    "multimodal_byte_histogram",
    "centroid_embeddings_by_label",
    "chunk_documents_overlap",
    "pack_documents_token_budget",
    "split_assign_documents",
    # wrangler task queries (the reference's own workload)
    "apply_transformation_dates",
    "entity_match_jaccard",
    "detect_error_suppliers",
    "impute_priority_word",
    "wrangler_e2e_transformation",
    # subquery / decorrelation family
    "scalar_subquery_acctbal",
    "having_large_orders",
    "argmin_part_per_type",
    "correlated_avg_qty_filter",
    "nested_agg_nations_above_avg",
    # structured streaming
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_dedup_watermark",
    "stream_stateful_user_totals",
    "stream_static_enrich",
    "stream_stream_attribution",
    "stream_upsert_sink_totals",
    # relational tail: SURVEY §2 rows still local-only + custom joins
    "stratified_sample_orders",
    "class_balance_orders",
    "split_rest_customers",
    "asof_join_events",
    "range_join_events",
    "approx_distinct_events",
    "salted_join_orders",
    "levenshtein_match_parts",
)


def _ordered_names() -> list[str]:
    prioritized = [n for n in DRIVER_GRADE_PRIORITY if n in REGISTRY]
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
