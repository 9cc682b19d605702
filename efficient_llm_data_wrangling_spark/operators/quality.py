"""Data-quality operators: declarative expectation checking and
single-pass column profiling — the validation layer a training-data
pipeline runs before (and after) every transformation batch.

Both operators are pure aggregate expressions: one scan, map-side
partials, a few-row result — cost is one pass over the data at any
scale, never a per-rule pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_counts(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate named boolean expectations in ONE aggregation pass:
    returns (rule, n_rows, n_violations, pass_rate).

    Each rule is a Column predicate that should hold for every row.
    All rules fold into a single ``agg`` — adding a rule adds a
    conditional-sum expression, not a job. NULL predicate results
    count as violations (unknown ≠ pass).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)).alias(name)
        )
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(name).cast("long").alias("n_violations"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule",
        "r.n_rows",
        "r.n_violations",
        (1.0 - F.col("r.n_violations").cast("double") / F.col("r.n_rows")).alias(
            "pass_rate"
        ),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass profile of the named columns: count, nulls,
    approximate distincts, min/max (as strings, type-erased).

    Exact ``countDistinct`` over several columns at once forces either
    multiple aggregations or an expand; ``approx_count_distinct``
    (HyperLogLog++, 2% default error) keeps the profile one pass with
    fixed memory — the right trade at corpus scale.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.approx_count_distinct(c).alias(f"__adist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__null_{c}").cast("long").alias("n_nulls"),
                        F.col(f"__adist_{c}").cast("long").alias("approx_distinct"),
                        F.col(f"__min_{c}").alias("min_str"),
                        F.col(f"__max_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")


def observed(df: DataFrame, name: str, metrics: dict[str, Column]):
    """Attach zero-cost pipeline metrics to a DataFrame via
    ``df.observe``: the metrics are computed BY the action that
    consumes the frame (write/collect), not by a second scan — at
    100 TB an extra validation pass is a second 100 TB read; observe
    is free.

    Returns ``(df, observation)``; read ``observation.get`` after the
    consuming action finishes.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[expr.alias(alias) for alias, expr in metrics.items()])
    return out, obs
