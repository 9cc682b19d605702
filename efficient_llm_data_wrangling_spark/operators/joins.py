"""Temporal join operators the reference lacks (SURVEY.md §2.10 gap
list): as-of (nearest prior event) and bounded range joins.

Both avoid the O(n²) theta-join a naive formulation produces:

* **as-of** — union the two tagged streams and carry the most recent
  right-side values forward with ``last(..., ignorenulls=True)`` over a
  (key, time)-ordered window. ONE shuffle on the key, linear work — no
  join at all. This is the standard log-merge formulation every
  time-series engine uses.
* **range** — quantize time into buckets of the range width; a pair
  within ``(0, width]`` must land in the same or adjacent bucket, so an
  equi-join on (key, bucket ∈ {b, b+1}) + an exact residual filter
  replaces the inequality join. Shuffle is uniform in (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, the right row with the greatest ``ts`` ≤
    the left row's ``ts`` and the same ``key`` (ties at equal ts
    match). Left rows keep their full schema; matched right values
    arrive as ``{prefix}{ts}`` and ``{prefix}{col}`` (null if no prior
    right row exists).

    Right-side duplicates at identical (key, ts) resolve to the one the
    (ts, side, ...) sort places last — pass pre-deduplicated rights for
    strict determinism.
    """
    left_cols = left.columns
    # tagged union: right rows sort BEFORE left rows at equal ts so
    # an exactly-simultaneous right row is visible to the left row
    r_ts_type = dict(right.dtypes)[ts]
    l_tagged = left.select(
        *left_cols,
        F.lit(None).cast(r_ts_type).alias("__r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[
            F.col(key).alias(key) if c == key else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
        ],
        F.col(ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(0).alias("__side"),
    )
    # right rows carry their own ts in the ORDER column too
    r_tagged = r_tagged.withColumn(ts, F.col("__r_ts").cast(dict(left.dtypes)[ts]))
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        F.col("__side"),
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{prefix}{ts}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    width_seconds: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Pairs (l, r) with the same ``key`` and ``r.ts − l.ts`` in
    ``(0, width]`` seconds, via bucket-quantized equi-join.

    Output: (left_id, right_id, gap_seconds). The bucket explode is a
    2× row amplification on the left — constant — while the join stays
    an equi-join AQE can plan (broadcast/skew-split) like any other.
    """
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    bucket = F.floor(micros / (width_seconds * 1_000_000))
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(key).alias("__lk"),
        micros.alias("__lus"),
        F.explode(F.array(bucket, bucket + 1)).alias("__bucket"),
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(key).alias("__rk"),
        micros.alias("__rus"),
        bucket.alias("__bucket"),
    )
    # integer-micros gap, divided once — bit-identical across engines
    gap = (F.col("__rus") - F.col("__lus")).cast("double") / 1_000_000.0
    return (
        l.join(r, (F.col("__lk") == F.col("__rk")) & (l["__bucket"] == r["__bucket"]))
        .filter((gap > 0) & (gap <= width_seconds))
        .select(
            F.col("__lid").alias(left_id + "_l"),
            F.col("__rid").alias(right_id + "_r"),
            gap.alias("gap_seconds"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Skew-defeating equi-join: salt the big side with a deterministic
    per-row bucket (hash of the whole row) and replicate the small side
    across all buckets, so one hot key spreads over ``buckets`` tasks.

    This is the manual fallback for when AQE's skew-join splitting
    can't apply (e.g. the skewed side feeds an aggregation in the same
    stage) and the small side is too big to broadcast outright.
    Replication factor = ``buckets`` on the SMALL side only.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    bs = big.withColumn("__salt", salt)
    ss = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    return bs.join(ss, [key, "__salt"]).drop("__salt")
