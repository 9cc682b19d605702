"""Sampling, shuffling and class balancing (SURVEY.md §2.4 A6/A7,
§2.5 O4/O5, §2.2 P11).

The reference relies on pandas' seeded samplers
(fast_ai_wrangler/utils/data_utils.py:20-61 sampling helpers, :337-346
class balancing, :349-357 seeded shuffle, :216-217 head-k splits).
pandas seeds don't transfer to a distributed engine, so each operator
ships in two flavors:

* ``*_seeded`` — distributed-deterministic via ``rand(seed)`` /
  window-rank: same seed + same data ⇒ same result on any cluster
  layout (rand(seed) is keyed per-row after a repartition-free scan).
* ``*_by_key`` — fully engine-independent determinism (order by an
  explicit key), used by the DuckDB oracle checks where Spark's PRNG
  can't be reproduced.

Scale note: exact-k via global sort-limit is fine (k is tiny — demos
k=3, supervision d=100); the per-class window rank shuffles once on the
label column, which has few distinct values — we salt-free because the
downstream ``row_number() <= n`` cut prunes long groups early under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle_seeded(df: DataFrame, seed: int = 42) -> DataFrame:
    """O4 — deterministic random re-order (data_utils.py:349-357
    ``sample(frac=1, random_state=seed)``)."""
    return df.orderBy(F.rand(seed), *df.columns)


def sample_k_seeded(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """O5 — exact-k pseudo-random sample (data_utils.py:20-27,56-58).

    ``orderBy(rand(seed)).limit(k)`` gives exact k (unlike
    ``df.sample`` which is Bernoulli); the sort is a cluster-wide
    top-k (TakeOrdered), not a full sort, so it is cheap even on huge
    inputs.
    """
    return df.orderBy(F.rand(seed), *df.columns).limit(k)


def sample_k_by_key(df: DataFrame, k: int, key: str) -> DataFrame:
    """Deterministic head-k by key order — the oracle-checkable variant
    of O5 and of the reference's positional ``iloc[:k]`` split
    (data_utils.py:216-217)."""
    return df.orderBy(key).limit(k)


def split_head_rest(df: DataFrame, k: int, key: str) -> tuple[DataFrame, DataFrame]:
    """P11 — train = first k by key, test = rest (data_utils.py:216-217,
    with an explicit key instead of list position, SURVEY §7 risk 5).
    Ranks via the scalable :func:`global_rank`, not a partitionless
    window."""
    ranked = global_rank(df, [key], out_col="__rn")
    train = ranked.filter(F.col("__rn") <= k).drop("__rn")
    test = ranked.filter(F.col("__rn") > k).drop("__rn")
    return train, test


def stratified_sample_seeded(
    df: DataFrame, label_col: str, per_label: int, seed: int = 42
) -> DataFrame:
    """A6 — up to ``per_label`` rows per class, seeded
    (data_utils.py:49-53 per-group ``sample``). Window-rank over
    ``rand(seed)`` within each label partition."""
    w = Window.partitionBy(label_col).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_label)
        .drop("__rn")
    )


def stratified_sample_by_key(df: DataFrame, label_col: str, per_label: int, key: str) -> DataFrame:
    """A6 (oracle-checkable) — first ``per_label`` rows per class in key
    order; engine-independent."""
    w = Window.partitionBy(label_col).orderBy(key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_label)
        .drop("__rn")
    )


def class_balance_seeded(df: DataFrame, label_col: str, seed: int = 42) -> DataFrame:
    """A7 — downsample every class to the smallest class's size
    (data_utils.py:337-346). One pass: rank within class by rand(seed),
    broadcast-join the min class count, keep rank ≤ min."""
    counts = df.groupBy(label_col).count()
    min_count = counts.agg(F.min("count").alias("__min"))
    w = Window.partitionBy(label_col).orderBy(F.rand(seed))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(min_count))
        .filter(F.col("__rn") <= F.col("__min"))
        .drop("__rn", "__min")
    )


def class_balance_by_key(df: DataFrame, label_col: str, key: str) -> DataFrame:
    """A7 (oracle-checkable) — same cut, key order instead of PRNG."""
    counts = df.groupBy(label_col).count()
    min_count = counts.agg(F.min("count").alias("__min"))
    w = Window.partitionBy(label_col).orderBy(key)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(min_count))
        .filter(F.col("__rn") <= F.col("__min"))
        .drop("__rn", "__min")
    )


def top_up_concat(base: DataFrame, extra: DataFrame, target: int, key: str) -> DataFrame:
    """U1 — union-all top-up to reach ``target`` rows
    (data_utils.py:56-59 ``pd.concat``): take ``target - count(base)``
    rows from ``extra`` in key order and append."""
    need = target - base.count()
    if need <= 0:
        return base
    return base.unionByName(extra.orderBy(key).limit(need))


def global_rank(df: DataFrame, keys: list[str], out_col: str = "rn") -> DataFrame:
    """Dense global row_number over a total key order WITHOUT the
    single-partition window (`Window.orderBy(...)` with no partition
    moves the entire input to one task — the classic 100 TB killer).

    Scalable two-pass formulation:
    1. ``repartitionByRange(keys)`` — range exchange gives globally
       ordered partitions;
    2. rank within each partition (window PARTITIONED by
       ``spark_partition_id`` — parallel);
    3. add the cumulative row count of all earlier partitions —
       per-partition counts are PARTITION METADATA (#partitions rows,
       like AQE statistics), so they collect to the driver and return
       as a broadcast lookup; no global window anywhere.

    Result is identical to the global window for a total (tie-free)
    key order.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    ranged = df.repartitionByRange(*[F.col(k) for k in keys]).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = W.partitionBy("__pid").orderBy(*keys)
    # MATERIALIZE the ranked frame before reading it twice: the counts
    # collect below and the final join are SEPARATE jobs, and each
    # re-executes the range exchange independently — AQE re-plans the
    # shuffle per job, so the partition layout (and with it __pid and
    # __local_rn) can differ between the offsets pass and the output
    # pass, producing silently colliding/skipping global ranks (r12:
    # sorted_neighborhood_dedup at sf0.1 lost its whole suffix pass to
    # exactly this — offsets from one layout applied to another). The
    # checkpoint pins one physical layout that both passes read.
    local = ranged.withColumn(
        "__local_rn", F.row_number().over(local_w)
    ).localCheckpoint(eager=False)
    counts = sorted(
        (r["__pid"], r["__n"])
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    offsets, running = [], 0
    for pid, n in counts:
        offsets.append((pid, running))
        running += n
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __offset long")
    return (
        local.join(F.broadcast(offsets_df), "__pid")
        .withColumn(out_col, (F.col("__local_rn") + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__local_rn", "__offset")
    )
