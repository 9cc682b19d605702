"""Structured Streaming operators over the ``events`` file stream.

The reference has no streaming surface at all (SURVEY.md §2.10); these
are the beyond-reference operators the north star asks for, built
entirely on Structured Streaming primitives:

* :func:`stream_events` — the ``events`` parquet re-read as a file
  stream (the same source a Kafka topic would feed at scale).
* :func:`tumbling_counts` / :func:`sliding_value_avg` — watermarked
  windowed aggregations (append mode: only watermark-finalized windows
  are emitted, which is what makes the output deterministic and
  oracle-checkable).
* :func:`session_windows_per_user` — ``session_window`` gap-merged
  sessions, the canonical stateful windowing operator.
* :func:`dedup_within_watermark` — ``dropDuplicatesWithinWatermark``
  with state bounded by the watermark delay (infinite-state-safe at
  100 TB/day ingest, unlike plain ``dropDuplicates``).
* :func:`stateful_user_totals` — a custom stateful operator via
  ``applyInPandasWithState`` (running per-user totals), the pattern for
  any operator Structured Streaming lacks natively.

Execution harness: :func:`run_to_memory` drives a query with
``trigger(availableNow=True)`` into a memory sink and returns the
result as a batch DataFrame, so streaming operators satisfy the same
``queries()``/oracle contract as batch ones. A no-data final
micro-batch (Spark default) advances the watermark to
``max(event time) - delay`` and flushes finalized windows.

Scale posture: every operator keys state by (window, group) or
(dedup key) — state size is bounded by watermark horizon × key
cardinality, never by stream length. Shuffles are the normal
streaming-agg exchanges; nothing collects to the driver.

State-store provider: the default HDFS-backed (in-heap) provider is
deliberately kept. Measured head-to-head at sf0.1 / local[32]
(3-run medians, fresh JVM each): RocksDB made the two stateful
headliners SLOWER — ``stream_tumbling_counts`` 1.45 s → 1.62 s,
``stream_stream_attribution`` 2.93 s → 3.59 s — because at
kilobyte-scale state its per-commit SST/WAL overhead dominates and
there is no heap pressure to relieve. RocksDB is the right provider
only once state approaches executor heap (production posture:
watermark-horizon × key-cardinality ≫ heap, where in-heap stores
OOM or GC-thrash); flip it then via
``spark.sql.streaming.stateStore.providerClass`` — results are
provider-independent, so the swap is config-only.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from efficient_llm_data_wrangling_spark.session import tune

def _stream_dir(sf_dir: str, table: str = "events") -> str:
    """File-stream sources monitor a DIRECTORY; the test data ships
    each table as a single parquet file. Mirror it (symlink) into a
    per-sf temp directory — the exact shape a production drop-folder /
    object-store prefix source has, with zero data copying."""
    src = Path(sf_dir.rstrip("/")) / f"{table}.parquet"
    mirror = Path(tempfile.gettempdir()) / "elldw_stream" / src.parent.name / table
    mirror.mkdir(parents=True, exist_ok=True)
    link = mirror / f"{table}.parquet"
    if not link.exists():
        try:
            link.symlink_to(src)
        except FileExistsError:
            pass
    return str(mirror)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file stream — the arriving-batch side
    of ingest-time operators (dedup probe, quality gating). No event
    time exists on documents, so downstream ops must be stateless or
    carry their own keys; schema comes from the parquet footer like
    :func:`stream_events`."""
    tune(spark)
    path = _stream_dir(sf_dir, table="documents")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table as a file stream — the arriving-vector
    side of ingest-time semantic operators (the semantic dedup gate).
    Schema from the parquet footer like :func:`stream_documents`;
    no event time, so consumers must be stateless."""
    tune(spark)
    path = _stream_dir(sf_dir, table="embeddings")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream with ``ts`` normalized to a
    watermark-capable ``timestamp``, matching the batch loader's values.

    File streams need an explicit schema; it is taken from the parquet
    footer via a (lazy, footer-only) batch read so both testdata
    vintages work: ``ts`` as raw int64 nanos (old driver output under
    ``spark.sql.legacy.parquet.nanosAsLong``) or as TIMESTAMP(MICROS)
    / timestamp_ntz (current driver output). Watermarks require
    TimestampType (not NTZ); the session timezone is pinned UTC
    (session.RUNTIME_CONFS) so the cast preserves wall-clock values —
    query outputs cast back to NTZ for oracle parity.
    """
    tune(spark)
    path = _stream_dir(sf_dir)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    ts_type = schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        # integer `div`, not `/`: double division loses precision at
        # 1e18-scale nanos and shifts the microsecond value by ±1
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts").cast("timestamp")
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _fast_checkpoint_dir() -> str | None:
    """Checkpoint on tmpfs when available: micro-batch latency is
    dominated by state-store delta/commit fsyncs (4 state stores ×
    partitions × batches for a stream-stream join), which are pure
    overhead for an ephemeral availableNow run. Production jobs put
    checkpoints on durable storage for exactly-once RECOVERY; a
    drain-and-discard run has nothing to recover, so memory-speed
    checkpoints are semantics-free. Returns None when no tmpfs exists
    (Spark then uses its normal temp checkpoint)."""
    import os
    import uuid

    shm = Path("/dev/shm")
    if shm.is_dir() and os.access(shm, os.W_OK):
        d = shm / "elldw_ckpt" / uuid.uuid4().hex
        d.mkdir(parents=True, exist_ok=True)
        return str(d)
    return None


def _stream_partitions() -> str | None:
    """Shuffle-partition count for STREAMING queries only. Stateful
    operators instantiate state stores per (operator, partition) and
    pay a delta+commit per store per micro-batch — a stream-stream
    join runs 4 stores/partition, so at the batch-tuned 32 partitions
    an availableNow drain commits 128 stores per batch while holding
    only a few MB of state. State should be partitioned for state
    VOLUME (production: watermark-horizon × arrival-rate / executor
    memory), not for batch scan width. Env override
    ``SPARK_GRAFT_STREAM_PARTITIONS`` wins; default 8 locally."""
    import os

    v = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    try:
        return str(max(1, int(v)))
    except ValueError:
        return None


#: the most recently terminated run_to_memory query (see the
#: diagnostics hook in its body); None until the first stream runs
LAST_QUERY = None


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming frame to completion into a memory sink and
    return the sink table. ``availableNow`` processes the whole backlog
    then stops — the batch-equivalent execution of a streaming plan.

    Shuffle partitions are narrowed for the stream's lifetime (state
    stores scale with partitions; see :func:`_stream_partitions`) and
    restored after — partitioning never changes results, only the
    per-micro-batch state-store commit fan-out."""
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    nparts = _stream_partitions()
    if nparts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", nparts)
    try:
        writer = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        ckpt = _fast_checkpoint_dir()
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        query = writer.start()
        query.awaitTermination()
        # diagnostics hook: the terminated query's last micro-batch
        # IncrementalExecution stays reachable here so tests can
        # assert on the EXECUTED streaming plan (join strategies,
        # state operators) — run_to_memory's return frame only sees
        # the memory sink, never the streaming plan that filled it
        global LAST_QUERY
        LAST_QUERY = query
    finally:
        if nparts is not None and prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    if ckpt is not None:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Watermarked window aggregations
# ---------------------------------------------------------------------------


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + integer value totals per event_type.

    Append mode emits a window only once the watermark passes its end —
    late data inside the watermark still lands in its window; anything
    later is dropped. ``value`` totals are aggregated as integer cents
    so results are bit-deterministic under any partitioning.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_value_avg(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window average value (as exact cents-sum + count; the
    average is derived in double from the two exact integers, so both
    engines compute the same division)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            (F.col("value_cents").cast("double") / F.col("n_events") / 100.0).alias("avg_value"),
        )
    )


def session_windows_per_user(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization per user: events within ``gap`` of each
    other merge into one session; a session is emitted once the
    watermark passes its close. The canonical stateful-merge windowing
    operator (no batch-SQL primitive does this merge — the oracle
    restates it with lag()-based island detection)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Streaming dedup
# ---------------------------------------------------------------------------


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """First-seen (user_id, event_type) pairs with dedup state expired
    by the watermark — the streaming twin of batch exact dedup. Only
    the key columns are projected out: which concrete row survives a
    within-batch tie is execution-order-dependent, the key set is not.
    """
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    return deduped.select("user_id", "event_type")


def ingest_dedup_probe(stream_docs: DataFrame, standing_hashes: DataFrame) -> DataFrame:
    """Ingest-time dedup probe: every arriving document is checked
    against the STANDING corpus's hash index (a static frame of
    distinct text hashes, column ``h``) — the streaming half of
    ``incremental_dedup_batch``. Stateless stream-static left join:
    no watermark, no state store; the verdict rides along per row as
    the admission manifest.

    Scale: the standing index is the persisted dedup artifact (16
    bytes/doc), broadcast when it fits, shuffled-join otherwise; a
    Bloom prefilter (operators/dedup.py's portable Bloom) in front
    drops the obvious-new majority before the join at full corpus
    size. Raw text never leaves the scan — only (doc_id, h) flows."""
    keyed = stream_docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    probed = keyed.join(
        F.broadcast(standing_hashes.withColumn("__seen", F.lit(1))), "h", "left"
    )
    return probed.select("doc_id", F.col("__seen").isNull().alias("is_new_vs_corpus"))


def admission_verdicts(stream_docs: DataFrame, standing_hashes: DataFrame) -> DataFrame:
    """The full streaming admission pipeline, fused: every arriving
    document carries (a) its dedup verdict against the standing
    corpus's hash index (:func:`ingest_dedup_probe` semantics) and (b)
    its Gopher rule metrics (``gopher_metric_cols`` — the same column
    definitions the batch filter uses), with ``admitted`` = new AND
    passing. Stateless: the whole verdict is scan-side column
    expressions plus one stream-static broadcast join, so it runs
    inline on the firehose with zero state stores.

    Scale: identical posture to the two halves it composes — the
    standing index broadcasts while it fits (16 bytes/doc) and
    degrades to a shuffled stream-static join beyond; the Gopher
    metrics are codegen'd per-row expressions.
    """
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        _toks_col,
        gopher_metric_cols,
    )

    keyed = stream_docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        _toks_col().alias("toks"),
    )
    probed = keyed.join(
        F.broadcast(standing_hashes.withColumn("__seen", F.lit(1))), "h", "left"
    )
    g = gopher_metric_cols()
    return probed.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["mean_len_milli"].alias("mean_len_milli"),
        g["stopword_hits"].alias("stopword_hits"),
        g["alpha_pct"].alias("alpha_pct"),
        (F.col("__seen").isNull() & g["passes"]).alias("admitted"),
    )


def admission_manifest_to_parquet(
    stream_docs: DataFrame, standing_hashes: DataFrame, base_dir: str
) -> str:
    """Drive :func:`admission_verdicts` end-to-end into the versioned
    parquet sink (the :func:`upsert_totals_to_parquet` discipline):
    each micro-batch's ADMITTED rows merge doc_id-idempotently into
    the snapshot, every batch writes a new immutable ``v{batch_id}``
    directory, and the latest complete version is the manifest a
    downstream training-data builder reads. Retried batches re-insert
    the same doc_ids and dedupe away — exactly-once at the sink
    without sink-side transactions.
    """
    from pathlib import Path

    verdicts = admission_verdicts(stream_docs, standing_hashes)
    spark = stream_docs.sparkSession
    root = Path(base_dir)

    def _latest() -> str | None:
        versions = sorted(
            (d for d in root.glob("v*") if (d / "_SUCCESS").exists()),
            key=lambda d: int(d.name[1:]),
        )
        return str(versions[-1]) if versions else None

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        admitted = batch_df.filter(F.col("admitted")).drop("admitted")
        prev = _latest()
        if prev is not None:
            admitted = spark.read.parquet(prev).unionByName(admitted)
        admitted.dropDuplicates(["doc_id"]).write.mode("overwrite").parquet(
            str(root / f"v{batch_id}")
        )

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    nparts = _stream_partitions()
    if nparts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", nparts)
    try:
        writer = (
            verdicts.writeStream.outputMode("append")
            .foreachBatch(merge)
            .trigger(availableNow=True)
        )
        ckpt = _fast_checkpoint_dir()
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        writer.start().awaitTermination()
    finally:
        if nparts is not None and prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if ckpt is not None:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    latest = _latest()
    assert latest is not None, "admission stream produced no snapshot version"
    return latest


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_TOTALS_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)
_TOTALS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running (count, integer-cents total) per user, updated per
    micro-batch. State is two longs per user — O(users), not O(events).
    """
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value_cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def stateful_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Arbitrary stateful processing via ``applyInPandasWithState``:
    per-user running totals emitted every micro-batch (update mode).

    This is the extension point for operators Structured Streaming
    lacks natively — the Python state function sees Arrow batches per
    key and a typed ``GroupState``. Summing integer cents (not floats)
    keeps emitted values independent of batch/partition order.
    """
    prepped = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_TOTALS_OUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def static_enrich_window_totals(
    events: DataFrame,
    dim: DataFrame,
    dim_key: str,
    dim_name: str,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join + windowed aggregate: each event is enriched
    with a dimension attribute (join key derived as ``user_id % |dim|``
    on the synthetic data), then counted per (window, attribute).

    The static side is broadcast — Structured Streaming re-plans the
    join per micro-batch, so the stream side NEVER shuffles for the
    join; the only stateful exchange is the windowed aggregation.
    This is the standard enrichment topology: a 100 TB/day stream
    joined to a catalog-sized dimension costs one map-side hash probe
    per event.
    """
    n_keys = dim.count()  # driver-side scalar; dimension is tiny by contract
    enriched = events.withColumn(
        "__k", (F.col("user_id") % F.lit(n_keys)).cast("long")
    ).join(F.broadcast(dim), F.col("__k") == F.col(dim_key))
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col(dim_name))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(dim_name),
            "n_events",
            "value_cents",
        )
    )


# ---------------------------------------------------------------------------
# Stream-stream join
# ---------------------------------------------------------------------------


def clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to
    the same-user clicks in the preceding ``horizon`` — the canonical
    attribution topology (ad-click → conversion), and the one join
    only Structured Streaming can run over two unbounded inputs.

    Semantics: equi-key on user_id plus the event-time range
    ``click_ts ≤ purchase_ts ≤ click_ts + horizon``. Watermarks on
    BOTH sides + the range condition bound the join state: a buffered
    click can be evicted once the purchase-side watermark passes
    ``click_ts + horizon``; state size is watermark-horizon ×
    arrival-rate, never stream length.

    Scale: both sides hash-exchange on user_id (the equi-key) — the
    range predicate evaluates within each key group, so there is no
    interval-explosion; a 100 TB/day stream costs the same two
    exchanges a batch equi-join would.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        # whole seconds of the exact microsecond difference (floor-div
        # of the difference, not difference of per-side floors — the
        # latter is off by one when the fractional parts straddle)
        F.expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000").alias(
            "lag_seconds"
        ),
        F.round(F.col("purchase_value") * 100).cast("long").alias("purchase_cents"),
    )


# ---------------------------------------------------------------------------
# foreachBatch upsert sink (streaming → warehouse snapshot)
# ---------------------------------------------------------------------------


def upsert_totals_to_parquet(
    events: DataFrame, base_dir: str, checkpoint_dir: str | None = None
) -> str:
    """The standard streaming→warehouse topology: an update-mode
    aggregation whose per-batch deltas MERGE into a keyed parquet
    snapshot via ``foreachBatch`` — the sink pattern for every store
    without a native streaming writer (warehouse tables, JDBC, object
    stores).

    Each micro-batch emits the keys whose totals changed; the batch
    function SCD1-upserts them into the current snapshot and writes a
    new immutable version directory (``v{batch_id}``) — the
    atomic-swap discipline object stores need (readers never observe a
    half-written snapshot; the latest complete version wins). After the
    backlog drains the snapshot equals the batch group-by — exactly
    restatable in SQL.

    Scale: per batch, the delta is |changed keys| rows — the upsert
    broadcasts it against the snapshot; the full-snapshot rewrite is
    the parquet trade-off (a table format — Iceberg/Delta — swaps the
    rewrite for a metadata commit, same foreachBatch shape).

    Pass ``checkpoint_dir`` to make the run RESUMABLE: the same
    checkpoint across invocations gives exactly-once recovery — a
    restart skips committed batches, drains only newly arrived files,
    and an idle restart is a no-op (pinned by
    test_upsert_sink_restart_recovery). Without it a throwaway
    checkpoint is used and removed after the drain.
    """
    from pathlib import Path

    from efficient_llm_data_wrangling_spark.queries.etl import upsert_by_key

    totals = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    spark = events.sparkSession
    root = Path(base_dir)

    def _latest() -> str | None:
        versions = sorted(
            (d for d in root.glob("v*") if (d / "_SUCCESS").exists()),
            key=lambda d: int(d.name[1:]),
        )
        return str(versions[-1]) if versions else None

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest()
        if prev is None:
            merged = batch_df
        else:
            merged = upsert_by_key(spark.read.parquet(prev), batch_df, "user_id")
        merged.write.mode("overwrite").parquet(str(root / f"v{batch_id}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    nparts = _stream_partitions()
    if nparts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", nparts)
    try:
        writer = (
            totals.writeStream.outputMode("update")
            .foreachBatch(merge)
            .trigger(availableNow=True)
        )
        ckpt = checkpoint_dir if checkpoint_dir is not None else _fast_checkpoint_dir()
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        writer.start().awaitTermination()
    finally:
        if nparts is not None and prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if ckpt is not None and checkpoint_dir is None:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    latest = _latest()
    assert latest is not None, "stream produced no snapshot version"
    return latest


def band_index_upsert_to_parquet(
    band_stream: DataFrame,
    standing_bands: DataFrame,
    base_dir: str,
    checkpoint_dir: str | None = None,
) -> tuple[str, str]:
    """Versioned maintenance of the MinHash BAND INDEX — the dedup
    artifact ``stream_neardup_gate`` joins against — so the gate's
    index ages with the stream instead of waiting for a corpus
    compaction (VERDICT r10 item 6). ``standing_bands`` (id, band,
    key — the batch LSH's 32-rows/doc sketch index) is written as
    version v0 before the stream starts; each micro-batch of arriving
    band rows (computed SCAN-side on the stream, exactly the gate's
    posture) is graded against the CURRENT version and then appended
    to it — the ``upsert_totals_to_parquet`` atomic-version-swap
    topology applied to the dedup artifact.

    Semantics: the index absorbs the sketch of everything SEEN —
    admitted or not — because a dedup index exists to flag re-arrivals
    of anything it has ever witnessed; what admission MEANS is
    recorded per arrival in the manifest: ``n_index_hits`` ((band,
    key) collisions with the index as of the batch), ``n_batch_
    conflicts`` (keys shared with a smaller-id arrival in the SAME
    batch), ``admitted`` = both zero, i.e. first-seen wins. Both
    per-batch writes are IDEMPOTENT (the manifest overwrites its own
    ``b{batch_id}`` subdirectory, the index its ``v{batch_id+1}``
    version), so foreachBatch's at-least-once replay after a crash
    cannot double-count — pass ``checkpoint_dir`` and a restart
    resumes exactly-once (pinned by the restart-recovery test). Because
    the seen-set grows order-free, the final index after ANY batch
    partitioning equals the batch-built index on the union (pinned by
    the multi-batch convergence test), and under id-ordered ingestion
    the manifest is batch-split-invariant too.

    Scale: per batch the delta is 32 rows/arrival; the index-hit probe
    is one keyed equi-join against the current version (broadcast
    while it fits, shuffled beyond — the gate's guarded posture), the
    intra-batch conflict check one self-equi-join bounded by batch
    size, and the version write appends |batch|×32 rows. A table
    format (Iceberg/Delta) swaps the full rewrite for a metadata
    commit, same foreachBatch shape.
    """
    from pathlib import Path

    spark = band_stream.sparkSession
    root = Path(base_dir)
    manifest_dir = root / "manifest"
    manifest_dir.mkdir(parents=True, exist_ok=True)
    standing_bands.select(
        F.col("id").cast("long").alias("id"), "band", "key"
    ).write.mode("overwrite").parquet(str(root / "v0"))

    def _latest() -> str:
        versions = sorted(
            (d for d in root.glob("v*") if (d / "_SUCCESS").exists()),
            key=lambda d: int(d.name[1:]),
        )
        return str(versions[-1])

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ba = batch_df.select(
            F.col("arr_id").cast("long").alias("arr_id"), "band", "key"
        ).localCheckpoint()
        idx = spark.read.parquet(_latest())
        hits = (
            ba.join(idx, ["band", "key"])
            .select("arr_id", "band", "key")
            .distinct()
            .groupBy("arr_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_index_hits"))
        )
        other = ba.select(
            F.col("arr_id").alias("__oid"), "band", "key"
        )
        conf = (
            ba.join(other, ["band", "key"])
            .filter(F.col("__oid") < F.col("arr_id"))
            .select("arr_id", "band", "key")
            .distinct()
            .groupBy("arr_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_batch_conflicts"))
        )
        manifest = (
            ba.select("arr_id")
            .distinct()
            .join(hits, "arr_id", "left")
            .join(conf, "arr_id", "left")
            .select(
                "arr_id",
                F.coalesce("n_index_hits", F.lit(0)).cast("long").alias("n_index_hits"),
                F.coalesce("n_batch_conflicts", F.lit(0))
                .cast("long")
                .alias("n_batch_conflicts"),
                (
                    F.coalesce("n_index_hits", F.lit(0)).eqNullSafe(0)
                    & F.coalesce("n_batch_conflicts", F.lit(0)).eqNullSafe(0)
                ).alias("admitted"),
            )
        )
        # IDEMPOTENT per-batch manifest write: foreachBatch is
        # at-least-once, so a crash-rerun batch must overwrite its own
        # subdirectory rather than append rows twice (the version
        # write below is already idempotent — same v{batch_id+1} path)
        manifest.write.mode("overwrite").parquet(
            str(manifest_dir / f"b{batch_id}")
        )
        idx.unionByName(
            ba.select(F.col("arr_id").alias("id"), "band", "key")
        ).write.mode("overwrite").parquet(str(root / f"v{batch_id + 1}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    nparts = _stream_partitions()
    if nparts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", nparts)
    try:
        writer = (
            band_stream.writeStream.outputMode("append")
            .foreachBatch(merge)
            .trigger(availableNow=True)
        )
        ckpt = checkpoint_dir if checkpoint_dir is not None else _fast_checkpoint_dir()
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        writer.start().awaitTermination()
    finally:
        if nparts is not None and prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if ckpt is not None and checkpoint_dir is None:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return f"{manifest_dir}/b*", _latest()


def cell_index_upsert_to_parquet(
    probe_stream: DataFrame,
    standing_cells: DataFrame,
    vec_frame: DataFrame,
    base_dir: str,
    cos_bar: float,
    checkpoint_dir: str | None = None,
) -> tuple[str, str]:
    """Versioned maintenance of the IVF CELL INDEX — the semantic
    gate's standing (cell → member) artifact — so the paraphrase
    gate's index ages with the stream the way
    :func:`band_index_upsert_to_parquet` ages the lexical one; the
    codebook itself stays FIXED (assignment maintenance is cheap under
    a frozen codebook; refreshing the codebook is the batch rebuild
    ``knn_ivf_drift_report`` exists to trigger). ``probe_stream``
    carries (arr_id, rn, c): each arrival's probe cells ranked by
    distance, rank 1 the HOME cell computed SCAN-side from the
    codebook literals. ``standing_cells`` (id, c) is written as v0
    before the stream starts; ``vec_frame`` (id, v) is the static
    double-vector lookup BOTH cosine verifications read.

    Per micro-batch: candidates = batch probes equi-joined to the
    CURRENT index version on the cell key, verified by exact double
    cosine against ``cos_bar`` (a cell collision means nothing by
    itself — unlike a band-key hit — so the manifest counts VERIFIED
    flags); intra-batch conflicts = probes against smaller-id batch
    arrivals' home cells, same verification. The index absorbs every
    arrival's home-cell row — seen-set semantics, so the final index
    after ANY batch partitioning equals the batch assignment of
    standing ∪ arrivals under the standing codebook (the convergence
    test), and ``admitted`` is batch-split-invariant. Both per-batch
    writes are IDEMPOTENT (manifest overwrites ``b{batch_id}``, index
    its ``v{batch_id+1}``), so at-least-once replay cannot
    double-count; pass ``checkpoint_dir`` for exactly-once restart.

    Scale: ONE probe row per (arrival, probe) flows through the
    stream — the embedding never leaves the scan except into the
    static lookup the verification joins; the index probe is a keyed
    equi-join against the current version; verification touches the
    members of the probed cells only (the IVF-bounded candidate
    budget); the version write appends 1 row/arrival.
    """
    from efficient_llm_data_wrangling_spark.operators.dedup import cosine_sim

    spark = probe_stream.sparkSession
    root = Path(base_dir)
    manifest_dir = root / "manifest"
    manifest_dir.mkdir(parents=True, exist_ok=True)
    standing_cells.select(
        F.col("id").cast("long").alias("id"), F.col("c").cast("long").alias("c")
    ).write.mode("overwrite").parquet(str(root / "v0"))

    def _latest() -> str:
        versions = sorted(
            (d for d in root.glob("v*") if (d / "_SUCCESS").exists()),
            key=lambda d: int(d.name[1:]),
        )
        return str(versions[-1])

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ba = batch_df.select(
            F.col("arr_id").cast("long").alias("arr_id"),
            F.col("rn").cast("int").alias("rn"),
            F.col("c").cast("long").alias("c"),
        ).localCheckpoint()
        idx = spark.read.parquet(_latest())
        va = vec_frame.select(
            F.col("id").alias("arr_id"), F.col("v").alias("__va")
        )
        vb = vec_frame.select(F.col("id"), F.col("v").alias("__vb"))
        cand = ba.join(idx, "c").select("arr_id", "id").distinct()
        ver = (
            cand.join(va, "arr_id")
            .join(vb, "id")
            .select(
                "arr_id", cosine_sim(F.col("__va"), F.col("__vb")).alias("cosine")
            )
        )
        agg = ver.groupBy("arr_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("cosine") >= cos_bar, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        homes = ba.filter(F.col("rn") == 1).select(
            F.col("arr_id").alias("__oid"), "c"
        )
        bcand = (
            ba.join(homes, "c")
            .filter(F.col("__oid") < F.col("arr_id"))
            .select("arr_id", "__oid")
            .distinct()
        )
        bver = (
            bcand.join(va, "arr_id")
            .join(
                vec_frame.select(
                    F.col("id").alias("__oid"), F.col("v").alias("__vb")
                ),
                "__oid",
            )
            .select(
                "arr_id", cosine_sim(F.col("__va"), F.col("__vb")).alias("cosine")
            )
        )
        bagg = bver.groupBy("arr_id").agg(
            F.sum(F.when(F.col("cosine") >= cos_bar, 1).otherwise(0))
            .cast("long")
            .alias("n_batch_conflicts"),
        )
        manifest = (
            ba.filter(F.col("rn") == 1)
            .select("arr_id", F.col("c").alias("home_cell"))
            .join(agg, "arr_id", "left")
            .join(bagg, "arr_id", "left")
            .select(
                "arr_id",
                "home_cell",
                F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
                F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
                F.coalesce("n_batch_conflicts", F.lit(0))
                .cast("long")
                .alias("n_batch_conflicts"),
                (
                    F.coalesce("n_flagged", F.lit(0)).eqNullSafe(0)
                    & F.coalesce("n_batch_conflicts", F.lit(0)).eqNullSafe(0)
                ).alias("admitted"),
            )
        )
        manifest.write.mode("overwrite").parquet(str(manifest_dir / f"b{batch_id}"))
        idx.unionByName(
            ba.filter(F.col("rn") == 1).select(
                F.col("arr_id").alias("id"), "c"
            )
        ).write.mode("overwrite").parquet(str(root / f"v{batch_id + 1}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    nparts = _stream_partitions()
    if nparts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", nparts)
    try:
        writer = (
            probe_stream.writeStream.outputMode("append")
            .foreachBatch(merge)
            .trigger(availableNow=True)
        )
        ckpt = checkpoint_dir if checkpoint_dir is not None else _fast_checkpoint_dir()
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        writer.start().awaitTermination()
    finally:
        if nparts is not None and prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if ckpt is not None and checkpoint_dir is None:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return f"{manifest_dir}/b*", _latest()
