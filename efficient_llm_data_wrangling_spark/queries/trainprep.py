"""Training-data preparation operators — the steps between a cleaned
corpus and a token stream a trainer consumes (beyond-reference north
star; the reference stops at per-row string transforms):

* **chunking** — split long documents into fixed-token windows with
  overlap (context-window packing precursor);
* **sequence packing** — greedily pack chunks into fixed token budgets
  by running total (the streaming approximation of bin packing every
  large-scale pretraining pipeline uses);
* **split assignment** — deterministic, engine-portable train/val/test
  buckets from a content-independent key hash (MD5, not engine-native
  hashes — xxhash64/DuckDB-hash disagree across engines and versions,
  and a split that changes when the engine upgrades poisons eval sets).

All arithmetic is integer (token counts, integer division, window
cumsums) so both engines agree bit-exactly; chunk text derives from
the same 1-based slice on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

#: chunk geometry: 50-token windows every 40 tokens (10-token overlap).
_CHUNK, _STRIDE = 50, 40
#: greedy packing budget (tokens per packed sequence).
_BUDGET = 2000


_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM t WHERE len(toks) >= 1
),
c AS (
  SELECT doc_id, n,
         unnest(generate_series(0, greatest(1, (n + {_STRIDE - _CHUNK + _STRIDE - 1}) // {_STRIDE}) - 1)) AS chunk_id,
         toks
  FROM base
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(least(n - chunk_id * {_STRIDE}, {_CHUNK}) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, chunk_id * {_STRIDE} + 1, chunk_id * {_STRIDE} + {_CHUNK}), ' ') AS chunk_text
FROM c
"""


@query("chunk_documents_overlap", oracle=_CHUNK_ORACLE, tags=("trainprep", "text"))
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap: each document becomes
    ⌈(n−overlap)/stride⌉ chunks of ≤50 tokens starting every 40 — the
    context-window shaping step before packing/tokenization. Chunk
    count and boundaries are pure integer arithmetic; the chunk text
    is a 1-based slice — identical formulas on both engines.

    Scale: tokens stay inside one row (array column, no explode of
    token rows); only chunk rows are generated (~n/stride per doc).
    The token array is referenced ≥2 times (count + slice) so it stays
    a staged column, never re-split per chunk.

    Perf note (r8): after two rounds as the bench's max
    calibration-normalized ratio (1.334 vs_r5, 1.263 vs_r6) with this
    code untouched, a 7× interleaved calibration/query A/B at sf0.1
    measured median ratio 1.078 — 1.081× the r6 driver's 0.997, inside
    the ≤1.1 noise band, so the driver readings were host drift, not a
    regression (the repo's noise discipline: only interleaved pairs
    are trustworthy single-query evidence).
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.lit(1), F.expr(f"(n + {_STRIDE - _CHUNK + _STRIDE - 1}) div {_STRIDE}")
    )
    base = (
        docs.select(
            "doc_id",
            F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("toks"),
        )
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .filter(F.col("n") >= 1)
    )
    chunks = base.select(
        "doc_id",
        "n",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.least(
            F.col("n") - F.col("chunk_id") * _STRIDE, F.lit(_CHUNK)
        ).cast("int").alias("n_chunk_tokens"),
        F.array_join(
            F.expr(f"slice(toks, chunk_id * {_STRIDE} + 1, {_CHUNK})"), " "
        ).alias("chunk_text"),
    )


_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS pack_id
FROM c
"""


@query("pack_documents_token_budget", oracle=_PACK_ORACLE, tags=("trainprep", "window"))
def pack_documents_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: within each source, documents (ordered
    by id) are packed into ~2000-token bins by running total —
    ``pack_id = floor(preceding_cumsum / budget)``, the one-pass
    streaming approximation of bin packing used to build fixed-length
    training sequences without padding waste.

    Scale: ONE window cumsum per source partition (keyed shuffle +
    sort); integer token counts make the cumsum exact and the bin
    assignment deterministic. No global coordination — sources pack
    independently, which is also what you want operationally (a source
    re-crawl repacks only itself).
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).alias(
            "n_tokens"
        ),
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return t.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(f"(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
               f"ROWS UNBOUNDED PRECEDING) - n_tokens) div {_BUDGET}").alias("pack_id"),
    )


_SPLIT_ORACLE = """
WITH h AS (
  SELECT doc_id, lang, source,
         instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 13 THEN 'train'
            WHEN bucket < 15 THEN 'valid'
            ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM h GROUP BY 1, 2
"""


@query("split_assign_documents", oracle=_SPLIT_ORACLE, tags=("trainprep",))
def split_assign_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (13/2/1 of 16 MD5
    buckets on the document KEY): reproducible across engines, engine
    versions, and reruns — the property that keeps eval sets uncovered
    by training data forever. Never hash content (near-dups of an eval
    doc must not leak into train via a different hash) and never use
    engine-native hashes (xxhash64 and DuckDB's hash() disagree).

    Scale: a scan-local expression + one grouped count. The split
    column would normally be written back as a partition column
    (``write_parquet(partition_by=["split"])``) for pruned reads.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.instr(
        F.lit("0123456789abcdef"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    ) - 1
    split = (
        F.when(bucket < 13, "train").when(bucket < 15, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Packing efficiency report
# --------------------------------------------------------------------------

_PACK_REPORT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
p AS (
  SELECT source, CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS pack_id,
         n_tokens
  FROM c
),
bins AS (
  SELECT source, pack_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
  FROM p GROUP BY source, pack_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
       CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
       CAST(sum(bin_tokens) * 1000 // (count(*) * {_BUDGET}) AS BIGINT)
         AS fill_permille
FROM bins GROUP BY source
"""


@query("packing_efficiency_report", oracle=_PACK_REPORT_ORACLE, tags=("trainprep", "agg"))
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The acceptance report for the sequence-packing stage: per
    source, bin count, document count, total tokens, the largest bin
    (greedy preceding-cumsum packing lets a bin overflow by its last
    document — max_bin_tokens bounds the overflow a trainer must
    truncate or spill), and fill rate in exact per-mille of the
    {budget}-token budget. Everything derives from the SAME window
    cumsum the graded packing query uses, so the report grades the
    exact bins the pipeline would ship.

    Scale: one window cumsum per source partition (the packing plan),
    then two keyed reductions (source, pack_id) → source — map-side
    combined, |sources| output rows. All integers exact.
    """
    tune(spark)
    from efficient_llm_data_wrangling_spark.queries.trainprep import (
        pack_documents_token_budget,
    )

    packed = pack_documents_token_budget(spark, sf_dir)
    bins = packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
        F.expr(f"sum(bin_tokens) * 1000L div (count(1) * {_BUDGET})").alias("fill_permille"),
    )


# ---------------------------------------------------------------------------
# Batch padding-waste report (inference/training batching decision)
# ---------------------------------------------------------------------------

_BATCH_B = 32


def _padding_sql(dv: str) -> str:
    """Engine-portable report body over view ``__bdocs``
    (source, doc_id, n_tokens). Shared template (Spark ``div`` /
    DuckDB ``//``) so the two engines cannot drift."""
    return f"""
WITH r AS (
  SELECT source, n_tokens,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           {dv} {_BATCH_B} AS b_arr,
         (row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) - 1)
           {dv} {_BATCH_B} AS b_len
  FROM __bdocs
),
a AS (
  SELECT source, b_arr AS b, count(*) AS n, max(n_tokens) AS mx,
         sum(n_tokens) AS tok
  FROM r GROUP BY source, b_arr
),
l AS (
  SELECT source, b_len AS b, count(*) AS n, max(n_tokens) AS mx,
         sum(n_tokens) AS tok
  FROM r GROUP BY source, b_len
),
u AS (
  SELECT 'arrival' AS strategy, n, mx, tok FROM a
  UNION ALL
  SELECT 'length_sorted' AS strategy, n, mx, tok FROM l
)
SELECT strategy,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(n * mx) AS BIGINT) AS padded_tokens,
       CAST(sum(n * mx) - sum(tok) AS BIGINT) AS wasted_tokens,
       (CAST(sum(n * mx) AS BIGINT) - CAST(sum(tok) AS BIGINT)) * 1000
         {dv} CAST(sum(n * mx) AS BIGINT) AS waste_permille
FROM u GROUP BY strategy
"""


_PADDING_ORACLE = (
    "WITH __bdocs AS (\n"
    "  SELECT source, doc_id,\n"
    "         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)\n"
    "           AS n_tokens\n"
    "  FROM documents\n"
    "),\n"
    + _padding_sql("//").strip().removeprefix("WITH ")
)


@query("batch_padding_report", oracle=_PADDING_ORACLE, tags=("trainprep", "window"))
def batch_padding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste under two batching policies at batch size
    {_BATCH_B} — the serving/training throughput decision packing
    does not cover (packing concatenates; batching pads every sequence
    to its batch max): per-source arrival-order batches (what a naive
    loader does) versus length-sorted batches (bucketed batching),
    each billed ``batch_rows × batch_max`` with the shortfall reported
    as exact per-mille waste. The delta between the two rows is the
    throughput a loader gives away by not length-bucketing — routinely
    2-5× padding reduction on natural length distributions, measured
    here instead of assumed.

    Scale: both policies are ONE window rank + one grouped aggregate
    per policy, partitioned by source (the ingest partition — batches
    never span sources operationally). No global sort: the length
    ordering is per-source, and sources parallelize. Integer token
    counts end-to-end.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    # materialized once: both policy branches consume the tokenized
    # frame, and without the checkpoint each branch re-tokenizes the
    # corpus (fact-scan audit: 2 documents scans)
    docs.select(
        "source",
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    ).localCheckpoint(eager=False).createOrReplaceTempView("__bdocs")
    return spark.sql(_padding_sql("div"))


# ---------------------------------------------------------------------------
# Adaptive data mixing: DoReMi-style multiplicative-weights rounds
# ---------------------------------------------------------------------------

_MW_ROUNDS = 4
_MW_EPS = 500  # update gain: w *= (1e6 + eps * excess_milli) / 1e6


def _mw_round_ctes() -> str:
    ctes = [
        "w0 AS (SELECT source, loss_milli, CAST(1000000 AS BIGINT) AS w FROM loss)"
    ]
    for r in range(1, _MW_ROUNDS + 1):
        p = f"w{r - 1}"
        ctes.append(
            f"m{r} AS (SELECT CAST(sum(w * loss_milli) // sum(w) AS BIGINT) AS ml FROM {p})"
        )
        ctes.append(
            f"""w{r} AS (
  SELECT source, loss_milli,
         CAST(loss_milli - ml AS BIGINT) AS excess_milli,
         CAST(w * (1000000 + {_MW_EPS} * (loss_milli - ml)) // 1000000 AS BIGINT) AS w
  FROM {p}, m{r}
)"""
        )
    return ",\n".join(ctes)


_MW_ORACLE = f"""
WITH t AS (
  SELECT source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT source,
         (len(toks) - len(list_distinct(toks))) * 1000 // len(toks) AS rep_milli
  FROM t WHERE len(toks) > 0
),
loss AS (
  SELECT source, CAST(sum(rep_milli) // count(*) AS BIGINT) AS loss_milli
  FROM d GROUP BY source
),
{_mw_round_ctes()}
{" UNION ALL ".join(
    f"SELECT CAST({r} AS BIGINT) AS round, source, loss_milli, excess_milli, w AS weight_micro FROM w{r}"
    for r in range(1, _MW_ROUNDS + 1)
)}
"""


@query("domain_reweight_rounds", oracle=_MW_ORACLE, tags=("trainprep", "iterative", "mixture"))
def domain_reweight_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive data mixing as relational rounds (DoReMi, Xie et al.
    2023, with the classic linearized multiplicative-weights update):
    each source's proxy loss is its mean per-document repetition rate
    in exact milli (the in-engine difficulty signal; a production run
    substitutes proxy-model excess loss), and each of the {_MW_ROUNDS}
    rounds recomputes the current mixture's weighted loss, measures
    every source's excess over it, and reweights ``w ←
    w·(1e6 + {_MW_EPS}·excess)/1e6`` in floor-division micro-units —
    upweighting the domains the current mixture handles worst, exactly
    DoReMi's control loop. The full per-round trace (loss, excess,
    weight) is the graded output, so both engines replay every
    division boundary of the iteration bit-for-bit.

    Scale: the per-source loss is ONE scan-side aggregate over the
    corpus; every round after that is arithmetic on a |sources|-row
    frame with the 1-row mixture loss joined in-plan as a broadcast
    aggregate (the ``stream_drift_monitor`` denominator discipline —
    no collect, no driver loop). 100 TB changes only the first
    aggregate's scan time; the iteration cost is independent of data
    size. localCheckpoint truncates the per-round lineage (the BPE /
    perceptron round discipline).
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = docs.select("source", toks.alias("toks")).filter(F.size("toks") > 0).select(
        "source",
        F.expr(
            "(size(toks) - size(array_distinct(toks))) * 1000 div size(toks)"
        ).alias("rep_milli"),
    )
    loss = d.groupBy("source").agg(
        F.expr("sum(rep_milli) div count(*)").cast("long").alias("loss_milli")
    )
    w = loss.withColumn("w", F.lit(1000000).cast("long"))
    traces: list[DataFrame] = []
    for r in range(1, _MW_ROUNDS + 1):
        m = w.agg(F.expr("sum(w * loss_milli) div sum(w)").cast("long").alias("ml"))
        w = (
            w.crossJoin(F.broadcast(m))
            .select(
                "source",
                "loss_milli",
                (F.col("loss_milli") - F.col("ml")).cast("long").alias("excess_milli"),
                F.expr(
                    f"CAST(w * (1000000 + {_MW_EPS} * (loss_milli - ml)) div 1000000 AS BIGINT)"
                ).alias("w"),
            )
            .localCheckpoint(eager=False)
        )
        traces.append(
            w.select(
                F.lit(r).cast("long").alias("round"),
                "source",
                "loss_milli",
                "excess_milli",
                F.col("w").alias("weight_micro"),
            )
        )
    out = traces[0]
    for t in traces[1:]:
        out = out.unionByName(t)
    return out


# --------------------------------------------------------------------------
# Training-order mixing report (do we need a global shuffle?)
# --------------------------------------------------------------------------

_MIX_BLOCK = 64  # docs per training block (loader read-ahead window)

_MIX_POLICY_KEYS_SQL = {
    "clustered": "source, doc_id",
    "arrival": "doc_id",
    "hashed": "md5(CAST(doc_id AS VARCHAR)), doc_id",
}


def _mix_policy_sql(policy: str, keys: str) -> str:
    return f"""
  SELECT '{policy}' AS policy, source,
         (row_number() OVER (ORDER BY {keys}) - 1) // {_MIX_BLOCK} AS blk
  FROM documents"""


_MIX_ORACLE = f"""
WITH pos AS (
  {" UNION ALL ".join(_mix_policy_sql(p, k) for p, k in _MIX_POLICY_KEYS_SQL.items())}
),
bs AS (
  SELECT policy, blk, source, CAST(count(*) AS BIGINT) AS c
  FROM pos GROUP BY policy, blk, source
),
blocks AS (
  SELECT policy, blk, sum(c) AS n_in_block, max(c) AS max_c,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM bs GROUP BY policy, blk
)
SELECT policy,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(max_c * 1000 // n_in_block) // count(*) AS BIGINT)
         AS mean_max_share_permille,
       CAST(max(max_c * 1000 // n_in_block) AS BIGINT)
         AS worst_max_share_permille,
       CAST(sum(n_sources * 1000) // count(*) AS BIGINT) AS mean_sources_milli,
       CAST(min(n_sources) AS BIGINT) AS min_sources
FROM blocks GROUP BY policy
"""


@query("training_order_mixing_report", oracle=_MIX_ORACLE, tags=("trainprep", "agg"))
def training_order_mixing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit of the TRAINING READ ORDER — the question
    a 100 TB pipeline must answer before paying for a full global
    shuffle of the corpus: per {_MIX_BLOCK}-doc loader block, how
    source-pure is each candidate ordering? Three policies: clustered
    (ORDER BY source — what per-source ingest directories produce;
    the gradient-noise pathology: worst share 480 permille / 3
    sources per block at sf0.01, and at a real corpus where a
    source's run far exceeds the block it degrades to fully pure
    1000-permille blocks), arrival (doc_id order — here round-robin
    across sources at 61-62 permille, BETTER than random because the
    generator interleaved), and hashed (md5 order — the one-shuffle
    fix, 103 mean / 125 worst). The honest reading this report exists
    to surface: a hash shuffle does not beat a well-interleaved
    arrival order — what it buys is a GUARANTEED multinomial bound
    independent of arrival pathology, so the decision rule is
    "measure arrival first; pay the global shuffle only if it reads
    clustered".
    Metrics per policy in exact integers: mean/worst max-source share
    per block (permille) and mean/min distinct sources per block.

    Scale: each policy's block ids come from
    :func:`operators.sampling.global_rank` (range exchange + parallel
    local rank + #partitions-row broadcast offsets — never a global
    single-partition window; the oracle restates it as the plain
    window it replaces); everything after is two keyed partial-agg
    reductions down to |blocks| then |policies| rows.
    """
    tune(spark)
    from efficient_llm_data_wrangling_spark.operators import sampling as SAMP

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    frames = []
    for policy, keys in (
        ("clustered", ["source", "doc_id"]),
        ("arrival", ["doc_id"]),
        ("hashed", ["__h", "doc_id"]),
    ):
        base = docs.withColumn("__h", F.md5(F.col("doc_id").cast("string")))
        ranked = SAMP.global_rank(base, keys, out_col="__rn")
        frames.append(
            ranked.select(
                F.lit(policy).alias("policy"),
                "source",
                F.expr(f"(__rn - 1) div {_MIX_BLOCK}").alias("blk"),
            )
        )
    pos = frames[0]
    for fdf in frames[1:]:
        pos = pos.unionByName(fdf)
    bs = pos.groupBy("policy", "blk", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    blocks = bs.groupBy("policy", "blk").agg(
        F.sum("c").alias("n_in_block"),
        F.max("c").alias("max_c"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return blocks.groupBy("policy").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.expr("CAST(sum(max_c * 1000 div n_in_block) div count(*) AS BIGINT)").alias(
            "mean_max_share_permille"
        ),
        F.expr("CAST(max(max_c * 1000 div n_in_block) AS BIGINT)").alias(
            "worst_max_share_permille"
        ),
        F.expr("CAST(sum(n_sources * 1000) div count(*) AS BIGINT)").alias(
            "mean_sources_milli"
        ),
        F.min("n_sources").cast("long").alias("min_sources"),
    )


# --------------------------------------------------------------------------
# Leave-one-source-out ablation (the drop-a-source decision)
# --------------------------------------------------------------------------

_LOO_ORACLE = """
WITH t AS (
  SELECT source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT source, len(toks) AS n_toks,
         (len(toks) - len(list_distinct(toks))) * 1000 // len(toks) AS rep_milli
  FROM t WHERE len(toks) > 0
),
s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(rep_milli) AS BIGINT) AS sum_rep
  FROM d GROUP BY source
),
g AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS gn,
         CAST(sum(n_tokens) AS BIGINT) AS gt,
         CAST(sum(sum_rep) AS BIGINT) AS gs
  FROM s
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 1000 // gt AS BIGINT) AS token_share_permille,
       CAST(sum_rep // n_docs AS BIGINT) AS src_mean_rep_milli,
       CAST(gs // gn AS BIGINT) AS corpus_mean_rep_milli,
       CAST((gs - sum_rep) // (gn - n_docs) AS BIGINT) AS loo_mean_rep_milli,
       CAST((gs - sum_rep) // (gn - n_docs) - gs // gn AS BIGINT) AS delta_milli,
       (gs - sum_rep) // (gn - n_docs) < gs // gn AS drop_improves
FROM s, g
"""


@query("source_ablation_report", oracle=_LOO_ORACLE, tags=("trainprep", "mixture"))
def source_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation over the mixing proxy loss — the
    data-attribution-lite measurement behind the DROP-a-source
    decision ``domain_reweight_rounds`` (which only REWEIGHTS) cannot
    answer: for every source, the corpus mean repetition (the same
    proxy-loss signal DoReMi's rounds consume; a production run
    substitutes proxy-model excess loss) recomputed as if that source
    were removed, its signed delta, and a ``drop_improves`` verdict.
    The most negative ``delta_milli`` names the single highest-value
    drop; token_share_permille prices what the drop costs in data.
    All floor-division integers on positive sums, so every LOO
    division boundary replays bit-for-bit in both engines.

    Scale: ONE scan-side aggregate to |sources| rows, then the 1-row
    global total joined back in-plan as a broadcast aggregate (the
    ``stream_drift_monitor`` denominator discipline) — the |sources|
    LOO variants cost |sources| subtractions, never |sources| scans,
    which is the entire point of computing ablation relationally.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = (
        docs.select("source", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "source",
            F.size("toks").alias("n_toks"),
            F.expr(
                "(size(toks) - size(array_distinct(toks))) * 1000 div size(toks)"
            ).alias("rep_milli"),
        )
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("rep_milli").cast("long").alias("sum_rep"),
    )
    g = s.agg(
        F.sum("n_docs").cast("long").alias("gn"),
        F.sum("n_tokens").cast("long").alias("gt"),
        F.sum("sum_rep").cast("long").alias("gs"),
    )
    return s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("CAST(n_tokens * 1000 div gt AS BIGINT)").alias("token_share_permille"),
        F.expr("CAST(sum_rep div n_docs AS BIGINT)").alias("src_mean_rep_milli"),
        F.expr("CAST(gs div gn AS BIGINT)").alias("corpus_mean_rep_milli"),
        F.expr("CAST((gs - sum_rep) div (gn - n_docs) AS BIGINT)").alias(
            "loo_mean_rep_milli"
        ),
        F.expr(
            "CAST((gs - sum_rep) div (gn - n_docs) - gs div gn AS BIGINT)"
        ).alias("delta_milli"),
        F.expr("(gs - sum_rep) div (gn - n_docs) < gs div gn").alias("drop_improves"),
    )


# ---------------------------------------------------------------------------
# Skip-gram pair generation with negative sampling (word2vec data prep)
# ---------------------------------------------------------------------------

_SG_WINDOW = (-2, -1, 1, 2)  # context offsets
_SG_NEGS = 2  # negative draws per pair
_SG_T = "0.001"  # word2vec subsampling threshold t (double literal)
_SG_TWO32 = 1 << 32


def _sg_u32(s: str, vc: str) -> str:
    """First 8 md5 nibbles of string expression ``s`` as BIGINT (the
    portable hex parse; every nibble cast before the scale multiply)."""
    return "(" + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({s}), {1 + j}, 1)) - 1"
        f" AS BIGINT) * {16 ** (7 - j)}"
        for j in range(8)
    ) + ")"


def _sg_u32_conv(s: str) -> str:
    """Spark spelling of the same 32-bit value: ONE md5 call through
    ``conv`` (DuckDB has no conv, so its side keeps the instr chain —
    the ``weighted_sample_orders`` precedent; identical integers)."""
    return f"cast(conv(substring(md5({s}), 1, 8), 16, 10) as bigint)"


def _sg_parts(
    vc: str,
    pos_src: str,
    engine: str = "duck",
    cnt_src: str = "cnt",
    kp_src: str = "kp",
) -> tuple[str, str]:
    """(with_body, final_fmt): the WITH chain through ``pn`` (counts,
    cumulative intervals, keep verdicts, windowed pairs, per-pair
    negative uniforms) and the final interval-join SELECT with ``{pn}``
    / ``{cum}`` table slots — one source of truth; the oracle splices
    them into one statement, the Spark side MATERIALIZES ``pn`` and
    ``cum`` first so the md5-chain uniforms are computed once per row
    and never re-evaluated inside the join conditions (the first cut
    did exactly that: ~550M md5 calls, 71 s at sf0.1; split, the
    query runs in seconds). ``cnt_src``/``kp_src`` (r12) let the
    Spark side substitute materialized temp views for the
    multi-referenced ``cnt``/``kp`` CTEs — Spark inlines a CTE per
    reference, so without the substitution the vocab histogram ran
    ~4× and the keep-verdict scan (one md5/row) 2× per build; the
    oracle keeps the defaults and its MATERIALIZED pins."""
    u32 = _sg_u32_conv if engine == "spark" else (lambda t: _sg_u32(t, vc))
    keep_hash = u32("concat(CAST(doc_id AS {vc}), ':', CAST(pos AS {vc}), ':sub')".format(vc=vc))
    neg_hash = lambda d: u32(  # noqa: E731
        "concat(CAST(p.doc_id AS {vc}), ':', CAST(p.pos AS {vc}), ':',"
        " CAST(p.off AS {vc}), ':neg{d}')".format(vc=vc, d=d),
    )
    u_cols = ", ".join(
        f"({neg_hash(d)}) % tot.t AS u{d}" for d in range(1, _SG_NEGS + 1)
    )
    neg_joins = "\n".join(
        f"JOIN {{cum}} c{d} ON pn.u{d} BETWEEN c{d}.lo AND c{d}.hi"
        for d in range(1, _SG_NEGS + 1)
    )
    neg_cols = ", ".join(f"c{d}.tok AS neg{d}" for d in range(1, _SG_NEGS + 1))
    with_body = f"""cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM {pos_src} GROUP BY tok
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM {cnt_src}),
cum AS (
  SELECT tok, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS lo,
         CAST(sum(c) OVER (ORDER BY tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
              AS BIGINT) AS hi
  FROM {cnt_src}
),
kp AS (
  SELECT s.doc_id, s.pos, s.tok,
         (CAST(({keep_hash}) AS DOUBLE) / CAST({_SG_TWO32} AS DOUBLE))
           < (sqrt(CAST({_SG_T} AS DOUBLE) * CAST(tot.t AS DOUBLE)
                   / CAST(cnt.c AS DOUBLE))
              + CAST({_SG_T} AS DOUBLE) * CAST(tot.t AS DOUBLE)
                / CAST(cnt.c AS DOUBLE)) AS keep
  FROM {pos_src} s JOIN {cnt_src} cnt ON s.tok = cnt.tok CROSS JOIN tot
),
pairs AS (
  SELECT a.doc_id, a.pos, o.off,
         a.tok AS center, b.tok AS context,
         a.keep AND b.keep AS kept
  FROM {kp_src} a
  JOIN (SELECT * FROM (VALUES {", ".join(f"({o})" for o in _SG_WINDOW)}) v(off)) o
    ON true
  JOIN {kp_src} b ON b.doc_id = a.doc_id AND b.pos = a.pos + o.off
),
pn AS (
  SELECT p.doc_id, p.pos, p.off, p.center, p.context, p.kept, {u_cols}
  FROM pairs p CROSS JOIN tot
)"""
    final = f"""SELECT pn.doc_id, CAST(pn.pos AS BIGINT) AS pos, CAST(pn.off AS BIGINT) AS off,
       pn.center, pn.context, pn.kept,
       {neg_cols}
FROM {{pn}} pn
{neg_joins}"""
    return with_body, final


def _sg_sql(vc: str, pos_src: str) -> str:
    with_body, final = _sg_parts(vc, pos_src)
    return f"\nWITH {with_body}\n" + final.format(pn="pn", cum="cum") + "\n"


_SG_POS_DUCK = f"""__sgpos AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i + 1] AS tok
  FROM (SELECT doc_id, {{toks}} AS toks FROM documents) t0,
       unnest(range(len(toks))) u(i)
)"""


def _sg_oracle() -> str:
    from efficient_llm_data_wrangling_spark.queries.corpusops import _TOKS_SQL

    body = _sg_sql("VARCHAR", "__sgpos")
    pos = _SG_POS_DUCK.format(toks=_TOKS_SQL)
    return body.replace("WITH cnt AS", f"WITH {pos},\ncnt AS", 1)


@query(
    "skipgram_negative_sampling",
    oracle=_sg_oracle(),
    tags=("trainprep", "curation", "sampling"),
)
def skipgram_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP-GRAM pair generation with negative sampling — the
    word2vec/embedding-model data-prep op (Mikolov et al. 2013),
    fully deterministic and engine-portable: windowed (center,
    context) pairs at offsets {_SG_WINDOW}, the frequency SUBSAMPLING
    rule p_keep = √(t/f) + t/f evaluated in shared doubles (IEEE
    sqrt is correctly rounded, so both engines hold the identical
    probability) against a per-instance md5 uniform, and {_SG_NEGS}
    negative draws per pair by inverse-CDF lookup into the cumulative
    UNIGRAM intervals (token-ordered, exact BIGINT bounds; the ¾-power
    shaping is documented out — it needs a portable exp, and at this
    corpus's 31-type vocabulary the two distributions are nearly
    identical). Deviation kept honest: instances are subsampled but
    windows form on the ORIGINAL sequence (word2vec compacts first) —
    ``kept`` marks pairs whose BOTH endpoints survive, so a consumer
    filters rather than re-indexes; negative=context collisions are
    possible and a consumer drops them (standard practice), both
    documented here rather than hidden.

    Measured at sf0.01 (105,660 pairs from ~26k token instances): the
    subsampling rule is brutal exactly as word2vec intends on a
    stopword-dense corpus — every one of the 31 types sits far above
    the t={_SG_T} relative-frequency threshold, mean per-type keep
    probability 0.23, and 4.2% of pairs survive BOTH endpoints (the
    ~0.2² product) — the designed behavior when the whole vocabulary
    is high-frequency (real corpora keep their long tail at p=1, and
    the kept fraction rises toward the pair count itself).
    Negative=context collisions run 3.3%, the 1/vocab-mass rate the
    consumer's drop-filter expects.

    Scale: pair generation is one self-join on (doc, pos±offset) —
    keyed, never quadratic; the negative lookup is a broadcast
    interval probe against a vocabulary-sized cumulative table (the
    reshard rung's discipline); subsampling is scan-side arithmetic
    against a broadcast 1-row total. Output rows ≈ 4 × corpus tokens
    regardless of SF — linear, shuffle-light, and the text never
    leaves the tokenizer.
    """
    tune(spark)
    from efficient_llm_data_wrangling_spark.queries.corpusops import _toks_col

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(_toks_col()).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    pos.localCheckpoint(eager=False).createOrReplaceTempView("__sgpos")
    body_plain, _ = _sg_parts("STRING", "__sgpos", engine="spark")
    body_cnt, _ = _sg_parts("STRING", "__sgpos", engine="spark", cnt_src="__sgcnt")
    with_body, final = _sg_parts(
        "STRING", "__sgpos", engine="spark", cnt_src="__sgcnt", kp_src="__sgkp"
    )
    # materialize the multi-referenced stages exactly once each: the
    # vocab histogram cnt (feeds tot, cum, kp — Spark re-inlines a CTE
    # per reference), the keep-verdict frame kp (both pair sides, one
    # md5 coin per token instance), and pn (so every md5-chain uniform
    # is computed exactly once per pair row, never re-evaluated inside
    # the interval-join conditions) plus the 1-vocab-row cum table
    # before the joins
    spark.sql(f"WITH {body_plain} SELECT * FROM cnt").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__sgcnt")
    spark.sql(f"WITH {body_cnt} SELECT * FROM kp").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__sgkp")
    spark.sql(f"WITH {with_body} SELECT * FROM pn").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__sgpn")
    spark.sql(f"WITH {body_cnt} SELECT * FROM cum").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__sgcum")
    return spark.sql(final.format(pn="__sgpn", cum="__sgcum"))


# ---------------------------------------------------------------------------
# Fill-in-the-middle transform (the code-LM training-data reordering)
# ---------------------------------------------------------------------------

_FIM_RATE_PCT = 50  # share of documents transformed (md5-deterministic)


def _fim_sql(engine: str, documents: str) -> str:
    """Shared FIM text, engine-parameterized only in spelling (token
    split, list slice/join, md5 u32, integer division). Three
    independent md5 draws per document: the apply coin (rate
    {_FIM_RATE_PCT}%), and two uniform positions over [0, n] whose
    min/max bound the middle span — fully deterministic, so both
    engines transform the identical documents identically."""
    if engine == "spark":
        from efficient_llm_data_wrangling_spark.queries.corpusops import _toks_col  # noqa: F401

        toks = "filter(split(text, ' '), x -> x <> '')"
        ll = "size(toks)"
        u32 = lambda tag: (  # noqa: E731
            f"cast(conv(substring(md5(concat(CAST(doc_id AS STRING), ':{tag}')),"
            f" 1, 8), 16, 10) as bigint)"
        )
        # slice(arr, start, length), 1-based start
        pre = "array_join(slice(toks, 1, s), ' ')"
        mid = "array_join(slice(toks, s + 1, e - s), ' ')"
        suf = "array_join(slice(toks, e + 1, n - e), ' ')"
    else:
        from efficient_llm_data_wrangling_spark.queries.corpusops import _TOKS_SQL
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        toks = _TOKS_SQL
        ll = "len(toks)"
        u32 = lambda tag: _hexint_sql(  # noqa: E731
            f"md5(CAST(doc_id AS VARCHAR) || ':{tag}')", 1, 8
        )
        # list_slice(arr, begin, end), 1-based inclusive
        # DuckDB 1.0's array_to_string returns NULL for an empty
        # list (Spark's array_join returns '') — coalesce to ''
        pre = "coalesce(array_to_string(list_slice(toks, 1, s), ' '), '')"
        mid = "coalesce(array_to_string(list_slice(toks, s + 1, e), ' '), '')"
        suf = "coalesce(array_to_string(list_slice(toks, e + 1, n), ' '), '')"
    return f"""
WITH t AS (
  SELECT doc_id, text, {toks} AS toks, CAST({ll} AS BIGINT) AS n
  FROM {documents}
),
d AS (
  SELECT doc_id, text, toks, n,
         ({u32("fimp")}) % 100 < {_FIM_RATE_PCT} AS fim_applied,
         ({u32("fim1")}) % (n + 1) AS u1,
         ({u32("fim2")}) % (n + 1) AS u2
  FROM t
),
sp AS (
  SELECT doc_id, text, toks, n, fim_applied,
         least(u1, u2) AS s, greatest(u1, u2) AS e
  FROM d
)
SELECT doc_id, fim_applied, n AS n_tokens,
       CASE WHEN fim_applied THEN s ELSE CAST(0 AS BIGINT) END AS span_start,
       CASE WHEN fim_applied THEN e ELSE CAST(0 AS BIGINT) END AS span_end,
       CASE WHEN fim_applied THEN e - s ELSE CAST(0 AS BIGINT) END AS n_middle,
       CASE WHEN fim_applied
            THEN '<PRE>' || {pre} || '<SUF>' || {suf} || '<MID>' || {mid}
            ELSE text END AS out_text
FROM sp
"""


@query(
    "fim_span_transform",
    oracle=_fim_sql("duck", "documents"),
    tags=("trainprep", "curation"),
)
def fim_span_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (Bavarian et al. 2022) — the training-data
    reordering behind every infilling-capable code LM: for a
    deterministic {_FIM_RATE_PCT}% of documents, elect a middle span
    by two md5-uniform draws over token boundaries (min/max of the
    pair — the paper's uniform-span election) and emit the document
    in PSM order, <PRE> prefix <SUF> suffix <MID> middle, leaving the
    rest untransformed — the mixed corpus the paper shows preserves
    left-to-right quality while teaching infilling. Spans here are
    TOKEN-boundary (the paper splits characters; documented
    deviation — boundary semantics, not mechanism) and the sentinel
    strings stand in for tokenizer sentinel ids. Every draw is a
    versioned md5 (the corpus-wide split discipline), so re-runs and
    both engines transform the identical documents identically —
    the oracle hash equality covers the reassembled strings
    themselves, not just the bookkeeping.

    Scale: pure scan-side column arithmetic — three md5 draws, two
    slices, one concat per document; no shuffle, no state, no
    Python. At 100 TB this pushes below any exchange exactly like
    ``chunk_documents_overlap``; the span bookkeeping columns
    (span_start/end, n_middle) are what the packing stage consumes
    to budget sequences.
    """
    tune(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__fim_documents")
    return spark.sql(_fim_sql("spark", "__fim_documents"))


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) — collision cost measured
# across the dimension ladder
# ---------------------------------------------------------------------------

_FH_DIMS = (1024, 4096, 16384, 65536)


def _fh_sql(engine: str, documents: str) -> str:
    """Shared feature-hashing text; engine switches are the md5 u32
    spelling, the n-gram burst, and integer division. The feature
    stream is fastText's wordNgrams=3 surface (unigrams + word
    bigrams + word trigrams); ONE type histogram feeds all four
    dimension rungs."""
    if engine == "spark":
        dv = "div"
        u32 = "cast(conv(substring(md5(concat('fh:', w)), 1, 8), 16, 10) as bigint)"
        grams = lambda n: (  # noqa: E731
            f"CASE WHEN size(toks) >= {n} THEN transform("
            f"sequence(1, size(toks) - {n - 1}),"
            f" i -> concat_ws(' ', slice(toks, i, {n})))"
            f" ELSE array() END"
        )
        sel = (
            f"SELECT explode(concat(toks, {grams(2)}, {grams(3)})) AS w "
            f"FROM (SELECT split(text, ' ') AS toks FROM {documents}) tk"
        )
    else:
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        dv = "//"
        u32 = _hexint_sql("md5(concat('fh:', w))", 1, 8)
        grams = lambda n: (  # noqa: E731
            f"[array_to_string(toks[i:i+{n - 1}], ' ')"
            f" for i in range(1, len(toks) - {n - 2})]"
        )
        sel = (
            f"SELECT unnest(list_concat(list_concat(toks, {grams(2)}), {grams(3)}))"
            f" AS w FROM (SELECT string_split(text, ' ') AS toks FROM {documents}) tk"
        )
    rungs = ",\n".join(
        f"""r{d} AS (
  SELECT CAST({d} AS BIGINT) AS dims, ({u32}) % {d} AS bucket,
         CAST(count(*) AS BIGINT) AS n_types, CAST(sum(cnt) AS BIGINT) AS mass
  FROM ty GROUP BY ({u32}) % {d}
)"""
        for d in _FH_DIMS
    )
    unions = "\n  UNION ALL\n".join(f"SELECT * FROM r{d}" for d in _FH_DIMS)
    return f"""
WITH tok AS ({sel}),
ty AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok WHERE w != '' GROUP BY w
),
{rungs},
allr AS ({unions}),
rep AS (
  SELECT dims,
         CAST(sum(n_types) AS BIGINT) AS n_types,
         CAST(sum(mass) AS BIGINT) AS token_mass,
         CAST(count(*) AS BIGINT) AS n_buckets_used,
         CAST(sum(CASE WHEN n_types > 1 THEN n_types ELSE 0 END) AS BIGINT)
           AS n_types_shared,
         CAST(sum(CASE WHEN n_types > 1 THEN mass ELSE 0 END) AS BIGINT)
           AS mass_shared,
         CAST(max(n_types) AS BIGINT) AS max_bucket_types
  FROM allr GROUP BY dims
)
SELECT dims, n_types, n_buckets_used,
       n_types * 1000 {dv} dims AS load_milli,
       n_types_shared,
       n_types_shared * 1000 {dv} n_types AS type_collision_permille,
       mass_shared * 1000 {dv} token_mass AS mass_collision_permille,
       max_bucket_types
FROM rep
"""


@query(
    "feature_hashing_collision_report",
    oracle=_fh_sql("duck", "documents"),
    tags=("trainprep", "learning"),
)
def feature_hashing_collision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger 2009) priced — fastText-style
    models never build a vocabulary; they hash features straight
    into a fixed weight table, and the ONLY design decision is the
    table size. This report measures that decision on the corpus's
    own feature stream — fastText's wordNgrams=3 surface (unigrams +
    word bigrams + word trigrams; the n-gram features are the whole
    POINT of the trick, since enumerating them as a vocabulary is
    what does not scale) — across the 1k-to-64k dimension ladder:
    per rung, bucket occupancy, the share of feature TYPES sharing a
    bucket (parameter aliasing), and the share of token MASS in
    shared buckets — the quantity that actually moves training loss,
    because a collision hurts in proportion to how often its
    features occur. All exact integers from ONE type histogram
    (md5-portable buckets, both engines bit-identical).

    Measured (sf0.01 / sf0.1 — 17,192 / 28,175 feature types): at
    1k dims EVERYTHING collides (1000 permille, max 29 / 45 types
    per bucket); the ladder drains to 234 / 345 permille of types
    at 64k. The decision-grade detail is the mass-vs-type GAP: mass
    collision reads BELOW type collision at every roomy rung (196
    vs 234 permille at sf0.01/64k) — the Zipf head is ~31 unigram
    types carrying most of the mass, and a handful of frequent
    types is statistically hard to hit — so aliasing lands mostly
    on the rare-tail n-grams, exactly the features a linear model
    can afford to alias. Read-off: ~4x type headroom (64k dims for
    17k types) buys a sub-25% aliased-type share and less aliased
    mass; fastText's 2M-bucket default for ~200k-type corpora is
    the same ~10x rule.

    Scale: one scan-side n-gram burst + one map-side-combinable
    type histogram (bounded by the FEATURE VOCABULARY, not the
    corpus); each rung is a re-aggregation of that type table. At
    100 TB the type table is the only shuffled state (hundreds of
    millions of rows, trivially partitioned by feature).
    """
    tune(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__fh_documents")
    return spark.sql(_fh_sql("spark", "__fh_documents"))
