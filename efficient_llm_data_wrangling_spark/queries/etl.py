"""Snapshot-maintenance ETL operators a recurring training-data
pipeline needs between crawls: keyed upsert (SCD1 merge), snapshot
diff (CDC-style added/removed/changed), composition ratios, and the
string-function surface.

Registry.py hash conventions apply (identical aliases, exact integer /
decimal aggregates, no raw-double sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table


def _dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


# --------------------------------------------------------------------------
# Keyed upsert (SCD1 merge): delta wins, base fills the rest
# --------------------------------------------------------------------------

def upsert_by_key(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """MERGE-style SCD1 upsert: every key in ``delta`` replaces its
    ``base`` row; unmatched base rows pass through.

    Shape: ``delta ∪ (base ⟕̸ delta)`` — one left-anti join on the key
    plus a union, both streaming-friendly. At scale the anti join
    shuffles on the same key as any downstream keyed write, so the
    exchange is reusable; when delta is small (the common incremental
    case) Catalyst broadcasts it and the base side never shuffles.
    """
    survivors = base.join(delta.select(key), on=key, how="left_anti")
    return delta.unionByName(survivors)


_UPSERT_ORACLE = """
WITH delta AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1 AS DECIMAL(19,3)) AS price,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(price AS VARCHAR) AS price_str,
       o_orderpriority
FROM delta
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS VARCHAR) AS price_str,
       o_orderpriority
FROM orders WHERE o_orderkey % 10 <> 0
"""


@query("upsert_snapshot_orders", oracle=_UPSERT_ORACLE, tags=("etl", "join"))
def upsert_snapshot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert of a synthetic delta (every 10th order repriced
    +10%) into the orders snapshot via :func:`upsert_by_key`.

    Hash-convention note: the reprice runs in EXACT decimal arithmetic
    (decimal(18,2) × 1.1 → scale 3) on both engines — quantizing a
    computed double back to decimal is engine-divergent on shortest-
    representation ties (Spark casts via Double.toString + HALF_UP;
    DuckDB rounds the binary value), ~0.2% of rows here."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        _dec("o_totalprice").cast("decimal(19,3)").alias("price"),
        "o_orderpriority",
    )
    delta = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "price",
        (F.col("price").cast("decimal(18,2)") * F.lit("1.1").cast("decimal(2,1)"))
        .cast("decimal(19,3)"),
    )
    merged = upsert_by_key(o, delta, "o_orderkey")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("price").cast("string").alias("price_str"),
        "o_orderpriority",
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC): added / removed / changed between two versions
# --------------------------------------------------------------------------

def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Keyed diff of two snapshot versions → rows tagged ``added`` /
    ``removed`` / ``changed`` (unchanged rows are dropped — at 100 TB
    the diff output is the small side, so filtering early keeps the
    result proportional to the churn, not the corpus).

    One full-outer join on the key — a single co-partitioned shuffle;
    change detection is null-safe equality (``<=>``) on the compared
    columns, JVM-side.
    """
    o = old.select(key, *compare_cols)
    n = new.select(key, *compare_cols)
    on = o.alias("o").join(
        n.alias("n"), F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer"
    )
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(F.col(f"o.{key}").isNull(), "added")
        .when(F.col(f"n.{key}").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        on.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            F.col("status"),
        )
    )


_DIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 7 <> 0
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
  CASE WHEN old.o_orderkey IS NULL THEN 'added'
       WHEN new.o_orderkey IS NULL THEN 'removed'
       WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'changed'
  END AS status
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE CASE WHEN old.o_orderkey IS NULL THEN 'added'
           WHEN new.o_orderkey IS NULL THEN 'removed'
           WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'changed'
      END IS NOT NULL
"""


@query("snapshot_diff_orders", oracle=_DIFF_ORACLE, tags=("etl", "join"))
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff between two synthetic snapshot versions of orders
    (drop every 7th key from old, every 11th from new, restatus every
    5th) via :func:`snapshot_diff`."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    return snapshot_diff(old, new, "o_orderkey", ["o_orderstatus"])


# --------------------------------------------------------------------------
# Composition ratios (corpus monitoring)
# --------------------------------------------------------------------------

_SHARE_ORACLE = """
SELECT source, lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY source) AS share
FROM documents
GROUP BY source, lang
"""


@query("lang_share_by_source", oracle=_SHARE_ORACLE, tags=("etl", "text", "agg"))
def lang_share_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition monitor: language share within each source.
    Aggregate first (tiny result), THEN the ratio window runs over the
    aggregated rows — cardinality = |source × lang|, so the window cost
    is independent of corpus size. Exact int/int division is
    bit-identical across engines."""
    tune(spark)
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(W.partitionBy("source"))
    return counts.withColumn(
        "share", F.col("n_docs").cast("double") / total
    )


# --------------------------------------------------------------------------
# String function surface
# --------------------------------------------------------------------------

_STRFN_ORACLE = """
SELECT c_custkey,
  upper(c_name) AS name_upper,
  lower(c_mktsegment) AS seg_lower,
  substring(c_name, 1, 8) AS name_prefix,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
  regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
  replace(c_name, 'Customer', 'Cust') AS name_short,
  reverse(c_mktsegment) AS seg_rev,
  CAST(length(c_name) AS INT) AS name_len,
  concat_ws('|', c_mktsegment, c_name) AS seg_name
FROM customer
"""


@query("string_functions_customer", oracle=_STRFN_ORACLE, tags=("functions",))
def string_functions_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface — upper/lower/substring/lpad/
    regexp_extract/replace/reverse/length/concat_ws — all JVM column
    expressions in one whole-stage-codegen project over the scan."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("name_num"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
    )


# --------------------------------------------------------------------------
# PII redaction (text-pipeline hygiene)
# --------------------------------------------------------------------------

_REDACT_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
    text || ' contact user' || doc_id || '@example.com or +1-555-01' || doc_id % 100 || ' now' AS dirty
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\+?[0-9][0-9()\-]{6,}[0-9]', '<PHONE>', 'g') AS clean
FROM d
"""


@query("mask_contacts_documents", oracle=_REDACT_ORACLE, tags=("etl", "text"))
def mask_contacts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email + phone masking with chained
    ``regexp_replace`` — JVM-side regex inside whole-stage codegen, no
    UDF; the hygiene pass every LLM training corpus gets. Deterministic
    fake PII is injected per doc_id so the masks are actually exercised
    (the synthetic corpus contains none)."""
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"), (F.col("doc_id") % 100).cast("string"),
        F.lit(" now"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\-]{6,}[0-9]"
    clean = F.regexp_replace(
        F.regexp_replace(dirty, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select("doc_id", clean.alias("clean"))


# --------------------------------------------------------------------------
# Word counts (tokenize + explode + top-k)
# --------------------------------------------------------------------------

_WC_ORACLE = """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM w WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 100
"""


@query("word_counts_documents", oracle=_WC_ORACLE, tags=("etl", "text", "agg"))
def word_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-explode-count, the canonical corpus profile: explode is
    a generator (no shuffle), the count is map-side partial, and top-k
    compiles to TakeOrdered (no global sort materialization). Total
    (n desc, word) ordering makes the LIMIT deterministic."""
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Date spine generation (calendar dimension)
# --------------------------------------------------------------------------

_SPINE_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi FROM orders
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
),
o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n FROM orders GROUP BY 1
)
SELECT CAST(spine.d AS VARCHAR)[1:10] AS day,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
FROM spine LEFT JOIN o ON spine.d = CAST(o.d AS DATE)
"""


@query("date_spine_order_counts", oracle=_SPINE_ORACLE, tags=("etl", "temporal"))
def date_spine_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine (``sequence`` + ``explode`` — generated,
    not scanned) left-joined to daily order counts so zero-activity
    days appear explicitly. The spine is ~2400 rows regardless of fact
    size, so it broadcasts; gap-free time series are what downstream
    trend/backfill jobs assume."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        F.broadcast(spine)
        .join(daily, "d", "left")
        .select(
            F.col("d").cast("string").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance under erasure (retractable rollups)
# ---------------------------------------------------------------------------

#: erased slice: orders whose md5(o_orderkey) first hex digit is 15
#: (1/16 — the right-to-be-forgotten batch hitting the warehouse).
_IVM_BUCKET = (
    "instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS {vc})), 1, 1)) - 1"
)

_IVM_ORACLE = f"""
WITH b AS (
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS BIGINT) AS n_base,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_cents,
         CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS max_base_cents
  FROM orders GROUP BY o_orderpriority
),
e AS (
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS BIGINT) AS n_erased,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_erased_cents,
         CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS max_erased_cents
  FROM orders WHERE {_IVM_BUCKET.format(vc='VARCHAR')} = 15
  GROUP BY o_orderpriority
),
s AS (
  -- the ORACLE side maintains nothing: it recomputes the surviving
  -- rollup directly, so hash equality with the Spark side's
  -- base-minus-retraction IS the IVM correctness statement
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS BIGINT) AS n_maintained,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS sum_maintained_cents,
         CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS max_surviving_cents
  FROM orders WHERE {_IVM_BUCKET.format(vc='VARCHAR')} <> 15
  GROUP BY o_orderpriority
)
SELECT b.grp,
       b.n_base, CAST(COALESCE(e.n_erased, 0) AS BIGINT) AS n_erased,
       s.n_maintained,
       b.sum_base_cents,
       CAST(COALESCE(e.sum_erased_cents, 0) AS BIGINT) AS sum_erased_cents,
       s.sum_maintained_cents,
       b.max_base_cents,
       COALESCE(e.max_erased_cents = b.max_base_cents, FALSE) AS max_invalidated,
       s.max_surviving_cents
FROM b JOIN s ON b.grp = s.grp LEFT JOIN e ON b.grp = e.grp
"""


@query("ivm_erasure_rollup", oracle=_IVM_ORACLE, tags=("etl", "agg", "privacy"))
def ivm_erasure_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under ERASURE — what the
    warehouse's standing rollups do when the right-to-be-forgotten
    batch lands (``user_erasure_manifest`` names the rows; THIS is how
    the aggregates forget them without rescanning the base): per
    order-priority group, the maintained count and sum are computed as
    base MINUS the retraction batch's aggregate — count and sum are
    self-maintainable under deletion — while the ORACLE recomputes the
    surviving rollup directly from the filtered table, so the driver's
    hash equality IS the IVM correctness theorem (base − Δ ≡
    recompute). MAX is the honest counter-example: it is NOT
    self-maintainable under deletion, and ``max_invalidated`` flags
    exactly the groups whose erased slice contained a row achieving
    the group max — the groups where a real maintenance job must pay
    the rescan that ``max_surviving_cents`` represents. Measured: the
    1/16 erasure batch invalidates the max in 1 of 5 groups at
    sf0.001 and 0 of 5 at sf0.01 (the max row rarely falls in the
    batch — which is the point: the rescan is the exception); sums
    and counts never need it.

    Scale: the maintained path touches the base rollup (already
    standing) plus ONE pass over the erased slice — at 100 TB the
    erasure batch is key-addressable and tiny, so the retraction
    aggregate is the cheap side; only max-invalidated groups pay a
    group-pruned rescan. Exact integer cents throughout.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    bucket = F.expr(_IVM_BUCKET.format(vc="STRING"))
    base = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_base"),
        F.sum(cents).cast("long").alias("sum_base_cents"),
        F.max(cents).cast("long").alias("max_base_cents"),
    )
    er = (
        orders.filter(bucket == 15)
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_erased"),
            F.sum(cents).cast("long").alias("sum_erased_cents"),
            F.max(cents).cast("long").alias("max_erased_cents"),
        )
    )
    # the maintained values are DERIVED (base − Δ), never recomputed;
    # only the max column — the non-maintainable aggregate — rescans,
    # and only to report what the invalidated groups would pay for
    surv_max = (
        orders.filter(bucket != 15)
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.max(cents).cast("long").alias("max_surviving_cents"))
    )
    return (
        base.join(er, "grp", "left")
        .join(surv_max, "grp")
        .select(
            "grp",
            "n_base",
            F.coalesce("n_erased", F.lit(0)).cast("long").alias("n_erased"),
            F.expr("CAST(n_base - coalesce(n_erased, 0) AS BIGINT)").alias(
                "n_maintained"
            ),
            "sum_base_cents",
            F.coalesce("sum_erased_cents", F.lit(0))
            .cast("long")
            .alias("sum_erased_cents"),
            F.expr(
                "CAST(sum_base_cents - coalesce(sum_erased_cents, 0) AS BIGINT)"
            ).alias("sum_maintained_cents"),
            "max_base_cents",
            F.expr(
                "coalesce(max_erased_cents = max_base_cents, FALSE)"
            ).alias("max_invalidated"),
            "max_surviving_cents",
        )
    )


# ---------------------------------------------------------------------------
# Schema/statistics drift report (the data-contract check)
# ---------------------------------------------------------------------------

#: profiled event columns by CLASS — the contract check differs:
#: categorical columns are checked for UNSEEN values (an enum
#: exploding into free text), continuous columns for OUT-OF-RANGE
#: values (a unit change / sensor fault) — NDV-per-row density is NOT
#: a valid invariant (distincts saturate: a stationary corpus read a
#: 3.8x density "shift" on user_id at the smoke SF purely because the
#: 15-user domain saturates in both slices).
_SDRIFT_CAT = ("user_id", "event_type", "props")
_SDRIFT_NUM = ("value",)
_SDRIFT_COLS = _SDRIFT_CAT + _SDRIFT_NUM
_SDRIFT_NULL_BAR_PM = 50  # null-rate shift alert (permille points)
_SDRIFT_UNSEEN_BAR_PM = 500  # unseen share of the batch's distincts
_SDRIFT_OOR_BAR_PM = 50  # out-of-old-range share of new non-nulls
_SDRIFT_NEW_DAYS = 7  # the "new batch": the last 7 version-days


def _sdrift_sql(dv: str) -> str:
    """Engine-portable body over views ``__sdold``/``__sdnew`` (the
    pre-cutoff corpus and the arriving batch, same schema): ONE
    aggregate per side computes every column's row/null/NDV counts
    (multi-DISTINCT in one pass — Expand, not one scan per column),
    per-class domain probes (distinct anti-join for categorical,
    range count for continuous), then a |columns|-row comparison with
    integer drift bars."""
    aggs = ", ".join(
        f"CAST(count({c}) AS BIGINT) AS nn_{c},"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}"
        for c in _SDRIFT_COLS
    )
    legs = []
    for c in _SDRIFT_COLS:
        if c in _SDRIFT_CAT:
            unseen = (
                f"(SELECT CAST(count(*) AS BIGINT) FROM"
                f" (SELECT DISTINCT {c} AS v FROM __sdnew WHERE {c} IS NOT NULL) nv"
                f" WHERE NOT EXISTS (SELECT 1 FROM __sdold o2 WHERE o2.{c} = nv.v))"
            )
            oor = "CAST(-1 AS BIGINT)"
        else:
            unseen = "CAST(-1 AS BIGINT)"
            oor = (
                f"(SELECT CAST(count(*) AS BIGINT) FROM __sdnew"
                f" WHERE {c} IS NOT NULL"
                f" AND ({c} < (SELECT min({c}) FROM __sdold)"
                f" OR {c} > (SELECT max({c}) FROM __sdold)))"
            )
        legs.append(f"""SELECT '{c}' AS column_name,
       o.n AS n_old, w.n AS n_new,
       o.nn_{c} AS nn_old, w.nn_{c} AS nn_new,
       o.nd_{c} AS ndv_old, w.nd_{c} AS ndv_new,
       {unseen} AS n_unseen_new,
       {oor} AS n_oor_new
FROM o, w""")
    body = "\nUNION ALL\n".join(legs)
    return f"""
WITH o AS (SELECT CAST(count(*) AS BIGINT) AS n, {aggs} FROM __sdold),
w AS (SELECT CAST(count(*) AS BIGINT) AS n, {aggs} FROM __sdnew),
m AS (
{body}
)
SELECT column_name, n_old, n_new,
       CAST((n_old - nn_old) * 1000 {dv} n_old AS BIGINT) AS null_old_pm,
       CAST((n_new - nn_new) * 1000 {dv} n_new AS BIGINT) AS null_new_pm,
       ndv_old, ndv_new,
       CASE WHEN (n_old - nn_old) * 1000 {dv} n_old
                 >= (n_new - nn_new) * 1000 {dv} n_new
            THEN (n_old - nn_old) * 1000 {dv} n_old
                 - (n_new - nn_new) * 1000 {dv} n_new
                 > {_SDRIFT_NULL_BAR_PM}
            ELSE (n_new - nn_new) * 1000 {dv} n_new
                 - (n_old - nn_old) * 1000 {dv} n_old
                 > {_SDRIFT_NULL_BAR_PM} END AS null_drift,
       n_unseen_new,
       CAST(CASE WHEN n_unseen_new >= 0
                 THEN n_unseen_new * 1000
                      {dv} CASE WHEN ndv_new > 0 THEN ndv_new ELSE 1 END
                 ELSE -1 END AS BIGINT) AS unseen_share_pm,
       n_oor_new,
       CAST(CASE WHEN n_oor_new >= 0
                 THEN n_oor_new * 1000
                      {dv} CASE WHEN nn_new > 0 THEN nn_new ELSE 1 END
                 ELSE -1 END AS BIGINT) AS oor_new_pm,
       (n_unseen_new >= 0 AND n_unseen_new * 1000
          {dv} CASE WHEN ndv_new > 0 THEN ndv_new ELSE 1 END
          > {_SDRIFT_UNSEEN_BAR_PM})
       OR (n_oor_new >= 0 AND n_oor_new * 1000
          {dv} CASE WHEN nn_new > 0 THEN nn_new ELSE 1 END
          > {_SDRIFT_OOR_BAR_PM}) AS domain_drift
FROM m
"""


_SDRIFT_CUT = (
    "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400"
    " >= (SELECT max(CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400)"
    f" - {_SDRIFT_NEW_DAYS} + 1 FROM events)"
)

_SDRIFT_ORACLE = (
    f"WITH __sdold AS (SELECT * FROM events WHERE NOT ({_SDRIFT_CUT})),\n"
    f"__sdnew AS (SELECT * FROM events WHERE {_SDRIFT_CUT}),\n"
    + _sdrift_sql("//").strip().removeprefix("WITH ")
)


@query("schema_drift_report", oracle=_SDRIFT_ORACLE, tags=("etl", "dq", "diagnostics"))
def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATA-CONTRACT check an ingest pipeline runs before merging
    an arriving batch — per profiled column, the old-corpus vs
    new-batch statistics a schema-drift monitor compares: row counts,
    null rate (exact per-mille), exact distinct counts, and two
    integer-bar verdicts — a >{_SDRIFT_NULL_BAR_PM}‰ null-rate shift
    (an upstream field going dark arrives as a null-rate step) and a
    CLASS-appropriate domain check: categorical columns flag when
    >{_SDRIFT_UNSEEN_BAR_PM}‰ of the batch's distinct values were
    never seen in the corpus (an enum exploding into free text),
    continuous columns when >{_SDRIFT_OOR_BAR_PM}‰ of new non-nulls
    fall outside the corpus [min, max] (a unit change or sensor
    fault). The class split is load-bearing and was measured, not
    assumed: NDV-per-row density — the first bar tried here — reads a
    3.8× "shift" on a STATIONARY corpus at the smoke SF because the
    15-user domain saturates in both slices; unseen-share is immune
    to saturation. The split is the retention plan's version line:
    the last {_SDRIFT_NEW_DAYS} days are "the batch". This is the
    column-level companion of ``dq_expectations_orders`` (row rules)
    and ``mixture_drift_report`` (composition): together they are the
    three alarms a 100 TB ingest gate pages on.

    Scale: ONE aggregate per side computes every column's counts —
    the multi-DISTINCT compiles to a single-scan Expand, not a scan
    per column — then the report is a |columns|-row comparison of two
    1-row frames plus one bounded domain probe per column (the
    categorical anti-join runs distinct-set vs distinct-set — at
    100 TB that set is the column dictionary, or a Bloom sketch of it
    for id columns; the range probe is a broadcast 1-row min/max).
    Integer arithmetic throughout.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400")
    cut = ev.agg(
        (F.max(day) - F.lit(_SDRIFT_NEW_DAYS) + F.lit(1)).alias("min_new")
    )
    evc = ev.crossJoin(F.broadcast(cut))
    evc.filter(day < F.col("min_new")).createOrReplaceTempView("__sdold")
    evc.filter(day >= F.col("min_new")).createOrReplaceTempView("__sdnew")
    return spark.sql(_sdrift_sql("div"))
