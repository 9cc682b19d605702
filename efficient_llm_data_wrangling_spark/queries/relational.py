"""Relational wrangling core queries (SURVEY.md §2.1–2.6).

Each query exercises one (or a tight cluster of) reference operators on
the driver's synthetic tables, with a DuckDB oracle that restates the
semantics independently. See registry.py for the Spark↔DuckDB hash
conventions (decimal-exact aggregates, identical aliases, NTZ
timestamps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import metrics as M
from efficient_llm_data_wrangling_spark.operators import joins as JN
from efficient_llm_data_wrangling_spark.operators import sampling as SAMP
from efficient_llm_data_wrangling_spark.operators.serialize import serialize_keyed, serialize_values
from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import ensure_parallelism, tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table


def _dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


# --------------------------------------------------------------------------
# Flagship: entity-pair construction (J1 + J2 + P2 + P7)
# --------------------------------------------------------------------------

_PAIR_ORACLE = """
SELECT
  o_orderkey,
  concat(
    'o_orderstatus: ', coalesce(trim(CAST(o_orderstatus AS VARCHAR)), 'nan'),
    ' ^ o_totalprice: ', coalesce(trim(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)), 'nan'),
    ' ^ o_orderpriority: ', coalesce(trim(CAST(o_orderpriority AS VARCHAR)), 'nan'),
    ' ^ c_name: ', coalesce(trim(CAST(c_name AS VARCHAR)), 'nan'),
    ' ^ c_mktsegment: ', coalesce(trim(CAST(c_mktsegment AS VARCHAR)), 'nan'),
    ' ^ n_name: ', coalesce(trim(CAST(n_name AS VARCHAR)), 'nan')
  ) AS text,
  CASE WHEN o_orderstatus = 'F' THEN 'Yes' ELSE 'No' END AS label_str
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""


@query("pair_join_text", oracle=_PAIR_ORACLE, tags=("flagship", "join", "serialize"))
def pair_join_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's densest relational pipeline — blocked-pairs
    construction (fast_ai_wrangler/utils/data_utils.py:104-125): two
    equi-joins onto dimension tables, keyed row serialization (P2,
    data_utils.py:63-79), derived Yes/No label (P7, :122).

    Scale: customer and nation are dimensions → broadcast joins; the
    orders fact table streams through with zero shuffles.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    ).join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    text = serialize_keyed(
        [
            ("o_orderstatus", F.col("o_orderstatus")),
            ("o_totalprice", _dec("o_totalprice")),
            ("o_orderpriority", F.col("o_orderpriority")),
            ("c_name", F.col("c_name")),
            ("c_mktsegment", F.col("c_mktsegment")),
            ("n_name", F.col("n_name")),
        ]
    )
    label = F.when(F.col("o_orderstatus") == "F", "Yes").otherwise("No")
    return joined.select(
        F.col("o_orderkey"), text.alias("text"), label.alias("label_str")
    )


# --------------------------------------------------------------------------
# Serialization (P2 / P3)
# --------------------------------------------------------------------------

_SER_KEYED_ORACLE = """
SELECT
  p_partkey,
  concat(
    'p_name: ', coalesce(trim(CAST(p_name AS VARCHAR)), 'nan'),
    ' ^ p_brand: ', coalesce(trim(CAST(p_brand AS VARCHAR)), 'nan'),
    ' ^ p_type: ', coalesce(trim(CAST(p_type AS VARCHAR)), 'nan'),
    ' ^ p_size: ', coalesce(trim(CAST(p_size AS VARCHAR)), 'nan'),
    ' ^ p_retailprice: ', coalesce(trim(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR)), 'nan')
  ) AS text
FROM part
"""


@query("serialize_keyed_part", oracle=_SER_KEYED_ORACLE, tags=("serialize",))
def serialize_keyed_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — ``"col: val ^ col: val"`` row serialization
    (data_utils.py:63-79) as a pure column expression (no UDF)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    text = serialize_keyed(
        [
            ("p_name", F.col("p_name")),
            ("p_brand", F.col("p_brand")),
            ("p_type", F.col("p_type")),
            ("p_size", F.col("p_size")),
            ("p_retailprice", _dec("p_retailprice")),
        ]
    )
    return part.select("p_partkey", text.alias("text"))


_SER_VALUES_ORACLE = """
SELECT
  c_custkey,
  concat_ws('^',
    coalesce(trim(CAST(c_name AS VARCHAR)), 'nan'),
    coalesce(trim(CAST(c_nationkey AS VARCHAR)), 'nan'),
    coalesce(trim(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)), 'nan'),
    coalesce(trim(CAST(c_mktsegment AS VARCHAR)), 'nan')
  ) AS text
FROM customer
"""


@query("serialize_values_customer", oracle=_SER_VALUES_ORACLE, tags=("serialize",))
def serialize_values_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — values-only ``^``-joined serialization (data_utils.py:82-95)."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    text = serialize_values(
        [F.col("c_name"), F.col("c_nationkey"), _dec("c_acctbal"), F.col("c_mktsegment")]
    )
    return customer.select("c_custkey", text.alias("text"))


# --------------------------------------------------------------------------
# Projection / filter / derived label (P1, P7, P8)
# --------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity > 30 AND l_returnflag <> 'N' AND l_shipdate >= TIMESTAMP '1997-06-01'
"""


@query("filter_project_lineitem", oracle=_FILTER_ORACLE, tags=("filter",))
def filter_project_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + P8 — projection and conjunctive predicates; both the filter
    and the 4-column ReadSchema push into the parquet scan
    (verify with .explain: PushedFilters)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_returnflag") != "N")
            & (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


_LABEL_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_orderstatus = 'F' THEN 'Yes' ELSE 'No' END AS label_str,
  CASE WHEN o_totalprice > 200000 THEN 'yes' ELSE 'no' END AS flag_lower
FROM orders
"""


@query("derived_label_orders", oracle=_LABEL_ORACLE, tags=("project",))
def derived_label_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — derived Yes/No label columns (data_utils.py:122,167)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "Yes").otherwise("No").alias("label_str"),
        F.when(F.col("o_totalprice") > 200000, "yes").otherwise("no").alias("flag_lower"),
    )


# --------------------------------------------------------------------------
# Aggregations (A1 / A2 / A5)
# --------------------------------------------------------------------------

_COUNTS_ORACLE = """
SELECT l_returnflag AS label, CAST(count(*) AS BIGINT) AS count
FROM lineitem GROUP BY l_returnflag
"""


@query("label_counts", oracle=_COUNTS_ORACLE, tags=("agg",))
def label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-class counts (data_utils.py:339). Map-side partial
    aggregation: the shuffle carries one row per class per partition."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return M.label_counts(li.withColumnRenamed("l_returnflag", "label"), "label")


_MIN_CLASS_ORACLE = """
SELECT CAST(min(cnt) AS BIGINT) AS min_count
FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_returnflag)
"""


@query("min_class_count", oracle=_MIN_CLASS_ORACLE, tags=("agg",))
def min_class_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — smallest class size (data_utils.py:340)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return M.min_class_count(li, "l_returnflag")


_TRIAL_STATS_ORACLE = """
SELECT
  l_returnflag,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS mean_qty,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
"""


@query("group_mean_qty", oracle=_TRIAL_STATS_ORACLE, tags=("agg",))
def group_mean_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — mean per group, decimal-exact then cast to double so the
    value is identical across engines regardless of summation order."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("mean_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Comparator + confusion metrics (A3 / A4, F7–F9)
# --------------------------------------------------------------------------

_CONFUSION_ORACLE = """
WITH scored AS (
  SELECT
    CASE WHEN o_orderstatus = 'F' THEN 'yes' ELSE 'no' END AS gold,
    CASE WHEN o_totalprice > 150000 THEN 'yes' ELSE 'no' END AS pred
  FROM orders
), m AS (
  SELECT
    CAST(sum(CASE WHEN gold = 'yes' AND pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN gold = 'no'  AND pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS tn,
    CAST(sum(CASE WHEN gold = 'no'  AND pred <> gold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN gold = 'yes' AND pred <> gold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS crc,
    CAST(count(*) AS BIGINT) AS total
  FROM scored
)
SELECT
  tp, tn, fp, fn, crc, total,
  CAST(tp AS DOUBLE) / greatest(1, tp + fp) AS prec,
  CAST(tp AS DOUBLE) / greatest(1, tp + fn) AS rec,
  CAST(crc AS DOUBLE) / total AS acc,
  2 * (CAST(tp AS DOUBLE) / greatest(1, tp + fp)) * (CAST(tp AS DOUBLE) / greatest(1, tp + fn))
    / greatest(CAST(1.0 AS DOUBLE), CAST(tp AS DOUBLE) / greatest(1, tp + fp) + CAST(tp AS DOUBLE) / greatest(1, tp + fn)) AS f1
FROM m
"""


@query("confusion_metrics", oracle=_CONFUSION_ORACLE, tags=("metrics",))
def confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — tp/tn/fp/fn/crc/total → prec/rec/acc/f1 with the
    reference's exact ``max(1, ·)`` guards (utils.py:83-128), on a
    rule-derived pred/gold pair so the oracle restates the semantics
    independently of the comparator implementation."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", "yes").otherwise("no").alias("gold"),
        F.when(F.col("o_totalprice") > 150000, "yes").otherwise("no").alias("pred"),
    )
    out = M.confusion_metrics(scored, pred_col="pred", gold_col="gold")
    return out.select(
        "tp", "tn", "fp", "fn", "crc", "total",
        F.col("prec").cast("double").alias("prec"),
        F.col("rec").cast("double").alias("rec"),
        F.col("acc").cast("double").alias("acc"),
        F.col("f1").cast("double").alias("f1"),
    )


_TOLERANCE_ORACLE = """
-- Expected matches restated independently: pred shifts l_discount by
-- +0.03 on orderkey%3=0 rows (outside tolerance 0.021), +0.01 otherwise
-- (inside). Rows with linenumber=1 compare '1/4' vs '1.01 4.02': the
-- reference regex's fraction branch is dead code (group capture makes
-- the digit alternative always win), so '1/4' extracts [1, 4] which
-- matches [1.01, 4.02] element-wise within 0.021.
SELECT
  CAST(sum(CASE WHEN l_linenumber = 1 OR l_orderkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS matched,
  CAST(count(*) AS BIGINT) AS total
FROM lineitem
"""


@query("comparator_tolerance", oracle=_TOLERANCE_ORACLE, tags=("metrics", "comparator"))
def comparator_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8 — the numeric-tolerance comparator (|a−b| ≤ 0.021 on
    extracted magnitudes, utils.py:20-80) validated against ground
    truth the oracle computes from first principles, including the
    dead-fraction-branch quirk (see operators/metrics.py)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    shift = F.when(F.col("l_orderkey") % 3 == 0, 0.03).otherwise(0.01)
    pred = F.when(F.col("l_linenumber") == 1, F.lit("1/4")).otherwise(
        F.format_number(_dec("l_discount") + _dec(shift), 2)
    )
    gold = F.when(F.col("l_linenumber") == 1, F.lit("1.01 4.02")).otherwise(
        F.format_number(_dec("l_discount"), 2)
    )
    # the comparator is regex-heavy per row; spread the single-row-group
    # local scan across cores before evaluating it (no-op at scale)
    pg = ensure_parallelism(li.select(pred.alias("__p"), gold.alias("__g")))
    scored = pg.select(M.answers_match(F.col("__p"), F.col("__g")).alias("crc"))
    return scored.agg(
        F.sum(F.when(F.col("crc"), 1).otherwise(0)).alias("matched"),
        F.count(F.lit(1)).alias("total"),
    )


# --------------------------------------------------------------------------
# TPC-H-flavoured analytics (bench headliners)
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "bench"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the canonical scan-heavy
    aggregate (beyond the reference's A-ops, SURVEY §2.10). Decimal
    aggregation keeps results order-independent; partial aggregation
    means the shuffle is O(groups), not O(rows)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (_dec("l_quantity"), _dec("l_extendedprice"), _dec("l_discount"), _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("top_orders", oracle=_TOPK_ORACLE, tags=("sort", "limit"))
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 — top-k by score with a total tiebreak (run_wrangler.py:
    210-213 best-of selection, generalized). Spark plans this as
    TakeOrderedAndProject — no full sort at scale."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_MULTISORT_ORACLE = """
-- events.ts is TIMESTAMP_NS in parquet; Spark reads at microsecond
-- precision, so truncate to microseconds here too.
SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
  CAST(row_number() OVER (ORDER BY event_type, CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn
FROM events
WHERE value > 90
"""


@query("multi_key_rank_events", oracle=_MULTISORT_ORACLE, tags=("sort", "window"))
def multi_key_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — multi-key lexicographic alignment (data_utils.py:226-246)
    carried as an explicit rank column instead of list position
    (SURVEY §7 risk 5). Uses the scalable two-pass global rank
    (range-partition → parallel local rank → broadcast offsets), NOT a
    partitionless window that would drag everything to one task."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 90)
    keys = ["event_type", "ts", "event_id"]
    return SAMP.global_rank(ev.select("event_id", "event_type", "ts"), keys).select(
        "event_id", "event_type", "ts", "rn"
    )


# --------------------------------------------------------------------------
# Set ops + semi/anti joins (U1 and SURVEY §2.10 gap list)
# --------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT c_custkey, c_name, 'big_balance' AS src FROM customer WHERE c_acctbal > 5000
UNION ALL
SELECT c_custkey, c_name, 'automobile' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
"""


@query("union_all_topup", oracle=_UNION_ORACLE, tags=("setop",))
def union_all_topup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — union-all concat (data_utils.py:59 ``pd.concat``) via
    ``unionByName``."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", F.lit("big_balance").alias("src")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_name", F.lit("automobile").alias("src")
    )
    return a.unionByName(b)


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@query("semi_join_customers", oracle=_SEMI_ORACLE, tags=("join",))
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi join (SURVEY §2.10 gap list — needed by dedup flows):
    customers having at least one big order."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("anti_join_customers", oracle=_ANTI_ORACLE, tags=("join",))
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-anti join — customers with no orders."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Window + JSON (SURVEY §2.10 gap list, driver north star)
# --------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


@query("window_top_order_per_customer", oracle=_WINDOW_ORACLE, tags=("window",))
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number top-1 per key — the scalable form of the
    reference's per-group argmax selections (run_wrangler.py:210-213)."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE event_type = 'click'
"""


@query("json_extract_events", oracle=_JSON_ORACLE, tags=("json",))
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column
    (driver north star; SURVEY §7 Phase 4)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


# --------------------------------------------------------------------------
# Sampling / balancing (A6/A7, O5, P11) — key-deterministic variants
# --------------------------------------------------------------------------

_HEADK_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
ORDER BY c_custkey LIMIT 100
"""


@query("sample_head_k", oracle=_HEADK_ORACLE, tags=("sampling",))
def sample_head_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 (oracle-checkable variant) — exact-k sample in key order
    (data_utils.py:20-27; the seeded twin uses rand(seed) and is
    covered by determinism tests, since Spark's PRNG has no DuckDB
    equivalent). Plans as TakeOrderedAndProject: per-partition top-k,
    driver merge — no full sort at any scale."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return SAMP.sample_k_by_key(c, 100, "c_custkey")


_STRAT_ORACLE = """
SELECT o_orderkey, o_orderpriority FROM (
  SELECT o_orderkey, o_orderpriority,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn
  FROM orders
) WHERE rn <= 50
"""


@query("stratified_sample_orders", oracle=_STRAT_ORACLE, tags=("sampling",))
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (oracle-checkable variant) — first 50 rows per class in key
    order via window rank (data_utils.py:49-53 per-group sample). One
    shuffle on the (low-cardinality) label; rank cut prunes each group
    early."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return SAMP.stratified_sample_by_key(o, "o_orderpriority", 50, "o_orderkey")


_BALANCE_ORACLE = """
WITH m AS (
  SELECT min(n) AS mn FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderstatus)
)
SELECT o_orderkey, o_orderstatus FROM (
  SELECT o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
  FROM orders
), m WHERE rn <= m.mn
"""


@query("class_balance_orders", oracle=_BALANCE_ORACLE, tags=("sampling",))
def class_balance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (oracle-checkable variant) — every o_orderstatus class cut to
    the smallest class's size, key-ordered (data_utils.py:337-346). The
    min count broadcast-joins; the rank is the same single shuffle as
    A6."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return SAMP.class_balance_by_key(o, "o_orderstatus", "o_orderkey")


_SPLIT_ORACLE = """
SELECT c_custkey, c_name FROM (
  SELECT c_custkey, c_name, row_number() OVER (ORDER BY c_custkey) AS rn
  FROM customer
) WHERE rn > 1000
"""


@query("split_rest_customers", oracle=_SPLIT_ORACLE, tags=("sampling",))
def split_rest_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — head/rest split by explicit key (data_utils.py:216-217
    ``iloc[k:]`` re-expressed without list position, SURVEY §7 risk 5);
    returns the rest side, the train head is the same rank ≤ k cut."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    _, test = SAMP.split_head_rest(c, 1000, "c_custkey")
    return test


# --------------------------------------------------------------------------
# Temporal joins + multidimensional aggregates + set ops (§2.10 gap list)
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
       CAST(r.ts AS TIMESTAMP) AS asof_ts,
       r.event_id AS asof_event_id, r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@query("asof_join_events", oracle=_ASOF_ORACLE, tags=("join", "temporal"))
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks the user's most recent click
    at-or-before it. Implemented as the log-merge (union + keyed-window
    last(ignorenulls)) — ONE shuffle on user_id, linear work, no join
    node at all. DuckDB's native ASOF JOIN restates the semantics."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = JN.asof_join_backward(
        left, right, key="user_id", ts="ts", right_value_cols=["event_id", "value"]
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_ts").alias("asof_ts"),
        F.col("asof_event_id").alias("asof_event_id"),
        F.col("asof_value").alias("asof_value"),
    )


_RANGE_ORACLE = """
SELECT a.event_id AS event_id_l, b.event_id AS event_id_r,
       CAST(date_diff('microsecond', a.ts, b.ts) AS DOUBLE) / 1000000.0 AS gap_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND
"""


@query("range_join_events", oracle=_RANGE_ORACLE, tags=("join", "temporal"))
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range self-join (pairs of a user's events ≤ 5 minutes
    apart) via time-bucket quantization: the inequality join becomes an
    equi-join on (user, bucket ∈ {b, b+1}) + exact residual filter —
    shuffle keys stay uniform at any scale. Oracle = the plain
    inequality join."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    return JN.range_join_pairs(
        ev, ev, key="user_id", ts="ts", width_seconds=300,
        left_id="event_id", right_id="event_id",
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_pricing", oracle=_ROLLUP_ORACLE, tags=("agg",))
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total) with
    grouping_id to disambiguate NULL group markers — one pass, the
    expand node feeds the same partial-agg pipeline as a flat groupBy."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("decimal(18,2)").cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_orders", oracle=_CUBE_ORACLE, tags=("agg",))
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one
    expand+aggregate pass."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
"""


@query("intersect_customers", oracle=_INTERSECT_ORACLE, tags=("setop",))
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — rich customers who also placed a big
    order; Catalyst plans it as an aggregate + semi join."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.intersect(big)


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
"""


@query("except_customers", oracle=_EXCEPT_ORACLE, tags=("setop",))
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — the complementary anti side of the same
    pair, planned as an aggregate + anti join."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.exceptAll(big).distinct()


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok
FROM events GROUP BY event_type
"""


@query("approx_distinct_events", oracle=_APPROX_DISTINCT_ORACLE, tags=("agg", "approx"))
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ count-distinct at 1% rsd +
    approx_percentile sketch) per event_type — the sketches a 100 TB
    profiler uses instead of exact distincts. DuckDB's sketches differ
    by construction, so the oracle checks exact columns (``n``,
    ``exact_users``) for value parity and restates the sketch-error
    bounds as booleans: HLL within 5% of exact (5× the 1% rsd), approx
    p50 inside the exact [p45, p55] band, approx p95 inside
    [p90, max]. Driver-hash green ⟺ every bound held on every group."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("_ap50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("_ap95"),
        F.percentile("value", F.lit(0.45)).alias("_p45"),
        F.percentile("value", F.lit(0.55)).alias("_p55"),
        F.percentile("value", F.lit(0.90)).alias("_p90"),
        F.max("value").alias("_vmax"),
    )
    return agg.select(
        "event_type",
        "n",
        "exact_users",
        (
            F.abs(F.col("_approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("users_ok"),
        ((F.col("_ap50") >= F.col("_p45")) & (F.col("_ap50") <= F.col("_p55"))).alias(
            "p50_ok"
        ),
        ((F.col("_ap95") >= F.col("_p90")) & (F.col("_ap95") <= F.col("_vmax"))).alias(
            "p95_ok"
        ),
    )


_LEV_ORACLE = """
SELECT p.p_partkey, p.p_name, q.p_partkey AS cand_key, q.p_name AS cand_name,
       CAST(levenshtein(p.p_name, q.p_name) AS INT) AS dist
FROM part p JOIN part q
  ON p.p_brand = q.p_brand AND p.p_partkey < q.p_partkey
WHERE levenshtein(p.p_name, q.p_name) <= 5
"""


@query("levenshtein_match_parts", oracle=_LEV_ORACLE, tags=("join", "text"))
def levenshtein_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity matching (the Levenshtein branch the
    reference's prompts mandate, promptsTemplate.py:32-33) as a blocked
    join + JVM ``levenshtein`` — no Python in the pair loop. Brand
    blocking keeps candidate pairs linear-ish; the unblocked scale path
    is the MinHash-LSH family."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    p = part.select(F.col("p_partkey"), F.col("p_name"), F.col("p_brand"))
    q = part.select(
        F.col("p_partkey").alias("cand_key"),
        F.col("p_name").alias("cand_name"),
        F.col("p_brand").alias("__b"),
    )
    dist = F.levenshtein("p_name", "cand_name")
    return (
        p.join(q, (F.col("p_brand") == F.col("__b")) & (F.col("p_partkey") < F.col("cand_key")))
        .filter(dist <= 5)
        .select("p_partkey", "p_name", "cand_key", "cand_name", dist.alias("dist"))
    )


_ARRMAP_ORACLE = """
WITH t AS (
  SELECT l_orderkey,
         list_sort(list(l_linenumber)) AS lines,
         list_sort(list(DISTINCT l_returnflag)) AS flags
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(lines, ',') AS lines,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(lines[1] AS INT) AS first_line,
       array_to_string(list_sort(list_transform(lines, x -> x * 10)), ',') AS lines_x10,
       CAST(len(list_filter(lines, x -> x % 2 = 0)) AS INT) AS n_even,
       array_to_string(flags, ',') AS flags
FROM t
"""


@query("array_functions_lineitem", oracle=_ARRMAP_ORACLE, tags=("functions",))
def array_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface (collect_list/sort/transform/filter/
    element_at + collect_set) — the §2.10 gap-list functions as one
    grouped pipeline; both engines sort the collected arrays so the
    nondeterministic collect order never reaches the compare, and join
    them to strings (the hash compare treats cells as scalars)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    lines = F.array_sort(F.collect_list("l_linenumber"))
    return (
        li.groupBy("l_orderkey")
        .agg(
            lines.alias("lines"),
            F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
        )
        .select(
            "l_orderkey",
            F.array_join("lines", ",").alias("lines"),
            F.size("lines").alias("n_lines"),
            F.element_at("lines", 1).alias("first_line"),
            F.array_join(
                F.array_sort(F.transform("lines", lambda x: x * 10)), ","
            ).alias("lines_x10"),
            F.size(F.filter("lines", lambda x: x % 2 == 0)).alias("n_even"),
            F.array_join("flags", ",").alias("flags"),
        )
    )


_SALTED_ORACLE = """
WITH dim AS (
  SELECT DISTINCT o_orderpriority, substr(o_orderpriority, 1, 1) AS prio_code
  FROM orders
)
SELECT o.o_orderkey, o.o_orderpriority, d.prio_code
FROM orders o JOIN dim d ON o.o_orderpriority = d.o_orderpriority
"""


@query("salted_join_orders", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join on a 5-value key (every orders row hits one of
    5 priority groups — the pathological shuffle-key distribution):
    the big side salts into 8 deterministic buckets, the dim replicates
    8×, and the hot keys spread across tasks. Oracle = the plain join,
    proving salting is semantics-free."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    dim = (
        o.select("o_orderpriority").distinct()
        .withColumn("prio_code", F.substring("o_orderpriority", 1, 1))
    )
    return JN.salted_join(o, dim, key="o_orderpriority", buckets=8)


_Q3_SQL = """
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 20
"""


@query("sql_shipping_priority", oracle=_Q3_SQL, tags=("sql", "bench"))
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query submitted through the SQL interface
    (``spark.sql`` over registered views) — the same engine surface a
    BI tool hits; oracle is the identical SQL text in DuckDB. Catalyst
    broadcasts customer, reorders the joins, and plans the top-20 as
    TakeOrdered."""
    tune(spark)
    from efficient_llm_data_wrangling_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3_SQL)


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS DOUBLE) AS running_spend,
       lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
       lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
FROM orders
"""


@query("running_spend_per_customer", oracle=_RUNNING_ORACLE, tags=("window",))
def running_spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal-exact spend + lag/lead neighbors per customer —
    the frame-based window surface (cumulative ROWS frame, offset
    functions) over one shuffle on the partition key."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.sum(_dec("o_totalprice")).over(cum).cast("decimal(18,2)").cast("double").alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


_FROMJSON_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
       concat('k=', CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)) AS k_str
FROM events WHERE event_type = 'view'
"""


@query("from_json_events", oracle=_FROMJSON_ORACLE, tags=("functions", "json"))
def from_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parse (``from_json`` → typed struct, not
    per-path string extraction) with downstream typed arithmetic —
    parse once, use many times, which is what survives a wide JSON
    column at scale."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    parsed = ev.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
        F.concat(F.lit("k="), F.col("p.k").cast("string")).alias("k_str"),
    )


_MAP_ORACLE = """
WITH pairs AS (
  SELECT o_custkey, o_orderstatus, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey, o_orderstatus
), m AS (
  SELECT o_custkey, map_from_entries(list_sort(list({'k': o_orderstatus, 'v': n}))) AS status_map
  FROM pairs GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(cardinality(status_map) AS INT) AS n_statuses,
       coalesce(status_map['F'][1], 0) AS n_f,
       coalesce(status_map['O'][1], 0) AS n_o,
       array_to_string(list_sort(map_keys(status_map)), ',') AS statuses
FROM m
"""


@query("map_functions_orders", oracle=_MAP_ORACLE, tags=("functions",))
def map_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a per-customer status→count map
    (map_from_entries over collected pairs), then probe it with
    element_at / map_keys / size. Keys sort before map construction so
    both engines build identical maps."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    pairs = o.groupBy("o_custkey", "o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    m = pairs.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("o_orderstatus").alias("k"), F.col("n").alias("v"))))
        ).alias("status_map")
    )
    return m.select(
        "o_custkey",
        F.size("status_map").alias("n_statuses"),
        F.coalesce(F.element_at("status_map", "F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.element_at("status_map", "O"), F.lit(0)).alias("n_o"),
        F.array_join(F.array_sort(F.map_keys("status_map")), ",").alias("statuses"),
    )
