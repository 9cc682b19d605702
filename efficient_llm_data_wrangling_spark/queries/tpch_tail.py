"""TPC-H tail shapes: the remaining classic decision-support query
patterns not yet covered by the relational/subquery families —
EXISTS-driven semi joins (Q4), conditional pivot aggregation (Q12),
join ratio metrics (Q14), distinct-count with NOT-IN exclusion (Q16),
disjunctive multi-branch predicates (Q19), and the double-correlated
EXISTS/NOT-EXISTS "waiting supplier" shape (Q21).

The reference has no SQL surface at all (SURVEY.md §2.10); these are
north-star additions that exercise Catalyst's semi/anti join planning,
disjunctive predicate pushdown, and distinct-aggregate expansion — the
shapes a warehouse replacement must plan well at 100 TB.

Adaptations to the driver's synthetic schema (TESTDATA.md): lineitem
has no receiptdate/commitdate/shipmode and there is no partsupp table,
so "late" is modelled as ``l_shipdate > o_orderdate + 30 days`` and
supplier exclusions use ``s_acctbal < 0``. The relational shape (and
therefore the physical plan Catalyst picks) is identical to the
canonical queries.

Exact-arithmetic conventions per registry.py: money aggregates in
DECIMAL(18,2), ratios as integer parts-per-million via integer
division (``div`` / ``//``) — no float division anywhere near the
hash-compared values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table


def _dec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# --------------------------------------------------------------------------
# Q4 shape — EXISTS semi join: orders with a late shipment, by priority
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


@query("order_priority_late_exists", oracle=_Q4_ORACLE, tags=("subquery", "join", "agg"))
def order_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority where EXISTS a
    lineitem shipped >30 days after the order date. The correlated
    EXISTS lowers to a LEFT SEMI hash join on ``l_orderkey`` with the
    date comparison as a residual join condition — one shuffle on the
    join key, the semi join short-circuits per probe row (no fanout,
    no dedup pass afterwards).

    Scale: both sides shuffle-partition on orderkey; the date filter
    on orders pushes into the parquet scan before the exchange.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Q12 shape — conditional (pivoted) aggregation over a join
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


@query("priority_line_counts", oracle=_Q12_ORACLE, tags=("join", "agg"))
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per linestatus —
    the conditional-aggregation pivot (``sum(CASE WHEN …)``) that folds
    what would be two scans into one pass over the join.

    Scale: the year filter prunes the lineitem scan before the
    orderkey shuffle; partial aggregation reduces each map side to
    ≤ |linestatus| rows before the final O(groups) exchange.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q14 shape — promo revenue ratio (broadcast dim join, exact ppm ratio)
# --------------------------------------------------------------------------

_Q14_ORACLE = """
WITH j AS (
  SELECT p.p_type,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
    AND l.l_shipdate < TIMESTAMP '1997-04-01'
)
SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum(rev) AS DOUBLE) AS total_revenue,
  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev * 10000 ELSE CAST(0 AS DECIMAL(18,2)) END) AS BIGINT)
       * 1000000 // CAST(sum(rev * 10000) AS BIGINT) AS BIGINT) AS promo_ppm
FROM j
"""


@query("promo_revenue_ratio", oracle=_Q14_ORACLE, tags=("join", "agg"))
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts in one
    month. The part dimension broadcasts (it is O(SF) small vs the
    fact), so the month of lineitem never shuffles — map-side join
    then a single global aggregate.

    The ratio is emitted as exact integer parts-per-million: revenue
    sums are DECIMAL(18,2), scaled ×10000 to an exact integer of
    hundredths-of-cents, then integer-divided — both engines perform
    identical integer arithmetic, no float division near the hash.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("p_type"), rev.alias("rev")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero)
    agg = j.agg(
        F.sum(promo).alias("_promo"),
        F.sum("rev").alias("_total"),
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev") * 10000).otherwise(zero)).alias("_promo_u"),
        F.sum(F.col("rev") * 10000).alias("_total_u"),
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.expr("CAST(CAST(_promo_u AS BIGINT) * 1000000L div CAST(_total_u AS BIGINT) AS BIGINT)").alias(
            "promo_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Q16 shape — distinct suppliers per part attribute, NOT-IN exclusion
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand,
       CAST((p.p_size - 1) // 10 AS INTEGER) AS size_bucket,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p.p_brand, size_bucket
"""


@query("supplier_cnt_by_part_attrs", oracle=_Q16_ORACLE, tags=("subquery", "join", "agg", "distinct"))
def supplier_cnt_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, size
    bucket), excluding blacklisted suppliers. The NOT-IN subquery is a
    tiny set → LEFT ANTI broadcast join (no shuffle for the
    exclusion); the part dimension broadcasts too, so the only
    exchange is the final distinct-aggregate on (brand, bucket,
    suppkey) — Catalyst expands count(DISTINCT) into a two-level
    aggregate with partial dedup map-side.

    Note the NULL caveat the relational shape encodes: NOT IN with a
    nullable subquery is NOT an anti join in general; ``s_suppkey`` is
    a non-null key here, which is what licenses the rewrite.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            (((F.col("p_size") - 1) / 10).cast("int")).alias("size_bucket"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q19 shape — disjunctive multi-branch predicate over a join
# --------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("disjunctive_part_revenue", oracle=_Q19_ORACLE, tags=("join", "agg", "pushdown"))
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue over three OR'd (brand, size,
    quantity) branches. Catalyst splits the disjunction: the
    part-only conjuncts (brand ∈ {12,23,34}, size ≤ 15) and the
    lineitem-only conjunct (quantity ≤ 30) are derivable as common
    factors and push into each scan BEFORE the join; the full
    disjunction evaluates as a residual filter after the (broadcast)
    join. At 100 TB that pre-join pruning is the difference between
    joining 3 brands' worth of parts and joining all of them.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape — sole late supplier in multi-supplier orders
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH per_order AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                             THEN l.l_suppkey END) AS n_late,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON po.late_supp = s.s_suppkey
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
"""


@query("waiting_supplier_orders", oracle=_Q21_ORACLE, tags=("subquery", "join", "agg", "distinct"))
def waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    multi-supplier order. The canonical form is a double-correlated
    EXISTS (another supplier in the order) + NOT EXISTS (another LATE
    supplier); both correlate on the same key (orderkey), so the
    decorrelated plan folds BOTH subqueries into ONE per-order
    aggregate — n_supp, n_late, and the late supplier id in a single
    shuffle on orderkey — instead of two extra self-joins of the
    largest table in the schema. ``max(CASE WHEN late)`` is exact
    because the filter pins n_late = 1.

    Scale: one orderkey exchange over lineitem (the unavoidable one),
    orders pre-projected to 2 columns, supplier dim broadcast.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(F.broadcast(supplier), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
