"""Subquery / decorrelation surface: the classic TPC-H subquery shapes
(scalar subqueries, correlated aggregates, HAVING join-back, groupwise
argmin, nested-aggregate comparison) expressed as explicitly
decorrelated DataFrame plans — the physical form Catalyst (and every
other optimizer) lowers them to.

The reference has no subquery surface at all (straight-line pandas,
SURVEY.md §2.10); a user replacing it with this engine gets the full
ANSI subquery repertoire. Each query documents its decorrelation:

* global scalar aggregate  → 1-row DataFrame, ``crossJoin(broadcast(…))``
  (a BroadcastNestedLoopJoin with no condition — constant-folding-like,
  never a real cartesian);
* correlated aggregate     → groupBy on the correlation key + equi-join
  back (the agg output is already hash-partitioned on the join key, so
  AQE reuses the exchange instead of shuffling twice);
* EXISTS / NOT EXISTS      → left-semi / left-anti join;
* groupwise min join-back  → tiny agg → broadcast hash join.

Exact-arithmetic convention for filter *comparisons* that involve an
average: never compare against ``sum/count`` (float or decimal division
rounds differently per engine) — cross-multiply instead:
``x > sum/cnt  ⇔  x*cnt > sum`` (cnt > 0), which is exact in decimal on
both Spark and DuckDB. See registry.py for the output-column hash
conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table


def _dec(col: str, precision: int = 18, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({precision},{scale})")


# --------------------------------------------------------------------------
# Global scalar subquery + NOT EXISTS (TPC-H Q22 shape)
# --------------------------------------------------------------------------

_SCALAR_ORACLE = """
WITH g AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS c
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer, g
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * g.c > g.s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


@query("scalar_subquery_acctbal", oracle=_SCALAR_ORACLE, tags=("subquery", "join", "agg"))
def scalar_subquery_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance exceeds the global
    positive-balance average AND who placed no urgent order, grouped by
    nation. Decorrelation: the scalar average is a 1-row aggregate
    cross-joined via broadcast (BroadcastNestedLoopJoin over exactly
    one row — constant cost at any scale); NOT EXISTS is a left-anti
    join on the urgent-order key set. The avg comparison is
    cross-multiplied (``bal*cnt > sum``) so both engines compare exact
    decimals — no division anywhere in the predicate.

    Scale: the anti-join shuffles on custkey (both sides large at
    100 TB — correct co-partitioned plan); the scalar side is O(1)
    rows broadcast regardless of scale.
    """
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    bal = _dec("c_acctbal")
    scalar = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("s"), F.count(F.lit(1)).alias("c")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")

    rich = (
        customer.crossJoin(F.broadcast(scalar))
        .filter(bal * F.col("c") > F.col("s"))
        .join(urgent, customer["c_custkey"] == urgent["o_custkey"], "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(bal).cast("double").alias("total_bal"),
    )


# --------------------------------------------------------------------------
# Correlated aggregate in HAVING + join-back (TPC-H Q18 shape)
# --------------------------------------------------------------------------

_HAVING_ORACLE = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
SELECT o.o_orderkey, c.c_name,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(big.total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@query("having_large_orders", oracle=_HAVING_ORACLE, tags=("subquery", "agg", "join"))
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose lineitem
    quantity total exceeds a threshold, joined back to orders+customer.
    The HAVING filter runs on the aggregate *before* the joins, so the
    selective side (top ~1% of orders) drives the join. Quantities sum
    as decimal(12,2) — exact and order-independent.

    Scale: lineitem aggregates with map-side partial combine on
    l_orderkey; the filtered survivor set is small → AQE converts the
    join-back to a broadcast join at runtime (the plan stays a shuffle
    join only if the threshold stops being selective).
    """
    tune(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", 12)).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, orders["o_orderkey"] == big["l_orderkey"])
        .join(customer, customer["c_custkey"] == orders["o_custkey"])
        .select(
            "o_orderkey",
            "c_name",
            _dec("o_totalprice").cast("double").alias("total_price"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Groupwise argmin join-back (TPC-H Q2 shape)
# --------------------------------------------------------------------------

_ARGMIN_ORACLE = """
WITH m AS (
  SELECT p_type, min(CAST(p_retailprice AS DECIMAL(18,2))) AS min_price
  FROM part GROUP BY p_type
)
SELECT p.p_partkey, p.p_type, p.p_brand,
       CAST(m.min_price AS DOUBLE) AS min_price
FROM part p
JOIN m ON p.p_type = m.p_type
      AND CAST(p.p_retailprice AS DECIMAL(18,2)) = m.min_price
"""


@query("argmin_part_per_type", oracle=_ARGMIN_ORACLE, tags=("subquery", "agg", "join"))
def argmin_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): the parts achieving the
    minimum retail price within their p_type — the correlated scalar
    ``price = (SELECT min(price) WHERE same type)`` decorrelated to a
    tiny groupBy + broadcast hash join back onto the fact. Price
    equality compares decimals (exact parquet values on both sides).

    Scale: the per-type aggregate has |distinct p_type| rows — a
    dimension-sized broadcast at any corpus size; the fact side never
    shuffles. (A window ``min() over (partition by p_type)`` computes
    the same thing but forces a full shuffle+sort of part — the
    agg+broadcast form is the scale-correct plan.)
    """
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    price = _dec("p_retailprice")
    mins = part.groupBy("p_type").agg(F.min(price).alias("min_price"))
    p, m = part.alias("p"), mins.alias("m")
    return (
        p.join(
            F.broadcast(m),
            (F.col("p.p_type") == F.col("m.p_type"))
            & (F.col("p.p_retailprice").cast("decimal(18,2)") == F.col("m.min_price")),
        )
        .select(
            F.col("p.p_partkey").alias("p_partkey"),
            F.col("p.p_type").alias("p_type"),
            F.col("p.p_brand").alias("p_brand"),
            F.col("m.min_price").cast("double").alias("min_price"),
        )
    )


# --------------------------------------------------------------------------
# Correlated average filter (TPC-H Q17 shape)
# --------------------------------------------------------------------------

_CORR_AVG_ORACLE = """
WITH s AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem l JOIN s ON l.l_partkey = s.pk
WHERE 5 * CAST(l.l_quantity AS DECIMAL(12,2)) * s.cnt < s.sum_qty
"""


@query("correlated_avg_qty_filter", oracle=_CORR_AVG_ORACLE, tags=("subquery", "agg", "join"))
def correlated_avg_qty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems with
    quantity below 20% of their part's average quantity, summed to the
    would-be yearly revenue. The correlated ``avg(l_quantity) where
    same part`` decorrelates to a self-aggregation joined back on
    l_partkey; the 20%-of-average predicate is cross-multiplied
    (``5·qty·cnt < sum``) so it is exact decimal/bigint arithmetic in
    both engines — no float, no division, no boundary-row drift.

    Scale: the per-part aggregate is hash-partitioned on l_partkey,
    the same key the join needs — Spark reuses the aggregation's
    exchange for the sort-merge/shuffle-hash join-back instead of
    shuffling lineitem twice. Both sides scale with the data; nothing
    is broadcast (at 100 TB the part-stats side has billions of rows).
    """
    tune(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity", 12)
    stats = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = lineitem.join(stats, lineitem["l_partkey"] == stats["pk"]).filter(
        F.lit(5) * qty * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# --------------------------------------------------------------------------
# Nested-aggregate comparison (group average vs global average)
# --------------------------------------------------------------------------

_NESTED_ORACLE = """
WITH g AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS gs, count(*) AS gc FROM customer
),
n AS (
  SELECT c_nationkey,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS ns, count(*) AS nc
  FROM customer GROUP BY c_nationkey
)
SELECT n.c_nationkey, nt.n_name,
       CAST(n.nc AS BIGINT) AS n_cust,
       CAST(n.ns AS DOUBLE) AS sum_bal
FROM n, g
JOIN nation nt ON nt.n_nationkey = n.c_nationkey
WHERE n.ns * g.gc > g.gs * n.nc
"""


@query("nested_agg_nations_above_avg", oracle=_NESTED_ORACLE, tags=("subquery", "agg"))
def nested_agg_nations_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-aggregate comparison — nations whose average customer
    balance beats the global average (``HAVING avg(x) > (SELECT
    avg(x) …)``). Both averages stay as exact (sum, count) pairs and
    the comparison cross-multiplies: ``ns/nc > gs/gc ⇔ ns·gc > gs·nc``
    — pure decimal×bigint, no division, identical in both engines.

    Scale: one scan feeds both aggregates (the global one is a
    re-aggregation of the per-nation partials in principle; here two
    cheap aggs), the scalar is a 1-row broadcast, and the nation name
    joins via broadcast. No plan node grows with corpus size except
    the single groupBy shuffle.
    """
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    bal = _dec("c_acctbal")
    per_nation = customer.groupBy("c_nationkey").agg(
        F.sum(bal).alias("ns"), F.count(F.lit(1)).alias("nc")
    )
    glob = customer.agg(F.sum(bal).alias("gs"), F.count(F.lit(1)).alias("gc"))
    return (
        per_nation.crossJoin(F.broadcast(glob))
        .filter(F.col("ns") * F.col("gc") > F.col("gs") * F.col("nc"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .select(
            "c_nationkey",
            "n_name",
            F.col("nc").alias("n_cust"),
            F.col("ns").cast("double").alias("sum_bal"),
        )
    )
