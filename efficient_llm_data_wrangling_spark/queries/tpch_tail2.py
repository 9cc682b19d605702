"""TPC-H tail batch 2: Q5/Q7/Q8/Q9/Q10/Q13/Q15 shapes over the
synthetic star schema (the testdata ships no partsupp table, so Q9's
supplycost uses the documented ``p_retailprice/2`` stand-in and
Q11/Q20 are out of scope; Q13's comment-pattern filter becomes an
``o_orderpriority`` exclusion — same plan shape, available column).

House conventions: every money aggregate is carried BOTH as
DECIMAL(18,2)-summed-then-double (reporting) and as an exact integer
unit (hundredths of cents: ``price_cents × (100 − discount_cents)``)
wherever a ratio, ordering, or tie-break depends on it — so the value
hash never sits on a float boundary. Dimension joins broadcast;
facts shuffle once per aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.queries.tpch_tail import _dec
from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

#: exact integer revenue unit: hundredths of cents.
_REV_U_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)
_REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def _rev_u() -> F.Column:
    return F.expr(_REV_U_SQL)


def _rev_dec() -> F.Column:
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


# --------------------------------------------------------------------------
# Q5 shape — local supplier volume (6-way join, region-pruned)
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name,
       CAST(sum({_REV_U_SQL}) AS BIGINT) AS revenue_u,
       CAST(sum({_REV_DEC_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@query("local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg", "tpch"))
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier and the
    customer share a nation inside one region-year slice — the classic
    star-join with an extra fact-side equality (c_nationkey =
    s_nationkey) that prunes the join product before aggregation.

    Scale: region→nation→(customer, supplier) are all dimension-sized
    and broadcast; the ONLY fact shuffle is orders⋈lineitem on
    orderkey, and the year filter prunes orders before it. Revenue is
    summed in exact integer units alongside the decimal report.
    """
    tune(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum(_rev_u()).cast("long").alias("revenue_u"),
        F.sum(_rev_dec()).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Q7 shape — volume shipping between a nation pair, by year
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_REV_U_SQL}) AS BIGINT) AS volume_u,
       CAST(sum({_REV_DEC_SQL}) AS DOUBLE) AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("nation_pair_volume", oracle=_Q7_ORACLE, tags=("join", "agg", "tpch"))
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations in both
    directions, split by year — the disjunctive cross-dimension
    predicate ((s=A ∧ c=B) ∨ (s=B ∧ c=A)) that cannot be pushed into
    either dimension alone, applied AFTER the broadcast joins bring
    both nation names onto the fact row.

    Scale: one fact shuffle (orders⋈lineitem); supplier/customer/
    nation broadcast; the 2-year shipdate filter prunes the scan.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("__snk"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("__cnk"),
        )
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.sum(_rev_u()).cast("long").alias("volume_u"),
        F.sum(_rev_dec()).cast("double").alias("volume"),
    )


# --------------------------------------------------------------------------
# Q8 shape — market share of one nation within a region, by year
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
WITH allv AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(sum({_REV_U_SQL}) AS BIGINT) AS total_u,
         CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV_U_SQL}
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_u
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
  GROUP BY o_year
)
SELECT o_year, nation_u, total_u,
       CAST(nation_u * 1000000 // total_u AS BIGINT) AS mkt_share_ppm
FROM allv
"""


@query("market_share_by_year", oracle=_Q8_ORACLE, tags=("join", "agg", "tpch"))
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one
    part type, per year — the numerator folded into the same aggregate
    as the denominator with a conditional sum (one pass, not two), and
    the share emitted as exact integer ppm (integer revenue units ÷
    integer revenue units; no float division near the hash).

    Scale: part/customer/supplier/nation/region all broadcast; one
    fact shuffle (orders⋈lineitem), one |years|-row aggregate.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    cn = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("__cnk")
    )
    sn = n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("__cnk"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("__snk"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", _rev_u()).otherwise(F.lit(0).cast("long"))
        ).cast("long").alias("nation_u"),
        F.sum(_rev_u()).cast("long").alias("total_u"),
    )
    return agg.select(
        "o_year",
        "nation_u",
        "total_u",
        F.expr("CAST(nation_u * 1000000L div total_u AS BIGINT)").alias("mkt_share_ppm"),
    )


# --------------------------------------------------------------------------
# Q9 shape moved to tpch_partsupp.py (round 6): rebuilt on the
# deterministic partsupp surrogate, retiring the p_retailprice/2
# supplycost stand-in this module carried in round 5.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Q10 shape — returned-item top customers (TakeOrdered, exact tie-break)
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         CAST(sum({_REV_U_SQL}) AS BIGINT) AS revenue_u,
         CAST(sum({_REV_DEC_SQL}) AS DOUBLE) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-04-01'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT * FROM rev ORDER BY revenue_u DESC, c_custkey LIMIT 20
"""


@query("returned_item_customers", oracle=_Q10_ORACLE, tags=("join", "agg", "topk", "tpch"))
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers with the most returned-item
    revenue in one quarter. The top-k runs as TakeOrdered over the
    per-customer aggregate (never a global sort), ordered by the EXACT
    integer revenue with custkey as the deterministic tie-break — a
    float revenue ordering could disagree across engines at the 20th
    boundary.

    Scale: returnflag + quarter filters prune the fact scan; one
    orderkey shuffle, one custkey aggregate, k=20 TakeOrdered.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(_rev_u()).cast("long").alias("revenue_u"),
        F.sum(_rev_dec()).cast("double").alias("revenue"),
    )
    return rev.orderBy(F.desc("revenue_u"), F.asc("c_custkey")).limit(20)


# --------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (left join histogram)
# --------------------------------------------------------------------------

_Q13_ORACLE = """
WITH co AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
"""


@query("customer_order_distribution", oracle=_Q13_ORACLE, tags=("join", "agg", "tpch"))
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the count-of-counts histogram — how many
    customers placed N qualifying orders, INCLUDING the zero-order
    customers that only a left outer join preserves (the shape an
    inner join silently drops). The reference comment-pattern filter
    becomes an ``o_orderpriority`` exclusion inside the JOIN condition
    (filtering after the outer join would turn absent orders into
    lost customers).

    Scale: one custkey shuffle for the outer-join count, then the
    second aggregate runs on |distinct counts| rows — map-side
    combined to almost nothing.
    """
    tune(spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).cast("long").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape — top supplier by quarterly revenue (argmax join-back)
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH srev AS (
  SELECT l.l_suppkey AS supplier_no,
         CAST(sum({_REV_U_SQL}) AS BIGINT) AS total_revenue_u
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l.l_suppkey
),
m AS (SELECT max(total_revenue_u) AS mx FROM srev)
SELECT s.s_suppkey, s.s_name, srev.total_revenue_u
FROM srev JOIN m ON srev.total_revenue_u = m.mx
JOIN supplier s ON s.s_suppkey = srev.supplier_no
"""


@query("top_supplier_revenue", oracle=_Q15_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum quarterly
    revenue — the view-then-argmax pattern, decorrelated as aggregate →
    1-row broadcast max → join-back (ALL max-ties returned, per spec).
    Revenue compares as the exact integer unit, so the argmax boundary
    cannot drift between engines.

    Scale: one suppkey aggregate over the pruned quarter, a 1-row
    broadcast, and a dimension join-back — no window, no global sort.
    ``srev`` is materialized before the max is derived: the lazy shape
    evaluated the lineitem-scan-plus-aggregate subtree twice (once for
    the view, once for the max — 2 fact scans, no runtime
    ReusedExchange; round-6 tools/fact_scan_audit.py finding), while
    the checkpoint is only |suppliers-in-quarter| rows.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    srev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_u()).cast("long").alias("total_revenue_u")
    ).localCheckpoint(eager=False)
    m = srev.agg(F.max("total_revenue_u").alias("__mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(m), F.col("total_revenue_u") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_u")
    )


# --------------------------------------------------------------------------
# Q6 shape — forecast revenue change (pure pushdown scan-aggregate)
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_u,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@query("forecast_revenue_change", oracle=_Q6_ORACLE, tags=("agg", "pushdown", "tpch"))
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-aggregate — every predicate
    (shipdate range, discount band, quantity cap) must reach the
    parquet scan as a pushed filter, and the whole query is one
    whole-stage-codegen pass plus a 1-row aggregate. Revenue is
    summed both as the exact integer unit (price-cents ×
    discount-cents) and as the decimal report.

    Scale: the definitional minimum-work query — if this plans
    anything beyond scan→filter→partial-agg→1-row exchange, the
    engine is broken. Plan test pins PushedFilters.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * CAST(round(l_discount * 100) AS BIGINT)"
            )
        ).cast("long").alias("revenue_u"),
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("revenue"),
    )
