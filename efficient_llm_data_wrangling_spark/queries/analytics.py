"""Analytical operator surface beyond the reference's own inventory
(SURVEY.md §2.10 north-star set): pivot/unpivot reshaping, exact
percentiles, gap-based sessionization, grouping sets, lag/lead deltas,
list aggregation, a scalable ntile, the datetime function surface, and
fixed-width histograms.

Every query follows the registry.py hash conventions: identical column
aliases on both engines, decimal-exact money sums cast once to double,
integer-cents sums for the double-typed ``events.value``, and total
(tie-free) orderings wherever a window or rank is involved.

Scale notes (these run on the 100 TB plan, not just sf0.01):

* pivot passes an EXPLICIT value list — ``pivot(col)`` without values
  runs a whole extra distinct job over the fact table to discover them;
* sessionization and lag/lead partition their windows by a key
  (user/customer) — per-key state is bounded, no global window;
* ntile is built on :func:`sampling.global_rank` (range exchange +
  per-partition rank + driver-side offsets), NOT a single-partition
  ``Window.orderBy`` — the classic global-window scale killer;
* histogram bucketing is pure column arithmetic → map-side partial
  aggregation; one shuffle of at most ``n_buckets`` rows per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.operators import sampling as SAMP
from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table


def _dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


#: integer-cents representation of the double ``events.value`` column —
#: order-independent exact sums (streaming.py uses the same convention).
def _cents(col: str) -> Column:
    return F.round(F.col(col) * 100).cast("bigint")


# --------------------------------------------------------------------------
# Pivot / unpivot (wide<->long reshaping)
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p,
  CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("pivot_status_revenue", oracle=_PIVOT_ORACLE, tags=("analytics", "pivot"))
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue per priority × order-status matrix.

    The status values are passed explicitly to ``pivot`` — omitting
    them makes Spark run a separate distinct-scan job over the fact
    table just to discover the column set, which at 100 TB doubles the
    I/O. With explicit values the whole query is one scan + one
    hash-aggregate shuffle (pivot compiles to conditional aggregates,
    exactly the CASE WHEN form of the oracle)."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", _dec("o_totalprice").alias("p")
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("p").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    return wide.select(
        "o_orderpriority",
        F.col("F_rev").cast("double").alias("rev_f"),
        F.col("O_rev").cast("double").alias("rev_o"),
        F.col("P_rev").cast("double").alias("rev_p"),
        (
            F.coalesce(F.col("F_n"), F.lit(0))
            + F.coalesce(F.col("O_n"), F.lit(0))
            + F.coalesce(F.col("P_n"), F.lit(0))
        ).cast("bigint").alias("n_orders"),
    )


_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


@query("unpivot_lineitem_charges", oracle=_UNPIVOT_ORACLE, tags=("analytics", "pivot"))
def unpivot_lineitem_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): melt the three charge columns into
    (measure, amount) rows. ``DataFrame.unpivot`` compiles to a single
    Expand node — one scan, 3× row fan-out, NO union of three scans
    (the oracle's UNION ALL restatement would read the table three
    times at scale)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


# --------------------------------------------------------------------------
# Exact percentiles (sort-based distributed aggregate)
# --------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
  CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
"""


@query("percentile_price_by_priority", oracle=_PCTL_ORACLE, tags=("analytics", "agg"))
def percentile_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (SQL percentile_cont
    semantics) per group. Spark's ``percentile`` aggregate buffers each
    group's values on the reducer — fine for bounded group cardinality
    like the 5 priorities here; for high-cardinality/unbounded groups
    switch to ``approx_percentile`` (t-digest, fixed memory), exercised
    by ``approx_distinct_events``. round(4) absorbs the last-ulp libm
    interpolation difference between engines."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Gap-based sessionization (batch; streaming variant = stream_session_windows)
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
)
SELECT user_id,
  CAST(session_id AS BIGINT) AS session_id,
  CAST(min(ts) AS TIMESTAMP) AS session_start,
  CAST(max(ts) AS TIMESTAMP) AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM sess
GROUP BY user_id, session_id
"""


@query("sessionize_events", oracle=_SESSION_ORACLE, tags=("analytics", "temporal"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization: a >30-minute silence starts a new
    session. lag + running-sum windows PARTITIONED BY user_id — state
    per task is one user's events, so the plan is a single shuffle on
    user_id regardless of total scale (no global window). The streaming
    twin is ``stream_session_windows`` (session_window + watermark)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    order = [F.col("ts"), F.col("event_id")]
    w = W.partitionBy("user_id").orderBy(*order)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    run = W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = ev.withColumn("session_id", F.sum(is_new).over(run).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("value_cents"),
    )


# --------------------------------------------------------------------------
# Grouping sets (complements rollup_pricing / cube_orders)
# --------------------------------------------------------------------------

_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


@query("grouping_sets_lineitem", oracle=_GSETS_SQL, tags=("analytics", "agg", "sql"))
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form under rollup/cube (both already
    covered by ``rollup_pricing`` / ``cube_orders``): an arbitrary list
    of grouping combinations in ONE Expand + hash-aggregate pass instead
    of one scan per combination. ``grouping()`` disambiguates real NULL
    keys from the ALL rows. Oracle is the identical SQL text."""
    from efficient_llm_data_wrangling_spark.sources.catalog import register_views

    tune(spark)
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------------------------
# lag/lead deltas: inter-order gap per customer
# --------------------------------------------------------------------------

_GAP_ORACLE = """
WITH g AS (
  SELECT o_custkey,
    date_diff('day',
      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      CAST(o_orderdate AS DATE)) AS gap
  FROM orders
)
SELECT o_custkey,
  CAST(count(gap) AS BIGINT) AS n_gaps,
  CAST(avg(gap) AS DOUBLE) AS avg_gap_days,
  CAST(max(gap) AS BIGINT) AS max_gap_days
FROM g GROUP BY o_custkey
HAVING count(gap) > 0
"""


@query("order_gap_days", oracle=_GAP_ORACLE, tags=("analytics", "window"))
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead surface: days between a customer's consecutive orders,
    aggregated per customer. The window partitions by customer — the
    lag never sees more than one customer's history per task. avg of
    exact integer day-gaps divides identically in both engines (no
    rounding needed)."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w).cast("date")
    )
    return (
        o.withColumn("gap", gap)
        .groupBy("o_custkey")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.avg("gap").alias("avg_gap_days"),
            F.max("gap").cast("bigint").alias("max_gap_days"),
        )
        .filter(F.col("n_gaps") > 0)
    )


# --------------------------------------------------------------------------
# List aggregation (collect_list/collect_set → deterministic string)
# --------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT r_name,
  string_agg(n_name, ',' ORDER BY n_name) AS nations,
  CAST(count(*) AS BIGINT) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
"""


@query("collect_nations_per_region", oracle=_COLLECT_ORACLE, tags=("analytics", "agg"))
def collect_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation: nations per region as a SORTED joined string —
    ``collect_list`` order is partition-dependent, so ``array_sort``
    before ``array_join`` is what makes the result deterministic (and
    hash-comparable; registry.py array convention). Region broadcasts."""
    tune(spark)
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    joined = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return joined.groupBy("r_name").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


# --------------------------------------------------------------------------
# Scalable ntile (equi-depth bucketing without a global window)
# --------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH t AS (
  SELECT c_acctbal, ntile(8) OVER (ORDER BY c_acctbal, c_custkey) AS tile
  FROM customer
)
SELECT CAST(tile AS INT) AS tile,
  CAST(count(*) AS BIGINT) AS n_customers,
  min(c_acctbal) AS min_acctbal,
  max(c_acctbal) AS max_acctbal
FROM t GROUP BY tile
"""


@query("ntile_customer_acctbal", oracle=_NTILE_ORACLE, tags=("analytics", "window", "scale"))
def ntile_customer_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth 8-tile over account balance WITHOUT the
    single-partition global window ntile needs: global rank comes from
    :func:`sampling.global_rank` (range exchange + parallel local rank
    + driver-side offsets), and the SQL ntile bucket formula — first
    ``n % k`` tiles get ``n//k + 1`` rows — is then pure arithmetic on
    the rank. Oracle is DuckDB's native ntile."""
    tune(spark)
    k = 8
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n = c.count()  # scalar driver-side, same class as global_rank's offsets
    q, r = divmod(n, k)
    qd = max(q, 1)  # divisor guard for n < k (all rows land in branch 1)
    ranked = SAMP.global_rank(c, ["c_acctbal", "c_custkey"], out_col="rn")
    tile = (
        F.when(
            F.col("rn") <= r * (q + 1),
            ((F.col("rn") - 1) / (q + 1)).cast("bigint"),
        )
        .otherwise(r + ((F.col("rn") - r * (q + 1) - 1) / qd).cast("bigint"))
        + 1
    ).cast("int")
    return (
        ranked.withColumn("tile", tile)
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Datetime function surface
# --------------------------------------------------------------------------

_DT_ORACLE = """
SELECT o_orderkey,
  CAST(extract(year FROM o_orderdate) AS INT) AS yr,
  CAST(extract(month FROM o_orderdate) AS INT) AS mo,
  CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
  CAST(extract(doy FROM o_orderdate) AS INT) AS doy,
  CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dow,
  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
  CAST(CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS VARCHAR) AS due_date
FROM orders
"""


@query("datetime_functions_orders", oracle=_DT_ORACLE, tags=("analytics", "functions"))
def datetime_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction/arithmetic surface: year/month/quarter/doy/
    dow, month truncation, last_day, date_add. All JVM-side column
    expressions inside whole-stage codegen — no UDF. Engine quirk
    pinned by the oracle: Spark ``dayofweek`` is 1=Sunday..7, DuckDB
    ``dow`` is 0=Sunday..6, so the oracle shifts by +1."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.trunc(d, "MM").cast("string").alias("month_start"),
        F.last_day(d).cast("string").alias("month_end"),
        F.date_add(d, 30).cast("string").alias("due_date"),
    )


# --------------------------------------------------------------------------
# Fixed-width histogram (equi-width bucketing)
# --------------------------------------------------------------------------

_HIST_ORACLE = """
SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS INT) AS bucket,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
"""


@query("histogram_totalprice", oracle=_HIST_ORACLE, tags=("analytics", "agg"))
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets of 30k, top-capped): bucket id
    is pure column arithmetic, so the aggregate is map-side partial →
    at most 20 rows shuffle per task, independent of input scale. IEEE
    division + floor of identical doubles is bit-identical across
    engines — no rounding needed."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19)).cast("int")
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Connected components (iterative; duplicate-cluster primitive)
# --------------------------------------------------------------------------

_CC_ORACLE = """
WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
e AS (
  SELECT o_orderkey AS src, o_orderkey * 2 AS dst
  FROM orders, mx WHERE o_orderkey * 2 <= mx.m
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
SELECT node,
  CASE WHEN node = 0 THEN 0 ELSE node // (node & -node) END AS component
FROM nodes
"""


@query("connected_components_halving", oracle=_CC_ORACLE, tags=("graph", "iterative", "scale"))
def connected_components_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative distributed connected components
    (:func:`operators.graph.connected_components` — min-label
    propagation + pointer jumping, O(log diameter) rounds,
    localCheckpoint lineage truncation) on the deterministic doubling
    graph ``k — 2k`` over the dense orderkey domain. That graph's
    components have a CLOSED FORM — the component root is the odd part
    ``k / (k & -k)`` — so an exact SQL oracle can grade a genuinely
    iterative Spark algorithm. In the dedup pipeline the same operator
    consumes LSH/exact-hash pair output to form duplicate groups."""
    tune(spark)
    from efficient_llm_data_wrangling_spark.operators.graph import connected_components

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    edges = o.select(
        F.col("o_orderkey").alias("src"), (F.col("o_orderkey") * 2).alias("dst")
    ).filter(F.col("dst") <= mx)
    return connected_components(edges)


# --------------------------------------------------------------------------
# Group-mean imputation (missing-value repair, reference S3 family)
# --------------------------------------------------------------------------

_IMPUTE_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
)
SELECT c_custkey,
  coalesce(
    bal,
    CAST(sum(CAST(bal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
      / count(bal) OVER (PARTITION BY c_nationkey)
  ) AS imputed_bal,
  CAST(bal IS NULL AS BOOLEAN) AS was_imputed
FROM c
"""


@query("impute_mean_acctbal", oracle=_IMPUTE_ORACLE, tags=("etl", "impute", "window"))
def impute_mean_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation (the distributed upgrade of the
    reference's imputation task family, S3): negative balances are
    nulled then repaired with their nation's mean. The mean derives
    from a DECIMAL-exact window sum divided once in double — a plain
    double avg is partial-sum-order dependent and would not hash
    across engines. One window shuffle on the group key."""
    tune(spark)
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    w = W.partitionBy("c_nationkey")
    mean = F.sum(_dec("bal")).over(w).cast("double") / F.count("bal").over(w)
    return c.select(
        "c_custkey",
        F.coalesce(F.col("bal"), mean).alias("imputed_bal"),
        F.col("bal").isNull().alias("was_imputed"),
    )


# --------------------------------------------------------------------------
# Statistical moments surface (corr / covar / stddev / variance)
# --------------------------------------------------------------------------

#: Shared double-combine stage (identical template text on both
#: engines) over EXACT integer sufficient statistics. "+ CAST(0 AS
#: DOUBLE)" collapses IEEE -0.0 (corr/covar can round to zero from
#: below and engines' round() may disagree on the sign of zero).
_MOM_CORR_SQL = (
    "round(CAST(__numxy AS DOUBLE) / (sqrt(CAST(__numxx AS DOUBLE)) * "
    "sqrt(CAST(__numyy AS DOUBLE))), 6) + CAST(0 AS DOUBLE)"
)
_MOM_COVAR_SQL = (
    "round(CAST(__numxy AS DOUBLE) / CAST(__nn1 AS DOUBLE) / "
    "CAST(100 AS DOUBLE), 3) + CAST(0 AS DOUBLE)"
)
_MOM_SD_SQL = (
    "round(sqrt(CAST(__numdd AS DOUBLE) / CAST(__nn1 AS DOUBLE)) / "
    "CAST(100 AS DOUBLE), 6) + CAST(0 AS DOUBLE)"
)
_MOM_VAR_SQL = (
    "round(CAST(__numxx AS DOUBLE) / CAST(__nn1 AS DOUBLE), 6) "
    "+ CAST(0 AS DOUBLE)"
)

_MOMENTS_ORACLE = f"""
WITH r AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem
),
a AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS __n,
         CAST(sum(q) AS HUGEINT) AS sx,
         CAST(sum(pc) AS HUGEINT) AS sy,
         CAST(sum(q * q) AS HUGEINT) AS sxx,
         CAST(sum(pc * pc) AS HUGEINT) AS syy,
         CAST(sum(q * pc) AS HUGEINT) AS sxy,
         CAST(sum(dc) AS HUGEINT) AS sd,
         CAST(sum(dc * dc) AS HUGEINT) AS sdd
  FROM r GROUP BY l_returnflag
),
x AS (
  SELECT l_returnflag, __n,
         __n * (__n - 1) AS __nn1,
         __n * sxy - sx * sy AS __numxy,
         __n * sxx - sx * sx AS __numxx,
         __n * syy - sy * sy AS __numyy,
         __n * sdd - sd * sd AS __numdd
  FROM a
)
SELECT l_returnflag,
  {_MOM_CORR_SQL} AS corr_qty_price,
  {_MOM_COVAR_SQL} AS covar_qty_price,
  {_MOM_SD_SQL} AS sd_discount,
  {_MOM_VAR_SQL} AS var_qty,
  CAST(__n AS BIGINT) AS n
FROM x
"""


@query("stats_moments_lineitem", oracle=_MOMENTS_ORACLE, tags=("analytics", "agg"))
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate surface: corr/covar_samp/stddev_samp/
    var_samp per return flag, computed from EXACT integer sufficient
    statistics (Σx, Σy, Σx², Σy², Σxy in quantity units / price cents /
    discount centi-units; sums held in decimal(38)/HUGEINT — the
    distributed-aggregation decomposition ``groupwise_trend_orders``
    also uses). The engines' native streaming co-moment aggregates
    merge partials in different orders (last-ulp drift that a rounding
    boundary can expose at scale — the weighted-sample lesson); exact
    integer numerators n·Σxy − ΣxΣy cast to double ONCE and combined
    with identical template expressions are bit-stable at any SF.

    Scale: one partial-aggregated shuffle on the group key; eight
    integer sums instead of four co-moment states — same plan shape,
    strictly portable results."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    r = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("dc"),
    )
    dec = "decimal(38,0)"
    # every sum accumulates in decimal(38,0) (cast BEFORE F.sum): the
    # oracle's HUGEINT accumulation is exact, and at ~6e11 rows
    # sum(q*pc) ≈ 5.8e19 > int64 — a post-sum cast would wrap first
    a = r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum(F.col("q").cast(dec)).alias("sx"),
        F.sum(F.col("pc").cast(dec)).alias("sy"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).alias("sxx"),
        F.sum((F.col("pc") * F.col("pc")).cast(dec)).alias("syy"),
        F.sum((F.col("q") * F.col("pc")).cast(dec)).alias("sxy"),
        F.sum(F.col("dc").cast(dec)).alias("sd"),
        F.sum((F.col("dc") * F.col("dc")).cast(dec)).alias("sdd"),
    )
    x = a.select(
        "l_returnflag",
        "__n",
        F.expr("__n * (__n - 1)").alias("__nn1"),
        F.expr("__n * sxy - sx * sy").alias("__numxy"),
        F.expr("__n * sxx - sx * sx").alias("__numxx"),
        F.expr("__n * syy - sy * sy").alias("__numyy"),
        F.expr("__n * sdd - sd * sd").alias("__numdd"),
    )
    return x.select(
        "l_returnflag",
        F.expr(_MOM_CORR_SQL).alias("corr_qty_price"),
        F.expr(_MOM_COVAR_SQL).alias("covar_qty_price"),
        F.expr(_MOM_SD_SQL).alias("sd_discount"),
        F.expr(_MOM_VAR_SQL).alias("var_qty"),
        F.col("__n").cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# VARIANT (semi-structured) + Python UDTF surfaces
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
FROM events
"""


@query("variant_shred_events", oracle=_VARIANT_ORACLE, tags=("json", "variant"))
def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` paths — the open-schema ingestion pattern (parse
    at the edge, shred lazily) that replaces string re-parsing per
    field. ``get_json_object`` (json_extract_events) re-parses the
    string per extraction; variant parses once."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.expr("variant_get(__v, '$.k', 'bigint')")
    return ev.withColumn("__v", v).select(
        "event_id", k.alias("k"), (k % 10).alias("k_mod")
    )


_UDTF_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT ws[i.i] || ' ' || ws[i.i + 1] AS bigram
  FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) i
  WHERE ws[i.i] <> '' AND ws[i.i + 1] <> ''
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 100
"""


@query("udtf_bigrams_documents", oracle=_UDTF_ORACLE, tags=("udf", "udtf", "text"))
def udtf_bigrams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4) emitting word bigrams per
    document via LATERAL join, then top-100 counts. API-surface demo of
    arbitrary one-row→many-rows Python logic; for THIS expressible
    shape the JVM path is ``explode(zip_with(slice..))`` or the
    word_counts pattern — a UDTF crosses the Python boundary per row
    and stays out of hot paths."""
    from pyspark.sql.functions import udtf

    tune(spark)
    from efficient_llm_data_wrangling_spark.sources.catalog import register_views

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            ws = (text or "").split(" ")
            for i in range(len(ws) - 1):
                if ws[i] and ws[i + 1]:
                    yield (ws[i] + " " + ws[i + 1],)

    register_views(spark, sf_dir, "documents")
    spark.udtf.register("bigrams_udtf", Bigrams)
    return spark.sql(
        """
        SELECT b.bigram, CAST(count(*) AS BIGINT) AS n
        FROM documents, LATERAL bigrams_udtf(text) b
        GROUP BY b.bigram ORDER BY n DESC, b.bigram LIMIT 100
        """
    )


# --------------------------------------------------------------------------
# Rank-function window surface
# --------------------------------------------------------------------------

_RANKFN_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       CAST(rank()        OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()  OVER w AS BIGINT) AS drnk,
       percent_rank()     OVER w            AS prnk,
       cume_dist()        OVER w            AS cdist,
       CAST(CAST(first_value(o_totalprice) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
       CAST(CAST(nth_value(o_totalprice, 2) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
"""


@query("window_rank_functions_orders", oracle=_RANKFN_ORACLE, tags=("analytics", "window"))
def window_rank_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ANSI rank-function repertoire over one keyed window:
    rank / dense_rank / percent_rank / cume_dist / first_value /
    nth_value, partitioned by order priority, ordered by price. Ties
    are safe unaliased: every emitted value is either a pure rank
    statistic (identical for peers) or drawn from the ordering column
    itself, so no tiebreak is needed for determinism.

    Scale: ONE window spec ⇒ one shuffle+sort per partition key; all
    six functions evaluate in the same Window physical operator pass.
    Partition cardinality is bounded (5 priorities) — for unbounded
    global rankings use ``sampling.global_rank`` (range-exchange) as
    ``ntile_customer_acctbal`` does.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        price_dec.cast("double").alias("price"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_totalprice").over(w).cast("decimal(18,2)").cast("double").alias("min_price"),
        F.nth_value("o_totalprice", 2).over(w).cast("decimal(18,2)").cast("double").alias("second_price"),
    )


# --------------------------------------------------------------------------
# Approximate percentiles (sketch path for the exact-percentile query)
# --------------------------------------------------------------------------


_APPROX_PCTL_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY o_orderpriority
"""


@query(
    "approx_percentile_price", oracle=_APPROX_PCTL_ORACLE, tags=("analytics", "approx", "agg")
)
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (Greenwald-Khanna) p50/p90/p99 of order
    totals per priority — the sketch twin of the exact
    ``percentile_price_by_priority``: single pass, O(1/ε) memory per
    group, mergeable partials (the exact percentile needs a full sort
    per group). DuckDB's approx_quantile is t-digest — a different
    sketch with different answers — so the oracle checks the exact
    ``n_orders`` for value parity and restates the sketch-error bounds
    as booleans: each approx percentile must land inside the band of
    exact neighboring percentiles ([p45,p55], [p85,p95], [p97,max]).
    Driver-hash green ⟺ every bound held on every group."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    acc = 10000
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(f"approx_percentile(o_totalprice, 0.5, {acc})").alias("_a50"),
        F.expr(f"approx_percentile(o_totalprice, 0.9, {acc})").alias("_a90"),
        F.expr(f"approx_percentile(o_totalprice, 0.99, {acc})").alias("_a99"),
        F.percentile("o_totalprice", F.lit(0.45)).alias("_p45"),
        F.percentile("o_totalprice", F.lit(0.55)).alias("_p55"),
        F.percentile("o_totalprice", F.lit(0.85)).alias("_p85"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("_p95"),
        F.percentile("o_totalprice", F.lit(0.97)).alias("_p97"),
        F.max("o_totalprice").alias("_pmax"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        ((F.col("_a50") >= F.col("_p45")) & (F.col("_a50") <= F.col("_p55"))).alias("p50_ok"),
        ((F.col("_a90") >= F.col("_p85")) & (F.col("_a90") <= F.col("_p95"))).alias("p90_ok"),
        ((F.col("_a99") >= F.col("_p97")) & (F.col("_a99") <= F.col("_pmax"))).alias("p99_ok"),
    )


# --------------------------------------------------------------------------
# SQL scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN expr)
# --------------------------------------------------------------------------

_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     * (1 + CAST(l_tax AS DECIMAL(4,2)))
                     AS DECIMAL(30,6))) AS DOUBLE) AS total_charge
FROM lineitem GROUP BY l_returnflag
"""


@query("sql_scalar_udf_charge", oracle=_SQL_UDF_ORACLE, tags=("sql", "functions"))
def sql_scalar_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF surface: ``CREATE TEMPORARY FUNCTION`` with a
    ``RETURN`` expression body (Spark SQL UDF, not a Python UDF) —
    reusable business logic that stays INSIDE Catalyst: the charge
    formula inlines into the plan, folds, and runs in codegen, unlike
    any external UDF. The oracle restates the inlined expression.

    Scale: zero serialization boundary — this is the mechanism for
    shared expression libraries at 100 TB (Python UDFs cost an Arrow
    round-trip per batch; SQL UDFs cost nothing).
    """
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(
            price DECIMAL(18,2), disc DECIMAL(4,2), tax DECIMAL(4,2))
        RETURNS DECIMAL(30,6)
        RETURN CAST(price * (1 - disc) * (1 + tax) AS DECIMAL(30,6))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(charge(CAST(l_extendedprice AS DECIMAL(18,2)),
                               CAST(l_discount AS DECIMAL(4,2)),
                               CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                 AS total_charge
        FROM lineitem_v GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# Robust statistics (r3): winsorization, group-wise OLS trend, count-min
# --------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderkey, o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM c
),
b AS (
  SELECT o_orderpriority,
         max(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo,
         max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi
  FROM r GROUP BY o_orderpriority
)
SELECT r.o_orderkey, r.o_orderpriority, r.cents,
       CAST(least(greatest(r.cents, b.lo), b.hi) AS BIGINT) AS clipped_cents
FROM r JOIN b USING (o_orderpriority)
"""


@query("winsorize_prices", oracle=_WINSOR_ORACLE, tags=("analytics", "quality"))
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip to the exact p05/p95 within each priority
    group) — the outlier treatment that keeps rows instead of dropping
    them (complements the Tukey-fence `outlier_iqr_prices`). The
    percentile is rank-based and integer-exact: rank ``⌈k·n/100⌉`` via
    ``(k·n+99) div 100`` over (cents, orderkey) total order — no float
    quantile interpolation anywhere.

    Scale: one window pass (rank + count share a single (priority)
    partitioning), a 5-row bounds aggregate that broadcasts, and a
    scan-side clip. Group count is tiny; within-group sort is the only
    real cost — identical to what any exact percentile requires.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    wrk = W.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wall = W.partitionBy("o_orderpriority")
    r = c.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    b = r.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rn") == F.expr("(5 * n + 99) div 100"), F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("cents"))).alias("hi"),
    )
    return r.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
        .cast("long")
        .alias("clipped_cents"),
    )


_TREND_ORACLE = """
WITH t AS (
  SELECT o_custkey,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders
),
s AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM t GROUP BY o_custkey
)
SELECT o_custkey, n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope_cents_per_day,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
       END AS intercept_cents
FROM s
"""


@query("groupwise_trend_orders", oracle=_TREND_ORACLE, tags=("analytics", "agg"))
def groupwise_trend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer OLS trend (spend vs time): slope and intercept from
    the closed-form normal equations, with every sufficient statistic
    (n, Σx, Σy, Σxy, Σx²) an exact 64-bit integer — order-free
    map-side-combinable sums — and the ONLY floating point being two
    final divisions of identical exact integers. Degenerate groups
    (single date) yield NULL, not Inf.

    Scale: one partial-aggregated groupBy; sufficient statistics are
    the textbook distributed-regression decomposition (each partition
    contributes partial sums), so the shuffle carries 5 longs per
    customer regardless of order count.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")).alias("x"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("y"),
    )
    s = t.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("long") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(den == 0, F.lit(None)).otherwise(
        num.cast("double") / den.cast("double")
    )
    intercept = F.when(den == 0, F.lit(None)).otherwise(
        (
            F.col("sy").cast("double")
            - (num.cast("double") / den.cast("double")) * F.col("sx").cast("double")
        )
        / F.col("n").cast("double")
    )
    return s.select(
        "o_custkey",
        "n",
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )




_CMS_D, _CMS_W = 3, 256  # depth (independent hash rows) x width (counters)


def _cms_bucket_sql(j: int) -> str:
    """DuckDB: row-j bucket = integer value of 2 hex chars of the key's
    MD5 at offset 4j (0..255 — width is exactly one byte, no modulo)."""
    p = 1 + 4 * j
    return (
        f"((instr('0123456789abcdef', substr(h, {p}, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substr(h, {p + 1}, 1)) - 1))"
    )


_CMS_ORACLE = f"""
WITH ue AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count FROM events GROUP BY user_id
),
hx AS (
  SELECT user_id, exact_count, md5(CAST(user_id AS VARCHAR)) AS h FROM ue
),
bk AS (
  SELECT user_id, exact_count, j,
         CASE j WHEN 0 THEN {_cms_bucket_sql(0)}
                WHEN 1 THEN {_cms_bucket_sql(1)}
                ELSE {_cms_bucket_sql(2)} END AS bucket
  FROM hx, unnest(generate_series(0, {_CMS_D - 1})) AS t(j)
),
counters AS (
  SELECT j, bucket, CAST(sum(exact_count) AS BIGINT) AS cnt
  FROM bk GROUP BY j, bucket
),
est AS (
  SELECT bk.user_id, CAST(min(c.cnt) AS BIGINT) AS est_count
  FROM bk JOIN counters c ON bk.j = c.j AND bk.bucket = c.bucket
  GROUP BY bk.user_id
)
SELECT ue.user_id, ue.exact_count, est.est_count,
       est.est_count >= ue.exact_count AS overestimate_ok
FROM ue JOIN est ON ue.user_id = est.user_id
"""


@query("countmin_user_counts", oracle=_CMS_ORACLE, tags=("analytics", "approx"))
def countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=3, w=256) estimate of per-user event counts
    next to the exact count, with the CMS guarantee (estimate ≥ truth,
    error bounded by collisions) emitted as an oracle-checked boolean.
    Buckets derive from MD5 bytes of the key — engine-portable, so the
    sketch's collision pattern (and therefore every estimate) is
    deterministic and the oracle reproduces it exactly.

    Scale: the sketch is d·w = 768 counters regardless of cardinality —
    the point of CMS. Counters build from the pre-aggregated per-key
    counts (map-side combinable); the estimate join broadcasts the
    768-row counter table. At 100 TB the same plan holds with the raw
    event count rolled up first, exactly as here.
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    ue = events.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    h = F.md5(F.col("user_id").cast("string"))
    hx = ue.select("user_id", "exact_count", h.alias("h"))
    bucket_cols = [
        F.struct(
            F.lit(j).alias("j"),
            (
                (F.instr(F.lit("0123456789abcdef"), F.substring("h", 1 + 4 * j, 1)) - 1) * 16
                + (F.instr(F.lit("0123456789abcdef"), F.substring("h", 2 + 4 * j, 1)) - 1)
            ).alias("bucket"),
        )
        for j in range(_CMS_D)
    ]
    bk = hx.select(
        "user_id", "exact_count", F.explode(F.array(*bucket_cols)).alias("jb")
    ).select("user_id", "exact_count", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    counters = bk.groupBy("j", "bucket").agg(F.sum("exact_count").cast("long").alias("cnt"))
    est = (
        bk.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )
    return ue.join(est, "user_id").select(
        "user_id",
        "exact_count",
        "est_count",
        (F.col("est_count") >= F.col("exact_count")).alias("overestimate_ok"),
    )


# --------------------------------------------------------------------------
# Approximate-percentile sketch accuracy report
# --------------------------------------------------------------------------

_APPROXQ_ORACLE = """
WITH c AS (
  SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
qs AS (SELECT unnest([50, 95]) AS qm),
n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY g),
hist AS (SELECT g, c AS v, CAST(count(*) AS BIGINT) AS freq FROM c GROUP BY g, c),
hw AS (
  SELECT g, v, sum(freq) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM hist
),
exact AS (
  SELECT hw.g, qs.qm,
         CAST(min(CASE WHEN hw.cum >= (n.n * qs.qm + 99) // 100 THEN hw.v END) AS BIGINT)
           AS exact_cents
  FROM hw JOIN n USING (g) CROSS JOIN qs
  GROUP BY hw.g, qs.qm
)
SELECT exact.g AS l_returnflag, CAST(exact.qm AS BIGINT) AS qm, n.n,
       exact.exact_cents, TRUE AS ok_rank_bound
FROM exact JOIN n USING (g)
"""


@query("approx_quantile_report", oracle=_APPROXQ_ORACLE, tags=("analytics", "sketch"))
def approx_quantile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy gate for Spark's ``percentile_approx`` (the
    Greenwald–Khanna quantile sketch — the O(1/ε)-memory single-pass
    path a 100 TB percentile query MUST take): for p50/p95 of price
    cents per return flag, compute the sketch estimate AND its exact
    rank interval, then assert the GK guarantee — the estimate's rank
    is within ±(n/accuracy + 1) of the target ceil-rank. The oracle
    recomputes the exact quantiles by histogram rank election and
    pins ``ok_rank_bound`` to TRUE, so a sketch drifting out of its
    contract hash-mismatches (the ``countmin_user_counts`` precedent:
    grade the BOUND, not the engine-specific estimate).

    Scale: one pass for the sketch, one histogram aggregate + per-group
    bounded window for the exact side, one broadcast join-back of 6
    estimate rows for the rank probe. Exact values are integer cents.
    """
    tune(spark)
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
    )
    approx = (
        li.groupBy("g")
        .agg(
            F.percentile_approx("c", [0.5, 0.95], 1000).alias("aq"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "g",
            "n",
            F.explode(
                F.arrays_zip(F.array(F.lit(50), F.lit(95)).alias("qm"), F.col("aq").alias("a"))
            ).alias("z"),
        )
        .select("g", "n", F.col("z.qm").cast("long").alias("qm"), F.col("z.a").cast("long").alias("a"))
    )
    ranks = (
        li.join(F.broadcast(approx), "g")
        .groupBy("g", "qm", "n", "a")
        .agg(
            F.sum(F.when(F.col("c") < F.col("a"), 1).otherwise(0)).cast("long").alias("rank_lo"),
            F.sum(F.when(F.col("c") <= F.col("a"), 1).otherwise(0)).cast("long").alias("rank_hi"),
        )
    )
    hist = li.groupBy("g", F.col("c").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    hw = hist.select(
        "g", "v", F.sum("freq").over(Window.partitionBy("g").orderBy("v")).alias("cum")
    )
    exact = (
        hw.join(F.broadcast(approx.select("g", "qm", "n").distinct()), "g")
        .groupBy("g", "qm", "n")
        .agg(
            F.min(
                F.expr("CASE WHEN cum >= (n * qm + 99) div 100 THEN v END")
            ).cast("long").alias("exact_cents")
        )
    )
    return (
        ranks.join(exact, ["g", "qm", "n"])
        .select(
            F.col("g").alias("l_returnflag"),
            "qm",
            "n",
            "exact_cents",
            (
                (F.col("rank_hi") >= (F.expr("(n * qm + 99) div 100") - (F.col("n") / 1000).cast("long") - 1))
                & (F.col("rank_lo") <= (F.expr("(n * qm + 99) div 100") + (F.col("n") / 1000).cast("long") + 1))
            ).alias("ok_rank_bound"),
        )
    )


# --------------------------------------------------------------------------
# Sample-quantile calibration (hash-replayable estimator vs exact ranks)
# --------------------------------------------------------------------------

#: 1/8 deterministic sample: first md5 hex digit of the KEY < 2.
_SQC_SAMPLE_SQL = (
    "instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1"
)
_SQC_QMS = (10, 50, 90)

_SQC_ORACLE = f"""
WITH c AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         {_SQC_SAMPLE_SQL} AS bh
  FROM orders
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _SQC_QMS)}]) AS qm),
nf AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY g),
s AS (SELECT g, c FROM c WHERE bh < 2),
ns AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sample FROM s GROUP BY g),
hws AS (
  SELECT g, v, sum(freq) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM (SELECT g, c AS v, CAST(count(*) AS BIGINT) AS freq FROM s GROUP BY g, c)
),
est AS (
  SELECT hws.g, qs.qm,
         CAST(min(CASE WHEN hws.cum >= (ns.n_sample * qs.qm + 99) // 100
                       THEN hws.v END) AS BIGINT) AS est_cents
  FROM hws JOIN ns USING (g) CROSS JOIN qs
  GROUP BY hws.g, qs.qm
),
hwf AS (
  SELECT g, v, sum(freq) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM (SELECT g, c AS v, CAST(count(*) AS BIGINT) AS freq FROM c GROUP BY g, c)
),
exact AS (
  SELECT hwf.g, qs.qm,
         CAST(min(CASE WHEN hwf.cum >= (nf.n * qs.qm + 99) // 100
                       THEN hwf.v END) AS BIGINT) AS exact_cents
  FROM hwf JOIN nf USING (g) CROSS JOIN qs
  GROUP BY hwf.g, qs.qm
),
rk AS (
  SELECT c.g, e.qm,
         CAST(count(CASE WHEN c.c <= e.est_cents THEN 1 END) AS BIGINT) AS rank_le
  FROM c JOIN est e ON c.g = e.g
  GROUP BY c.g, e.qm
)
SELECT e.g, CAST(e.qm AS BIGINT) AS qm, nf.n, ns.n_sample,
       e.est_cents, x.exact_cents,
       CAST(abs(rk.rank_le * 1000 // nf.n - e.qm * 10) AS BIGINT)
         AS rank_err_permille
FROM est e
JOIN exact x ON e.g = x.g AND e.qm = x.qm
JOIN nf ON nf.g = e.g
JOIN ns ON ns.g = e.g
JOIN rk ON rk.g = e.g AND rk.qm = e.qm
"""


@query("sample_quantile_calibration", oracle=_SQC_ORACLE, tags=("analytics", "sketch"))
def sample_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-quantile ESTIMATOR graded against exact ranks — the
    hash-replayable member of the quantile family, completing the
    sketch-calibration trio (``minhash_error_calibration`` grades the
    Jaccard estimator, ``kmv_distinct_calibration`` the cardinality
    estimator, this one the quantile estimator; the GK sketch itself
    stays bound-asserted in ``approx_quantile_report`` because Spark's
    ``percentile_approx`` internals have no DuckDB twin): p10/p50/p90
    of price cents per order priority estimated from the deterministic
    1/8 md5-keyed sample, then the estimate's TRUE rank in the full
    data measured as error in exact permille — the empirical
    Dvoretzky–Kiefer–Wolfowitz shape (~sqrt(q(1-q)/n_s), ≈26‰ at p50
    for n_s≈375 here) a pipeline consults before trusting sampled
    statistics for shard sizing or winsorize bounds. Every stage —
    sampling rule, ceil-rank election, rank probe — replays
    bit-for-bit in both engines; nothing is bound-asserted.

    Scale: the sample rule is a scan-side predicate (no shuffle to
    sample); both rank elections are per-group bounded-histogram
    windows over DISTINCT cents (the ``approx_quantile_report``
    posture); the rank probe is one more scan with a broadcast
    15-row estimate join — map-side combinable conditional counts,
    so the full pass is three scans of one column regardless of
    corpus size.
    """
    tune(spark)
    from pyspark.sql import Window

    qm_arr = F.array(*[F.lit(q) for q in _SQC_QMS])
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1),
            )
            - 1
        ).alias("bh"),
    )
    nf = ords.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    samp = ords.filter(F.col("bh") < 2)
    ns_ = samp.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_sample"))

    def rank_elect(rows: DataFrame, sizes: DataFrame, size_col: str, out: str) -> DataFrame:
        hist = rows.groupBy("g", F.col("c").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("freq")
        )
        hw = hist.select(
            "g", "v", F.sum("freq").over(Window.partitionBy("g").orderBy("v")).alias("cum")
        )
        return (
            hw.join(F.broadcast(sizes), "g")
            .select("g", "v", "cum", size_col, F.explode(qm_arr).alias("qm"))
            .groupBy("g", "qm")
            .agg(
                F.min(
                    F.expr(f"CASE WHEN cum >= ({size_col} * qm + 99) div 100 THEN v END")
                )
                .cast("long")
                .alias(out)
            )
        )

    est = rank_elect(samp, ns_, "n_sample", "est_cents")
    exact = rank_elect(ords, nf, "n", "exact_cents")
    rk = (
        ords.join(F.broadcast(est), "g")
        .groupBy("g", "qm")
        .agg(
            F.sum(F.when(F.col("c") <= F.col("est_cents"), 1).otherwise(0))
            .cast("long")
            .alias("rank_le")
        )
    )
    return (
        est.join(exact, ["g", "qm"])
        .join(F.broadcast(nf), "g")
        .join(F.broadcast(ns_), "g")
        .join(rk, ["g", "qm"])
        .select(
            "g",
            F.col("qm").cast("long").alias("qm"),
            "n",
            "n_sample",
            "est_cents",
            "exact_cents",
            F.expr("CAST(abs(rank_le * 1000 div n - qm * 10) AS BIGINT)").alias(
                "rank_err_permille"
            ),
        )
    )


# --------------------------------------------------------------------------
# RFM segmentation (three scalable ntiles, no global window)
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH m AS (SELECT max(o_orderdate) AS mx FROM orders),
cu AS (
  SELECT o.o_custkey AS c_custkey,
         CAST(date_diff('day', max(o.o_orderdate), m.mx) AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders o CROSS JOIN m
  GROUP BY o.o_custkey, m.mx
),
q AS (
  SELECT c_custkey, spend_cents,
         ntile(4) OVER (ORDER BY recency_days, c_custkey) AS r_q,
         ntile(4) OVER (ORDER BY n_orders, c_custkey) AS f_q,
         ntile(4) OVER (ORDER BY spend_cents, c_custkey) AS m_q
  FROM cu
)
SELECT 'R' || r_q || 'F' || f_q || 'M' || m_q AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(spend_cents) AS BIGINT) AS spend_cents_total
FROM q GROUP BY segment
"""


def _ntile_rank(rank_col: str, n: int, k: int) -> Column:
    """SQL ntile bucket from a 1-based global rank: the first ``n % k``
    tiles get ``n//k + 1`` rows (the ``ntile_customer_acctbal``
    arithmetic, factored for reuse)."""
    q, r = divmod(n, k)
    qd = max(q, 1)
    return (
        F.when(
            F.col(rank_col) <= r * (q + 1),
            ((F.col(rank_col) - 1) / (q + 1)).cast("bigint"),
        )
        .otherwise(r + ((F.col(rank_col) - r * (q + 1) - 1) / qd).cast("bigint"))
        + 1
    ).cast("int")


@query("rfm_customer_segments", oracle=_RFM_ORACLE, tags=("analytics", "behavior", "scale"))
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic behavioral rollup: per customer,
    recency (days since last order vs the corpus max date), frequency
    (order count), and monetary (exact spend cents) each quartiled,
    then segment cells ('R1F4M4' …) reported with counts and exact
    spend totals. Every quartile is a SCALABLE ntile: global rank from
    ``sampling.global_rank`` (range exchange + local rank + driver
    offsets) and the ntile bucket as pure rank arithmetic — the
    single-partition window DuckDB's native ntile implies never
    appears in the plan (the ``ntile_customer_acctbal`` pattern ×3).

    Scale: one custkey aggregate over orders, three range exchanges
    over the customer-dimension-sized RFM frame, one ≤4³-row segment
    aggregate.
    """
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderdate").alias("__mx"))
    cu = (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.expr("CAST(datediff(max(__mx), max(o_orderdate)) AS BIGINT)").alias(
                "recency_days"
            ),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("spend_cents"),
        )
    )
    n = cu.count()  # scalar, same class as global_rank's offsets
    ranked = SAMP.global_rank(cu, ["recency_days", "c_custkey"], out_col="__rr")
    ranked = SAMP.global_rank(ranked, ["n_orders", "c_custkey"], out_col="__rf")
    ranked = SAMP.global_rank(ranked, ["spend_cents", "c_custkey"], out_col="__rm")
    seg = ranked.select(
        "spend_cents",
        F.concat(
            F.lit("R"), _ntile_rank("__rr", n, 4).cast("string"),
            F.lit("F"), _ntile_rank("__rf", n, 4).cast("string"),
            F.lit("M"), _ntile_rank("__rm", n, 4).cast("string"),
        ).alias("segment"),
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("spend_cents").cast("long").alias("spend_cents_total"),
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch calibration (portable, both engines replay it)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 1 << 32

_KMV_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         CAST({{hexint}} AS BIGINT) AS h
  FROM events
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
),
hk AS (
  SELECT event_type, h AS hk FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM d
  ) WHERE rn = {_KMV_K}
),
est AS (
  SELECT e.event_type, e.exact_users,
         CAST(coalesce(({_KMV_K - 1} * {_KMV_SPACE}) // k.hk, e.exact_users) AS BIGINT) AS kmv_users
  FROM ex e LEFT JOIN hk k ON e.event_type = k.event_type
)
SELECT event_type, exact_users, kmv_users,
       CAST(abs(kmv_users - exact_users) * 1000 // exact_users AS BIGINT) AS err_permille
FROM est
"""


def _kmv_oracle() -> str:
    from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

    return _KMV_ORACLE.format(hexint=_hexint_sql("md5(CAST(user_id AS VARCHAR))", 1, 8))


@query("kmv_distinct_calibration", oracle=_kmv_oracle(), tags=("analytics", "sketch"))
def kmv_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef 2002) distinct-count sketch
    graded against exact: per event_type, the {_KMV_K}-smallest
    portable md5 hash values of user_id yield the estimator
    ``(k−1)·2³² / h_k`` (falling back to the exact count when a group
    has fewer than k distinct hashes — the sketch stores them all),
    reported next to the exact distinct count with the error in exact
    permille. The hash-graded twin of ``approx_distinct_events``: that
    query can only assert HLL++ error BOUNDS as booleans (Spark's
    sketch has no DuckDB twin), while this sketch is replayed
    bit-for-bit by both engines — the ``minhash_error_calibration``
    discipline applied to cardinality estimation. Expected relative
    error ≈ 1/√(k−2) ≈ 13% at k={_KMV_K}; the report shows where the
    corpus actually lands.

    Scale: production keeps only the min-k aggregate (k×8 B per
    group, mergeable map-side); the CALIBRATION pass shown here also
    pays for the exact side — one distinct shuffle — because grading
    the sketch against truth is the entire point. The k-th-minimum
    election windows over DISTINCT hashes per group (|distinct|-sized,
    the bounded-histogram-election posture), never raw events.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    d = ev.select("event_type", h32.alias("h")).distinct()
    exact = (
        ev.distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_users"))
    )
    w = W.partitionBy("event_type").orderBy("h")
    hk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("event_type", F.col("h").alias("hk"))
    )
    est = exact.join(F.broadcast(hk), "event_type", "left").select(
        "event_type",
        "exact_users",
        F.coalesce(
            F.expr(f"({_KMV_K - 1} * {_KMV_SPACE}L) div hk"), F.col("exact_users")
        ).cast("long").alias("kmv_users"),
    )
    return est.select(
        "event_type",
        "exact_users",
        "kmv_users",
        F.expr("abs(kmv_users - exact_users) * 1000 div exact_users")
        .cast("long")
        .alias("err_permille"),
    )


# --------------------------------------------------------------------------
# Replicate-spread uncertainty for the sampled quantile estimator
# --------------------------------------------------------------------------

_QRS_REPS = 8  # disjoint 1/16 md5 replicates (hex digits 0..7)

_QRS_ORACLE = f"""
WITH c AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         {_SQC_SAMPLE_SQL} AS bh
  FROM orders
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _SQC_QMS)}]) AS qm),
nf AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY g),
s AS (SELECT g, bh AS rep, c FROM c WHERE bh < {_QRS_REPS}),
ns AS (SELECT g, rep, CAST(count(*) AS BIGINT) AS n_rep FROM s GROUP BY g, rep),
hws AS (
  SELECT g, rep, v, sum(freq) OVER (PARTITION BY g, rep ORDER BY v) AS cum
  FROM (SELECT g, rep, c AS v, CAST(count(*) AS BIGINT) AS freq
        FROM s GROUP BY g, rep, c)
),
est AS (
  SELECT hws.g, hws.rep, qs.qm,
         CAST(min(CASE WHEN hws.cum >= (ns.n_rep * qs.qm + 99) // 100
                       THEN hws.v END) AS BIGINT) AS est_cents
  FROM hws JOIN ns ON hws.g = ns.g AND hws.rep = ns.rep CROSS JOIN qs
  GROUP BY hws.g, hws.rep, qs.qm
),
sp AS (
  SELECT g, qm,
         CAST(count(*) AS BIGINT) AS n_reps,
         CAST(min(est_cents) AS BIGINT) AS est_min,
         CAST(max(est_cents) AS BIGINT) AS est_max,
         CAST((list_sort(list(est_cents)))
              [({_QRS_REPS} * 50 + 99) // 100] AS BIGINT) AS est_median
  FROM est GROUP BY g, qm
),
rs AS (
  SELECT c.g, sp.qm,
         CAST(count(CASE WHEN c.c > sp.est_min AND c.c <= sp.est_max
                    THEN 1 END) AS BIGINT) AS span_rows
  FROM c JOIN sp ON c.g = sp.g
  GROUP BY c.g, sp.qm
)
SELECT sp.g, CAST(sp.qm AS BIGINT) AS qm, sp.n_reps,
       sp.est_min, sp.est_median, sp.est_max,
       CAST(rs.span_rows * 1000 // nf.n AS BIGINT) AS spread_rank_permille
FROM sp
JOIN rs ON sp.g = rs.g AND sp.qm = rs.qm
JOIN nf ON nf.g = sp.g
"""


@query("quantile_replicate_spread", oracle=_QRS_ORACLE, tags=("analytics", "sketch"))
def quantile_replicate_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate-based UNCERTAINTY for the sampled quantile estimator —
    the deterministic bootstrap completing the calibration story
    (``sample_quantile_calibration`` grades one sample's ERROR; this
    grades the estimator's SPREAD, the number that decides whether
    the sample rate is big enough to act on): {_QRS_REPS} disjoint
    1/16 md5 replicates each elect p10/p50/p90 per priority, and the
    report carries min/median/max replicate estimates plus the
    empirical confidence width in RANK space — full-data rows strictly
    between the extreme estimates, in exact permille (the
    scale-free width a shard-sizing decision compares against its
    tolerance). Replicates are hash-disjoint so the spread is a real
    between-sample statistic, and every election and division replays
    bit-for-bit in both engines — no randomness, no bootstrap
    resampling driver loop.

    Scale: the replicate column is the SAME scan-side md5 digit the
    calibration query reads (no extra pass); elections are per-(group,
    replicate) bounded-histogram windows; the rank-span probe is one
    more scan against a broadcast 15-row min/max frame. Replicate
    count multiplies only the bounded histogram, never the scans.
    """
    tune(spark)
    from pyspark.sql import Window

    qm_arr = F.array(*[F.lit(q) for q in _SQC_QMS])
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1),
            )
            - 1
        ).alias("bh"),
    )
    nf = ords.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = ords.filter(F.col("bh") < _QRS_REPS).select("g", F.col("bh").alias("rep"), "c")
    ns_ = s.groupBy("g", "rep").agg(F.count(F.lit(1)).cast("long").alias("n_rep"))
    hist = s.groupBy("g", "rep", F.col("c").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    hw = hist.select(
        "g",
        "rep",
        "v",
        F.sum("freq").over(Window.partitionBy("g", "rep").orderBy("v")).alias("cum"),
    )
    est = (
        hw.join(F.broadcast(ns_), ["g", "rep"])
        .select("g", "rep", "v", "cum", "n_rep", F.explode(qm_arr).alias("qm"))
        .groupBy("g", "rep", "qm")
        .agg(
            F.min(F.expr("CASE WHEN cum >= (n_rep * qm + 99) div 100 THEN v END"))
            .cast("long")
            .alias("est_cents")
        )
    )
    med_ix = (_QRS_REPS * 50 + 99) // 100
    sp = est.groupBy("g", "qm").agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.min("est_cents").cast("long").alias("est_min"),
        F.max("est_cents").cast("long").alias("est_max"),
        F.expr(f"CAST(array_sort(collect_list(est_cents))[{med_ix - 1}] AS BIGINT)").alias(
            "est_median"
        ),
    )
    rs = (
        ords.join(F.broadcast(sp.select("g", "qm", "est_min", "est_max")), "g")
        .groupBy("g", "qm")
        .agg(
            F.sum(
                F.when((F.col("c") > F.col("est_min")) & (F.col("c") <= F.col("est_max")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("span_rows")
        )
    )
    return (
        sp.join(rs, ["g", "qm"])
        .join(F.broadcast(nf), "g")
        .select(
            "g",
            F.col("qm").cast("long").alias("qm"),
            "n_reps",
            "est_min",
            "est_median",
            "est_max",
            F.expr("CAST(span_rows * 1000 div n AS BIGINT)").alias(
                "spread_rank_permille"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation (the CBO input, sketch-calibrated)
# ---------------------------------------------------------------------------

#: deterministic key-sample: join keys whose md5 first hex digit is 0
#: (rate 1/16) contribute exact per-key frequency products; the
#: estimate scales by 16.
_JCE_RATE = 16

_JCE_BUCKET = "instr('0123456789abcdef', substr(md5(CAST({key} AS {vc})), 1, 1)) - 1"


def _jce_leg_sql(
    name: str, a_tbl: str, a_key: str, b_tbl: str, b_key: str, vc: str = "VARCHAR"
) -> str:
    """One estimated join: exact per-key counts on both sides for the
    SAMPLED keys only, the frequency-product estimate scaled by the
    sample rate, and the true join cardinality — shared SQL text for
    both engines apart from the division token (none needed: all
    multiplication). ``vc`` is the string-cast type token (Spark
    spells it STRING, DuckDB VARCHAR)."""
    bk = lambda key: _JCE_BUCKET.format(key=key, vc=vc)  # noqa: E731
    return f"""SELECT '{name}' AS join_name,
       CAST({_JCE_RATE} AS BIGINT) AS sample_rate,
       (SELECT CAST(count(DISTINCT {a_key}) AS BIGINT) FROM {a_tbl}
        WHERE {bk(a_key)} = 0) AS n_keys_sampled,
       (SELECT CAST(coalesce(sum(ca * cb), 0) * {_JCE_RATE} AS BIGINT) FROM
         (SELECT {a_key} AS k, CAST(count(*) AS BIGINT) AS ca FROM {a_tbl}
          WHERE {bk(a_key)} = 0 GROUP BY {a_key}) sa
         JOIN
         (SELECT {b_key} AS k, CAST(count(*) AS BIGINT) AS cb FROM {b_tbl}
          WHERE {bk(b_key)} = 0 GROUP BY {b_key}) sb
         USING (k)) AS est_rows,
       (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) FROM
         (SELECT {a_key} AS k, CAST(count(*) AS BIGINT) AS ca FROM {a_tbl}
          GROUP BY {a_key}) fa
         JOIN
         (SELECT {b_key} AS k, CAST(count(*) AS BIGINT) AS cb FROM {b_tbl}
          GROUP BY {b_key}) fb
         USING (k)) AS exact_rows"""


_JCE_LEGS = (
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("events_user_selfjoin", "events", "user_id", "events", "user_id"),
)

_JCE_BODY = "\nUNION ALL\n".join(_jce_leg_sql(*leg) for leg in _JCE_LEGS)

_JCE_ORACLE = f"""
SELECT join_name, sample_rate, n_keys_sampled, est_rows, exact_rows,
       CAST(CASE WHEN est_rows >= exact_rows THEN est_rows - exact_rows
                 ELSE exact_rows - est_rows END * 1000
            // CASE WHEN exact_rows > 0 THEN exact_rows ELSE 1 END
            AS BIGINT) AS abs_err_permille
FROM ({_JCE_BODY})
"""


@query(
    "join_cardinality_estimate",
    oracle=_JCE_ORACLE,
    tags=("analytics", "diagnostics", "scale"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-SIZE estimation by deterministic key sampling — the
    cost-based-optimizer input every 100 TB join plan hangs on, held
    to the repo's sketch-calibration discipline (``kmv``/``minhash``/
    ``quantile`` precedents): for each of three join shapes, exact
    per-key frequencies are computed ONLY for the 1/{_JCE_RATE}
    md5-sampled key slice, the frequency-product sum scales by
    {_JCE_RATE}, and the row grades the estimate against the true
    cardinality in exact per-mille. Key-domain sampling (not row
    sampling) is the correct discipline for join estimation — row
    sampling biases multiplicity products, while sampling the KEY
    domain keeps every sampled key's product exact (Vengerov 2015's
    correlated-sampling insight; both sides filter by the SAME hash,
    so matching keys are sampled together). The three shapes span the
    regimes: two FK joins (multiplicity 1×m — easy) and the
    events-user SELF-join, whose size is the second frequency moment
    F2, the classic hard target. Measured: at sf0.01 the legs read
    155/30/12‰ error and at sf0.1 55/11/139‰ — at 1/16 key-domain
    sampling, accurate enough to pick broadcast-vs-shuffle. The
    honest failure mode sits at sf0.001: the events table has ~100
    distinct users, the 1/16 sample catches ZERO of them, and the
    estimate reads 0 (1000‰) — ``n_keys_sampled`` is in the row
    precisely so a planner applies the production rule: below a
    sampled-key floor, fall back to exact counting (which is cheap
    exactly when the key domain is that small).

    Scale: each leg touches only hash-prefiltered key slices for the
    estimate (a predicate the scan can push down — the whole point:
    the estimator must be radically cheaper than the join) plus one
    full per-key count for the ground truth the GRADING needs (a
    production deployment drops the truth column and keeps the
    1/{_JCE_RATE} legs). No join of fact tables is ever materialized
    — cardinalities come from frequency products.
    """
    tune(spark)
    for t in ("customer", "orders", "lineitem", "events"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__jce_{t}")
    body = "\nUNION ALL\n".join(
        _jce_leg_sql(name, f"__jce_{a}", ak, f"__jce_{b}", bkey, vc="STRING")
        for name, a, ak, b, bkey in _JCE_LEGS
    )
    return spark.sql(
        f"""SELECT join_name, sample_rate, n_keys_sampled, est_rows, exact_rows,
       CAST(CASE WHEN est_rows >= exact_rows THEN est_rows - exact_rows
                 ELSE exact_rows - est_rows END * 1000
            div CASE WHEN exact_rows > 0 THEN exact_rows ELSE 1 END
            AS BIGINT) AS abs_err_permille
FROM ({body})"""
    )


# ---------------------------------------------------------------------------
# Predicate selectivity estimation (the histogram CBO input)
# ---------------------------------------------------------------------------

_PSEL_B = 32  # equi-width histogram buckets


def _psel_sql(dv: str) -> str:
    """Engine-portable estimator body over view ``__pselcents`` (c):
    integer bounds, ceil bucket width, the 32-bucket equi-width
    histogram, three named range predicates derived from the bounds,
    and the textbook uniform-within-bucket interpolation — every step
    exact BIGINT so both engines replay the estimate bit-for-bit."""
    B = _PSEL_B
    return f"""
WITH b AS (
  SELECT CAST(min(c) AS BIGINT) AS mn, CAST(max(c) AS BIGINT) AS mx,
         CAST((max(c) - min(c) + 1 + {B - 1}) {dv} {B} AS BIGINT) AS width
  FROM __pselcents
),
h AS (
  SELECT CAST((c - b.mn) {dv} b.width AS BIGINT) AS bkt,
         CAST(count(*) AS BIGINT) AS cnt
  FROM __pselcents, b GROUP BY 1
),
p AS (
  SELECT 'mid_quarter' AS pred_name,
         CAST(mn + (mx - mn + 1) * 3 {dv} 8 AS BIGINT) AS lo,
         CAST(mn + (mx - mn + 1) * 5 {dv} 8 - 1 AS BIGINT) AS hi
  FROM b
  UNION ALL
  SELECT 'top_decile',
         CAST(mn + (mx - mn + 1) * 9 {dv} 10 AS BIGINT), mx FROM b
  UNION ALL
  SELECT 'narrow_slab',
         CAST(mn + (mx - mn + 1) {dv} 2 AS BIGINT),
         CAST(mn + (mx - mn + 1) {dv} 2 + (mx - mn + 1) {dv} 100 AS BIGINT)
  FROM b
),
est AS (
  SELECT p.pred_name, p.lo, p.hi,
         CAST(coalesce(sum(
           h.cnt * greatest(CAST(0 AS BIGINT),
             least(p.hi, b.mn + (h.bkt + 1) * b.width - 1)
             - greatest(p.lo, b.mn + h.bkt * b.width) + 1) {dv} b.width
         ), 0) AS BIGINT) AS est_rows
  FROM p, h, b GROUP BY p.pred_name, p.lo, p.hi
),
ex AS (
  SELECT p.pred_name,
         CAST(count(CASE WHEN s.c BETWEEN p.lo AND p.hi THEN 1 END) AS BIGINT)
           AS exact_rows
  FROM p, __pselcents s GROUP BY p.pred_name
)
SELECT e.pred_name, e.lo AS lo_cents, e.hi AS hi_cents,
       e.est_rows, x.exact_rows,
       CAST(CASE WHEN e.est_rows >= x.exact_rows
                 THEN e.est_rows - x.exact_rows
                 ELSE x.exact_rows - e.est_rows END * 1000
            {dv} CASE WHEN x.exact_rows > 0 THEN x.exact_rows ELSE 1 END
            AS BIGINT) AS abs_err_permille
FROM est e JOIN ex x ON e.pred_name = x.pred_name
"""


_PSEL_ORACLE = (
    "WITH __pselcents AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
    " AS BIGINT) AS c FROM orders),\n"
    + _psel_sql("//").strip().removeprefix("WITH ")
)


@query(
    "predicate_selectivity_estimate",
    oracle=_PSEL_ORACLE,
    tags=("analytics", "diagnostics", "scale"),
)
def predicate_selectivity_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate SELECTIVITY estimation from an equi-width histogram —
    the other CBO input next to ``join_cardinality_estimate``, held to
    the same grading discipline: a {_PSEL_B}-bucket integer-cents
    histogram over order totalprice, three range predicates spanning
    the regimes (a quarter-span slab, the top decile, a 1%-span narrow
    slab), the textbook uniform-within-bucket interpolation in exact
    BIGINT cross-multiplication, and the estimate graded against the
    exact count in per-mille. The regime finding the three predicates
    exist to show: wide predicates estimate well (bucket-interior mass
    dominates), the narrow slab is the hard case (it lives inside ~1
    bucket, so the whole estimate IS the uniformity assumption) — the
    reason real optimizers escalate from equi-width to equi-depth to
    sampled estimation as predicates narrow. Measured at sf0.01:
    mid-quarter 0‰, top-decile 2‰, narrow slab 59‰.

    Scale: one scan builds the histogram (map-side combinable
    {_PSEL_B}-group count); the estimator then runs on {_PSEL_B} rows ×
    3 predicates; the exact side is the grading cost only (one
    conditional-count pass a production deployment drops). Bounds ride
    a broadcast 1-row frame; no shuffle beyond the bucket count.
    """
    tune(spark)
    load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "c"
        )
    ).createOrReplaceTempView("__pselcents")
    return spark.sql(_psel_sql("div"))


# ---------------------------------------------------------------------------
# Predicate selectivity, equi-depth (the escalation, measured)
# ---------------------------------------------------------------------------


def _pseld_sql(dv: str) -> str:
    """Engine-portable equi-depth estimator body over views
    ``__pselcents`` (c — for the shared predicate definitions and the
    exact grading) and ``__pseldepth`` (bkt, lo_b, hi_b, cnt — the
    rank-bucketed histogram): same three predicates, interpolation
    within each bucket's own VALUE range."""
    B = _PSEL_B
    return f"""
WITH b AS (
  SELECT CAST(min(c) AS BIGINT) AS mn, CAST(max(c) AS BIGINT) AS mx
  FROM __pselcents
),
p AS (
  SELECT 'mid_quarter' AS pred_name,
         CAST(mn + (mx - mn + 1) * 3 {dv} 8 AS BIGINT) AS lo,
         CAST(mn + (mx - mn + 1) * 5 {dv} 8 - 1 AS BIGINT) AS hi
  FROM b
  UNION ALL
  SELECT 'top_decile',
         CAST(mn + (mx - mn + 1) * 9 {dv} 10 AS BIGINT), mx FROM b
  UNION ALL
  SELECT 'narrow_slab',
         CAST(mn + (mx - mn + 1) {dv} 2 AS BIGINT),
         CAST(mn + (mx - mn + 1) {dv} 2 + (mx - mn + 1) {dv} 100 AS BIGINT)
  FROM b
),
est AS (
  SELECT p.pred_name, p.lo, p.hi,
         CAST(coalesce(sum(
           d.cnt * greatest(CAST(0 AS BIGINT),
             least(p.hi, d.hi_b) - greatest(p.lo, d.lo_b) + 1)
           {dv} (d.hi_b - d.lo_b + 1)
         ), 0) AS BIGINT) AS est_rows
  FROM p, __pseldepth d GROUP BY p.pred_name, p.lo, p.hi
),
ex AS (
  SELECT p.pred_name,
         CAST(count(CASE WHEN s.c BETWEEN p.lo AND p.hi THEN 1 END) AS BIGINT)
           AS exact_rows
  FROM p, __pselcents s GROUP BY p.pred_name
)
SELECT e.pred_name, e.lo AS lo_cents, e.hi AS hi_cents,
       CAST({B} AS BIGINT) AS n_buckets,
       e.est_rows, x.exact_rows,
       CAST(CASE WHEN e.est_rows >= x.exact_rows
                 THEN e.est_rows - x.exact_rows
                 ELSE x.exact_rows - e.est_rows END * 1000
            {dv} CASE WHEN x.exact_rows > 0 THEN x.exact_rows ELSE 1 END
            AS BIGINT) AS abs_err_permille
FROM est e JOIN ex x ON e.pred_name = x.pred_name
"""


_PSELD_ORACLE = (
    "WITH __pselcents AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
    " AS BIGINT) AS c, o_orderkey FROM orders),\n"
    "__pseldepth AS (\n"
    "  SELECT bkt, CAST(min(c) AS BIGINT) AS lo_b, CAST(max(c) AS BIGINT) AS hi_b,\n"
    "         CAST(count(*) AS BIGINT) AS cnt\n"
    "  FROM (SELECT c,\n"
    "          (row_number() OVER (ORDER BY c, o_orderkey) - 1)\n"
    f"          * {_PSEL_B} // (SELECT count(*) FROM __pselcents) AS bkt\n"
    "        FROM __pselcents)\n"
    "  GROUP BY bkt\n"
    "),\n"
    + _pseld_sql("//").strip().removeprefix("WITH ")
)


@query(
    "predicate_selectivity_equidepth",
    oracle=_PSELD_ORACLE,
    tags=("analytics", "diagnostics", "scale"),
)
def predicate_selectivity_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ESCALATION the equi-width estimator's docstring names,
    measured: the same three predicates estimated from a {_PSEL_B}-bucket
    EQUI-DEPTH histogram (buckets hold equal row counts, so resolution
    concentrates where the mass is — exactly what the narrow-slab
    regime needs). Buckets come from the scalable global-rank
    machinery (``sampling.global_rank``: range exchange + parallel
    local rank, never a single-partition window — the
    ``ntile_customer_acctbal`` posture); interpolation runs within
    each bucket's own value range in exact BIGINTs. Measured against
    the equi-width rung, and the result is POPULATION-conditional —
    the honest finding: at sf0.01 (~156 rows/bucket) the escalation
    pays where it should (narrow slab 59‰ → 39‰, the other regimes
    unchanged at 0‰/2‰), but at sf0.001 (~16 rows/bucket) equi-depth
    is WORSE across the board (narrow 66‰ → 200‰): thin equal-count
    buckets have noisy value ranges, so the within-bucket uniformity
    assumption degrades faster than equi-width's fixed grid. The
    production read-off: the escalation ladder is equi-width →
    equi-depth → sampling, but ANALYZE must size rows-per-bucket, not
    just bucket count — a histogram knob that silently flips sign on
    small partitions.

    Scale: one scan + the range-exchange rank (the global sort a real
    ANALYZE pays once per column), then the estimator runs on
    {_PSEL_B} bucket rows × 3 predicates; the exact side is grading
    cost only. No single-partition window anywhere.
    """
    tune(spark)
    cents = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "c"
        ),
        "o_orderkey",
    )
    cents.createOrReplaceTempView("__pselcents")
    ranked = SAMP.global_rank(cents, ["c", "o_orderkey"], out_col="rn")
    nf = cents.agg(F.count(F.lit(1)).cast("long").alias("n"))
    depth = (
        ranked.crossJoin(F.broadcast(nf))
        .select("c", F.expr(f"(rn - 1) * {_PSEL_B} div n").alias("bkt"))
        .groupBy("bkt")
        .agg(
            F.min("c").cast("long").alias("lo_b"),
            F.max("c").cast("long").alias("hi_b"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .localCheckpoint(eager=False)
    )
    depth.createOrReplaceTempView("__pseldepth")
    return spark.sql(_pseld_sql("div"))


# ---------------------------------------------------------------------------
# Join-order election (the Selinger DP over the two CBO inputs)
# ---------------------------------------------------------------------------

#: fixed-point scale for join selectivities: f_e ≈ 6.7e-8 for the
#: customer-orders edge, so per-mille/ppm scales underflow to 0 — 1e12
#: keeps every tested SF's selectivity and every DP product inside
#: BIGINT (past ~sf1 a production planner moves to log-domain costs).
_JOP_SCALE = 10**12


def _jop_est_sub(a_tbl: str, a_key: str, b_tbl: str, b_key: str, vc: str) -> str:
    """The sampled pair-cardinality estimate — exactly the
    ``join_cardinality_estimate`` leg (1/{rate} md5 key-domain slice,
    frequency products exact on the slice, scaled back up) as a scalar
    subquery."""
    bk = lambda key: _JCE_BUCKET.format(key=key, vc=vc)  # noqa: E731
    return f"""(SELECT CAST(coalesce(sum(ca * cb), 0) * {_JCE_RATE} AS BIGINT) FROM
     (SELECT {a_key} AS k, CAST(count(*) AS BIGINT) AS ca FROM {a_tbl}
      WHERE {bk(a_key)} = 0 GROUP BY {a_key}) sa
     JOIN
     (SELECT {b_key} AS k, CAST(count(*) AS BIGINT) AS cb FROM {b_tbl}
      WHERE {bk(b_key)} = 0 GROUP BY {b_key}) sb
     USING (k))"""


def _jop_sql(dv: str, n: str, c: str, o: str, l: str, vc: str) -> str:
    """Engine-portable Selinger body over the chain N–C–O–L: base
    counts, sampled pair estimates, TRUE subset cardinalities (the
    grading control), independence-model subset estimates extended in
    a fixed left-to-right order (so truncation is path-unique), and
    the left-deep DP — cost model C_out (sum of every intermediate
    including the top), tie-breaks total (smaller cost, then
    lexicographically smaller order string; pair orders put the
    smaller base-card side first, name-tiebroken) — run TWICE, once on
    estimated and once on true cardinalities."""
    S = _JOP_SCALE
    err = (
        "CAST(CASE WHEN {e} >= {t} THEN {e} - {t} ELSE {t} - {e} END * 1000 "
        + dv
        + " CASE WHEN {t} > 0 THEN {t} ELSE 1 END AS BIGINT)"
    )
    return f"""
WITH st AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM {n}) AS n_n,
    (SELECT CAST(count(*) AS BIGINT) FROM {c}) AS n_c,
    (SELECT CAST(count(*) AS BIGINT) FROM {o}) AS n_o,
    (SELECT CAST(count(*) AS BIGINT) FROM {l}) AS n_l,
    {_jop_est_sub(n, 'n_nationkey', c, 'c_nationkey', vc)} AS p_nc,
    {_jop_est_sub(c, 'c_custkey', o, 'o_custkey', vc)} AS p_co,
    {_jop_est_sub(o, 'o_orderkey', l, 'l_orderkey', vc)} AS p_ol,
    (SELECT CAST(count(*) AS BIGINT) FROM {n}
     JOIN {c} ON n_nationkey = c_nationkey) AS t_nc,
    (SELECT CAST(count(*) AS BIGINT) FROM {c}
     JOIN {o} ON c_custkey = o_custkey) AS t_co,
    (SELECT CAST(count(*) AS BIGINT) FROM {o}
     JOIN {l} ON o_orderkey = l_orderkey) AS t_ol,
    (SELECT CAST(count(*) AS BIGINT) FROM {n}
     JOIN {c} ON n_nationkey = c_nationkey
     JOIN {o} ON c_custkey = o_custkey) AS t_nco,
    (SELECT CAST(count(*) AS BIGINT) FROM {c}
     JOIN {o} ON c_custkey = o_custkey
     JOIN {l} ON o_orderkey = l_orderkey) AS t_col,
    (SELECT CAST(count(*) AS BIGINT) FROM {n}
     JOIN {c} ON n_nationkey = c_nationkey
     JOIN {o} ON c_custkey = o_custkey
     JOIN {l} ON o_orderkey = l_orderkey) AS t_ncol
),
f AS (
  SELECT st.*,
    CAST(p_nc * {S} {dv} (n_n * n_c) AS BIGINT) AS f_nc,
    CAST(p_co * {S} {dv} (n_c * n_o) AS BIGINT) AS f_co,
    CAST(p_ol * {S} {dv} (n_o * n_l) AS BIGINT) AS f_ol
  FROM st
),
e1 AS (
  SELECT f.*,
    CAST(n_n * n_c * f_nc {dv} {S} AS BIGINT) AS e_nc,
    CAST(n_c * n_o * f_co {dv} {S} AS BIGINT) AS e_co,
    CAST(n_o * n_l * f_ol {dv} {S} AS BIGINT) AS e_ol
  FROM f
),
e2 AS (
  SELECT e1.*,
    CAST(e_nc * n_o * f_co {dv} {S} AS BIGINT) AS e_nco,
    CAST(e_co * n_l * f_ol {dv} {S} AS BIGINT) AS e_col
  FROM e1
),
e3 AS (
  SELECT e2.*, CAST(e_nco * n_l * f_ol {dv} {S} AS BIGINT) AS e_ncol FROM e2
),
g AS (
  SELECT e3.*,
    CASE WHEN n_n < n_c THEN 'N,C' WHEN n_c < n_n THEN 'C,N'
         ELSE 'C,N' END AS o_nc,
    CASE WHEN n_c < n_o THEN 'C,O' WHEN n_o < n_c THEN 'O,C'
         ELSE 'C,O' END AS o_co,
    CASE WHEN n_o < n_l THEN 'O,L' WHEN n_l < n_o THEN 'L,O'
         ELSE 'L,O' END AS o_ol
  FROM e3
),
d3 AS (
  SELECT g.*,
    least(e_nc, e_co) + e_nco AS c_nco,
    CASE WHEN e_nc < e_co THEN o_nc || ',O'
         WHEN e_co < e_nc THEN o_co || ',N'
         ELSE least(o_nc || ',O', o_co || ',N') END AS o_nco,
    least(e_co, e_ol) + e_col AS c_col,
    CASE WHEN e_co < e_ol THEN o_co || ',L'
         WHEN e_ol < e_co THEN o_ol || ',C'
         ELSE least(o_co || ',L', o_ol || ',C') END AS o_col,
    least(t_nc, t_co) + t_nco AS ct_nco,
    CASE WHEN t_nc < t_co THEN o_nc || ',O'
         WHEN t_co < t_nc THEN o_co || ',N'
         ELSE least(o_nc || ',O', o_co || ',N') END AS ot_nco,
    least(t_co, t_ol) + t_col AS ct_col,
    CASE WHEN t_co < t_ol THEN o_co || ',L'
         WHEN t_ol < t_co THEN o_ol || ',C'
         ELSE least(o_co || ',L', o_ol || ',C') END AS ot_col
  FROM g
),
d4 AS (
  SELECT d3.*,
    least(c_nco, c_col) + e_ncol AS c_ncol,
    CASE WHEN c_nco < c_col THEN o_nco || ',L'
         WHEN c_col < c_nco THEN o_col || ',N'
         ELSE least(o_nco || ',L', o_col || ',N') END AS o_ncol,
    least(ct_nco, ct_col) + t_ncol AS ct_ncol,
    CASE WHEN ct_nco < ct_col THEN ot_nco || ',L'
         WHEN ct_col < ct_nco THEN ot_col || ',N'
         ELSE least(ot_nco || ',L', ot_col || ',N') END AS ot_ncol
  FROM d3
)
SELECT subset, n_tables, est_card, true_card,
       {err.format(e='est_card', t='true_card')} AS card_err_permille,
       est_cost, true_cost, est_order, true_order,
       CAST(CASE WHEN est_order = true_order THEN 1 ELSE 0 END AS BIGINT)
         AS plans_agree
FROM (
  SELECT 'N' AS subset, CAST(1 AS BIGINT) AS n_tables,
         n_n AS est_card, n_n AS true_card,
         CAST(0 AS BIGINT) AS est_cost, CAST(0 AS BIGINT) AS true_cost,
         'N' AS est_order, 'N' AS true_order
  FROM d4
  UNION ALL
  SELECT 'C', 2 - 1, n_c, n_c, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'C', 'C'
  FROM d4
  UNION ALL
  SELECT 'O', 2 - 1, n_o, n_o, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'O', 'O'
  FROM d4
  UNION ALL
  SELECT 'L', 2 - 1, n_l, n_l, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'L', 'L'
  FROM d4
  UNION ALL
  SELECT 'NC', 2, e_nc, t_nc, e_nc, t_nc, o_nc, o_nc FROM d4
  UNION ALL
  SELECT 'CO', 2, e_co, t_co, e_co, t_co, o_co, o_co FROM d4
  UNION ALL
  SELECT 'OL', 2, e_ol, t_ol, e_ol, t_ol, o_ol, o_ol FROM d4
  UNION ALL
  SELECT 'NCO', 3, e_nco, t_nco, c_nco, ct_nco, o_nco, ot_nco FROM d4
  UNION ALL
  SELECT 'COL', 3, e_col, t_col, c_col, ct_col, o_col, ot_col FROM d4
  UNION ALL
  SELECT 'NCOL', 4, e_ncol, t_ncol, c_ncol, ct_ncol, o_ncol, ot_ncol FROM d4
)
"""


_JOP_ORACLE = _jop_sql("//", "nation", "customer", "orders", "lineitem", "VARCHAR")


@query(
    "join_order_plan",
    oracle=_JOP_ORACLE,
    tags=("analytics", "diagnostics", "scale"),
)
def join_order_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Selinger left-deep join-order DP (Selinger et al. 1979) run
    on the repo's own CBO inputs — the capstone that composes
    ``join_cardinality_estimate`` into the decision it exists to
    feed. Over the chain nation–customer–orders–lineitem: base counts
    (the stats a catalog always has), the three pair cardinalities
    estimated by the graded 1/{_JCE_RATE} md5 key-domain sampler,
    subset cardinalities from the textbook independence model (pair
    selectivities at fixed-point scale {_JOP_SCALE:.0e}, extended
    left-to-right so integer truncation is path-unique), and the DP
    over all 10 connected subsets with C_out cost (sum of every
    intermediate) and total tie-breaks — run TWICE, on estimated and
    on TRUE subset cardinalities (real join counts, the grading
    control a production planner cannot afford — which is the point),
    with ``plans_agree`` comparing the elected orders per subset.

    Measured at all three SFs: the estimate-driven DP elects the
    true-optimal order on EVERY subset (``plans_agree`` = 1 × 10 rows
    × 3 SFs) — N,C,O,L for the full chain. Two findings inside that
    agreement: (1) the decision the estimates actually inform —
    extending COL from CO (cost 15,000) vs from OL (cost 60,000) at
    sf0.01 — is called correctly from 30–155‰-error estimates,
    because the cost ratio sits far from the decision boundary; this
    robustness-to-bad-stats is WHY Selinger planning works. (2) The
    nation edge exposes the sampler's documented small-domain failure
    mode inside the DP: the 25-key nationkey domain deterministically
    catches ZERO keys in the 1/{_JCE_RATE} md5 slice, every N-subset
    estimate reads 0 (1000‰), and the est arm elects N-first on
    degenerate zero-cost evidence (the truth arm agrees only because
    nation is genuinely tiny). The production rule
    ``join_cardinality_estimate`` pins — below a sampled-key floor,
    fall back to exact counting, cheap exactly when the domain is
    small — belongs IN FRONT of the DP; this query keeps the raw
    failure visible rather than papering over it.

    Scale: the planner's inputs are the estimator legs (hash-pushed
    key-slice scans) plus catalog counts; the DP itself is closed-form
    arithmetic on ONE broadcast row — 10 states for a 4-chain, never
    a data-sized shuffle. The true-cardinality columns are grading
    cost only (three real joins a deployment drops). Fixed-point
    {_JOP_SCALE:.0e} selectivities hold to ~sf1; past that a planner
    moves to log-domain costs.
    """
    tune(spark)
    for t in ("nation", "customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__jop_{t}")
    return spark.sql(
        _jop_sql(
            "div", "__jop_nation", "__jop_customer", "__jop_orders",
            "__jop_lineitem", "STRING",
        )
    )


# ---------------------------------------------------------------------------
# Runtime-filter (bloom) semi-join pruning (the execution half of the CBO)
# ---------------------------------------------------------------------------

_BLOOM_K = 3  # hash functions per key
#: the two filter sizes reported side by side — the sizing decision:
#: 2^16 is provably undersized for the filtered key domain at sf0.1,
#: 2^20 comfortable; the report prices both.
_BLOOM_SIZES = (1 << 16, 1 << 20)


def _bloom_pos_sql(key: str, i: int, m: int, vc: str) -> str:
    """Bit position i ∈ [0, k) for ``key``: first 8 md5 nibbles of the
    salted key string, mod m — deterministic, engine-portable (the
    hex parse is the instr chain; Spark evaluates the same text)."""
    s = f"concat(CAST({key} AS {vc}), ':', '{i}')"
    h = "(" + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({s}), {1 + j}, 1)) - 1"
        f" AS BIGINT) * {16 ** (7 - j)}"
        for j in range(8)
    ) + ")"
    return f"({h} % {m})"


def _bloom_sql(dv: str, orders: str, lineitem: str, vc: str) -> str:
    """Engine-portable body: the filtered dim keys, per-size bloom bit
    sets (distinct positions), scan-side probe of every fact row's key
    (pass = all {k} positions present), the exact semi-join truth, and
    the realized-filter FP expectation (bits_set/m)^k in exact
    permille cross-multiplication."""
    k = _BLOOM_K
    legs = []
    for m in _BLOOM_SIZES:
        poss_d = ", ".join(
            _bloom_pos_sql("o_orderkey", i, m, vc) + f" AS p{i}" for i in range(k)
        )
        poss_f = ", ".join(
            _bloom_pos_sql("l_orderkey", i, m, vc) + f" AS p{i}" for i in range(k)
        )
        probe_join = " AND ".join(
            f"EXISTS (SELECT 1 FROM bits_{m} b WHERE b.pos = pk.p{i})"
            for i in range(k)
        )
        legs.append(
            f"""dimpos_{m} AS (
  SELECT {poss_d} FROM dk
),
bits_{m} AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT p{i} AS pos FROM dimpos_{m}" for i in range(k))}
  )
),
probekeys_{m} AS (
  SELECT lk.l_orderkey, {poss_f.replace('l_orderkey', 'lk.l_orderkey')}
  FROM lk
),
passkeys_{m} AS (
  SELECT l_orderkey FROM probekeys_{m} pk
  WHERE {probe_join}
),
leg_{m} AS (
  SELECT CAST({m} AS BIGINT) AS m_bits,
         CAST({k} AS BIGINT) AS k_hashes,
         (SELECT CAST(count(*) AS BIGINT) FROM dk) AS n_dim_keys,
         (SELECT CAST(count(*) AS BIGINT) FROM bits_{m}) AS bits_set,
         (SELECT CAST(count(*) AS BIGINT) FROM {lineitem}) AS n_fact_rows,
         (SELECT CAST(coalesce(sum(f.n), 0) AS BIGINT)
          FROM passkeys_{m} p JOIN fct f ON p.l_orderkey = f.l_orderkey)
           AS n_pass_rows,
         (SELECT CAST(coalesce(sum(f.n), 0) AS BIGINT)
          FROM dk d JOIN fct f ON d.o_orderkey = f.l_orderkey)
           AS n_match_rows
)"""
        )
    finals = "\nUNION ALL\n".join(
        f"""SELECT m_bits, k_hashes, n_dim_keys, bits_set,
       n_fact_rows, n_pass_rows, n_match_rows,
       n_pass_rows - n_match_rows AS n_false_positive_rows,
       CAST((n_pass_rows - n_match_rows) * 1000
            {dv} CASE WHEN n_fact_rows - n_match_rows > 0
                      THEN n_fact_rows - n_match_rows ELSE 1 END
            AS BIGINT) AS fp_measured_permille,
       CAST((bits_set * 1000 {dv} m_bits)
            * (bits_set * 1000 {dv} m_bits)
            * (bits_set * 1000 {dv} m_bits) {dv} 1000000
            AS BIGINT) AS fp_expected_permille
FROM leg_{m}"""
        for m in _BLOOM_SIZES
    )
    return f"""
WITH dk AS (
  SELECT DISTINCT o_orderkey FROM {orders} WHERE o_orderpriority = '1-URGENT'
),
lk AS (SELECT DISTINCT l_orderkey FROM {lineitem}),
fct AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
  FROM {lineitem} GROUP BY l_orderkey
),
{",".join(legs)}
{finals}
"""


_BLOOM_ORACLE = _bloom_sql("//", "orders", "lineitem", "VARCHAR")


@query(
    "bloom_semijoin_prune_report",
    oracle=_BLOOM_ORACLE,
    tags=("analytics", "scale", "diagnostics"),
)
def bloom_semijoin_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME-FILTER pruning, measured — the execution-time half of
    join optimization next to the planning half (``join_order_plan``):
    at 100 TB the single biggest join lever is not ordering but NOT
    SHUFFLING the fact rows a filtered dim side can never match
    (Spark's own runtime bloom filter / DPP story, made explicit and
    graded). The urgent-priority orders' keys build a k={_BLOOM_K}
    bloom filter at TWO sizes ({" and ".join(f"2^{m.bit_length() - 1}" for m in _BLOOM_SIZES)});
    every lineitem key is probed scan-side (pass = all {_BLOOM_K}
    md5-derived positions set — deterministic, so both engines replay
    the filter bit-for-bit), graded against the exact semi-join, and
    the report prices the filter with the REALIZED-occupancy FP model
    (bits_set/m)^k — exact for a uniform non-member probe against the
    filter actually built, tighter than the textbook asymptotic.

    Measured at sf0.1 (30,076 filtered keys, 600k fact rows): the
    2^16 filter is saturated — 49,122/65,536 bits set — and passes
    320,678 rows against 120,566 true matches, measured FP 417‰ vs
    the realized-occupancy model's 420‰ (the model is good to 3‰,
    which is why a runtime can SIZE the filter from bits_set alone
    mid-query); the 2^20 filter (8.3% occupancy) passes 120,846 —
    within 280 rows (0.6‰, below the report's integer-permille floor)
    of exact. Same story compressed at sf0.01: 94 false-positive rows
    at 2^16, zero at 2^20. The sizing read-off: m must track the
    FILTERED key count (the CBO estimate ``join_cardinality_estimate``
    provides), not the table size — a saturated filter silently
    degrades to a 42% pass-through that still LOOKS like pruning.

    Scale: the filter is bits_set distinct positions built from one
    scan of the filtered dim keys (broadcast as a bitset in a real
    runtime — {max(_BLOOM_SIZES) // 8 // 1024} KiB at 2^{max(_BLOOM_SIZES).bit_length() - 1}); the probe
    is scan-side arithmetic on the fact key (pushes below the
    shuffle); the exact semi-join column is grading cost only. Probe
    positions are computed per DISTINCT fact key, then row counts
    join back — the fact table itself is scanned once for counts.
    """
    tune(spark)
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__blm_{t}")
    return spark.sql(_bloom_sql("div", "__blm_orders", "__blm_lineitem", "STRING"))


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count calibration (portable registers, both
# engines replay the sketch bit-for-bit)
# ---------------------------------------------------------------------------

_HLL_P = 6
_HLL_M = 1 << _HLL_P  # 64 registers
_HLL_WBITS = 32 - _HLL_P  # 26-bit rho field
_HLL_WMOD = 1 << _HLL_WBITS
_HLL_ALPHA = "CAST('0.709' AS DOUBLE)"  # alpha_64 (Flajolet 2007, Fig. 3)
_HLL_LIN_BAR = (5 * _HLL_M) // 2  # 2.5*m small-range bar (exact int)


def _hll_sql(engine: str, events: str) -> str:
    """Shared HLL text, engine-parameterized only in spelling (hash
    nibbles→int, bit-length, shift, integer division) — every
    arithmetic step is the same expression, so the registers, the
    indicator sum, and the final double are bit-identical."""
    if engine == "spark":
        h32 = "cast(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) as bigint)"
        blen = lambda v: f"CAST(length(conv(CAST({v} AS BIGINT), 10, 2)) AS INT)"  # noqa: E731
        shift = "shiftleft(CAST(1 AS BIGINT), mj)"
        dv = "div"
        from efficient_llm_data_wrangling_spark.functions import portable_math as PM

        lnv = PM.lnint_inline_sql("CASE WHEN v > 0 THEN v ELSE 1 END")
    else:
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        h32 = _hexint_sql("md5(CAST(user_id AS VARCHAR))", 1, 8)
        blen = lambda v: f"CAST(length(bin(CAST({v} AS BIGINT))) AS INT)"  # noqa: E731
        shift = "(CAST(1 AS BIGINT) << mj)"
        dv = "//"
        from efficient_llm_data_wrangling_spark.functions import portable_math as PM

        lnv = PM.lnint_inline_sql_duck("CASE WHEN v > 0 THEN v ELSE 1 END")
    # ln(m) = p*ln2 exactly under the portable formula (z = 0 branch)
    ln_m = f"(CAST({_HLL_P} AS DOUBLE) * {PM.LN2_SQL})"
    return f"""
WITH d AS (
  SELECT DISTINCT event_type, CAST({h32} AS BIGINT) AS h
  FROM {events}
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM {events} GROUP BY event_type
),
rg AS (
  SELECT event_type, h {dv} {_HLL_WMOD} AS j,
         max(CASE WHEN h % {_HLL_WMOD} = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - {blen(f"h % {_HLL_WMOD}")} END) AS mj
  FROM d GROUP BY event_type, h {dv} {_HLL_WMOD}
),
z AS (
  SELECT event_type,
         sum(CAST(1 AS DOUBLE) / CAST({shift} AS DOUBLE)) AS zp,
         CAST(count(*) AS BIGINT) AS npres
  FROM rg GROUP BY event_type
),
e AS (
  SELECT ex.event_type, ex.exact_users,
         z.zp + CAST({_HLL_M} - z.npres AS DOUBLE) AS zz,
         {_HLL_M} - z.npres AS v
  FROM ex JOIN z ON ex.event_type = z.event_type
),
est AS (
  SELECT event_type, exact_users, v,
         {_HLL_ALPHA} * CAST({_HLL_M * _HLL_M} AS DOUBLE) / zz AS e_raw
  FROM e
),
fin AS (
  SELECT event_type, exact_users,
         CASE WHEN e_raw <= CAST({_HLL_LIN_BAR} AS DOUBLE) AND v > 0
              THEN CAST({_HLL_M} AS DOUBLE) * ({ln_m} - ({lnv}))
              ELSE e_raw END AS e_fin,
         CASE WHEN e_raw <= CAST({_HLL_LIN_BAR} AS DOUBLE) AND v > 0
              THEN 'linear' ELSE 'raw' END AS regime
  FROM est
)
SELECT event_type, exact_users,
       CAST(floor(e_fin) AS BIGINT) AS hll_users,
       CAST(abs(CAST(floor(e_fin) AS BIGINT) - exact_users) * 1000
            {dv} exact_users AS BIGINT) AS err_permille,
       regime
FROM fin
"""


@query("hll_distinct_calibration", oracle=_hll_sql("duck", "events"), tags=("analytics", "sketch"))
def hll_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (Flajolet 2007) distinct-count sketch graded
    against exact — the sketch family's third rung next to KMV
    (order statistics) and Count-Min (frequency): per event_type,
    each distinct 32-bit portable md5 hash of user_id lands in one of
    m=64 registers by its top 6 bits, the register keeps the max
    leading-zero rank rho of the remaining 26 bits, and the estimator
    is alpha_64 * m^2 / sum_j 2^(-M_j) with Flajolet's small-range
    linear-counting fallback m*ln(m/V) when the raw estimate is under
    2.5m and empty registers remain. Both engines replay the sketch
    bit-for-bit: the indicator sum is a sum of exact dyadic doubles
    (order-independent by construction), ln goes through the portable
    atanh series, and the released estimate is floor'd — the oracle
    hash equality IS the sketch replay, the
    ``kmv_distinct_calibration`` discipline applied to the estimator
    production systems actually deploy. The ``regime`` column shows
    which correction fired; expected relative error 1.04/sqrt(64) =
    13% in the raw regime, better under linear counting.

    Measured: at sf0.1 (1,500 distinct users per event_type, n = 23m)
    the raw regime reads 1,532 — 21 permille, well inside the 13%
    band. At sf0.01 (150 distinct, n = 2.3m) the sketch sits in the
    awkward linear/raw crossover: linear counting fires on V = 10
    empty registers (the Poisson expectation is ~6) and reads 118 —
    213 permille, the honest cost of a 64-register sketch right at
    the correction boundary (production picks p >= 12, where the
    crossover sits far below interesting cardinalities).

    Honest omissions, both unreachable at any test SF and both noted
    for the 100 TB posture: the 32-bit large-range correction (fires
    above ~143M distinct per group — production uses a 64-bit hash,
    which removes it entirely) and HLL++'s empirical bias tables
    (Heule 2013; the classic estimator is the portable one).

    Scale: production keeps only the 64-register max-aggregate
    (64 x 1 B per group, mergeable map-side — this is WHY HLL is the
    industry default); the CALIBRATION pass also pays for the exact
    side — one distinct shuffle — because grading the sketch against
    truth is the point. Register election groups by (event_type, j):
    at most 64 rows per group survive the map-side combine.
    """
    tune(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__hll_events")
    return spark.sql(_hll_sql("spark", "__hll_events"))


# ---------------------------------------------------------------------------
# Label propagation vs connected components (the transitive-chaining
# problem of dedup graphs, measured)
# ---------------------------------------------------------------------------

_LPA_G = 8  # clique size (ground-truth community)
_LPA_ROUNDS = 4


def _lpa_sql(engine: str, documents: str) -> str:
    """Shared LPA-vs-min-label text; engine differences are integer
    division and DuckDB-side MATERIALIZED (multi-referenced rounds).
    The graph is deterministic with closed-form ground truth (the
    ``connected_components_halving`` precedent): doc_ids tile into
    {_LPA_G}-cliques (gk = id div {_LPA_G}) and every third adjacent
    clique pair gets ONE planted bridge between representatives — the
    false-positive edge an LSH band join contributes. Both algorithms
    run {_LPA_ROUNDS} synchronous unrolled rounds: LPA adopts the
    most frequent neighbor label (count DESC, label ASC ties),
    min-label CC takes min(own, neighbors). Convergence is REPORTED
    (n_changed_last_round), not assumed."""
    dv = "div" if engine == "spark" else "//"
    mat = "" if engine == "spark" else "MATERIALIZED "
    ctes = [
        # groups of size 1 (isolated node: inner joins drop it from
        # the LPA arm) or 2 (synchronous LPA label-swaps forever on a
        # bare pair) can arise as the TAIL clique when the doc count
        # is not a multiple of {_LPA_G}; both are degenerate GRAPHS,
        # not algorithm cases, so the vertex set keeps only groups
        # with >= 3 members (no-op at every test SF — tails are 4 or
        # 0 — and the replay test mirrors the rule)
        f"v0g AS {mat}(SELECT doc_id AS node, doc_id {dv} {_LPA_G} AS gk FROM {documents})",
        "vsz AS (SELECT gk, count(*) AS sz FROM v0g GROUP BY gk)",
        f"v AS {mat}(SELECT n.node, n.gk FROM v0g n JOIN vsz z ON z.gk = n.gk AND z.sz >= 3)",
        (
            "ce AS (SELECT a.node AS src, b.node AS dst"
            " FROM v a JOIN v b ON a.gk = b.gk AND a.node <> b.node)"
        ),
        (
            f"gs AS {mat}(SELECT gk, min(node) AS rep FROM v GROUP BY gk)"
        ),
        (
            f"br0 AS (SELECT a.rep AS src, b.rep AS dst FROM gs a JOIN gs b"
            f" ON b.gk = a.gk + 1 AND a.gk % 3 = 0)"
        ),
        (
            f"edges AS {mat}(SELECT src, dst FROM ce"
            " UNION ALL SELECT src, dst FROM br0"
            " UNION ALL SELECT dst, src FROM br0)"
        ),
        "l0 AS (SELECT node, node AS lab FROM v)",
        "m0 AS (SELECT node, node AS lab FROM v)",
    ]
    for r in range(1, _LPA_ROUNDS + 1):
        ctes.append(
            f"""lc{r} AS {mat}(
  SELECT e.dst AS node, l.lab, CAST(count(*) AS BIGINT) AS c
  FROM edges e JOIN l{r - 1} l ON l.node = e.src
  GROUP BY e.dst, l.lab
)"""
        )
        ctes.append(
            f"""l{r} AS {mat}(
  SELECT node, lab FROM (
    SELECT node, lab, row_number() OVER (PARTITION BY node
                                         ORDER BY c DESC, lab) AS rn
    FROM lc{r}
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""m{r} AS {mat}(
  SELECT n.node, least(n.lab, coalesce(mn.ml, n.lab)) AS lab
  FROM m{r - 1} n LEFT JOIN (
    SELECT e.dst AS node, min(l.lab) AS ml
    FROM edges e JOIN m{r - 1} l ON l.node = e.src
    GROUP BY e.dst
  ) mn ON mn.node = n.node
)"""
        )
    r, p = _LPA_ROUNDS, _LPA_ROUNDS - 1
    ctes.append(
        f"""fin AS {mat}(
  SELECT 'lpa' AS method, l.node, l.lab, v.gk,
         CASE WHEN l.lab <> q.lab THEN 1 ELSE 0 END AS chg
  FROM l{r} l JOIN l{p} q ON q.node = l.node JOIN v ON v.node = l.node
  UNION ALL
  SELECT 'minlabel_cc', m.node, m.lab, v.gk,
         CASE WHEN m.lab <> q.lab THEN 1 ELSE 0 END
  FROM m{r} m JOIN m{p} q ON q.node = m.node JOIN v ON v.node = m.node
)"""
    )
    ctes.append(
        """gstat AS (
  SELECT method, gk, CAST(count(DISTINCT lab) AS BIGINT) AS nlabs
  FROM fin GROUP BY method, gk
)"""
    )
    ctes.append(
        """cstat AS (
  SELECT method, lab, CAST(count(DISTINCT gk) AS BIGINT) AS ngks
  FROM fin GROUP BY method, lab
)"""
    )
    ctes.append(
        """gagg AS (
  SELECT method, CAST(sum(CASE WHEN nlabs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_split_groups
  FROM gstat GROUP BY method
)"""
    )
    ctes.append(
        """cagg AS (
  SELECT method, CAST(sum(CASE WHEN ngks > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_merged_communities
  FROM cstat GROUP BY method
)"""
    )
    ctes.append("eagg AS (SELECT CAST(count(*) AS BIGINT) AS n_edges_directed FROM edges)")
    ctes.append("bagg AS (SELECT CAST(count(*) AS BIGINT) AS n_bridges FROM br0)")
    ctes.append(
        """fagg AS (
  SELECT method, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(count(DISTINCT lab) AS BIGINT) AS n_communities,
         CAST(sum(chg) AS BIGINT) AS n_changed_last_round
  FROM fin GROUP BY method
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT f.method, f.n_nodes, e.n_edges_directed, b.n_bridges,
       f.n_communities, g.n_split_groups, c.n_merged_communities,
       f.n_changed_last_round
FROM fagg f
JOIN gagg g ON g.method = f.method
JOIN cagg c ON c.method = f.method
CROSS JOIN eagg e CROSS JOIN bagg b
"""
    )


@query(
    "label_propagation_communities",
    oracle=_lpa_sql("duck", "documents"),
    tags=("analytics", "graph", "iterative"),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) vs min-label
    connected components on the SAME bridged-clique graph — the
    measured answer to dedup's transitive-chaining problem: an LSH
    band join emits occasional false-positive pairs, CC (what
    ``dedup_cluster_canonical`` runs) merges everything a bridge
    touches, and community detection is the standard counter. The
    graph is deterministic with closed-form truth (the
    ``connected_components_halving`` discipline): doc_ids tile into
    {8}-cliques, every third adjacent clique pair gets one planted
    bridge between representatives. Both algorithms run 4 unrolled
    synchronous rounds with fully deterministic elections (LPA:
    neighbor-label frequency, count DESC / label ASC ties; CC:
    min(own, neighbor labels)); convergence is REPORTED
    (n_changed_last_round), not assumed.

    Measured (sf0.01: 63 cliques, 21 bridges; sf0.1: 625 / 208):
    both converge inside the budget (n_changed_last_round = 0), and
    they split exactly on the bridges — LPA recovers ALL ground-truth
    communities (n_communities = n_cliques, zero splits, zero
    merges: a 1-vs-7 frequency vote ignores a single bridge) while
    CC returns n_cliques - n_bridges components (42 / 417;
    n_merged_communities = n_bridges exactly). The dedup read-off:
    run CC for recall on verified pairs, run LPA when the pair
    stream still carries unverified LSH candidates.

    Scale: per round, LPA is one edges-ranks join + one (node,
    label) count + one per-node argmax window (bounded by degree,
    here {7}+1); CC is one join + min-aggregate — the
    ``pagerank_trade_network`` topology. Edges are clique-bounded
    (|V| x {7} + bridges); nothing quadratic in the corpus. In the
    real pipeline the same rounds consume the LSH candidate-pair
    table in place of the synthetic cliques.
    """
    tune(spark)
    load_table(spark, sf_dir, "documents").select("doc_id").createOrReplaceTempView(
        "__lpa_documents"
    )
    return spark.sql(_lpa_sql("spark", "__lpa_documents"))


# ---------------------------------------------------------------------------
# Pareto skyline: the dominance operator, closed-form over the size domain
# ---------------------------------------------------------------------------


def _skyline_sql(engine: str, part: str) -> str:
    """Shared skyline text — pure integer arithmetic (DECIMAL(18,2)
    cents), identical on both engines; only the table name differs."""
    return f"""
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS sz,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
  FROM {part}
),
g AS (
  SELECT sz, CAST(min(pc) AS BIGINT) AS pmin, CAST(count(*) AS BIGINT) AS n_parts
  FROM p GROUP BY sz
),
s AS (
  SELECT sz, pmin,
         min(pmin) OVER (ORDER BY sz DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_larger,
         min(pmin) OVER (ORDER BY sz ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_smaller
  FROM g
),
sky AS (
  SELECT 'premium' AS arm, sz, pmin FROM s
  WHERE best_larger IS NULL OR pmin < best_larger
  UNION ALL
  SELECT 'compact' AS arm, sz, pmin FROM s
  WHERE best_smaller IS NULL OR pmin < best_smaller
),
pts AS (
  SELECT k.arm, p.p_partkey, p.sz, p.pc
  FROM p JOIN sky k ON k.sz = p.sz AND p.pc = k.pmin
)
SELECT arm, p_partkey, sz AS p_size, pc AS price_centi,
       CAST(row_number() OVER (PARTITION BY arm ORDER BY sz, p_partkey)
            AS BIGINT) AS skyline_rank,
       CAST(count(*) OVER (PARTITION BY arm) AS BIGINT) AS n_skyline_parts
FROM pts
"""


@query(
    "pareto_skyline_parts",
    oracle=_skyline_sql("duck", "part"),
    tags=("analytics", "olap"),
)
def pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (Borzsony/Kossmann/Stocker, ICDE 2001) — the
    dominance operator the optimizer family lacked: all parts not
    weakly dominated under TWO preference arms sharing every
    expression, 'premium' (maximize p_size, minimize price) and
    'compact' (minimize both). Weak dominance with one strict
    coordinate: equal (size, price) twins never dominate each other,
    so exact duplicates co-survive (test-pinned). The naive operator
    is the O(n^2) NOT EXISTS self-join; here the 2-D skyline
    collapses to a CLOSED FORM over the size DOMAIN — per size, only
    the min-price parts can survive (same-size cheaper parts
    dominate), and a size-group survives iff its pmin beats the
    running min over strictly better sizes (one window over ~50
    rows). Prices are exact DECIMAL(18,2) cents; no doubles anywhere.

    Measured (sf0.01 / sf0.1): the premium skyline keeps 4 / 2 size
    groups (4 rows at sf0.1 — two same-price twins co-survive, the
    weak-dominance semantics visible in the data) and the compact
    4 / 1 — the skyline SHRINKS as the corpus grows (each size's
    pmin walks toward the domain floor, so one near-floor group
    dominates the rest), the classic independent-dimensions result
    (E[skyline size] ~ O((ln n)^(d-1)) for d = 2).

    Scale: one map-side-combinable GROUP BY over the 50-value size
    domain, one ~50-row window (bounded by the SCHEMA's size domain,
    not the corpus — the single-partition window precedent of the
    bounded-histogram elections), and one join back that AQE
    broadcasts (sky is <= 50 rows). Nothing quadratic; d > 2 needs
    the local-skyline-then-merge partition algorithm instead — the
    closed form is exactly the d = 2 prize.
    """
    tune(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("__sky_part")
    return spark.sql(_skyline_sql("spark", "__sky_part"))


# ---------------------------------------------------------------------------
# Sketch mergeability: shard-combine == global-rebuild, the 100 TB identity
# ---------------------------------------------------------------------------


def _sketch_merge_sql(engine: str, documents: str) -> str:
    """Shared HLL+KMV merge-vs-rebuild text, engine-parameterized only
    in spelling (hash nibbles->int, bit-length, shift, integer
    division, portable ln) — same discipline as ``_hll_sql``."""
    from efficient_llm_data_wrangling_spark.functions import portable_math as PM

    if engine == "spark":
        h32 = "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)"
        blen = lambda v: f"CAST(length(conv(CAST({v} AS BIGINT), 10, 2)) AS INT)"  # noqa: E731
        shift = "shiftleft(CAST(1 AS BIGINT), mj)"
        dv = "div"
        lnv = PM.lnint_inline_sql("CASE WHEN v > 0 THEN v ELSE 1 END")
    else:
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        h32 = _hexint_sql("md5(text)", 1, 8)
        blen = lambda v: f"CAST(length(bin(CAST({v} AS BIGINT))) AS INT)"  # noqa: E731
        shift = "(CAST(1 AS BIGINT) << mj)"
        dv = "//"
        lnv = PM.lnint_inline_sql_duck("CASE WHEN v > 0 THEN v ELSE 1 END")
    ln_m = f"(CAST({_HLL_P} AS DOUBLE) * {PM.LN2_SQL})"
    rho = (
        f"CASE WHEN h % {_HLL_WMOD} = 0 THEN {_HLL_WBITS + 1} "
        f"ELSE {_HLL_WBITS + 1} - {blen(f'h % {_HLL_WMOD}')} END"
    )
    return f"""
WITH d AS (
  SELECT DISTINCT source, CAST({h32} AS BIGINT) AS h FROM {documents}
),
dg AS (SELECT DISTINCT h FROM d),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_distinct,
         (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM d) AS n_sources
  FROM dg
),
rg_src AS (
  SELECT source, h {dv} {_HLL_WMOD} AS j, max({rho}) AS mj
  FROM d GROUP BY source, h {dv} {_HLL_WMOD}
),
rg_merged AS (SELECT j, max(mj) AS mj FROM rg_src GROUP BY j),
rg_rebuilt AS (
  SELECT h {dv} {_HLL_WMOD} AS j, max({rho}) AS mj
  FROM dg GROUP BY h {dv} {_HLL_WMOD}
),
hll_mismatch AS (
  SELECT CAST(count(*) AS BIGINT) AS n_mismatch
  FROM rg_merged m FULL OUTER JOIN rg_rebuilt r ON m.j = r.j
  WHERE coalesce(m.mj, -1) != coalesce(r.mj, -1)
),
hll_legs AS (
  SELECT 'merged' AS leg, j, mj FROM rg_merged
  UNION ALL
  SELECT 'rebuilt' AS leg, j, mj FROM rg_rebuilt
),
hll_z AS (
  SELECT leg,
         sum(CAST(1 AS DOUBLE) / CAST({shift} AS DOUBLE)) AS zp,
         CAST(count(*) AS BIGINT) AS npres
  FROM hll_legs GROUP BY leg
),
hll_est AS (
  SELECT leg, {_HLL_M} - npres AS v,
         {_HLL_ALPHA} * CAST({_HLL_M * _HLL_M} AS DOUBLE)
           / (zp + CAST({_HLL_M} - npres AS DOUBLE)) AS e_raw
  FROM hll_z
),
hll_fin AS (
  SELECT leg,
         CAST(floor(CASE WHEN e_raw <= CAST({_HLL_LIN_BAR} AS DOUBLE) AND v > 0
                         THEN CAST({_HLL_M} AS DOUBLE) * ({ln_m} - ({lnv}))
                         ELSE e_raw END) AS BIGINT) AS est
  FROM hll_est
),
kmv_src AS (
  SELECT h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM d
  ) t WHERE rn <= {_KMV_K}
),
kmv_merged_set AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM kmv_src) u
  ) t WHERE rn <= {_KMV_K}
),
kmv_rebuilt_set AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM dg
  ) t WHERE rn <= {_KMV_K}
),
kmv_mismatch AS (
  SELECT CAST(count(*) AS BIGINT) AS n_mismatch
  FROM kmv_merged_set m FULL OUTER JOIN kmv_rebuilt_set r ON m.h = r.h
  WHERE m.h IS NULL OR r.h IS NULL
),
kmv_fin AS (
  SELECT 'merged' AS leg,
         CAST({_KMV_K - 1} * {_KMV_SPACE} AS BIGINT) {dv} max(h) AS est
  FROM kmv_merged_set
  UNION ALL
  SELECT 'rebuilt' AS leg,
         CAST({_KMV_K - 1} * {_KMV_SPACE} AS BIGINT) {dv} max(h) AS est
  FROM kmv_rebuilt_set
),
rows_out AS (
  SELECT 'hll' AS sketch,
         max(CASE WHEN leg = 'merged' THEN est END) AS merged_estimate,
         max(CASE WHEN leg = 'rebuilt' THEN est END) AS rebuilt_estimate,
         (SELECT n_mismatch FROM hll_mismatch) AS n_structure_mismatch
  FROM hll_fin
  UNION ALL
  SELECT 'kmv' AS sketch,
         max(CASE WHEN leg = 'merged' THEN est END) AS merged_estimate,
         max(CASE WHEN leg = 'rebuilt' THEN est END) AS rebuilt_estimate,
         (SELECT n_mismatch FROM kmv_mismatch) AS n_structure_mismatch
  FROM kmv_fin
)
SELECT r.sketch, e.n_sources, e.exact_distinct,
       CAST(r.merged_estimate AS BIGINT) AS merged_estimate,
       CAST(r.rebuilt_estimate AS BIGINT) AS rebuilt_estimate,
       CAST(r.n_structure_mismatch AS BIGINT) AS n_structure_mismatch,
       r.merged_estimate = r.rebuilt_estimate AS estimates_equal,
       CAST(abs(r.merged_estimate - e.exact_distinct) * 1000
            {dv} e.exact_distinct AS BIGINT) AS err_permille_merged
FROM rows_out r CROSS JOIN ex e
"""


@query(
    "sketch_merge_report",
    oracle=_sketch_merge_sql("duck", "documents"),
    tags=("analytics", "sketch", "scale"),
)
def sketch_merge_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY verified, not assumed — the identity that
    makes sketches the 100 TB primitive: build HLL registers and a
    KMV min-set per SOURCE shard, combine the per-shard sketches
    (HLL: register-wise max of maxes; KMV: k smallest of the union of
    k-sets), and prove the combined sketch is BIT-IDENTICAL to one
    rebuilt from the global distinct stream (``n_structure_mismatch``
    == 0 for both families, and the released estimates are equal).
    This is the lattice-homomorphism property (max and min-k are both
    commutative idempotent monoids) that lets a 1000-executor plan
    sketch each shard independently and combine 64-byte states at the
    driver — no re-read, no distinct shuffle. Same portable spellings
    as ``hll_distinct_calibration`` / ``kmv_distinct_calibration``
    (32-bit md5 registers, dyadic indicator sum, portable ln,
    floor'd release; (k-1)*2^32/h_k over exact BIGINTs), so both
    engines replay every register and every min-set element.

    Measured (sf0.01 / sf0.1): 20 sources at both SFs; exact distinct
    texts 500 / 4,992 (the corpus's planted duplication collapses
    hard under DISTINCT — the dedup families' finding read back
    through a sketch); both sketches merge == rebuild EXACTLY
    (0 register/min-set mismatches, estimates equal); merged HLL
    reads 88 / 42 permille error (inside the 1.04/sqrt(64) = 13%
    band) and merged KMV 130 / 65 permille — the usual k=64
    accuracy, now with the merge path certified.

    Scale: the per-shard legs group by (source, j) — map-side
    combinable, at most 64 register rows and 64 min-set rows per
    source survive. The windowed per-source rank is the PORTABLE
    CALIBRATION spelling of KMV's bounded min-heap (production uses a
    k-bounded min-set aggregate, map-side combinable; the window
    partitions by source, per-key state bounded by the source's
    distinct hashes). The rebuilt leg pays one global distinct — the
    calibration cost, exactly what merging avoids in production; the
    report exists to prove skipping it is safe.
    """
    tune(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__skm_documents")
    return spark.sql(_sketch_merge_sql("spark", "__skm_documents"))
