"""Temporal / history / graph-analytics operators: SCD2 history
construction, time-series gap interpolation, per-group mode, portable
weighted sampling, and fixed-point PageRank in exact integer units.

These extend the warehouse family (``queries/etl.py`` upsert/CDC) and
the iterative family (``operators/graph.py`` connected components)
with the remaining shapes a production lakehouse runs daily.

Cross-engine conventions (registry.py): window frames and orderings
are total (explicit tiebreaks); every fractional value derives either
from integer arithmetic (PageRank nano-units, interpolation
milli-cents via exact ``floor``) or the identical IEEE double op
sequence (weighted-sample keys, rounded to 12 dp to absorb the ≤1 ulp
``ln`` difference between libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# SCD2: status-change history per customer
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderstatus, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
marked AS (
  SELECT o_custkey, o_orderstatus, d, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_status
  FROM o
),
changes AS (
  SELECT o_custkey, o_orderstatus, d
  FROM marked WHERE prev_status IS NULL OR o_orderstatus <> prev_status
)
SELECT o_custkey, o_orderstatus,
       CAST(d AS VARCHAR) AS valid_from,
       CAST(lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderstatus) AS VARCHAR)
         AS valid_to,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d, o_orderstatus) AS INT)
         AS version,
       lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderstatus) IS NULL
         AS is_current
FROM changes
"""


@query("scd2_status_history", oracle=_SCD2_ORACLE, tags=("temporal", "etl"))
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event log: per
    customer, collapse the order-status timeline into change rows with
    ``[valid_from, valid_to)`` ranges, a version counter, and an
    ``is_current`` flag — the standard dimension-history shape
    (complements the SCD1 merge in ``upsert_snapshot_orders``).
    Change detection is ``lag() <>`` over a total (date, orderkey)
    order; validity ranges come from ``lead()`` over the change rows.

    Scale: two window passes over the SAME (custkey | date, …)
    partitioning — one shuffle, the second window reuses the sort
    within partitions. No join, no collect.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    w_scan = W.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w_scan))
        .filter(F.col("prev_status").isNull() | (F.col("o_orderstatus") != F.col("prev_status")))
        .select("o_custkey", "o_orderstatus", "d")
    )
    w_hist = W.partitionBy("o_custkey").orderBy("d", "o_orderstatus")
    return changes.select(
        "o_custkey",
        "o_orderstatus",
        F.col("d").cast("string").alias("valid_from"),
        F.lead("d").over(w_hist).cast("string").alias("valid_to"),
        F.row_number().over(w_hist).cast("int").alias("version"),
        F.lead("d").over(w_hist).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill: per-user daily spine with linear interpolation
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
bounds AS (
  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
j AS (
  SELECT s.user_id, s.d, daily.cents FROM spine s
  LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
),
f AS (
  SELECT user_id, d, cents,
         last_value(cents IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS prev_c,
         last_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS prev_d,
         first_value(cents IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
         first_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM j
)
SELECT user_id, CAST(d AS VARCHAR) AS day,
       CAST(CASE WHEN cents IS NOT NULL THEN cents * 1000
                 ELSE floor(CAST(prev_c AS DOUBLE)
                            + CAST((next_c - prev_c) * date_diff('day', prev_d, d) AS DOUBLE)
                              / date_diff('day', prev_d, next_d)) * 1000
            END AS BIGINT) AS value_milli_cents,
       cents IS NOT NULL AS was_present
FROM f
"""


@query("interpolate_gaps_events", oracle=_INTERP_ORACLE, tags=("temporal", "window"))
def interpolate_gaps_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series per user: build the min→max date spine,
    left-join observed daily totals, and linearly interpolate missing
    days between their nearest observed neighbors (spine endpoints are
    always observed, so no extrapolation case exists). All arithmetic
    is exact-integer cents — the interpolation ratio is the only
    division, applied to exact ints and floored, so both engines agree
    bit-for-bit.

    Scale: one groupBy (daily totals), one tiny per-user bounds agg
    whose spine explode is ~days-per-user rows, one keyed left join,
    and two window passes over the same (user | day) sort. Carry-
    forward/backward via ``last/first IGNORE NULLS`` — no self-join,
    no driver loop.
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("c").alias("cents"))
    )
    bounds = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    j = spine.join(daily, ["user_id", "d"], "left")
    w_back = W.partitionBy("user_id").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    w_fwd = W.partitionBy("user_id").orderBy("d").rowsBetween(0, W.unboundedFollowing)
    present_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    f = j.select(
        "user_id",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(w_back).alias("prev_c"),
        F.last(present_d, ignorenulls=True).over(w_back).alias("prev_d"),
        F.first("cents", ignorenulls=True).over(w_fwd).alias("next_c"),
        F.first(present_d, ignorenulls=True).over(w_fwd).alias("next_d"),
    )
    interp = (
        F.floor(
            F.col("prev_c").cast("double")
            + ((F.col("next_c") - F.col("prev_c")) * F.datediff("d", "prev_d")).cast("double")
            / F.datediff("next_d", "prev_d")
        )
        * 1000
    )
    return f.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        F.when(F.col("cents").isNotNull(), F.col("cents") * 1000)
        .otherwise(interp)
        .cast("long")
        .alias("value_milli_cents"),
        F.col("cents").isNotNull().alias("was_present"),
    )


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group with deterministic tiebreak
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rk
  FROM c
)
SELECT user_id, event_type AS mode_event_type, CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1
"""


@query("mode_event_type_per_user", oracle=_MODE_ORACLE, tags=("temporal", "agg"))
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a total tiebreak (count desc, value asc) —
    the categorical summary statistic Spark has no built-in aggregate
    for; composed as count → window rank → filter, which IS the
    scalable formulation (``mode()`` UDAFs hold per-group hashmaps;
    this holds nothing).

    Scale: partial-aggregated count (map-side combine) then a window
    over the already-shuffled (user_id) partitioning — the window
    reuses the groupBy's exchange under AQE, so effectively one
    shuffle.
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), F.col("n").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis, portable)
# ---------------------------------------------------------------------------

# --- portable ln for the ES sample key -------------------------------------
#
# libm ``ln`` differs by 1 ulp between the JVM and DuckDB's C library;
# at 12-dp rounding that flips a boundary with probability ~1e-6 per
# row — invisible at sf0.01, a near-certain mismatch by sf0.1 (150k
# rows). Fix: compute ln with a FIXED atanh series over +,-,*,/ only
# (IEEE-exact-rounded, so both engines produce the identical double):
#
#   u = v / 2^32, v ∈ [1, 2^32];  B = bitlength(v);  m = v / 2^(B-1)
#   ln(u) = (B - 33)·ln2 + 2·atanh((m-1)/(m+1)),  z = (m-1)/(m+1) < 1/3
#   atanh(z) ≈ z·Σ_{k=0..15} z^(2k)/(2k+1)   (truncation error < 6e-18)
#
# Engine-specific: only v (hex→int) and B (binary-string length); every
# arithmetic stage below is the SAME template string evaluated by both.

_LN2_SQL = "CAST('0.6931471805599453' AS DOUBLE)"


def _horner_sql() -> str:
    """Σ z^(2k)/(2k+1) over the staged __z2 column, Horner form."""
    expr = f"CAST(1 AS DOUBLE)/CAST(31 AS DOUBLE)"
    for k in range(29, 0, -2):
        expr = f"CAST(1 AS DOUBLE)/CAST({k} AS DOUBLE) + __z2 * ({expr})"
    return expr


_M_SQL = "CAST(__v AS DOUBLE) / CAST(__shift AS DOUBLE)"
_Z_SQL = "(__m - CAST(1 AS DOUBLE)) / (__m + CAST(1 AS DOUBLE))"
_Z2_SQL = "__z * __z"
_LNU_SQL = (
    f"CAST(__b - 33 AS DOUBLE) * {_LN2_SQL} + CAST(2 AS DOUBLE) * (__z * ({{horner}}))"
).format(horner="{horner}")


_WSAMPLE_K = 100

_WSAMPLE_ORACLE = f"""
WITH t AS (
  SELECT o_orderkey, o_totalprice,
         ({"+".join(f"(instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), {1 + i}, 1)) - 1) * {16 ** (7 - i)}" for i in range(8))})
           + CAST(1 AS BIGINT) AS __v
  FROM orders
),
b AS (SELECT *, length(bin(__v)) AS __b FROM t),
sh AS (SELECT *, (CAST(1 AS BIGINT) << (__b - 1)) AS __shift FROM b),
m AS (SELECT *, {_M_SQL} AS __m FROM sh),
z AS (SELECT *, {_Z_SQL} AS __z FROM m),
z2 AS (SELECT *, {_Z2_SQL} AS __z2 FROM z),
keyed AS (
  SELECT o_orderkey, o_totalprice,
         round(({_LNU_SQL.format(horner=_horner_sql())}) / o_totalprice, 12)
           + CAST(0 AS DOUBLE) AS sample_key
  FROM z2
)
SELECT o_orderkey, o_totalprice, sample_key
FROM keyed
ORDER BY sample_key DESC, o_orderkey ASC LIMIT {_WSAMPLE_K}
"""


@query("weighted_sample_orders", oracle=_WSAMPLE_ORACLE, tags=("temporal", "sampling"))
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    key = ln(u)/w with u ∈ (0,1] derived from MD5 of the row key and
    w = o_totalprice; the top-k keys ARE a w-weighted sample. u is
    exactly representable (32-bit integer / 2³²) and ``ln`` is the
    portable fixed atanh series above — every arithmetic stage is the
    same template string on both engines, so the key is bit-identical
    at ANY scale (libm ``ln`` flipped a 12-dp rounding boundary at
    sf0.1's 150k rows); ties broken by orderkey.

    Scale: scan-side key computation + TakeOrdered(k) — per-partition
    top-k heaps, no global sort, no shuffle of non-winners. The same
    key works as a reservoir over streams (keep the k largest keys
    seen).
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    staged = (
        orders.select("o_orderkey", "o_totalprice", h.alias("__h"))
        .withColumn(
            "__v",
            F.expr("cast(conv(substring(__h, 1, 8), 16, 10) as bigint) + cast(1 as bigint)"),
        )
        .withColumn("__b", F.expr("length(conv(__v, 10, 2))").cast("int"))
        .withColumn("__shift", F.expr("shiftleft(cast(1 as bigint), __b - 1)"))
        .withColumn("__m", F.expr(_M_SQL))
        .withColumn("__z", F.expr(_Z_SQL))
        .withColumn("__z2", F.expr(_Z2_SQL))
    )
    # "+ 0.0" collapses IEEE negative zero to +0.0: a u ≈ 1 row rounds
    # to ±0.0 differently across engines' round() (equal values, but the
    # driver's repr hash distinguishes '-0.0' from '0.0')
    key = F.expr(
        f"round(({_LNU_SQL.format(horner=_horner_sql())}) / o_totalprice, 12) "
        "+ CAST(0 AS DOUBLE)"
    )
    return (
        staged.select("o_orderkey", "o_totalprice", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("o_orderkey"))
        .limit(_WSAMPLE_K)
    )


# ---------------------------------------------------------------------------
# PageRank (3 fixed iterations, exact integer nano-units)
# ---------------------------------------------------------------------------

_PR_ITERS = 3

_PR_EDGES_SQL = """
edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT n_nationkey AS k, n_name FROM nation),
it0 AS (
  SELECT k, CAST(1000000000 // (SELECT count(*) FROM nation) AS BIGINT) AS r FROM nodes
)
"""


def _pr_iter_sql(i: int) -> str:
    return f"""
it{i} AS (
  SELECT n.k,
         CAST((150000000 // (SELECT count(*) FROM nation))
              + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS k, sum(r.r // d.deg) AS m
    FROM edges e JOIN it{i - 1} r ON e.src = r.k JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON n.k = s.k
)"""


_PAGERANK_ORACLE = (
    "WITH "
    + _PR_EDGES_SQL.strip()
    + ","
    + ",".join(_pr_iter_sql(i) for i in range(1, _PR_ITERS + 1))
    + f"""
SELECT n.k AS nationkey, n.n_name AS n_name, it.r AS rank_nano
FROM it{_PR_ITERS} it JOIN nodes n ON it.k = n.k
"""
)


#: Broadcast the per-iteration rank/degree/incoming-mass vectors only
#: while |V| stays under this bound (~16 MB of (long,long) rows); a
#: billion-node graph flips every iteration join to a keyed shuffle.
_PR_BROADCAST_MAX_V = 1 << 20


@query("pagerank_trade_network", oracle=_PAGERANK_ORACLE, tags=("temporal", "graph"))
def pagerank_trade_network(
    spark: SparkSession, sf_dir: str, *, broadcast_max_v: int | None = None
) -> DataFrame:
    """PageRank (damping 0.85, {3} fixed iterations) over the
    customer-nation → supplier-nation trade graph distilled from
    lineitem. Ranks are exact integer *nano-units* throughout —
    ``r/deg`` and the 0.85 damping are integer divisions — so
    cross-partition sums are order-free and both engines agree
    bit-for-bit (the same trick as ``centroid_embeddings_by_label``).
    Dangling mass is dropped identically on both sides (documented
    semantics, not an accident).

    Scale: the edge distillation is the heavy part (fact-table join,
    distinct on 2 small ints — partial-agg before shuffle); each
    iteration is then edges ⋈ ranks + one groupBy(dst). The |V|-row
    vectors (ranks, degrees, incoming mass) broadcast only while
    |V| ≤ ``_PR_BROADCAST_MAX_V``; above that every iteration join
    degrades gracefully to a keyed shuffle (plus localCheckpoint per
    round in a real long-lived loop — see operators/graph.py). Both
    regimes are plan-shape-pinned in tests.
    """
    tune(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # materialize the fact-join distillation ONCE: edges is ≤|N|²
    # rows but its lineage is the heavy lineitem⋈orders join, and it
    # feeds deg plus every iteration — without the checkpoint each of
    # the 3 rounds re-scans the fact tables (6 scans at 100 TB)
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = nation.select(F.col("n_nationkey").alias("k"), "n_name")
    n = nodes.count()  # fixed-size dimension table: one driver scalar
    init, base = 10**9 // n, (15 * 10**7) // n

    limit = _PR_BROADCAST_MAX_V if broadcast_max_v is None else broadcast_max_v

    def _bc(df: DataFrame) -> DataFrame:
        # all three per-iteration vectors are |V|-row; one shared guard
        return F.broadcast(df) if n <= limit else df

    ranks = nodes.select("k", F.lit(init).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(_bc(ranks), edges["src"] == ranks["k"])
            .join(_bc(deg), "src")
            .select("dst", F.expr("r div deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        # incoming has <= |V| rows — same broadcast-budget assumption
        # as broadcasting `ranks` above; without the hint the planner
        # sort-merges this left join (no stats on the agg output)
        ranks = (
            nodes.join(_bc(incoming), nodes["k"] == incoming["dst"], "left")
            .select(
                "k",
                (F.lit(base) + F.expr("(85 * coalesce(m, 0)) div 100")).cast("long").alias("r"),
            )
        )
    return ranks.join(_bc(nodes), "k").select(
        F.col("k").alias("nationkey"), "n_name", F.col("r").alias("rank_nano")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day per-user window (RANGE frame over event time)
# ---------------------------------------------------------------------------

_ROLL_SEC = 7 * 86400

_ROLLING_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, sec,
       CAST(count(*) OVER w AS BIGINT) AS n_7d,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_7d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN {_ROLL_SEC} PRECEDING AND CURRENT ROW)
"""


@query("rolling_user_value_7d", oracle=_ROLLING_ORACLE, tags=("temporal", "window"))
def rolling_user_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-7-day activity (count + exact integer cents)
    per user — the RANGE-frame window every feature store and fraud
    monitor computes, distinct from the ROWS frames elsewhere in the
    registry: peers at the same second aggregate together on both
    engines by RANGE semantics, so the result is deterministic even
    under same-timestamp ties. Event time reduces to integer epoch
    SECONDS on both sides (truncation, all-positive), eliminating the
    ns-vs-us parquet precision mismatch from the frame arithmetic.

    Scale: one shuffle on user_id, then a single ordered pass per
    partition with a sliding two-pointer frame — state is the frame's
    rows, bounded by a user's 7-day event volume (the same assumption
    the sessionizer makes). No global window, no cross-user state.
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        # NTZ → epoch seconds via the UTC session tz (pinned in
        # session.RUNTIME_CONFS), matching the oracle's naive epoch_ns
        F.col("ts").cast("timestamp").cast("long").alias("sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_ROLL_SEC, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "sec",
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
        F.sum("cents").over(w).cast("long").alias("cents_7d"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (the batch drift alarm, closed form)
# ---------------------------------------------------------------------------

_CUSUM_BASE_DAYS = 10  # days 1-10 fit the baseline; 11+ are monitored
_CUSUM_STEP_DAY = 21  # the planted arm shifts counts up from this day


def _cusum_sql(engine: str, events: str) -> str:
    """Shared CUSUM text; engine differences are the datediff
    spelling and integer division. The sequential recursion
    S_t = max(0, S_{t-1} + d_t) is evaluated in CLOSED FORM as
    S_t = cum_t - min_prefix(cum_t) — two window functions, no
    recursion — with everything in exact integer centi-count units:
    with baseline sum s0 over {_CUSUM_BASE_DAYS} days, mean mu0 =
    s0/{_CUSUM_BASE_DAYS} and allowance k = mu0/10 give the scaled
    deviation D_t = 100*x_t - 11*s0; the alarm bar H = 20*s0 is two
    baseline-mean days of accumulated excess."""
    if engine == "spark":
        day = "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') + 1 AS BIGINT)"
        dv = "div"
    else:
        day = "CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS BIGINT)"
        dv = "//"
    return f"""
WITH dc0 AS (
  SELECT event_type, {day} AS d, CAST(count(*) AS BIGINT) AS x
  FROM {events} GROUP BY event_type, {day}
),
tt AS (SELECT DISTINCT event_type FROM dc0),
sp AS (SELECT DISTINCT d FROM dc0),
dc AS (
  SELECT t.event_type, s.d, coalesce(c.x, CAST(0 AS BIGINT)) AS x
  FROM tt t CROSS JOIN sp s
  LEFT JOIN dc0 c ON c.event_type = t.event_type AND c.d = s.d
),
arms AS (
  SELECT 'raw' AS arm, event_type, d, x FROM dc
  UNION ALL
  SELECT 'planted', event_type, d,
         CASE WHEN d >= {_CUSUM_STEP_DAY} THEN x + x {dv} 2 ELSE x END
  FROM dc
),
b AS (
  SELECT arm, event_type, CAST(sum(x) AS BIGINT) AS s0
  FROM arms WHERE d <= {_CUSUM_BASE_DAYS} GROUP BY arm, event_type
),
m AS (
  SELECT a.arm, a.event_type, a.d,
         100 * a.x - 11 * b.s0 AS dd, b.s0
  FROM arms a JOIN b ON b.arm = a.arm AND b.event_type = a.event_type
  WHERE a.d > {_CUSUM_BASE_DAYS}
),
c AS (
  SELECT arm, event_type, d, s0,
         sum(dd) OVER (PARTITION BY arm, event_type ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM m
),
s AS (
  SELECT arm, event_type, d, s0,
         cum - least(CAST(0 AS BIGINT),
                     min(cum) OVER (PARTITION BY arm, event_type ORDER BY d
                                    ROWS UNBOUNDED PRECEDING)) AS cusum
  FROM c
),
al AS (
  SELECT arm, event_type, s0,
         CAST(count(*) AS BIGINT) AS n_days_monitored,
         CAST(max(cusum) AS BIGINT) AS max_cusum_centi,
         CAST(min(CASE WHEN cusum > 20 * s0 THEN d END) AS BIGINT)
           AS first_alarm_day
  FROM s GROUP BY arm, event_type, s0
)
SELECT arm, event_type, n_days_monitored,
       s0 * 100 {dv} {_CUSUM_BASE_DAYS} AS baseline_mean_centi,
       max_cusum_centi,
       20 * s0 AS alarm_bar_centi,
       first_alarm_day IS NOT NULL AS alarm_fired,
       coalesce(first_alarm_day, -1) AS first_alarm_day,
       CASE WHEN arm = 'planted' AND first_alarm_day IS NOT NULL
            THEN first_alarm_day - {_CUSUM_STEP_DAY}
            ELSE -1 END AS detection_delay_days
FROM al
"""


@query(
    "cusum_changepoint_report",
    oracle=_cusum_sql("duck", "events"),
    tags=("temporal", "quality", "monitoring"),
)
def cusum_changepoint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) — the batch drift
    alarm next to ``event_anomaly_zscore`` (point outliers) and
    ``stream_drift_monitor`` (distributional drift): per event_type,
    daily counts fit a {10}-day baseline, and the one-sided CUSUM of
    mean-plus-allowance exceedances runs over the monitoring days in
    CLOSED FORM — the textbook recursion S_t = max(0, S_{t-1} + d_t)
    equals cum_t - min(0, prefix-min of cum), so two window functions
    replace the sequential loop and the operator distributes (the
    reason CUSUM is usually 'streaming-only' is the recursion; the
    closed form makes it a plain windowed query). Everything is
    exact centi-count integers (D_t = 100 x_t - 11 s0 folds the
    mu0/10 allowance without rationals); the alarm bar is 20 s0 (two
    baseline-mean days of accumulated excess). TWO ARMS through the
    shared expressions: 'raw' (the honest null — the synthetic event
    stream is stationary and must stay quiet) and 'planted' (counts
    step up 1.5x from day {21}; the alarm must fire, and the
    detection delay in days is the measured quantity).

    Measured (sf0.01 / sf0.1): the raw arm is QUIET on all five
    event types (max CUSUM well under the bar) and the planted arm
    fires on all five with detection delay 4-5 days — the classic
    CUSUM trade: the mu0/10 allowance absorbs daily noise, and a 50%
    step accumulates ~0.4 baseline-means of excess per day, so
    crossing the 2-mean bar takes ~4-5 days by construction.
    Day-boundary effects, not corpus size, set the delay — the same
    report at 100 TB reads the same days. Zero-event days are
    SPINE-FILLED (the calendar grid crosses every observed event_type
    with every observed day; missing cells read x = 0): a
    total-outage day drains the CUSUM like any other below-mean day
    instead of silently vanishing from the monitor — the failure
    mode a count-based alarm exists to catch.

    Scale: one map-side-combinable daily aggregate (|types| x days
    rows), then windows PARTITIONED BY (arm, event_type) over at
    most the calendar span — bounded per-key state, never a global
    window; the closed form is what makes the distributed plan
    possible at all.
    """
    tune(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__cusum_events")
    return spark.sql(_cusum_sql("spark", "__cusum_events"))


# ---------------------------------------------------------------------------
# Bounded-hop cheapest trade routes (multi-source Bellman-Ford, unrolled)
# ---------------------------------------------------------------------------

_BF_HOPS = 4


def _bf_sql(engine: str, t: dict[str, str]) -> str:
    """Shared Bellman-Ford text — NO engine switches in the
    arithmetic (exact centi-cent BIGINTs, least/CASE relaxation);
    DuckDB gets MATERIALIZED CTEs (each round is referenced twice)
    and Spark a broadcast hint on the 25x25 seed grid."""
    import re as _re

    hint = "/*+ BROADCAST(b) */ " if engine == "spark" else ""
    rounds = []
    for r in range(1, _BF_HOPS + 1):
        rounds.append(f"""d{r} AS (
  SELECT p.s, p.v,
         CASE WHEN m.mc IS NULL THEN p.c
              WHEN p.c IS NULL THEN m.mc
              ELSE least(p.c, m.mc) END AS c
  FROM d{r - 1} p LEFT JOIN (
    SELECT q.s, e.dst AS v, CAST(min(q.c + e.w) AS BIGINT) AS mc
    FROM d{r - 1} q JOIN e ON e.src = q.v WHERE q.c IS NOT NULL
    GROUP BY q.s, e.dst
  ) m ON m.s = p.s AND m.v = p.v
)""")
    hopcase = " ".join(
        f"WHEN d{r}.c IS NOT NULL AND d{r}.c = f.c THEN {r}"
        for r in range(0, _BF_HOPS)
    )
    hopjoins = "\n".join(
        f"  LEFT JOIN d{r} ON d{r}.s = f.s AND d{r}.v = f.v"
        for r in range(0, _BF_HOPS)
    )
    sql = f"""
WITH e AS (
  SELECT src, dst, CAST(min(pc) AS BIGINT) AS w FROM (
    SELECT c.c_nationkey AS src, su.s_nationkey AS dst,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
    FROM {t['lineitem']} l
    JOIN {t['orders']} o ON o.o_orderkey = l.l_orderkey
    JOIN {t['customer']} c ON c.c_custkey = o.o_custkey
    JOIN {t['supplier']} su ON su.s_suppkey = l.l_suppkey
  ) x GROUP BY src, dst
),
nn AS (SELECT CAST(n_nationkey AS BIGINT) AS k, n_name FROM {t['nation']}),
d0 AS (
  SELECT {hint}a.k AS s, b.k AS v,
         CASE WHEN a.k = b.k THEN CAST(0 AS BIGINT) END AS c
  FROM nn a CROSS JOIN nn b
),
{",".join(rounds)},
f AS (SELECT s, v, c FROM d{_BF_HOPS} WHERE c IS NOT NULL)
SELECT ns.n_name AS src_nation, nv.n_name AS dst_nation,
       f.c AS cost_centi,
       CAST(CASE {hopcase} ELSE {_BF_HOPS} END AS BIGINT) AS hops,
       CAST(e.w AS BIGINT) AS direct_centi,
       CAST(CASE WHEN e.w IS NOT NULL AND e.w > f.c THEN e.w - f.c END
            AS BIGINT) AS indirect_savings_centi
FROM f
{hopjoins}
  LEFT JOIN e ON e.src = f.s AND e.dst = f.v
  JOIN nn ns ON ns.k = f.s
  JOIN nn nv ON nv.k = f.v
"""
    if engine == "duck":
        sql = _re.sub(r"(\b\w+) AS \(", r"\1 AS MATERIALIZED (", sql)
    return sql


_BF_TABLES_DUCK = {
    n: n for n in ("lineitem", "orders", "customer", "supplier", "nation")
}
_BF_TABLES_SPARK = {
    n: f"__bf_{n}" for n in ("lineitem", "orders", "customer", "supplier", "nation")
}


@query(
    "bellman_ford_trade_paths",
    oracle=_bf_sql("duck", _BF_TABLES_DUCK),
    tags=("temporal", "graph"),
)
def bellman_ford_trade_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop cheapest trade routes — multi-source Bellman-Ford,
    the distributed-graph family's missing classic next to PageRank
    (fixed-point mass), connected components (min-label), LPA
    (frequency vote), and triangle counting (wedge close): over the
    customer-nation -> supplier-nation trade graph (edge weight = the
    MINIMUM observed line price on the pair, exact centi-cents), all
    {4} relaxation rounds run as plain joins — round r holds the
    cheapest cost using at most r hops for EVERY source at once (the
    all-sources formulation is what distributes: the frontier is a
    (s, v) frame, not one Dijkstra heap per source, and Dijkstra's
    priority queue is exactly what a shuffle-based engine cannot
    express). Hops of the released cost are recovered deterministically
    as the FIRST round that already reads the final cost. The
    measured question a route table exists to answer: does chaining
    trades beat the direct pair? ``indirect_savings_centi`` prices it
    (NULL when the direct edge is already optimal or absent).

    Measured (sf0.001 / sf0.01 / sf0.1): the arbitrage DRAINS as the
    graph densifies — at sf0.001 the 25-nation graph is incomplete
    (265 of 625 routes reachable, chains to 3 hops, multi-hop beats
    the direct edge on 137 of 240 direct pairs), at sf0.01 it is
    complete (625 routes, 210 still route through 2 hops, 214 of
    600 directs beaten) and at sf0.1 every non-self route is the
    direct edge and ZERO directs are beaten: with ~470 lineitems per
    pair the per-pair minimum sits at the price-domain floor, and a
    floor-priced direct edge cannot be undercut. Route arbitrage is
    a sparse-data artifact here, and the report measures it
    shrinking to exactly nothing. Self-routes price 0 (the init),
    and every released cost replays hop-exactly in pure Python.

    Scale: the edge distillation is the only fact-table work (one
    join tree, map-side-combinable min per nation pair — at most
    |N|^2 = 625 edge rows survive); each relaxation round is a
    625-row frame joined to the 625-row edge table (broadcast-sized
    by construction — bounded by the NATION DOMAIN, not the corpus),
    and the unrolled 4-round chain is a fixed-depth plan. The same
    text at a million-node graph swaps the seed CROSS JOIN for a
    sparse frontier and per-round localCheckpoints (the
    ``connected_components_halving`` loop discipline).
    """
    tune(spark)
    for n, view in _BF_TABLES_SPARK.items():
        load_table(spark, sf_dir, n).createOrReplaceTempView(view)
    return spark.sql(_bf_sql("spark", _BF_TABLES_SPARK))


# ---------------------------------------------------------------------------
# Forecast backtest with MASE (exact-integer model election)
# ---------------------------------------------------------------------------

_MASE_SEASON = 7  # weekly seasonal lag / MA window


def _mase_sql(engine: str, events: str) -> str:
    """Shared backtest text; the only engine switches are integer
    division and the date-diff spelling (the ``_cusum_sql``
    precedent). Forecast errors are kept as SCALED integers (x7 for
    the moving average) so every MAE/MASE is an exact rational."""
    if engine == "spark":
        day = "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') + 1 AS BIGINT)"
        dv = "div"
    else:
        day = "CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS BIGINT)"
        dv = "//"
    s = _MASE_SEASON
    return f"""
WITH dc0 AS (
  SELECT event_type, {day} AS d, CAST(count(*) AS BIGINT) AS x
  FROM {events} GROUP BY event_type, {day}
),
tt AS (SELECT DISTINCT event_type FROM dc0),
sp AS (SELECT DISTINCT d FROM dc0),
mx AS (SELECT CAST(max(d) AS BIGINT) AS dmax FROM sp),
dc AS (
  SELECT t.event_type, sgrid.d, coalesce(c.x, CAST(0 AS BIGINT)) AS x
  FROM tt t CROSS JOIN sp sgrid
  LEFT JOIN dc0 c ON c.event_type = t.event_type AND c.d = sgrid.d
),
lagd AS (
  SELECT event_type, d, x,
         lag(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1,
         lag(x, {s}) OVER (PARTITION BY event_type ORDER BY d) AS y{s},
         sum(x) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN {s} PRECEDING AND 1 PRECEDING) AS s{s},
         CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN {s} PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS w{s}
  FROM dc
),
cut AS (SELECT (dmax * 2) {dv} 3 AS t0 FROM mx),
ins AS (
  SELECT l.event_type,
         CAST(sum(abs(l.x - l.y1)) AS BIGINT) AS s_in,
         CAST(count(*) AS BIGINT) AS n_in
  FROM lagd l CROSS JOIN cut
  WHERE l.y1 IS NOT NULL AND l.d <= cut.t0
  GROUP BY l.event_type
),
errs AS (
  SELECT l.event_type, 'naive' AS model, CAST(1 AS BIGINT) AS scale,
         CAST(abs(l.x - l.y1) AS BIGINT) AS ae
  FROM lagd l CROSS JOIN cut WHERE l.d > cut.t0 AND l.y1 IS NOT NULL
  UNION ALL
  SELECT l.event_type, 'seasonal_naive', CAST(1 AS BIGINT),
         CAST(abs(l.x - l.y{s}) AS BIGINT)
  FROM lagd l CROSS JOIN cut WHERE l.d > cut.t0 AND l.y{s} IS NOT NULL
  UNION ALL
  SELECT l.event_type, 'ma{s}', CAST({s} AS BIGINT),
         CAST(abs({s} * l.x - l.s{s}) AS BIGINT)
  FROM lagd l CROSS JOIN cut WHERE l.d > cut.t0 AND l.w{s} = {s}
),
agg AS (
  SELECT e.event_type, e.model, e.scale,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(e.ae) AS BIGINT) AS s_abs
  FROM errs e GROUP BY e.event_type, e.model, e.scale
),
rep AS (
  SELECT a.event_type, a.model, a.n_test,
         a.s_abs * 1000 {dv} (a.scale * a.n_test) AS mae_milli,
         a.s_abs * i.n_in * 1000 {dv} (a.scale * a.n_test * i.s_in)
           AS mase_milli
  FROM agg a JOIN ins i ON i.event_type = a.event_type
),
win AS (
  SELECT event_type, model AS best_model FROM (
    SELECT event_type, model,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY mase_milli, model) AS rn
    FROM rep
  ) t WHERE rn = 1
)
SELECT r.event_type, r.model, r.n_test, r.mae_milli, r.mase_milli,
       r.model = w.best_model AS is_best
FROM rep r JOIN win w ON w.event_type = r.event_type
"""


@query(
    "forecast_backtest_mase",
    oracle=_mase_sql("duck", "events"),
    tags=("temporal", "eval"),
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest scored with MASE (Hyndman &
    Koehler 2006) — the time-series EVAL rung next to the monitoring
    family (``cusum_changepoint_report`` detects; this one decides
    WHICH forecaster to trust): per event_type, the daily-count
    series (zero-spine-filled, the cusum discipline) splits at
    2/3 of the calendar, and three closed-form one-step-ahead
    models — naive (last value), seasonal-naive (lag {7}), and the
    {7}-day moving average — are scored on the held-out tail. MASE
    divides each model's test MAE by the IN-SAMPLE naive MAE, the
    scale-free comparison that made it the M-competition standard
    (interpretable: < 1000 milli beats always-predict-yesterday).
    Every error is an exact scaled integer (the MA keeps |{7}y -
    sum{7}| so no rationals are ever floated); MAE and MASE are
    integer-milli floors of exact BIGINT cross-products; the
    per-type election is deterministic (mase asc, model asc).

    Measured (sf0.01 / sf0.1): the moving average wins on ALL five
    event types at both SFs (mean MASE 820 / 862 milli vs naive
    1146 / 1198 and seasonal-naive 1199 / 1164) — the series is
    stationary noise, so {7}-day smoothing beats chasing yesterday
    by ~30%, and seasonal-naive is just a NOISIER yesterday: there
    is no weekly cycle in the generator, the honest negative a
    backtest exists to expose (deploying the 'seasonal' model here
    would be cargo cult). Detail worth reading: two series score
    MA{7} MASE slightly above 1000 (purchase 1127 at sf0.01) —
    best-of-three on the test tail can still be worse than the
    in-sample naive floor on a 10-day holdout, the small-n caveat
    MASE's scale makes visible.

    Scale: one map-side daily aggregate, windows PARTITIONED BY
    event_type over the calendar span (bounded per-key state), and
    a per-type model table of 3 rows — the whole backtest is two
    shuffles regardless of corpus size, and adding a model adds one
    UNION branch over the same lag frame.
    """
    tune(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__mase_events")
    return spark.sql(_mase_sql("spark", "__mase_events"))
