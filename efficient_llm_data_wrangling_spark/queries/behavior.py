"""Behavioral / product-analytics operators over the event stream:
ordered funnels, retention cohorts, and event-transition (Markov)
matrices — the query shapes every event warehouse runs daily, absent
from the reference (its data model has no time at all; SURVEY §1.2).

Cross-engine conventions: timestamps never leave the plan as strings —
durations are exact ``unix_micros`` differences (BIGINT), dates emit
as VARCHAR (registry.py convention), probabilities are single
divisions of exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase (earliest-next-step semantics)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                 WHEN c.t2 IS NOT NULL THEN 2
                 WHEN v.t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS reached,
       CAST(CASE WHEN p.t3 IS NOT NULL
                 THEN date_diff('microsecond', v.t1, p.t3) END AS BIGINT)
         AS view_to_purchase_micros
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


@query("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE, tags=("behavior", "temporal"))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel with earliest-next-step semantics: the
    click must follow the user's FIRST view, the purchase the FIRST
    qualifying click — strict event-order causality, not mere presence
    (the distinction that separates funnel analysis from three
    count(*)s). Emits the stage reached per user plus the exact
    microsecond view→purchase latency for completers.

    Scale: three per-user min-aggregates, each keyed on user_id — no
    window over raw events, no self-join explosion (each stage joins
    the per-user scalar from the previous stage). The stage-1/stage-2
    scalars feed BOTH the next stage and the final report join, and
    runtime exchange reuse does not cover the aggregate subtrees
    (measured), so each is materialized once — a |users|-row
    (user_id, ts) frame, far cheaper than re-running its
    events-sized aggregation.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    u = ev.select("user_id").distinct()
    reached = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    # unix_micros needs TIMESTAMP; session TZ is pinned UTC so the
    # ntz→timestamp cast is value-preserving and the difference is the
    # exact naive-microsecond gap DuckDB's date_diff computes
    lag = F.when(
        F.col("t3").isNotNull(),
        F.unix_micros(F.col("t3").cast("timestamp"))
        - F.unix_micros(F.col("t1").cast("timestamp")),
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            reached.cast("int").alias("reached"),
            lag.cast("long").alias("view_to_purchase_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts: users by first-activity day x day offset
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT CAST(f.cohort AS VARCHAR) AS cohort_day,
       CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


@query("retention_cohorts", oracle=_RETENTION_ORACLE, tags=("behavior", "temporal"))
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity day
    (cohort), counted on each subsequent active day as an offset from
    their cohort day — the table behind every "D7 retention" metric.

    Scale: first-activity is a per-user min; active days a per-user
    distinct — both keyed on user_id (one exchange reused), then a
    small (cohort, offset) count. The cohort join is per-user scalars,
    broadcastable; nothing touches raw-event granularity twice.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort"))
    a = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    return (
        a.join(f, "user_id")
        .select(
            F.col("cohort").cast("string").alias("cohort_day"),
            F.datediff("d", "cohort").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / CAST(tot.t AS DOUBLE) AS p
FROM c JOIN tot ON c.from_type = tot.from_type
"""


@query("markov_event_transitions", oracle=_MARKOV_ORACLE, tags=("behavior", "window"))
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types along each
    user's timeline (total (ts, event_id) order — deterministic under
    timestamp ties): transition counts and row-normalized
    probabilities, the summary behind next-action prediction and
    anomalous-sequence detection. The probability is one division of
    two exact integers.

    Scale: one window pass keyed on user_id (lead over the sorted
    partition), then a 25-cell aggregate — the matrix is
    |types|², independent of event volume.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = s.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").cast("long").alias("t"))
    return c.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("t").cast("double")).alias("p"),
    )


# --------------------------------------------------------------------------
# Anomaly flags via cross-multiplied integer z-score
# --------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
st AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v_cents) AS BIGINT) AS s,
         CAST(sum(v_cents * v_cents) AS BIGINT) AS ss
  FROM v GROUP BY user_id
)
SELECT v.event_id, v.user_id, v.v_cents,
       st.n >= 2 AND
       (v.v_cents * st.n - st.s) * (v.v_cents * st.n - st.s)
         > 9 * (st.n * st.ss - st.s * st.s) AS is_outlier
FROM v JOIN st USING (user_id)
"""


@query("event_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("behavior", "quality"))
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user |z| > 3 anomaly flags WITHOUT ever computing a float:
    z² > 9 cross-multiplies to (v·n − s)² > 9(n·ss − s²) over integer
    cents — exact sufficient statistics, no σ, no division, no
    rounding boundary for engines to disagree on (the
    ``groupwise_trend_orders`` decomposition applied to outlier
    detection). Every event rides out with its verdict — the audit
    manifest, not just the anomalies.

    Scale: one user-keyed aggregate (map-side combined to 3 numbers
    per user) joined back to the stream on the same key — at scale the
    join reuses the aggregate's hash partitioning, so the stats pass
    and the flag pass share one shuffle.

    Domain bound: the cross-multiplied products stay exact in int64
    while a user's n·|v|max < ~3e9 cents; a corpus where single users
    exceed that swaps the sums and products to decimal(38,0) — the
    ``stats_moments_lineitem`` precedent, same expressions wider type.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_cents"),
    )
    st = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_cents").cast("long").alias("s"),
        F.sum(F.expr("v_cents * v_cents")).cast("long").alias("ss"),
    )
    return ev.join(st, "user_id").select(
        "event_id",
        "user_id",
        "v_cents",
        (
            (F.col("n") >= 2)
            & (
                (F.col("v_cents") * F.col("n") - F.col("s"))
                * (F.col("v_cents") * F.col("n") - F.col("s"))
                > 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
            )
        ).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Behavioral-fingerprint similarity (trajectory similarity at signature level)
# ---------------------------------------------------------------------------

#: event-type alphabet, alphabetical — transition (from, to) maps to
#: bit from·5 + to of a 25-bit BIGINT mask.
_BHV_TYPES = ("click", "error", "purchase", "signup", "view")
_BHV_TOPK = 20

_BHV_TI_SQL = (
    "CASE event_type "
    + " ".join(f"WHEN '{t}' THEN {i}" for i, t in enumerate(_BHV_TYPES))
    + " END"
)

_BHV_SIM_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, {_BHV_TI_SQL} AS ti FROM events
),
tr AS (
  SELECT DISTINCT user_id,
         ti * 5 + lead(ti) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bit
  FROM e
),
sig AS (
  SELECT user_id, CAST(sum(CAST(1 AS BIGINT) << CAST(bit AS INT)) AS BIGINT) AS mask
  FROM tr WHERE bit IS NOT NULL GROUP BY user_id
),
m AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS n_users FROM sig GROUP BY mask
),
mb AS (
  SELECT mask, n_users, t.b AS bit
  FROM m, unnest(range(0, 25)) AS t(b)
  WHERE (mask >> CAST(t.b AS INT)) & 1 = 1
),
cand AS (
  SELECT DISTINCT a.mask AS mask_a, b.mask AS mask_b
  FROM mb a JOIN mb b ON a.bit = b.bit AND a.mask < b.mask
),
scored AS (
  SELECT c.mask_a, c.mask_b,
         CAST(bit_count(c.mask_a & c.mask_b) * 1000
              // bit_count(c.mask_a | c.mask_b) AS BIGINT) AS jaccard_milli,
         ma.n_users AS n_users_a, mb2.n_users AS n_users_b
  FROM cand c JOIN m ma ON ma.mask = c.mask_a JOIN m mb2 ON mb2.mask = c.mask_b
)
SELECT * FROM scored
ORDER BY jaccard_milli DESC, mask_a, mask_b
LIMIT {_BHV_TOPK}
"""


@query(
    "behavior_signature_similarity",
    oracle=_BHV_SIM_ORACLE,
    tags=("behavior", "similarity"),
)
def behavior_signature_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory-style behavioral similarity computed at the
    SIGNATURE level: each user's event history collapses to a 25-bit
    transition fingerprint (bit f·5+t set iff the user ever did
    type-f → type-t consecutively), and pairwise Jaccard runs over
    DISTINCT fingerprints weighted by user multiplicity — never over
    user pairs. Top-{_BHV_TOPK} most-similar fingerprint pairs with
    their cohort sizes: the segment-overlap report behind
    "users like these" features, at the cost of the signature
    cardinality, not the user count.

    Exactness: the mask is an exact BIGINT bit-OR, similarity is
    integer popcount Jaccard in milli-units (``bit_count(a&b)·1000
    div bit_count(a|b)``), and the window order (ts, event_id) is a
    unique key — every engine-pair result is bit-identical.

    Scale: one per-user window pass builds transitions, one shuffle
    per aggregation; the candidate join blocks distinct masks on
    shared bits (alphabet-bounded keys), so the quadratic is bounded
    by distinct-signature counts (≤ 2^25 regardless of user count) —
    the same collapse exact-dedup applies to documents, applied to
    behavioral cohorts.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    ti = F.expr(_BHV_TI_SQL)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "ts", "event_id", ti.alias("ti"))
        .select("user_id", (F.col("ti") * 5 + F.lead("ti").over(w)).alias("bit"))
        .filter(F.col("bit").isNotNull())
        .distinct()
    )
    sig = tr.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .cast("long")
        .alias("mask")
    )
    # distinct-fingerprint table, materialized once: the bit explode
    # (both candidate sides) and both count joins consume it
    m = sig.groupBy("mask").agg(F.count(F.lit(1)).cast("long").alias("n_users")).localCheckpoint(eager=False)
    mb = m.select(
        "mask",
        F.explode(
            F.expr("filter(sequence(0, 24), b -> (shiftright(mask, b) & 1) = 1)")
        ).alias("bit"),
    )
    cand = (
        mb.select(F.col("mask").alias("mask_a"), "bit")
        .join(mb.select(F.col("mask").alias("mask_b"), "bit"), "bit")
        .filter(F.col("mask_a") < F.col("mask_b"))
        .select("mask_a", "mask_b")
        .distinct()
    )
    ma = m.select(F.col("mask").alias("mask_a"), F.col("n_users").alias("n_users_a"))
    mb2 = m.select(F.col("mask").alias("mask_b"), F.col("n_users").alias("n_users_b"))
    return (
        cand.join(F.broadcast(ma), "mask_a")
        .join(F.broadcast(mb2), "mask_b")
        .select(
            "mask_a",
            "mask_b",
            F.expr(
                "bit_count(mask_a & mask_b) * CAST(1000 AS BIGINT)"
                " div bit_count(mask_a | mask_b)"
            ).alias("jaccard_milli"),
            "n_users_a",
            "n_users_b",
        )
        .orderBy(F.desc("jaccard_milli"), F.asc("mask_a"), F.asc("mask_b"))
        .limit(_BHV_TOPK)
    )


# --------------------------------------------------------------------------
# Markov next-event model: train/test holdout evaluation
# --------------------------------------------------------------------------

_HOLDOUT_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type,
         instr('0123456789abcdef',
               substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 12 AS is_train
  FROM events
),
p AS (SELECT * FROM s WHERE next_type IS NOT NULL),
c AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM p WHERE is_train GROUP BY 1, 2
),
pred AS (
  SELECT event_type, next_type AS predicted FROM (
    SELECT event_type, next_type,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n DESC, next_type) AS rn
    FROM c
  ) WHERE rn = 1
),
mode AS (
  SELECT next_type AS mode_type FROM (
    SELECT next_type, CAST(count(*) AS BIGINT) AS n
    FROM p WHERE is_train GROUP BY 1
  ) ORDER BY n DESC, next_type LIMIT 1
),
t AS (SELECT event_type, next_type FROM p WHERE NOT is_train)
SELECT CAST(count(*) AS BIGINT) AS n_test_pairs,
       CAST(count(*) FILTER (WHERE t.next_type = pr.predicted) AS BIGINT)
         AS n_correct_markov,
       CAST(count(*) FILTER (WHERE t.next_type = pr.predicted) * 1000 AS BIGINT)
         // count(*) AS markov_permille,
       CAST(count(*) FILTER (WHERE t.next_type = m.mode_type) AS BIGINT)
         AS n_correct_mode,
       CAST(count(*) FILTER (WHERE t.next_type = m.mode_type) * 1000 AS BIGINT)
         // count(*) AS mode_permille
FROM t LEFT JOIN pred pr ON t.event_type = pr.event_type CROSS JOIN mode m
"""


@query("markov_holdout_accuracy", oracle=_HOLDOUT_ORACLE, tags=("behavior", "learning"))
def markov_holdout_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out next-event prediction accuracy for the first-order
    Markov model ``markov_event_transitions`` summarizes — the eval
    hygiene a modeling claim needs, run IN the engine: users split
    12/4 of 16 md5 buckets on the KEY (the ``split_assign_documents``
    discipline — content-independent, engine-portable, leak-proof),
    the transition argmax fitted on train users only (ties to the
    lexicographically smallest successor), and accuracy measured on
    test users against the always-predict-the-mode baseline. The
    model-vs-baseline gap in exact per-mille is the number that says
    whether sequence structure exists at all; an unseen test state
    scores as wrong (LEFT JOIN null never equals), not dropped.

    Scale: one windowed lead per user partition builds every pair
    once; the fitted model is |types|² rows and broadcasts; the eval
    is one aggregate. Nothing beyond the pair pass touches event
    volume.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    bucket = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
    ) - 1
    p = (
        ev.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
            (bucket < 12).alias("is_train"),
        )
        .filter(F.col("next_type").isNotNull())
        .localCheckpoint(eager=False)
    )
    c = (
        p.filter("is_train")
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wpred = W.partitionBy("event_type").orderBy(F.desc("n"), F.asc("next_type"))
    pred = (
        c.withColumn("rn", F.row_number().over(wpred))
        .filter("rn = 1")
        .select("event_type", F.col("next_type").alias("predicted"))
    )
    mode = (
        p.filter("is_train")
        .groupBy("next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("next_type"))
        .limit(1)
        .select(F.col("next_type").alias("mode_type"))
    )
    t = p.filter(~F.col("is_train")).select("event_type", "next_type")
    return (
        t.join(F.broadcast(pred), "event_type", "left")
        .crossJoin(F.broadcast(mode))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_pairs"),
            F.sum(F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct_markov"),
            F.expr(
                "sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) * 1000L"
                " div count(1)"
            ).alias("markov_permille"),
            F.sum(F.when(F.col("next_type") == F.col("mode_type"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct_mode"),
            F.expr(
                "sum(CASE WHEN next_type = mode_type THEN 1 ELSE 0 END) * 1000L"
                " div count(1)"
            ).alias("mode_permille"),
        )
    )


# ---------------------------------------------------------------------------
# A/B test: two-proportion chi-square with a planted null AND a
# planted effect (the experimentation rung)
# ---------------------------------------------------------------------------

_AB_CRIT_MICRO = 3841459  # chi-square(df=1) 95% critical value, micro


def _ab_sql(engine: str, events: str) -> str:
    """Shared A/B text; engine switches are md5 u32 and integer
    division. The chi-square statistic runs as ONE fixed-shape double
    expression over exact BIGINT cell counts (products exceed 2^63 at
    scale, so the ratio is evaluated in IEEE doubles with an
    identical parenthesization on both engines — same discipline as
    the portable-ln callers); the release floors it to micro."""
    if engine == "spark":
        dv = "div"
        u32 = lambda tag: (  # noqa: E731
            f"cast(conv(substring(md5(concat('{tag}:', CAST(user_id AS STRING))),"
            f" 1, 8), 16, 10) as bigint)"
        )
    else:
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        dv = "//"
        u32 = lambda tag: _hexint_sql(  # noqa: E731
            f"md5(concat('{tag}:', CAST(user_id AS VARCHAR)))", 1, 8
        )
    chi = (
        "((CAST(a + b + c + d AS DOUBLE)"
        " * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
        "    - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
        " * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
        "    - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))"
        " / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)"
        "    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)))"
    )
    return f"""
WITH u AS (
  SELECT user_id,
         ({u32('abv')}) % 2 AS variant,
         CAST(CASE WHEN 4 * sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) >= count(*)
                   THEN 1 ELSE 0 END AS BIGINT) AS conv,
         ({u32('abe')}) % 5 AS ecoin
  FROM {events} GROUP BY user_id
),
arms AS (
  SELECT 'null' AS arm, variant, conv FROM u
  UNION ALL
  SELECT 'planted', variant,
         CASE WHEN variant = 1 AND ecoin = 0 THEN CAST(1 AS BIGINT)
              ELSE conv END
  FROM u
),
cells AS (
  SELECT arm,
         CAST(sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM arms GROUP BY arm
)
SELECT arm, a AS n_control_conv, b AS n_control_nonconv,
       c AS n_variant_conv, d AS n_variant_nonconv,
       a * 1000 {dv} (a + b) AS control_rate_milli,
       c * 1000 {dv} (c + d) AS variant_rate_milli,
       c * 1000 {dv} (c + d) - a * 1000 {dv} (a + b) AS lift_milli,
       CAST(floor({chi} * 1000000) AS BIGINT) AS chi2_micro,
       CAST(floor({chi} * 1000000) AS BIGINT) > {_AB_CRIT_MICRO} AS significant
FROM cells
"""


@query(
    "ab_test_chi_square",
    oracle=_ab_sql("duck", "events"),
    tags=("behavior", "eval"),
)
def ab_test_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experimentation rung: a two-proportion chi-square test
    (Pearson, df=1) over a user-level A/B assignment, run as TWO
    EXPERIMENT ARMS with known ground truth through shared
    expressions — 'null' (variant assigned by an md5 coin
    INDEPENDENT of behavior; any detected effect is a false
    positive) and 'planted' (variant-1 users additionally convert on
    a 1-in-5 md5 coin; a real ~+13-point true effect exists). Units
    are USERS, not events (the classic unit-of-randomization error
    is doing this at event grain — conversions within a user
    correlate and the test overcounts evidence); conversion = the
    user's purchase share reaching a quarter of their events. Cell
    counts are exact BIGINTs; the chi-square ratio is one
    fixed-parenthesization IEEE-double expression (identical bits on
    both engines) floored to micro, compared against the exact 95%
    critical value 3.841459.

    Measured (sf0.01, 150 users / sf0.1, 1,500): the null arm is
    QUIET at both SFs (chi2 0.20 / 0.97, lift -25 / -19 milli — a
    correctly randomized null), and the planted arm delivers the
    POWER lesson most A/B dashboards never show: the SAME true
    effect reads chi2 = 2.17 (NOT significant — a +94-milli
    observed lift at n=150 is statistically indistinguishable from
    noise) at sf0.01 and chi2 = 36.2 (>5 sigma, lift +132 milli) at
    sf0.1. A test that is quiet on a true effect is
    underpowered, not negative — the run-it-longer decision this
    operator prices exactly; the null arm is the false-positive
    control, the same two-sided discipline as the CUSUM and
    Fellegi-Sunter rungs.

    Scale: one user-level aggregate (map-side combinable max/coins),
    one 2x2x2 cell aggregate, arithmetic on an 8-cell frame. The
    production caveat carried in code: at planetary n the double
    products round (the counts stay exact; the statistic's ~1e-16
    relative wobble is shared bit-for-bit by both engines and is
    meaningless against a 3.84 threshold).
    """
    tune(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__ab_events")
    return spark.sql(_ab_sql("spark", "__ab_events"))
