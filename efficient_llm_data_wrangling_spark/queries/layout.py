"""Data-layout operators — the table-maintenance side of a 100 TB
lakehouse (beyond-reference north star; the reference never persists a
table large enough to care):

* **Z-order clustering report** — interleave the bits of two column
  ranks into one sort key (the Delta/Iceberg ``OPTIMIZE ZORDER BY``
  layout), simulate the resulting file boundaries, and measure
  min/max zone-map pruning for a selective predicate on the SECONDARY
  column against a conventional date-sorted layout. At 100 TB the
  file-skipping ratio this reports IS the query bill: a date-sorted
  layout scans every file for a customer-key predicate, while the
  Z-order layout bounds both dimensions per file.

All arithmetic is exact integers (16-bit per-dimension scaling,
bit-extraction via power-of-two division — no engine bit operators
needed, so the same formula runs on Spark and DuckDB verbatim apart
from the integer-division token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import ensure_parallelism, tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

#: bits per dimension in the Z-value (16 ⇒ 32-bit keys, BIGINT-safe).
_ZBITS = 16
#: simulated file count per layout (top-6-bit split of the sort key).
_ZFILES = 64


def _z_interleave(sx: str, sy: str, dv: str) -> str:
    """Bit-interleave two ``_ZBITS``-bit non-negative integers into a
    Z-value using only ``div``/``%``/``*``/``+`` — portable across
    Spark SQL (``dv='div'``) and DuckDB (``dv='//'``). Bit *i* of the
    scaled x lands at position 2i, of y at 2i+1."""
    terms = []
    for i in range(_ZBITS):
        p, q = 2**i, 4**i
        terms.append(f"((({sx}) {dv} {p}) % 2) * {q}")
        terms.append(f"((({sy}) {dv} {p}) % 2) * {q * 2}")
    return " + ".join(terms)


def _zorder_sql(dv: str) -> str:
    """The whole report as one engine-portable SQL body over views
    ``__zorders`` (x, y) — custkey and epoch-day per order. Kept as a
    single shared template so the Spark query and the DuckDB oracle
    cannot drift."""
    top = 4**_ZBITS // _ZFILES  # file width in Z-space (top 6 bits)
    return f"""
WITH b AS (
  SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy
  FROM __zorders
),
s AS (
  SELECT x, y,
         ((x - minx) * {2**_ZBITS - 1}) {dv} (CASE WHEN maxx > minx THEN maxx - minx ELSE 1 END) AS sx,
         ((y - miny) * {2**_ZBITS - 1}) {dv} (CASE WHEN maxy > miny THEN maxy - miny ELSE 1 END) AS sy,
         minx + ((maxx - minx) * 31) {dv} 64 AS c1,
         minx + ((maxx - minx) * 33) {dv} 64 AS c2,
         miny, maxy
  FROM __zorders CROSS JOIN b
),
f AS (
  SELECT x, c1, c2,
         ({_z_interleave("sx", "sy", dv)}) {dv} {top} AS f_z,
         ((y - miny) * {_ZFILES}) {dv} (maxy - miny + 1) AS f_d
  FROM s
),
g AS (
  SELECT f_z, f_d, min(x) AS gmin, max(x) AS gmax,
         count(*) AS g_rows, min(c1) AS c1, min(c2) AS c2
  FROM f GROUP BY f_z, f_d
),
z AS (
  SELECT 'zorder' AS layout, f_z AS file_id,
         min(gmin) AS fmin, max(gmax) AS fmax,
         sum(g_rows) AS n_rows, min(c1) AS c1, min(c2) AS c2
  FROM g GROUP BY f_z
),
d AS (
  SELECT 'date_sorted' AS layout, f_d AS file_id,
         min(gmin) AS fmin, max(gmax) AS fmax,
         sum(g_rows) AS n_rows, min(c1) AS c1, min(c2) AS c2
  FROM g GROUP BY f_d
),
u AS (SELECT * FROM z UNION ALL SELECT * FROM d)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN fmin <= c2 AND fmax >= c1 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned,
       CAST(sum(CASE WHEN fmin <= c2 AND fmax >= c1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned
FROM u
GROUP BY layout
"""


_ZORDER_ORACLE = (
    "WITH __zorders AS (SELECT o_custkey AS x,"
    " datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y"
    " FROM orders),\n"
    + _zorder_sql("//").strip().removeprefix("WITH ")
)


@query("zorder_layout_report", oracle=_ZORDER_ORACLE, tags=("layout", "scale"))
def zorder_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering effectiveness (the Delta/Iceberg ``OPTIMIZE
    ZORDER BY (o_custkey, o_orderdate)`` layout decision, simulated):
    scale both columns to 16-bit ranks, bit-interleave them into a
    Z-value, cut the sorted key space into 64 equal-width "files",
    and report how many files a selective customer-key slab predicate
    (the middle 1/32 of the key range) would scan under min/max
    zone-map pruning — against the same corpus laid out date-sorted.
    Output: one row per layout with (n_files, files_scanned,
    rows_scanned): the date layout scans every file for a customer
    predicate, the Z-order layout a bounded fraction.

    Scale: ONE fact pass computes per-row Z-values (pure column
    arithmetic, broadcast 1-row bounds) and pre-aggregates on the
    COMPOSITE (z-file, date-file) key — min/max/count compose, so
    both layouts then derive from the ≤64×64-row grid without
    re-touching the fact (the one extra scan is the bounds
    aggregate, the repo-standard broadcast-scalar pattern). Nothing
    global-sorts — the file split uses fixed-width key ranges, not
    row ranks. The bit math is div/mod-by-constant only, so the
    identical formula is the DuckDB oracle (no engine bit-operator
    divergence).
    """
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    o.createOrReplaceTempView("__zorders")
    return spark.sql(_zorder_sql("div"))


# ---------------------------------------------------------------------------
# Small-file compaction planner (the OPTIMIZE bin-packing decision)
# ---------------------------------------------------------------------------

#: compaction target (simulated bytes per output file) and the
#: "right-sized" floor: files ≥ target/2 are left alone (rewriting a
#: near-target file buys nothing and costs a full write — the
#: Delta/Iceberg OPTIMIZE default posture).
_COMPACT_TARGET = 4096


def _compaction_sql(dv: str) -> str:
    """Engine-portable plan body over view ``__cfiles``
    (part, hr, n_rows, bytes) — the simulated per-(partition, hour)
    ingest file inventory. Shared template so Spark (``dv='div'``)
    and DuckDB (``dv='//'``) cannot drift."""
    t, half = _COMPACT_TARGET, _COMPACT_TARGET // 2
    return f"""
WITH s AS (
  SELECT part, hr, n_rows, bytes,
         CASE WHEN bytes >= {half} THEN 1 ELSE 0 END AS right_sized
  FROM __cfiles
),
sm AS (SELECT part, hr, bytes FROM s WHERE right_sized = 0),
p AS (
  SELECT part, bytes,
         (sum(bytes) OVER (PARTITION BY part ORDER BY hr
                           ROWS UNBOUNDED PRECEDING) - bytes) {dv} {t} AS grp
  FROM sm
),
g AS (
  SELECT part, grp, count(*) AS nf, sum(bytes) AS gb
  FROM p GROUP BY part, grp
),
a AS (
  SELECT part,
         CAST(count(*) AS BIGINT) AS n_files_before,
         CAST(sum(right_sized) AS BIGINT) AS n_right_sized,
         CAST(count(*) - sum(right_sized) AS BIGINT) AS n_small,
         CAST(sum(bytes) AS BIGINT) AS bytes_total
  FROM s GROUP BY part
),
c AS (
  SELECT part,
         CAST(sum(CASE WHEN nf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rewrite_groups,
         CAST(sum(CASE WHEN nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_singletons,
         CAST(sum(CASE WHEN nf >= 2 THEN gb ELSE 0 END) AS BIGINT)
           AS bytes_rewritten
  FROM g GROUP BY part
)
SELECT a.part,
       a.n_files_before, a.n_right_sized, a.n_small,
       a.n_right_sized + coalesce(c.n_singletons, 0)
         + coalesce(c.n_rewrite_groups, 0) AS n_files_after,
       a.bytes_total,
       coalesce(c.bytes_rewritten, 0) + CAST(0 AS BIGINT) AS bytes_rewritten,
       a.bytes_total {dv} a.n_files_before AS avg_file_bytes_before,
       a.bytes_total {dv} (a.n_right_sized + coalesce(c.n_singletons, 0)
                           + coalesce(c.n_rewrite_groups, 0))
         AS avg_file_bytes_after,
       coalesce(c.bytes_rewritten, 0) * 1000 {dv} a.bytes_total
         AS write_amp_permille
FROM a LEFT JOIN c ON a.part = c.part
"""


_COMPACTION_ORACLE = (
    "WITH __cfiles AS (\n"
    "  SELECT event_type AS part,\n"
    "         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 3600 AS hr,\n"
    "         CAST(count(*) AS BIGINT) AS n_rows,\n"
    "         CAST(sum(32 + coalesce(length(props), 0)) AS BIGINT) AS bytes\n"
    "  FROM events GROUP BY 1, 2\n"
    "),\n"
    + _compaction_sql("//").strip().removeprefix("WITH ")
)


@query("compaction_plan_report", oracle=_COMPACTION_ORACLE, tags=("layout", "scale"))
def compaction_plan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the lakehouse OPTIMIZE /
    bin-packing decision, simulated): hourly streaming ingest writes
    one file per (event_type, hour) — the classic small-file problem —
    and the planner reports, per partition, what compaction at a
    {_COMPACT_TARGET}-byte target would do: files before/after,
    right-sized files skipped (≥ half target — rewriting them buys
    nothing), greedy hour-ordered bin-packing of the small ones
    (the ``pack_documents_token_budget`` cumsum discipline), singleton
    bins left in place (no gain, full write cost), bytes rewritten,
    and the resulting write amplification in exact per-mille. These
    are the numbers a table-maintenance service weighs against query
    savings before scheduling the rewrite — at 100 TB, compacting a
    million 1 MB files into 16k right-sized ones is often the single
    biggest scan-time win available.

    Scale: one fact pass builds the (partition, hour) inventory —
    after that everything runs on |files| rows: the pack cumsum is a
    per-partition window over the inventory (never the fact), and the
    report is two |files|-row aggregates joined on partition. Integer
    throughout; bytes are a deterministic 32+len(props) proxy so both
    engines bill identical sizes.
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    inv = (
        events.select(
            F.col("event_type").alias("part"),
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 3600").alias("hr"),
            (F.lit(32) + F.coalesce(F.length("props"), F.lit(0)))
            .cast("long")
            .alias("rb"),
        )
        .groupBy("part", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("rb").cast("long").alias("bytes"),
        )
        # |files| rows; materialized so the report's two aggregates
        # don't each re-scan the fact (audit: 2 events scans)
        .localCheckpoint(eager=False)
    )
    inv.createOrReplaceTempView("__cfiles")
    return spark.sql(_compaction_sql("div"))


# ---------------------------------------------------------------------------
# Snapshot retention plan (the VACUUM / expire_snapshots decision)
# ---------------------------------------------------------------------------

_RET_DAYS = 7  # retention window: keep snapshots from the last 7 version-days


def _retention_sql(dv: str) -> str:
    """Engine-portable plan body over view ``__vfiles``
    (part, v, n_rows, bytes) — the simulated per-(partition,
    version-day) rewrite inventory: each day with ≥1 event overwrites
    its partition (the ``overwrite_partitions_dynamic`` write
    pattern), so file (part, v) is referenced by snapshots
    [v, next_rewrite(part) − 1] and is reclaimable exactly when that
    interval ends before the retained window starts. Shared template
    so Spark (``dv='div'``) and DuckDB (``dv='//'``) cannot drift."""
    return f"""
WITH mk AS (
  SELECT max(v) - {_RET_DAYS} + 1 AS min_keep, max(v) AS v_max,
         CAST(count(DISTINCT v) AS BIGINT) AS n_versions
  FROM __vfiles
),
s AS (
  SELECT part, v, n_rows, bytes,
         lead(v) OVER (PARTITION BY part ORDER BY v) AS next_v
  FROM __vfiles
),
f AS (
  SELECT s.part, s.v, s.n_rows, s.bytes, s.next_v,
         CASE WHEN s.next_v IS NOT NULL AND s.next_v - 1 < mk.min_keep
              THEN 1 ELSE 0 END AS expired,
         CASE WHEN s.next_v IS NULL THEN 1 ELSE 0 END AS is_live
  FROM s, mk
)
SELECT f.part,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(f.is_live) AS BIGINT) AS n_live,
       CAST(sum(f.expired) AS BIGINT) AS n_expired,
       CAST(count(*) - sum(f.expired) AS BIGINT) AS n_retained,
       CAST(sum(f.bytes) AS BIGINT) AS bytes_total,
       CAST(sum(CASE WHEN f.expired = 1 THEN f.bytes ELSE 0 END) AS BIGINT)
         AS bytes_reclaimable,
       CAST(sum(CASE WHEN f.expired = 1 THEN f.bytes ELSE 0 END) * 1000
            {dv} sum(f.bytes) AS BIGINT) AS reclaim_permille,
       CAST(max(CASE WHEN f.is_live = 1 THEN f.v END) AS BIGINT) AS live_version,
       CAST(min(mk.min_keep) AS BIGINT) AS min_keep_version,
       CAST(min(mk.n_versions) AS BIGINT) AS n_versions
FROM f, mk GROUP BY f.part
"""


_RETENTION_ORACLE = (
    "WITH __vfiles AS (\n"
    "  SELECT event_type AS part,\n"
    "         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS v,\n"
    "         CAST(count(*) AS BIGINT) AS n_rows,\n"
    "         CAST(sum(32 + coalesce(length(props), 0)) AS BIGINT) AS bytes\n"
    "  FROM events GROUP BY 1, 2\n"
    "),\n"
    + _retention_sql("//").strip().removeprefix("WITH ")
)


@query("snapshot_retention_plan", oracle=_RETENTION_ORACLE, tags=("layout", "scale"))
def snapshot_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot RETENTION planning — the Delta VACUUM / Iceberg
    ``expire_snapshots`` decision, simulated on the same inventory
    discipline as ``compaction_plan_report``: daily dynamic-partition
    overwrites leave one file per (partition, version-day); a file is
    referenced by every snapshot from its write until its partition's
    next rewrite, so under a keep-last-{_RET_DAYS}-days policy it is
    reclaimable exactly when its reference interval ends before the
    retained window starts. Per partition: files total/live/expired/
    retained, bytes reclaimable in exact per-mille, the live version,
    and the global retention facts (cutoff, version count). The row a
    table-maintenance service reads before issuing the delete — and
    the reason VACUUM is safe to run: nothing inside the retained
    window is ever listed. The interval rule also gets right the case
    a naive age-based file delete gets WRONG: a file OLDER than the
    cutoff whose next rewrite falls inside the window stays retained
    (a time-travel query at the window edge still reads it) — it
    fires whenever a partition's version gaps span the cutoff.

    Scale: one fact pass builds the (partition, version) inventory;
    everything after runs on |files| rows — the next-rewrite lookup is
    a per-partition ``lead`` window over the inventory, the window
    facts one in-plan broadcast 1-row aggregate. Integer throughout
    (same 32+len(props) byte proxy as compaction).
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    inv = (
        events.select(
            F.col("event_type").alias("part"),
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400").alias("v"),
            (F.lit(32) + F.coalesce(F.length("props"), F.lit(0)))
            .cast("long")
            .alias("rb"),
        )
        .groupBy("part", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("rb").cast("long").alias("bytes"),
        )
        .localCheckpoint(eager=False)
    )
    inv.createOrReplaceTempView("__vfiles")
    return spark.sql(_retention_sql("div"))


# ---------------------------------------------------------------------------
# Reshard movement plan (consistent hashing vs mod-hash, measured)
# ---------------------------------------------------------------------------

_RSH_BEFORE = 8  # shards before the grow
_RSH_AFTER = 9  # shards after
_RSH_VNODES = 16  # virtual points per shard on the 2^32 ring


def _rsh_ring(n_shards: int) -> list[tuple[int, int]]:
    """The ring's (point, shard) list — pure hashlib at query-build
    time (the ring depends only on shard ids, never on data), so both
    engines receive identical literals."""
    import hashlib

    pts = []
    for s in range(n_shards):
        for v in range(_RSH_VNODES):
            h = int(hashlib.md5(f"ring:{s}:{v}".encode()).hexdigest()[:8], 16)
            pts.append((h, s))
    return sorted(pts)


def _rsh_intervals(n_shards: int) -> list[tuple[int, int, int]]:
    """Owner intervals [lo, hi] → shard: each point owns the arc from
    its predecessor (exclusive) up to itself; the wrap arc (above the
    last point and below the first) belongs to the FIRST point."""
    pts = _rsh_ring(n_shards)
    iv = []
    for i, (p, s) in enumerate(pts):
        lo = pts[i - 1][0] + 1 if i > 0 else 0
        iv.append((lo, p, s))
    # wrap: keys above the last point go to the first (smallest) point
    iv.append((pts[-1][0] + 1, (1 << 32) - 1, pts[0][1]))
    return iv


def _rsh_values(iv: list[tuple[int, int, int]]) -> str:
    return ", ".join(f"({lo}, {hi}, {s})" for lo, hi, s in iv)


def _rsh_sql(dv: str, tbl: str, vc: str) -> str:
    """Engine-portable body: per-doc 32-bit key hash, mod-hash owners
    before/after, ring owners via the literal interval tables, and the
    two movement rows with their expected-movement models — mod's
    exact residue arithmetic, the ring's REALIZED arc share of the new
    shard (the bloom report's realized-model discipline)."""
    h32 = "(" + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS {vc})), {1 + j}, 1)) - 1"
        f" AS BIGINT) * {16 ** (7 - j)}"
        for j in range(8)
    ) + ")"
    ivb = _rsh_values(_rsh_intervals(_RSH_BEFORE))
    iva = _rsh_values(_rsh_intervals(_RSH_AFTER))
    new_arc = sum(
        hi - lo + 1 for lo, hi, s in _rsh_intervals(_RSH_AFTER) if s == _RSH_AFTER - 1
    )
    return f"""
WITH dk AS (SELECT doc_id, {h32} AS h FROM {tbl}),
ivb(lo, hi, shard) AS (VALUES {ivb}),
iva(lo, hi, shard) AS (VALUES {iva}),
ob AS (
  SELECT d.doc_id, i.shard AS s_before FROM dk d JOIN ivb i
    ON d.h BETWEEN i.lo AND i.hi
),
oa AS (
  SELECT d.doc_id, i.shard AS s_after FROM dk d JOIN iva i
    ON d.h BETWEEN i.lo AND i.hi
),
ring AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN b.s_before <> a.s_after THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved
  FROM ob b JOIN oa a ON b.doc_id = a.doc_id
),
mh AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN h % {_RSH_BEFORE} <> h % {_RSH_AFTER}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM dk
)
SELECT 'mod_hash' AS strategy,
       CAST({_RSH_BEFORE} AS BIGINT) AS n_shards_before,
       CAST({_RSH_AFTER} AS BIGINT) AS n_shards_after,
       n_docs, n_moved,
       CAST(n_moved * 1000 {dv} n_docs AS BIGINT) AS moved_permille,
       CAST({_RSH_BEFORE} * 1000 {dv} {_RSH_AFTER} AS BIGINT)
         AS expected_permille
FROM mh
UNION ALL
SELECT 'consistent_ring',
       CAST({_RSH_BEFORE} AS BIGINT), CAST({_RSH_AFTER} AS BIGINT),
       n_docs, n_moved,
       CAST(n_moved * 1000 {dv} n_docs AS BIGINT),
       CAST(CAST({new_arc} AS BIGINT) * 1000 {dv} {1 << 32} AS BIGINT)
FROM ring
"""


_RSH_ORACLE = _rsh_sql("//", "documents", "VARCHAR")


@query(
    "reshard_movement_plan",
    oracle=_RSH_ORACLE,
    tags=("layout", "scale", "diagnostics"),
)
def reshard_movement_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESHARD movement accounting — the decision report for growing a
    sharded corpus {_RSH_BEFORE} → {_RSH_AFTER} shards, the operation
    that at 100 TB is priced entirely by how many BYTES MOVE. Two
    strategies over the same md5 key hash: the naive mod-hash
    (``shard_assign_documents``'s rule re-evaluated at the new count)
    and a consistent-hash ring ({_RSH_VNODES} virtual points per
    shard, built from pure shard-id hashing at PLAN time and shipped
    as literal owner intervals, so the per-key owner lookup is one
    broadcast interval join — no per-key ring scan). Each strategy row
    grades measured movement against its own model: mod-hash's exact
    residue arithmetic ({_RSH_BEFORE * 1000 // _RSH_AFTER}‰ — of the
    {_RSH_BEFORE * _RSH_AFTER} joint residues only {_RSH_AFTER - 1}
    agree), and the ring's REALIZED arc share of the new shard's
    points (the bloom report's realized-model discipline — tighter
    than the idealized 1/{_RSH_AFTER} because {_RSH_VNODES} vnodes
    carry real variance).

    Measured at sf0.1 (5,000 docs): mod-hash moves 889‰ (model 888‰)
    — growing by ONE shard rewrites 89% of a corpus — while the ring
    moves 93‰ against its realized-arc model of 96‰ (the idealized
    1/9 is 111‰; the new shard's 16 points happened to claim 9.6% of
    the ring, and the keys followed the arcs, not the ideal). The
    read-off: consistent hashing buys a 9.4× smaller rewrite at the
    cost of ±15% per-shard load variance at {_RSH_VNODES} vnodes —
    and the variance is READABLE from the interval table before any
    data moves, so vnode count can be sized at plan time.

    Scale: the ring is metadata (144 literal intervals); the per-key
    cost is one hash + one broadcast interval probe, scan-side; the
    movement report is one pass of column arithmetic with map-side
    combine. The real migration then moves ONLY the flagged keys —
    which is the entire point.
    """
    tune(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__rsh_docs")
    return spark.sql(_rsh_sql("div", "__rsh_docs", "STRING"))


# ---------------------------------------------------------------------------
# Hilbert-curve clustering vs Z-order (the liquid-clustering decision)
# ---------------------------------------------------------------------------


#: the misaligned file budget (not a power of 4): cuts land inside
#: level-3 quadrants, which is where the two curves' locality differs.
_HFILES_MISALIGNED = 48


def _hilbert_stage_ctes(dv: str, carry: str) -> str:
    """The 16-stage Hilbert xy2d chain as CTE pairs. Each stage, at
    quadrant size s = 2^(15-i): extract the quadrant bits (rx, ry),
    accumulate s^2 * gray(rx, ry) into the d-value, STRIP the
    processed bit (x % s — the bounded variant of the classic
    algorithm, so reflections never go negative and plain SQL
    div/mod replaces C bit twiddling), then reflect/swap the
    sub-square per the Hilbert rotation rule. Inductively hx, hy <
    s entering every stage, so all arithmetic stays in [0, s)."""
    ctes = []
    for i in range(_ZBITS):
        s = 2 ** (_ZBITS - 1 - i)
        ctes.append(
            f"""ha{i} AS (
  SELECT {carry}, hd,
         (hx {dv} {s}) % 2 AS rx, (hy {dv} {s}) % 2 AS ry,
         hx % {s} AS xm, hy % {s} AS ym
  FROM h{i}
)"""
        )
        ctes.append(
            f"""h{i + 1} AS (
  SELECT {carry},
         hd + CAST({s * s} AS BIGINT) * (CASE WHEN rx = 0 AND ry = 0 THEN 0
                              WHEN rx = 0 THEN 1
                              WHEN ry = 1 THEN 2 ELSE 3 END) AS hd,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - ym ELSE ym END)
              ELSE xm END AS hx,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - xm ELSE xm END)
              ELSE ym END AS hy
  FROM ha{i}
)"""
        )
    return ",\n".join(ctes)


def _hilbert_parts(dv: str) -> tuple[str, str]:
    """(grid_ctes, final_fmt): the fact pass through the composite
    (hilbert-64/48, z-64/48, date-file) grid ``g``, and the
    five-layout report over a ``{g}`` slot — split so the Spark side
    can MATERIALIZE the grid once (localCheckpoint) and the DuckDB
    oracle can pin ``g`` MATERIALIZED: without either, each of the
    five union branches re-aggregates the grid from its own fact
    scan (measured: five parquet scans in the executed plan). Shared
    template (the ``_zorder_sql`` discipline) so the engines cannot
    drift; all arithmetic is div/mod-by-constant over BIGINTs."""
    top64 = 4**_ZBITS // _ZFILES
    top48 = 4**_ZBITS // _HFILES_MISALIGNED
    carry = "x, y, c1, c2, d1, d2, zd, f_d"
    agg = (
        "min(gminx) AS fminx, max(gmaxx) AS fmaxx,"
        " min(gminy) AS fminy, max(gmaxy) AS fmaxy,"
        " sum(g_rows) AS n_rows,"
        " min(c1) AS c1, min(c2) AS c2, min(d1) AS d1, min(d2) AS d2"
    )
    grid = f"""b AS (
  SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy
  FROM __hlay
),
s AS (
  SELECT x, y,
         ((x - minx) * {2**_ZBITS - 1}) {dv} (CASE WHEN maxx > minx THEN maxx - minx ELSE 1 END) AS sx,
         ((y - miny) * {2**_ZBITS - 1}) {dv} (CASE WHEN maxy > miny THEN maxy - miny ELSE 1 END) AS sy,
         minx + ((maxx - minx) * 31) {dv} 64 AS c1,
         minx + ((maxx - minx) * 33) {dv} 64 AS c2,
         miny + ((maxy - miny) * 31) {dv} 64 AS d1,
         miny + ((maxy - miny) * 33) {dv} 64 AS d2,
         miny AS bminy, maxy AS bmaxy
  FROM __hlay CROSS JOIN b
),
h0 AS (
  SELECT x, y, c1, c2, d1, d2,
         CAST({_z_interleave("sx", "sy", dv)} AS BIGINT) AS zd,
         ((y - bminy) * {_ZFILES}) {dv} (bmaxy - bminy + 1) AS f_d,
         CAST(0 AS BIGINT) AS hd, sx AS hx, sy AS hy
  FROM s
),
{_hilbert_stage_ctes(dv, carry)},
g AS (
  SELECT hd {dv} {top64} AS fh64, hd {dv} {top48} AS fh48,
         zd {dv} {top64} AS fz64, zd {dv} {top48} AS fz48, f_d,
         min(x) AS gminx, max(x) AS gmaxx,
         min(y) AS gminy, max(y) AS gmaxy,
         count(*) AS g_rows,
         min(c1) AS c1, min(c2) AS c2, min(d1) AS d1, min(d2) AS d2
  FROM h{_ZBITS}
  GROUP BY hd {dv} {top64}, hd {dv} {top48}, zd {dv} {top64}, zd {dv} {top48}, f_d
)"""
    final = f"""
WITH u AS (
  SELECT 'hilbert' AS layout, CAST({_ZFILES} AS BIGINT) AS files_target,
         fh64 AS file_id, {agg}
  FROM {{g}} GROUP BY fh64
  UNION ALL
  SELECT 'hilbert', CAST({_HFILES_MISALIGNED} AS BIGINT), fh48, {agg}
  FROM {{g}} GROUP BY fh48
  UNION ALL
  SELECT 'zorder', CAST({_ZFILES} AS BIGINT), fz64, {agg}
  FROM {{g}} GROUP BY fz64
  UNION ALL
  SELECT 'zorder', CAST({_HFILES_MISALIGNED} AS BIGINT), fz48, {agg}
  FROM {{g}} GROUP BY fz48
  UNION ALL
  SELECT 'date_sorted', CAST({_ZFILES} AS BIGINT), f_d, {agg}
  FROM {{g}} GROUP BY f_d
)
SELECT layout, files_target,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN fminx <= c2 AND fmaxx >= c1 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned_x,
       CAST(sum(CASE WHEN fminx <= c2 AND fmaxx >= c1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned_x,
       CAST(sum(CASE WHEN fminy <= d2 AND fmaxy >= d1 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned_y,
       CAST(sum(CASE WHEN fminy <= d2 AND fmaxy >= d1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned_y
FROM u
GROUP BY layout, files_target
"""
    return grid, final


def _hilbert_sql(dv: str) -> str:
    """One-statement assembly of :func:`_hilbert_parts` — the DuckDB
    oracle form, with the grid MATERIALIZED."""
    grid, final = _hilbert_parts(dv)
    mat = "MATERIALIZED " if dv == "//" else ""
    return (
        "WITH "
        + grid.replace("g AS (", "g AS " + mat + "(", 1)
        + ",\n"
        + final.format(g="g").strip().removeprefix("WITH ")
    )


_HILBERT_ORACLE = (
    "WITH __hlay AS (SELECT o_custkey AS x,"
    " datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y"
    " FROM orders),\n"
    + _hilbert_sql("//").strip().removeprefix("WITH ")
)


@query("hilbert_layout_report", oracle=_HILBERT_ORACLE, tags=("layout", "scale"))
def hilbert_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering vs Z-order vs single-column sort —
    the liquid-clustering layout decision (Delta's replacement for
    ZORDER uses a Hilbert curve precisely because Z-order's quadrant
    jumps inflate per-file bounding boxes): both space-filling curves
    are computed over the same 16-bit (custkey, epoch-day) ranks, the
    sorted key spaces cut into {_ZFILES} equal-width files, and BOTH
    selective slab predicates (middle-1/32 of the customer range, and
    of the date range) priced per layout under min/max zone-map
    pruning. The Hilbert d-value runs the classic xy2d recurrence as
    16 unrolled CTE stages in bounded form — quadrant bits via
    div/mod, processed bits STRIPPED before the reflect/swap rotation
    so every intermediate stays in [0, s) and the identical
    plain-SQL arithmetic is the oracle (no C bit twiddling to
    diverge); a pytest pins the bounded recurrence against the
    textbook algorithm over an exhaustive grid.

    The measured story (sf0.1, 150k orders): date_sorted is the
    degenerate baseline — perfect on its own dimension (2/64 files
    for the date slab), full-scan on the other (64/64 for the
    customer slab). Both curves price BOTH predicates at ~11-12
    files; Hilbert's locality edge over Z-order shows in rows, not
    files, at this grid (equal 11 files on x; ~4% fewer rows scanned
    on y, 12 vs 11 files) — the curves buy multi-dimensional
    prunability at the cost of either dimension's perfect sort,
    which is exactly the trade a clustering advisor weighs.

    Scale: ONE fact pass computes both curve values (pure column
    arithmetic, broadcast 1-row bounds; the 16 Hilbert stages are
    narrow projections Catalyst collapses into one codegen'd stage)
    and pre-aggregates on the composite (hilbert-file, z-file,
    date-file) key, so all three layouts derive from the ≤{_ZFILES}³-
    bounded grid without re-touching the fact.
    """
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    # the 32-stage curve chain is expression-heavy per-row work; a
    # small orders.parquet arrives as ONE split, pinning the whole
    # chain to one core (r12 measurement: the grid ran 1-partition).
    # ensure_parallelism is a no-op at scale (big tables already have
    # more splits than cores) — guide §2.5 input-skew posture.
    ensure_parallelism(o).createOrReplaceTempView("__hlay")
    grid, final = _hilbert_parts("div")
    # materialize the composite grid ONCE: all five layout rows then
    # derive from the checkpointed bounded frame instead of five
    # fact scans (measured in the pre-fix executed plan)
    spark.sql(f"WITH {grid} SELECT * FROM g").localCheckpoint(eager=False).createOrReplaceTempView(
        "__hlay_grid"
    )
    return spark.sql(final.format(g="__hlay_grid"))


# ---------------------------------------------------------------------------
# Range-partitioner boundary election (the exchange-planning decision)
# ---------------------------------------------------------------------------

_RPP_P = 16  # target partition count
_RPP_SAMPLE_MOD = 16  # 1/16 md5 sample elects the boundaries


def _rpp_sql(engine: str, orders: str) -> str:
    """Shared range-partition-plan text, engine-parameterized only in
    spelling (md5 u32, row generator, integer division,
    MATERIALIZED). Three partitioners over the same {_RPP_P}-way
    budget, each on TWO keys (continuous price cents; 5-value
    priority digit): 'range_sampled' elects {_RPP_P - 1} boundaries
    from a deterministic 1/{_RPP_SAMPLE_MOD} md5 sample by
    equal-spaced order statistics (Spark's RangePartitioner,
    determinized), 'hash_key' buckets the KEY's md5, 'hash_row'
    buckets the row id's md5."""
    if engine == "spark":
        u32 = lambda s: (  # noqa: E731
            f"cast(conv(substring(md5({s}), 1, 8), 16, 10) as bigint)"
        )
        gen = f"(SELECT explode(sequence(1, {_RPP_P - 1})) AS i)"
        dv = "div"
        mat = ""
    else:
        from efficient_llm_data_wrangling_spark.queries.curation import _hexint_sql

        u32 = lambda s: _hexint_sql(f"md5({s})", 1, 8)  # noqa: E731
        gen = f"(SELECT unnest(range(1, {_RPP_P})) AS i)"
        dv = "//"
        mat = "MATERIALIZED "
    return f"""
WITH o AS {mat}(
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price,
         CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio
  FROM {orders}
),
rws AS {mat}(
  SELECT k, 'price' AS arm, price AS kv FROM o
  UNION ALL
  SELECT k, 'priority', prio FROM o
),
smp AS {mat}(
  SELECT arm, kv FROM rws
  WHERE ({u32("CAST(k AS STRING) || ':rps:' || arm")}) % {_RPP_SAMPLE_MOD} = 0
),
scnt AS (SELECT arm, CAST(count(*) AS BIGINT) AS m FROM smp GROUP BY arm),
srk AS {mat}(
  SELECT arm, kv, row_number() OVER (PARTITION BY arm ORDER BY kv) AS rk
  FROM smp
),
bd AS {mat}(
  SELECT s.arm, g.i, r.kv AS b
  FROM scnt s CROSS JOIN {gen} g
  JOIN srk r ON r.arm = s.arm
            AND r.rk = greatest((g.i * s.m) {dv} {_RPP_P}, 1)
),
iv AS {mat}(
  SELECT arm, i AS pid,
         lag(b) OVER (PARTITION BY arm ORDER BY i) AS lo,
         b AS hi
  FROM bd
  UNION ALL
  SELECT arm, {_RPP_P}, max(b), NULL FROM bd GROUP BY arm
),
asn AS {mat}(
  SELECT r.arm, 'range_sampled' AS method, v.pid
  FROM rws r JOIN iv v
    ON v.arm = r.arm
   AND (v.lo IS NULL OR r.kv > v.lo)
   AND (v.hi IS NULL OR r.kv <= v.hi)
  UNION ALL
  SELECT arm, 'hash_key',
         ({u32("CAST(kv AS STRING) || ':hk'")}) % {_RPP_P}
  FROM rws
  UNION ALL
  SELECT arm, 'hash_row',
         ({u32("CAST(k AS STRING) || ':hr:' || arm")}) % {_RPP_P}
  FROM rws
),
pc AS (
  SELECT arm, method, pid, CAST(count(*) AS BIGINT) AS c
  FROM asn GROUP BY arm, method, pid
)
SELECT arm, method,
       CAST(count(*) AS BIGINT) AS n_partitions_nonempty,
       CAST(max(c) AS BIGINT) AS max_rows,
       CAST(min(c) AS BIGINT) AS min_rows,
       CAST(sum(c) AS BIGINT) AS total_rows,
       CAST((max(c) - sum(c) {dv} {_RPP_P}) * 1000 {dv} (sum(c) {dv} {_RPP_P})
            AS BIGINT) AS skew_permille
FROM pc
GROUP BY arm, method
"""


@query(
    "range_partition_plan",
    oracle=_rpp_sql("duck", "orders"),
    tags=("layout", "scale", "optimizer"),
)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exchange-planning decision measured — Spark's
    RangePartitioner, determinized and priced against both hash
    alternatives on two key shapes: boundaries elected from a
    deterministic 1/{_RPP_SAMPLE_MOD} md5 sample by equal-spaced
    order statistics (rank i*m/{_RPP_P} of the sorted sample, the
    sample-quantile election a real range exchange performs on its
    reservoir), rows assigned by (lo, hi] interval join against the
    {_RPP_P - 1}-row broadcast boundary table; 'hash_key' buckets the
    key's md5 (locality per key value, no order), 'hash_row' the row
    id's (no locality at all). Duplicate boundary values produce
    legitimately EMPTY partitions — the honest signature of range
    partitioning on a low-NDV key, kept rather than papered over.

    Measured (sf0.1, 150k orders x 2 arms): on the continuous price
    key the sampled ranges balance to 120 permille over the ideal
    share — a 1/16 sample plans a sorted exchange within ~12% of
    perfect, the RangePartitioner bet — vs the ~20-permille floor
    both hash methods sit on (price cents are near-unique, so
    key-hash ~ row-hash). The 5-value priority key flips the
    ranking: range degrades GRACEFULLY to the per-value optimum (5
    non-empty partitions, skew 2,208 permille — each value is its
    own partition, the best any key-aware method can do) while
    hash_key does WORSE (4 partitions, 5,393 permille: md5 happens
    to collide two of the five values into one bucket — hash gives
    no such per-value guarantee), and only locality-free hash_row
    stays at its 19-permille floor. Read-off: partition-key
    CARDINALITY is the constraint for any key-aware exchange; when
    it is low, salt or composite the key (``salted_join_orders``) —
    and if you must pick key-aware, range's value-granular collapse
    beats hash's collision roulette.

    Scale: the sample is 1/{_RPP_SAMPLE_MOD} of the keyspace by
    construction (the one bounded-window election, on the sample
    only — a real exchange collects exactly this to the driver);
    assignment is a broadcast interval join ({_RPP_P - 1} rows) plus
    scan-side md5 arithmetic; counts are map-side partial. Nothing
    data-sized sorts or windows.
    """
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__rpp_orders")
    return spark.sql(_rpp_sql("spark", "__rpp_orders"))
