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
from efficient_llm_data_wrangling_spark.session import tune
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
