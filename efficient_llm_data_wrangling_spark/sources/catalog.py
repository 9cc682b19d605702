"""Table catalog over the driver-generated parquet test data.

The synthetic star schema (TESTDATA.md): TPC-H-ish ``region nation
customer supplier part orders lineitem`` plus ``events`` (stream-like),
``documents`` (text corpus) and ``embeddings`` (vectors).

Scale note: parquet scans here are the leaves of every plan; we rely on
Catalyst pushing filters/projections into the scan (``PushedFilters`` /
``ReadSchema`` in ``.explain``), so loaders never cache or collect —
they return lazy DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All tables the driver materializes per scale factor.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one synthetic table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    reads only as raw int64 nanos (``spark.sql.legacy.parquet.
    nanosAsLong``, set in session.RUNTIME_CONFS); it is normalized here
    to ``timestamp_ntz`` at microsecond precision so downstream plans
    and the DuckDB oracles (which cast ns→us the same floor way) agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from efficient_llm_data_wrangling_spark.session import tune

    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: double division loses precision at
        # 1e18-scale nanos and shifts the microsecond value by ±1
        micros = F.expr("ts div 1000")
        df = df.withColumn("ts", F.timestamp_micros(micros).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``t = load_tables(spark, d, 'orders', 'customer')``."""
    use = names or TABLES
    return {name: load_table(spark, sf_dir, name) for name in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so ``spark.sql`` can address the tables by name."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
