"""Queries exercising the synthesized-function engine (G4–G10) with
relational oracles: the pandas-UDF apply machinery must produce
bit-identical results to a pure-SQL restatement of each golden
function's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.functions.apply import apply_function
from efficient_llm_data_wrangling_spark.operators.serialize import serialize_keyed
from efficient_llm_data_wrangling_spark.plans import golden
from efficient_llm_data_wrangling_spark.registry import query
from efficient_llm_data_wrangling_spark.session import tune
from efficient_llm_data_wrangling_spark.sources.catalog import load_table

_DATES_ORACLE = """
SELECT o_orderkey, strftime(o_orderdate, '%b %d, %Y') AS pred
FROM orders
"""


@query("apply_transformation_dates", oracle=_DATES_ORACLE, tags=("wrangler", "udf"))
def apply_transformation_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/G5 — distributed apply of a synthesized date-reformat
    function (compile-once Arrow pandas UDF) against a strftime oracle.
    The reference re-execs per row (function_generator.py:131); here the
    source compiles once per worker and maps Arrow batches."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    df = orders.select(
        "o_orderkey", F.col("o_orderdate").cast("string").alias("text")
    )
    return apply_function(
        df, golden.GOLDEN_DATE_REFORMAT, task="data_transformation"
    ).select("o_orderkey", "pred")


_REGEX_DATES_ORACLE = """
SELECT o_orderkey,
       regexp_replace(CAST(o_orderdate AS VARCHAR),
                      '^\\s*(\\d{4})-(\\d{2})-(\\d{2})\\s+\\d{2}:\\d{2}:\\d{2}\\s*$',
                      '\\2/\\3/\\1') AS pred
FROM orders
"""


@query("regex_transform_dates", oracle=_REGEX_DATES_ORACLE, tags=("wrangler", "udf"))
def regex_transform_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGEX_GENERATOR synthesis variant
    (promptsTemplate.py:89-93 — defined but never wired in the
    reference): the synthesized operator is a regex program under the
    ``string_transformation_regex`` entry point, applied through the
    same compile-once pandas-UDF machinery, against a DuckDB
    regexp_replace oracle with the identical pattern (RE2 and Python
    ``re`` agree on this class-and-group subset)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    df = orders.select(
        "o_orderkey", F.col("o_orderdate").cast("string").alias("text")
    )
    return apply_function(
        df, golden.GOLDEN_REGEX_DATE, task="regex_transformation"
    ).select("o_orderkey", "pred")


_MATCH_ORACLE = """
WITH pairs AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         list_distinct(string_split(a.text, ' ')) AS ta,
         list_distinct(string_split(b.text, ' ')) AS tb
  FROM documents a
  JOIN documents b
    ON b.doc_id = CASE WHEN a.doc_id % 10 = 0 THEN a.doc_id ELSE a.doc_id + 1 END
)
SELECT left_id, right_id,
  CASE WHEN len(list_intersect(ta, tb)) * 1.0 / len(list_distinct(list_concat(ta, tb))) >= 0.5
       THEN 'Yes' ELSE 'No' END AS pred
FROM pairs
"""


@query("entity_match_jaccard", oracle=_MATCH_ORACLE, tags=("wrangler", "udf", "join"))
def entity_match_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — the LLM-synthesized semantic similarity join (entity
    matching via token-Jaccard threshold, the behavior the reference
    prompts mandate at promptsTemplate.py:30-48), applied distributed.
    Self-pairs (doc_id%10=0) give Yes, neighbor pairs mostly No; the
    oracle recomputes Jaccard relationally."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("left_id"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("right_id"), F.col("text").alias("text_b"))
    pair_key = F.when(F.col("left_id") % 10 == 0, F.col("left_id")).otherwise(
        F.col("left_id") + 1
    )
    paired = a.join(b, pair_key == b["right_id"])
    df = paired.select(
        "left_id", "right_id",
        F.concat_ws(" @@ ", "text_a", "text_b").alias("text"),
    )
    return apply_function(
        df, golden.GOLDEN_ENTITY_MATCH_JACCARD, task="entity_matching"
    ).select("left_id", "right_id", "pred")


_DETECT_ORACLE = """
WITH values_under_test AS (
  SELECT s_suppkey,
    CASE WHEN s_suppkey % 3 = 0 THEN lower(string_split(s_name, '#')[1]) ELSE s_name END AS text
  FROM supplier
)
SELECT s_suppkey, text,
  CASE WHEN regexp_matches(text, '[0-9]') THEN 'yes' ELSE 'no' END AS pred
FROM values_under_test
"""


@query("detect_error_suppliers", oracle=_DETECT_ORACLE, tags=("wrangler", "udf"))
def detect_error_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-detection task plumbing (S4/G5): every third supplier name
    is cleaned to a bare lowercase word (no error), the rest keep their
    digit-bearing id (error). The synthesized detector flags
    digit-bearing tokens; the oracle restates the rule as a regex."""
    tune(spark)
    sup = load_table(spark, sf_dir, "supplier")
    df = sup.select(
        "s_suppkey",
        F.when(
            F.col("s_suppkey") % 3 == 0,
            F.lower(F.element_at(F.split("s_name", "#"), 1)),
        )
        .otherwise(F.col("s_name"))
        .alias("text"),
    )
    return apply_function(
        df, golden.GOLDEN_DETECT_ERROR, task="error_detection_spelling"
    ).select("s_suppkey", "text", "pred")


_IMPUTE_ORACLE = """
SELECT o_orderkey,
  CASE WHEN contains(o_orderpriority, '-')
       THEN trim(substr(o_orderpriority, position('-' IN o_orderpriority) + 1))
       ELSE trim(o_orderpriority) END AS pred
FROM orders
"""


@query("impute_priority_word", oracle=_IMPUTE_ORACLE, tags=("wrangler", "udf", "serialize"))
def impute_priority_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Imputation task plumbing (S3/G5): serialize the row (P2), let
    the synthesized function recover the target attribute from the
    serialized text; oracle recomputes from the raw column."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    text = serialize_keyed(
        [("o_orderstatus", F.col("o_orderstatus")), ("o_orderpriority", F.col("o_orderpriority"))]
    )
    df = orders.select("o_orderkey", text.alias("text"))
    return apply_function(
        df, golden.GOLDEN_IMPUTE_PRIORITY, task="data_imputation"
    ).select("o_orderkey", "pred")


_E2E_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS crc,
       CAST(1.0 AS DOUBLE) AS acc
FROM orders WHERE o_orderkey >= 10
"""


@query("wrangler_e2e_transformation", oracle=_E2E_ORACLE, tags=("wrangler", "e2e"))
def wrangler_e2e_transformation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pipeline (G8/G9/G10 + apply + score) end-to-end with the
    offline deterministic client: train on the first 10 date rows,
    synthesize (stub returns the golden reformat), apply to the rest,
    score with the golden comparator. The golden function is exactly
    right, so crc == total and acc == 1.0 — which the oracle asserts
    from first principles."""
    from efficient_llm_data_wrangling_spark.plans.client import OfflineStubClient
    from efficient_llm_data_wrangling_spark.plans.compiler import SemanticCompiler
    from efficient_llm_data_wrangling_spark.wrangler import WranglerTask, run_wrangling_task

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("text"),
        F.date_format("o_orderdate", "MMM dd, yyyy").alias("label_str"),
    )
    train = base.filter(F.col("o_orderkey") < 10)
    test = base.filter(F.col("o_orderkey") >= 10)
    compiler = SemanticCompiler(client=OfflineStubClient([golden.GOLDEN_DATE_REFORMAT]))
    result = run_wrangling_task(
        WranglerTask(task="data_transformation", train=train, test=test, d=10),
        compiler,
    )
    return result.metrics.select(
        "total", "crc", F.col("acc").cast("double").alias("acc")
    )
