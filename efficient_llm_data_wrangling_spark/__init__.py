"""efficient_llm_data_wrangling_spark — a PySpark-native data-wrangling
and analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``effyli/efficient_llm_data_wrangling`` (SIGMOD DEEM'24,
"Towards Efficient Data Wrangling with LLMs using Code Generation"),
re-expressed Spark-first:

* relational wrangling core — declarative DataFrame plans (Catalyst
  optimizes scans, joins, pushdown) — :mod:`.sources`, :mod:`.operators`
* sandboxed synthesized-function application — compile-once Arrow
  pandas UDFs — :mod:`.functions`
* the LLM "semantic operator compiler" control loop with a pluggable,
  offline-stubbable client — :mod:`.plans`
* Structured Streaming windows/watermark/stateful ops — :mod:`.streaming`
* scale operators a 100 TB training-data pipeline needs (dedup,
  similarity search, text analysis, multimodal plumbing) —
  :mod:`.operators`

Everything here is plain public PySpark (DataFrame/SQL API); no custom
Catalyst rules are required (see SURVEY.md §4).
"""

__version__ = "0.1.0"

from efficient_llm_data_wrangling_spark.session import get_spark, tune  # noqa: F401
