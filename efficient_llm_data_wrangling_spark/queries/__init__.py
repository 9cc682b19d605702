"""Named queries — one per implemented operator (driver contract).

Importing this package registers every query into
:mod:`efficient_llm_data_wrangling_spark.registry`.
"""

import efficient_llm_data_wrangling_spark.queries.analytics  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.behavior  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.clustering  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.corpusops  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.curation  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.etl  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.quality  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.relational  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.retrieval  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.scale  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.layout  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.streaming  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.subqueries  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.temporal  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.textquality  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.tpch_partsupp  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.tpch_tail  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.tpch_tail2  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.trainprep  # noqa: F401
import efficient_llm_data_wrangling_spark.queries.wrangler  # noqa: F401
