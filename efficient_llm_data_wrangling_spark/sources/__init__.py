"""Sources and sinks (SURVEY.md §2.1, S1–S11)."""

from efficient_llm_data_wrangling_spark.sources.catalog import TABLES, load_table, load_tables
from efficient_llm_data_wrangling_spark.sources.readers import (
    read_blocked_pairs,
    read_csv_dir_with_filename_column,
    read_imputation_split,
    read_instruction,
    read_transformation_file,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_blocked_pairs",
    "read_csv_dir_with_filename_column",
    "read_imputation_split",
    "read_instruction",
    "read_transformation_file",
]
