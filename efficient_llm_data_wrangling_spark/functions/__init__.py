"""Synthesized-function execution engine (SURVEY.md §2.9, §7 Phase 2)."""

from efficient_llm_data_wrangling_spark.functions.apply import (
    NOT_EXECUTABLE,
    apply_function,
    is_executable,
    validate_function,
)
from efficient_llm_data_wrangling_spark.functions.sandbox import (
    SandboxError,
    compile_function,
    validate_source,
)

__all__ = [
    "NOT_EXECUTABLE",
    "apply_function",
    "is_executable",
    "validate_function",
    "SandboxError",
    "compile_function",
    "validate_source",
]
