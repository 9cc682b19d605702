"""The semantic operator compiler (SURVEY.md §2.9 G1–G10, §7 Phase 3).

The planner-above-Catalyst: lowers a *semantic intent* (task +
instruction + k demonstrations) into a concrete physical operator — a
Python function source applied as an Arrow pandas UDF — via an LLM
synthesize→validate→repair loop. LLM cost is O(trials × depth) per
TASK, never per row (the reference paper's central idea,
function_generator.py:195-233).
"""

from efficient_llm_data_wrangling_spark.plans.client import (
    LLMClient,
    OfflineStubClient,
    OpenAICompatibleClient,
)
from efficient_llm_data_wrangling_spark.plans.compiler import (
    CompiledFunction,
    SemanticCompiler,
    SynthesisFailed,
)

__all__ = [
    "LLMClient",
    "OfflineStubClient",
    "OpenAICompatibleClient",
    "CompiledFunction",
    "SemanticCompiler",
    "SynthesisFailed",
]
