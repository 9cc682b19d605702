"""The synthesize→validate→repair control loop (G8/G9 —
fast_ai_wrangler/function_generator.py:195-233 and
run_wrangler.py:16-56), as a typed driver-side component.

Differences from the reference, by design:

* failures return/raise typed results (:class:`SynthesisFailed`,
  ``CompiledFunction``) instead of the ``"No function …"`` sentinel
  string matched by substring (run_wrangler.py:38, SURVEY §7 Phase 3);
* demonstrations/supervision arrive as (small, collected) DataFrames;
  validation accuracy runs distributed through functions/apply.py;
* a cross-run persistent cache keyed by intent hash (plans/cache.py)
  sits in front of the LLM.

Cost structure preserved: ≤ trials × depth LLM calls per TASK
(BASELINE.md), zero LLM calls at apply time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from efficient_llm_data_wrangling_spark.functions.apply import TASK_ENTRY_POINTS, validate_function
from efficient_llm_data_wrangling_spark.functions.sandbox import SandboxError, validate_source
from efficient_llm_data_wrangling_spark.plans.cache import FunctionCache, intent_key
from efficient_llm_data_wrangling_spark.plans.client import LLMClient, extract_code
from efficient_llm_data_wrangling_spark.plans.prompts import formulate_prompt, retry_message


@dataclass(frozen=True)
class CompiledFunction:
    """The synthesized physical operator."""

    task: str
    source: str
    entry_name: str
    accuracy: float
    iterations: int
    from_cache: bool = False


class SynthesisFailed(RuntimeError):
    """Raised when no candidate survives validation within budget
    (the reference's 'No function can be generated' sentinel,
    function_generator.py:233)."""


@dataclass
class SemanticCompiler:
    """G8 driver loop with a pluggable client.

    ``depth`` bounds repair iterations per trial
    (function_generator.py:195 default 5); candidates accumulate on a
    stack and the best-by-accuracy wins on exhaustion (:217-223).
    """

    client: LLMClient
    depth: int = 5
    threshold: float = 0.51
    threshold_sup: float = 10.0
    cache: FunctionCache = field(default_factory=FunctionCache)

    def compile(
        self,
        task: str,
        demos: DataFrame,
        demo_rows: list[tuple[str, str]],
        supervision: DataFrame | None = None,
        instruction: str | None = None,
    ) -> CompiledFunction:
        """Synthesize a function for ``task`` from ``demo_rows``
        (the k collected (text, label) demonstrations) validated
        against the ``demos``/``supervision`` frames."""
        entry = TASK_ENTRY_POINTS[task]
        key = intent_key(task, instruction, demo_rows)
        hit = self.cache.get(key)
        if hit is not None:
            return CompiledFunction(task, hit["source"], entry, hit["accuracy"], 0, from_cache=True)

        messages = formulate_prompt(task, instruction, demo_rows)
        stack: list[tuple[float, str]] = []  # (accuracy, source)
        for iteration in range(1, self.depth + 1):
            response = self.client.complete(messages)
            source = extract_code(response)
            try:
                validate_source(source)
            except SandboxError as exc:
                messages = [*messages, retry_message(f"static validation: {exc}")]
                continue
            verdict, acc = validate_function(
                demos, supervision, source, task,
                threshold=self.threshold, threshold_sup=self.threshold_sup,
            )
            if verdict == "ok":
                self.cache.put(key, source, acc)
                return CompiledFunction(task, source, entry, acc, iteration)
            if acc > float("-inf"):
                stack.append((acc, source))
            messages = [*messages, retry_message(verdict)]

        if stack:  # best-of on exhaustion (function_generator.py:219-223)
            stack.sort(key=lambda pair: pair[0], reverse=True)
            acc, source = stack[0]
            self.cache.put(key, source, acc)
            return CompiledFunction(task, source, entry, acc, self.depth)
        raise SynthesisFailed(f"no candidate for task {task!r} survived {self.depth} iterations")
