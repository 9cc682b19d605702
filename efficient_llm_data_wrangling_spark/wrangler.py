"""End-to-end wrangling pipeline (the reference's
run_wrangler.py:16-56,116-271 lifecycle as a library API).

Lifecycle per task: sample k demonstrations (stratified for
entity-matching/error-detection, random otherwise — run_wrangler.py:
27-30) and d supervision rows (:32-35); synthesize with trial
reseeding (+1234 per failed trial, :44); apply the best function to
the test frame distributed; score with the golden comparator. LLM
calls: ≤ num_trials × depth per task; apply time: zero.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from efficient_llm_data_wrangling_spark.functions.apply import apply_function
from efficient_llm_data_wrangling_spark.operators.metrics import confusion_metrics
from efficient_llm_data_wrangling_spark.operators.sampling import (
    sample_k_seeded,
    stratified_sample_seeded,
)
from efficient_llm_data_wrangling_spark.plans.compiler import (
    CompiledFunction,
    SemanticCompiler,
    SynthesisFailed,
)

#: run_wrangler.py:27-30 — tasks that sample demonstrations stratified
#: by label.
STRATIFIED_TASKS = frozenset({"entity_matching", "error_detection_spelling"})

RESEED_STEP = 1234  # run_wrangler.py:44


@dataclass
class WranglerTask:
    task: str
    train: DataFrame
    test: DataFrame
    instruction: str | None = None
    k: int = 3  # demonstrations (run_wrangler.py:71)
    d: int = 100  # supervision rows (run_wrangler.py:72)
    num_trials: int = 1  # run_wrangler.py:80-85
    seed: int = 42


@dataclass
class WranglerResult:
    compiled: CompiledFunction
    predictions: DataFrame
    metrics: DataFrame
    trials_used: int


def _sample_demos(task: WranglerTask, seed: int) -> DataFrame:
    if task.task in STRATIFIED_TASKS:
        per_label = max(1, task.k // 2)
        return stratified_sample_seeded(task.train, "label_str", per_label, seed=seed)
    return sample_k_seeded(task.train, task.k, seed=seed)


def run_wrangling_task(task: WranglerTask, compiler: SemanticCompiler) -> WranglerResult:
    """G9/G10 — multi-trial synthesis with reseeding, best-function
    routing, distributed apply + metrics."""
    last_error: Exception | None = None
    candidates: list[CompiledFunction] = []
    for trial in range(task.num_trials):
        seed = task.seed + trial * RESEED_STEP
        demos = _sample_demos(task, seed)
        demo_rows = [
            (row["text"], row["label_str"])
            for row in demos.select("text", "label_str").collect()
        ]
        if not demo_rows:
            raise ValueError("train frame produced no demonstrations")
        supervision = sample_k_seeded(task.train, task.d, seed=seed + 1)
        try:
            candidates.append(
                compiler.compile(
                    task.task, demos, demo_rows,
                    supervision=supervision, instruction=task.instruction,
                )
            )
        except SynthesisFailed as exc:  # reseed and retry next trial
            last_error = exc
    if not candidates:
        raise last_error or SynthesisFailed(f"no trials succeeded for {task.task!r}")

    best = max(candidates, key=lambda c: c.accuracy)  # run_wrangler.py:210-213
    predictions = apply_function(task.test, best.source, task.task)
    metrics = confusion_metrics(predictions, "pred", "label_str")
    return WranglerResult(best, predictions, metrics, len(candidates))
