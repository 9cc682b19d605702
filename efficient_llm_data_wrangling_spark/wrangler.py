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


def _run_trial(
    task: WranglerTask, compiler: SemanticCompiler, trial: int
) -> CompiledFunction:
    """ONE synthesis trial at its scheduled seed (task.seed +
    trial×{RESEED_STEP}) — the body of the reference's num_trials loop
    (run_wrangler.py:16-56), extracted so trials can run serially or
    concurrently with an identical seed schedule."""
    seed = task.seed + trial * RESEED_STEP
    demos = _sample_demos(task, seed)
    demo_rows = [
        (row["text"], row["label_str"])
        for row in demos.select("text", "label_str").collect()
    ]
    if not demo_rows:
        raise ValueError("train frame produced no demonstrations")
    supervision = sample_k_seeded(task.train, task.d, seed=seed + 1)
    return compiler.compile(
        task.task, demos, demo_rows,
        supervision=supervision, instruction=task.instruction,
    )


def run_wrangling_task(
    task: WranglerTask,
    compiler: SemanticCompiler,
    max_workers: int = 1,
) -> WranglerResult:
    """G9/G10 — multi-trial synthesis with reseeding, best-function
    routing, distributed apply + metrics.

    ``max_workers`` > 1 fans the trials out as concurrent driver
    threads (the reference runs them serially, run_wrangler.py:16-56,
    but they are INDEPENDENT LLM calls — the X1 economics — and each
    trial's Spark validation jobs schedule concurrently under FAIR-ish
    local execution). The seed schedule is preserved exactly (trial i
    always runs at task.seed + i×{RESEED_STEP}) and best-function
    routing is keyed by (accuracy, lowest trial index) — a pure
    function of the trial RESULTS, so serial and concurrent execution
    select the identical function whenever the client is one whose
    response depends only on the request (the live client at
    temperature 0.2/seed 42, a single-response stub, or any replay
    keyed on the prompt). A multi-response ``OfflineStubClient``
    script is consumed in GLOBAL call order by design (it exists to
    model trial-varying responses in serial tests) — drive it with
    ``max_workers=1``."""
    n = task.num_trials
    results: list[CompiledFunction | None] = [None] * n
    errors: list[Exception | None] = [None] * n

    def _one(i: int) -> None:
        try:
            results[i] = _run_trial(task, compiler, i)
        except SynthesisFailed as exc:  # reseed and retry next trial
            errors[i] = exc

    workers = max(1, min(n, max_workers))
    if workers == 1:
        for i in range(n):
            _one(i)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_one, range(n)))

    candidates = [(i, c) for i, c in enumerate(results) if c is not None]
    if not candidates:
        # preserve the serial loop's diagnostic: the LAST trial's
        # error surfaced to the caller (run_wrangler.py's loop would
        # have raised on its final iteration)
        last_error = next((e for e in reversed(errors) if e is not None), None)
        raise last_error or SynthesisFailed(f"no trials succeeded for {task.task!r}")

    # run_wrangler.py:210-213 — max accuracy, first trial wins ties
    # (identical to the serial loop's first-max semantics, and
    # independent of completion order)
    best = max(candidates, key=lambda pair: (pair[1].accuracy, -pair[0]))[1]
    predictions = apply_function(task.test, best.source, task.task)
    metrics = confusion_metrics(predictions, "pred", "label_str")
    return WranglerResult(best, predictions, metrics, len(candidates))
