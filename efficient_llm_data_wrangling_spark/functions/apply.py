"""Distributed application of synthesized functions (G4/G5/G6/G7,
fast_ai_wrangler/function_generator.py:119-192) — the engine's core
custom operator.

Reference semantics reproduced:

* task-specific entry names ``string_transformation`` /
  ``input_output_converter`` / ``detect_error``
  (function_generator.py:121-128);
* per-row exception → the literal sentinel ``"Not excutable"``
  [sic, reference typo] (function_generator.py:145-147);
* executability probe on the first row (G6, :163-168);
* the three-stage validation gate: runs, ≥51% on demonstrations,
  ≥10% on held-out supervision rows (G7, :171-192).

Execution model (the anti-pattern fixed, SURVEY §4): the reference
re-``exec``s the source for EVERY row in a serial Python loop. Here
the source string travels to executors inside the UDF closure
(broadcast by Spark), is compiled ONCE per Python worker (process-level
memo keyed by source hash), and is applied to Arrow-batched pandas
Series — ~10-100× less Python overhead, parallel across the cluster,
and the relational part of the plan stays whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from efficient_llm_data_wrangling_spark.functions.sandbox import compile_function, validate_source
from efficient_llm_data_wrangling_spark.operators.metrics import answers_match

#: function_generator.py:147 — the reference's (misspelled) sentinel.
NOT_EXECUTABLE = "Not excutable"

#: function_generator.py:121-128 — task → entry-point name.
TASK_ENTRY_POINTS: dict[str, str] = {
    "data_transformation": "string_transformation",
    "entity_matching": "input_output_converter",
    "data_imputation": "input_output_converter",
    "error_detection_spelling": "detect_error",
    # regex-synthesis variant (REGEX_GENERATOR, promptsTemplate.py:89-93
    # — dead code in the reference, live here for surface completeness)
    "regex_transformation": "string_transformation_regex",
}

#: Worker-process compile memo: (hash(source), entry) → callable.
_WORKER_CACHE: dict[tuple[int, str], Callable[[str], object]] = {}


def _compiled(source: str, entry_name: str) -> Callable[[str], object]:
    key = (hash(source), entry_name)
    fn = _WORKER_CACHE.get(key)
    if fn is None:
        fn = compile_function(source, entry_name)
        _WORKER_CACHE[key] = fn
    return fn


def make_udf(source: str, entry_name: str, error_sentinel: str | None = NOT_EXECUTABLE):
    """Build an Arrow-batched pandas UDF that applies the synthesized
    function string→string.

    ``error_sentinel=None`` maps failures to NULL instead of the
    reference's literal (useful for relational post-filtering).
    """
    validate_source(source)  # fail fast on the driver

    @pandas_udf("string")
    def apply_batch(texts: pd.Series) -> pd.Series:
        fn = _compiled(source, entry_name)  # once per worker, memoized

        def one(value):
            try:
                out = fn("" if value is None else str(value))
                # list outputs flatten like the reference comparator
                # expects (utils.py:89-90)
                if isinstance(out, (list, tuple)):
                    return " ".join(str(v) for v in out)
                return None if out is None else str(out)
            except Exception:  # noqa: BLE001 — G5 semantics (:145-147)
                return error_sentinel

        return texts.map(one)

    return apply_batch


def apply_function(
    df: DataFrame,
    source: str,
    task: str | None = None,
    entry_name: str | None = None,
    in_col: str = "text",
    out_col: str = "pred",
    error_sentinel: str | None = NOT_EXECUTABLE,
) -> DataFrame:
    """G5 — ``df + pred`` column from applying the synthesized function.

    Sandbox caveat: the static+runtime guards stop accidental
    file/network/import misuse, not a determined adversary; review
    sources from untrusted models before shipping them to a cluster.
    """
    if entry_name is None:
        if task is None or task not in TASK_ENTRY_POINTS:
            raise ValueError(f"unknown task {task!r}; pass entry_name explicitly")
        entry_name = TASK_ENTRY_POINTS[task]
    udf = make_udf(source, entry_name, error_sentinel)
    return df.withColumn(out_col, udf(F.col(in_col)))


def is_executable(df: DataFrame, source: str, task: str | None = None, entry_name: str | None = None, in_col: str = "text") -> tuple[bool, str]:
    """G6 — probe the function on one row (function_generator.py:163-168).

    Driver-side ``limit(1)`` so a broken function never reaches a
    cluster-wide job.
    """
    try:
        row = apply_function(df.limit(1), source, task, entry_name, in_col=in_col, error_sentinel=None).collect()
    except Exception as exc:  # noqa: BLE001
        return False, str(exc)
    if not row:
        return True, "no rows to probe"
    if row[0]["pred"] is None:
        return False, "function raised on the probe row"
    return True, "ok"


def accuracy_of(df: DataFrame, source: str, task: str | None = None, entry_name: str | None = None, in_col: str = "text", gold_col: str = "label_str") -> float:
    """G5's scoring half — comparator accuracy of the function on a
    labeled frame (function_generator.py:150-160)."""
    scored = apply_function(df, source, task, entry_name, in_col=in_col)
    row = scored.agg(
        F.avg(F.when(answers_match(F.col("pred"), F.col(gold_col)), 1.0).otherwise(0.0)).alias("acc")
    ).first()
    return float(row["acc"] if row["acc"] is not None else 0.0)


def validate_function(
    demos: DataFrame,
    supervision: DataFrame | None,
    source: str,
    task: str | None = None,
    entry_name: str | None = None,
    threshold: float = 0.51,
    threshold_sup: float = 10.0,
) -> tuple[str, float]:
    """G7 — the reference's three-gate validation
    (function_generator.py:171-192). Returns (verdict, demo_accuracy)
    where verdict ∈ {ok, not_executable, not_accurate, not_general}.

    Note ``threshold_sup`` is on the PERCENT scale (10.0 ⇒ 10%),
    faithfully to function_generator.py:187-191.
    """
    ok, _msg = is_executable(demos, source, task, entry_name)
    if not ok:
        return "not_executable", float("-inf")
    acc = accuracy_of(demos, source, task, entry_name)
    if acc < threshold:
        return "not_accurate", acc
    if supervision is not None:
        sup_acc = accuracy_of(supervision, source, task, entry_name)
        if sup_acc * 100.0 < threshold_sup:
            return "not_general", acc
    return "ok", acc
