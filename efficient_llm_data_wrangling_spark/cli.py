"""CLI twin of the reference's ``run_wrangler.py`` (run_wrangler.py:
61-112 argparse surface → :func:`wrangler.run_wrangling_task`).

Same flags, same per-task lifecycle, same metrics report — but every
data-touching step is the distributed engine: splits load through the
``sources.readers`` Spark readers, the synthesized function applies as
a compile-once pandas UDF, and metrics come from the one-pass
``confusion_metrics`` aggregate. The driver contract for graded
correctness stays ``__spark_entry__``; this entry point exists so a
reference user's shell invocation ports verbatim::

    python -m efficient_llm_data_wrangling_spark.cli \
        --data_dir data/datasets/data_transformation/benchmark-x \
        --num_trials 3 --k 3

Task dispatch mirrors ``utils/contants.py:11-30`` (DATA2TASK) by path
segment rather than absolute-path lookup, so any directory that follows
the benchmark layout works without env configuration. The LLM client is
the same env-gated live path as everywhere else (``ELLDW_LLM_MODEL``;
plans/client.py) with ``--offline-golden`` substituting the recorded
golden functions so the CLI runs hermetically.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: utils/contants.py:33-36 — the reference's impute-target map, keyed
#: by dataset directory NAME (its absolute-path keys end in these).
IMPUTE_COLS = {"Buy": "manufacturer", "Restaurant": "city"}

#: promptsTemplate ERROR_DETECTION_SPELLING_INSTR shape
#: (data_utils.py:174-175): per-column instruction.
_ED_INSTR = "Detect spelling errors in the {column_name} column."


def task_for_dir(data_dir: str) -> str:
    """DATA2TASK by path segment (utils/contants.py:11-30): the
    reference keys absolute paths under ``$DATASET_PATH``; the segment
    carries the same information portably."""
    parts = set(Path(data_dir).parts)
    if "entity_matching" in parts:
        return "entity_matching"
    if "data_imputation" in parts:
        return "data_imputation"
    if "error_detection" in parts:
        return "error_detection_spelling"
    if "data_transformation" in parts:
        return "data_transformation"
    raise ValueError(
        f"{data_dir} does not contain a recognized task segment "
        "(entity_matching / data_imputation / error_detection / "
        "data_transformation) — see utils/contants.py:11-30"
    )


def _load_tasks(
    spark: SparkSession, data_dir: str, task: str, args: argparse.Namespace
) -> list[tuple[DataFrame, DataFrame, str | None]]:
    """(train, test, instruction) triples — read_raw_data_simple
    (data_utils.py:249-316) re-expressed over the Spark readers. EM and
    imputation are single-task; error detection yields one task per
    column file, transformation one per benchmark file."""
    from efficient_llm_data_wrangling_spark.sources import readers as R

    d = Path(data_dir)
    if task == "entity_matching":
        table_a = spark.read.option("header", True).csv(str(d / "tableA.csv"))
        table_b = spark.read.option("header", True).csv(str(d / "tableB.csv"))
        train = R.read_blocked_pairs(
            spark, str(d / "train.csv"), table_a, table_b,
            sep_tok=args.sep_tok, nan_tok=args.nan_tok,
        )
        test = R.read_blocked_pairs(
            spark, str(d / "test.csv"), table_a, table_b,
            sep_tok=args.sep_tok, nan_tok=args.nan_tok,
        )
        return [(train, test, R.read_instruction(data_dir))]

    if task == "data_imputation":
        impute_col = args.impute_col or IMPUTE_COLS.get(d.name)
        if not impute_col:
            raise ValueError(
                f"unknown imputation dataset {d.name!r}: pass --impute_col "
                "(the reference hardcodes Buy→manufacturer, "
                "Restaurant→city at utils/contants.py:33-36)"
            )
        # faithful quirk: the reference trains imputation on the VALID
        # split (data_utils.py:281 passes valid_file as train)
        train_split = d / "valid.csv" if (d / "valid.csv").exists() else d / "train.csv"
        train = R.read_imputation_split(
            spark, str(train_split), impute_col,
            sep_tok=args.sep_tok, nan_tok=args.nan_tok,
        )
        test = R.read_imputation_split(
            spark, str(d / "test.csv"), impute_col,
            sep_tok=args.sep_tok, nan_tok=args.nan_tok,
        )
        return [(train, test, R.read_instruction(data_dir))]

    if task == "error_detection_spelling":
        # one task per column CSV; text = the named column, label from
        # is_clean {1:'no', 0:'yes'} (data_utils.py:146-176)
        tasks = []
        train_dir, test_dir = d / "train_splits_single", d / "test_splits_single"
        for fname in sorted(os.listdir(train_dir)):
            if not fname.endswith(".csv"):
                continue
            column = fname.split("_")[2].split(".csv")[0]

            def _one(path: Path) -> DataFrame:
                df = spark.read.option("header", True).csv(str(path))
                df = df.toDF(*[c.lower() for c in df.columns])
                return df.select(
                    F.col(column).alias("text"),
                    F.when(F.col("is_clean") == 1, "no").otherwise("yes").alias("label_str"),
                )

            tasks.append(
                (_one(train_dir / fname), _one(test_dir / fname),
                 _ED_INSTR.format(column_name=column))
            )
        return tasks

    # data_transformation: first k rows train, rest test
    # (data_utils.py:200-240). P11's keyed head-k substitutes for list
    # position (positional order is not a distributed concept — the
    # same documented substitution split_rest_customers makes).
    from efficient_llm_data_wrangling_spark.operators.sampling import split_head_rest

    tasks = []
    for fname in sorted(os.listdir(data_dir)):
        path = d / fname
        if not path.is_file():
            continue
        df, instruction = R.read_transformation_file(spark, str(path))
        train, test = split_head_rest(df, args.k, key="text")
        tasks.append((train, test, instruction))
    return tasks


def build_parser() -> argparse.ArgumentParser:
    """run_wrangler.py:61-112, flag for flag."""
    p = argparse.ArgumentParser(description="Run wrangler")
    p.add_argument("--data_dir", type=str, required=True, help="Which data directory to run.")
    p.add_argument("--output_dir", type=str, default="outputs", help="Output directory.")
    p.add_argument("--k", type=int, default=3, help="Number examples in prompt")
    p.add_argument("--d", type=int, default=100, help="Number examples for training a classifier")
    p.add_argument("--num_iter", type=int, default=1, help="Number of iterations to sample from training data")
    p.add_argument("--num_run", type=int, default=-1, help="Number examples to run through model.")
    p.add_argument("--num_trials", type=int, default=1, help="Number trials to run. Results will be averaged with variance reported.")
    p.add_argument("--sample_method", type=str, default="random", choices=["random", "manual", "validation_clusters"], help="Example generation method")
    p.add_argument("--class_balanced", action="store_true", help="Class balance training data.")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--sep_tok", type=str, default="^", help="Separator for attr: val pairs in row.")
    p.add_argument("--nan_tok", type=str, default="nan", help="Token to represent nan entries.")
    # engine-side extensions (not in the reference surface)
    p.add_argument("--impute_col", type=str, default=None, help="Imputation target column (required for non-benchmark imputation dirs).")
    p.add_argument("--offline-golden", action="store_true", help="Use the recorded golden functions instead of a live LLM (hermetic run).")
    p.add_argument("--trial_workers", type=int, default=0, help="Concurrent synthesis trials (0 = auto: min(num_trials, 8) for --offline-golden, 1 — the reference's serial loop — for live clients, which may rate-limit and whose selection guarantee assumes request-pure responses; pass >1 explicitly to fan out live calls). Trials are independent LLM calls with a fixed seed schedule, so fan-out changes wall-time only.")
    p.add_argument("--master", type=str, default="local[*]", help="Spark master.")
    return p


def main(argv: list[str] | None = None) -> dict:
    from efficient_llm_data_wrangling_spark.operators.sampling import (
        class_balance_seeded,
    )
    from efficient_llm_data_wrangling_spark.plans.client import (
        OfflineStubClient,
        client_from_env,
    )
    from efficient_llm_data_wrangling_spark.plans.compiler import SemanticCompiler
    from efficient_llm_data_wrangling_spark.plans import golden
    from efficient_llm_data_wrangling_spark.session import get_spark
    from efficient_llm_data_wrangling_spark.sources.readers import write_json_metrics
    from efficient_llm_data_wrangling_spark.wrangler import (
        WranglerTask,
        run_wrangling_task,
    )

    args = build_parser().parse_args(argv)
    task = task_for_dir(args.data_dir)
    spark = get_spark(app_name="wrangler-cli", master=args.master)

    if args.offline_golden:
        client = OfflineStubClient([golden.GOLDEN_BY_TASK[task]])
    else:
        client = client_from_env()
        if client is None:
            raise SystemExit(
                "no live LLM configured (set ELLDW_LLM_MODEL, see "
                "plans/client.py) — or pass --offline-golden"
            )

    triples = _load_tasks(spark, args.data_dir, task, args)
    report: dict = {"task": task, "data_dir": args.data_dir, "tasks": []}
    sums = {"prec": 0.0, "rec": 0.0, "acc": 0.0, "f1": 0.0}
    for i, (train, test, instruction) in enumerate(triples, start=1):
        if args.class_balanced and task != "data_imputation":  # data_utils.py:337 gate
            train = class_balance_seeded(train, "label_str", seed=args.seed)
        if args.num_run != -1:
            test = test.limit(args.num_run)
        compiler = SemanticCompiler(client=client)
        # auto fan-out only for the hermetic stub: live endpoints may
        # rate-limit, and the "identical function selected" guarantee
        # (wrangler.py docstring) conditions on request-pure clients —
        # live concurrency is opt-in via an explicit --trial_workers>1
        workers = (
            args.trial_workers
            if args.trial_workers > 0
            else (min(args.num_trials, 8) if args.offline_golden else 1)
        )
        result = run_wrangling_task(
            WranglerTask(
                task=task, train=train, test=test, instruction=instruction,
                k=args.k, d=args.d, num_trials=args.num_trials, seed=args.seed,
            ),
            compiler,
            max_workers=workers,
        )
        row = result.metrics.collect()[0].asDict()
        row["task_number"] = i
        row["trials_used"] = result.trials_used
        report["tasks"].append(row)
        for m in sums:
            sums[m] += float(row.get(m) or 0.0)
        print(
            f"Task {i}: Prec: {row.get('prec'):.3f} Recall: {row.get('rec'):.3f} "
            f"Acc: {row.get('acc'):.3f} F1: {row.get('f1'):.3f}"
        )
    n = max(1, len(report["tasks"]))
    report["mean"] = {m: round(v / n, 6) for m, v in sums.items()}
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    write_json_metrics([report], str(out / "metrics.json"))
    print(json.dumps(report["mean"]))
    return report


if __name__ == "__main__":
    main()
