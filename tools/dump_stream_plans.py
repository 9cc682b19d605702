#!/usr/bin/env python
"""Dump the formatted plan of every frame a query localCheckpoints,
labeled by call site — the batch-side materialization points are where
the r12 project-before-checkpoint trims live (the returned streaming
frame shows only LogicalRDD leaves, so the evidence is the CHECKPOINT
INPUT plans). Usage: python tools/dump_stream_plans.py OUT_PREFIX query...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - Spark 3
    from pyspark.sql import DataFrame

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from efficient_llm_data_wrangling_spark.session import get_spark


def main() -> int:
    prefix = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark(app_name="plans")
    orig = DataFrame.localCheckpoint
    plans: list[str] = []

    def capture(self, eager=True):
        import traceback

        caller = "?"
        for fr in reversed(traceback.extract_stack(limit=8)[:-1]):
            if "dump_stream_plans" not in fr.filename:
                caller = f"{Path(fr.filename).name}:{fr.lineno}"
                break
        txt = self._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        plans.append(f"=== localCheckpoint at {caller} ===\n{txt}")
        return orig(self, eager)

    DataFrame.localCheckpoint = capture
    try:
        for name in names:
            plans.clear()
            df = REGISTRY[name].builder(spark, "/root/testdata/sf0.1")
            final = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            out = Path(prefix) / f"{name}.txt"
            out.write_text(
                "\n".join(plans) + f"\n=== returned frame ===\n{final}"
            )
            print(f"{name}: {len(plans)} checkpoint plans -> {out}")
    finally:
        DataFrame.localCheckpoint = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
