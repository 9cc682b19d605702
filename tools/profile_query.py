#!/usr/bin/env python
"""Per-query cost breakdown: build-phase (plan construction + eager
localCheckpoint actions) vs final noop action, with per-checkpoint
timings. The measurement tool behind OPTIMIZATION_r12.md — guide §1
("measure first"): before touching an operator, know whether its bill
is checkpoint job launches, plan compile, or the final action's data
work.

Usage: python tools/profile_query.py [--sf-dir DIR] [--n N] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # Spark 4: concrete instances are the classic DataFrame
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - Spark 3
    from pyspark.sql import DataFrame

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from efficient_llm_data_wrangling_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3, help="timed repeats after warmup")
    ap.add_argument(
        "--lazy",
        action="store_true",
        help="force every localCheckpoint to eager=False (experiment)",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    _ensure_loaded()
    spark = get_spark(app_name="profile")

    ckpt_log: list[tuple[float, str]] = []
    orig_ckpt = DataFrame.localCheckpoint

    def timed_ckpt(self, eager=True):
        import traceback

        caller = "?"
        for fr in reversed(traceback.extract_stack(limit=8)[:-1]):
            if "profile_query" not in fr.filename:
                caller = f"{Path(fr.filename).name}:{fr.lineno}"
                break
        t0 = time.time()
        out = orig_ckpt(self, False if args.lazy else eager)
        ckpt_log.append((time.time() - t0, caller))
        return out

    DataFrame.localCheckpoint = timed_ckpt
    try:
        for name in args.queries:
            spec = REGISTRY[name]
            # warmup at sf0.001 (codegen/JIT), mirroring bench.py
            try:
                spec.builder(spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: warmup failed: {exc}")
            for rep in range(args.n):
                ckpt_log.clear()
                t0 = time.time()
                df = spec.builder(spark, args.sf_dir)
                t_build = time.time() - t0
                t1 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t_action = time.time() - t1
                n_ck = len(ckpt_log)
                t_ck = sum(t for t, _ in ckpt_log)
                print(
                    f"{name} rep{rep}: total={t_build + t_action:7.3f}s "
                    f"build={t_build:7.3f}s (ckpt {n_ck}x {t_ck:6.3f}s, "
                    f"other {t_build - t_ck:6.3f}s) action={t_action:7.3f}s"
                )
                if ckpt_log:
                    tops = ", ".join(
                        f"{c}={t:.3f}"
                        for t, c in sorted(ckpt_log, reverse=True)[:8]
                    )
                    print(f"    top ckpts: {tops}")
            # release per-query scratch state like bench.py does
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.startswith("__"):
                    spark.catalog.dropTempView(t.name)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    finally:
        DataFrame.localCheckpoint = orig_ckpt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
