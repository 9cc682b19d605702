#!/usr/bin/env python
"""Registry-wide repeated-fact-scan audit.

For every non-streaming registered query, build the plan at sf0.001
and report which FACT tables (lineitem, orders, events, documents,
embeddings) appear in more than one parquet scan.

How to read the output — a repeated scan is NOT automatically a bug:

* **Self-joins and union branches** (asof/range/pair joins, funnels,
  simhash pigeonhole segments, LSH band branches) re-read the fact by
  construction; each branch carries its own pushdown and the re-scan
  parallelizes perfectly. At 100 TB, re-scanning pruned columnar data
  is usually CHEAPER than materializing an intermediate you cannot
  cache.
* **The real anti-pattern** is a SMALL DERIVED AGGREGATE evaluated
  twice because two consumers hang off the same lazy frame (argmax
  join-backs: the aggregate feeds both the value rows and the global
  max/total). Spark's ReusedExchange does NOT fire across these
  subtrees (verified empirically — 0 reuse in the executed plans), so
  the fix is a ``localCheckpoint`` of the aggregate, which is tiny
  compared to a second fact scan. Round 6 applied this to
  ``tpch_q11_important_stock`` (val), ``top_supplier_revenue``
  (srev), the pagerank/triangle edge distillations, the
  unigram/bigram/trigram/DSIR count models, the lang-ID confusion
  matrix, the IVF codebook fit, the funnel stage scalars, and the
  incremental-dedup hash index.

Usage: python tools/fact_scan_audit.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")
_SKIP_TAGS = {"streaming"}
_SKIP_NAMES = {"wrangler_e2e_transformation"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
    from efficient_llm_data_wrangling_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="fact_scan_audit")
    flagged = 0
    for name, spec in sorted(REGISTRY.items()):
        if _SKIP_TAGS & set(spec.tags) or name in _SKIP_NAMES:
            continue
        try:
            plan = (
                spec.builder(spark, args.sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            print(f"ERR   {name}: {str(e)[:100]}")
            continue
        counts = {t: plan.count(f"/{t}.parquet") for t in FACTS}
        multi = {t: c for t, c in counts.items() if c > 1}
        if multi:
            flagged += 1
            print(f"MULTI {name}: {multi}")
    print(f"\n{flagged} queries scan a fact table more than once")


if __name__ == "__main__":
    main()
