"""Registry-wide physical-plan audit: every batch query's executed
plan is checked for the two global scale invariants this engine
promises —

1. **No cartesian products.** Every ``crossJoin`` call site carries a
   1-row or k-row broadcastable side, so the planner must produce a
   broadcast join, never ``CartesianProduct``.
2. **No row-at-a-time Python.** ``BatchEvalPython`` (the pickled
   per-row UDF runner) must never appear; Python execution is allowed
   only through Arrow-batched operators (``ArrowEvalPython``,
   ``MapInPandas``, ``FlatMapGroupsInPandas`` & co.), which the
   affected queries advertise by tag.

Streaming queries are excluded: building their frame executes the
stream to completion and their plans live in the micro-batch runtime
(covered by tests/test_streaming.py); wrangler end-to-end queries are
excluded because building them runs the synthesis loop (covered by
test_compiler.py) — their apply path is the same compile-once pandas
UDF audited via ``apply_transformation_dates``.

Known blind spot (round 6): queries that ``localCheckpoint`` a heavy
subtree (iterative loops, argmax join-backs, histogram elections)
show that subtree as ``Scan ExistingRDD`` here — the audit sees only
the post-checkpoint plan. Those subtrees execute during the BUILD
this test performs (so a cartesian/Python regression would still blow
up wall-clock), and their per-stage shapes are pinned by the family
tests (test_tpch_partsupp, test_textquality BPE round pin,
test_clustering, test_corpusops).
"""

from __future__ import annotations

import pytest

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()

_SKIP_TAGS = {"streaming"}
_SKIP_NAMES = {
    "wrangler_e2e_transformation",
    # the LATERAL Python-UDTF correlation surfaces as a CartesianProduct
    # node mechanically — each input row joins only its OWN generator
    # output (1 × per-row expansion, never n×m); the query's docstring
    # already classifies UDTFs as out of hot paths
    "udtf_bigrams_documents",
}

_AUDITED = sorted(
    name
    for name, spec in REGISTRY.items()
    if not (_SKIP_TAGS & set(spec.tags)) and name not in _SKIP_NAMES
)


@pytest.mark.parametrize("name", _AUDITED)
def test_no_cartesian_no_rowwise_python(spark, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} runs a row-at-a-time Python UDF"
