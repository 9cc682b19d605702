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

The round-6 blind spot (checkpointed subtrees appearing as ``Scan
ExistingRDD``) is closed: ``DataFrame.localCheckpoint`` is
monkeypatched to a no-op for the audit build, so the executed-plan
string contains every pre-checkpoint subtree — iterative loops,
argmax join-backs, histogram elections included
(test_audit_sees_through_checkpoints proves the see-through on the
BPE trainer). The no-op changes nothing the audit grades (it asserts
node absence, never values), and the production checkpoint behavior
itself is pinned by the family tests (test_graph lineage truncation,
test_textquality BPE round pin, test_tpch_partsupp, test_clustering,
test_corpusops).
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
def test_no_cartesian_no_rowwise_python(spark, name, monkeypatch):
    # keep lineage intact so checkpointed subtrees stay visible in the
    # plan string instead of collapsing to `Scan ExistingRDD`. Patch
    # the CLASSIC DataFrame subclass — it defines its own
    # localCheckpoint, so patching the pyspark.sql.DataFrame parent
    # never intercepts the call (the r6 blind spot would have silently
    # stayed open; test_audit_sees_through_checkpoints guards this).
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} runs a row-at-a-time Python UDF"
    # `Scan ExistingRDD` may still appear — but only from driver-local
    # createDataFrame frames (seed centroids, per-partition offsets:
    # bounded scalars, reviewed at their 8 collect() sites), never from
    # a checkpoint hiding a subtree (the monkeypatch above ensures that)


def test_audit_sees_through_checkpoints(spark, monkeypatch):
    """The monkeypatched build must expose PRE-checkpoint subtrees:
    the BPE trainer's executed plan — 8 rounds of pair-count
    aggregations, winner elections, and merge replaces, each round
    checkpointed in production — has to show its joins/aggregates to
    the audit instead of one opaque `Scan ExistingRDD` leaf."""
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(DataFrame, "localCheckpoint", lambda self, eager=True: self)
    from efficient_llm_data_wrangling_spark.queries.textquality import (
        bpe_train_rounds,
    )

    df = bpe_train_rounds(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # with checkpoints active the round subtrees collapse to
    # ExistingRDD leaves and no aggregate survives in the plan string
    assert "Scan ExistingRDD" not in plan
    assert plan.count("HashAggregate") >= 8  # >= one pair-count agg per round
