from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Share one honest build of each registered query across the whole
# suite (plan audit + oracle comparison + reconciliation tests each
# rebuilt the same frames; the graph ladder pays ~0.4 s of plan
# conversion per localCheckpoint and ann_frontier_report alone has 120
# of them). Values/plans are unchanged — every consumer re-executes the
# same checkpointed leaves. See registry._BUILD_MEMO.
os.environ.setdefault("ELLDW_TEST_BUILD_MEMO", "1")


def pytest_collection_modifyitems(session, config, items):
    """Run the registry-wide plan audit FIRST: its builds happen under
    the checkpoint interception (so every checkpoint stage of every
    query is graded — the build memo would otherwise hand it frames
    built earlier WITHOUT interception) and they seed the memo that
    every later file (oracle sweep, reconciliation tests) reuses.
    Stable sort — order within each group is unchanged."""
    items.sort(key=lambda it: 0 if "test_global_plan_audit" in it.nodeid else 1)


def fresh_build(fn, *args, **kwargs):
    """Bypass the test-session build memo: call the UNDECORATED query
    builder. Needed by (a) plan-shape tests — an already-executed
    memoized frame prints its FINAL AQE plan (isFinalPlan=true,
    ResultQueryStage wrappers) instead of the initial one the shape
    assertions read — and (b) tests that monkeypatch an internal and
    must observe a rebuild."""
    import inspect

    return inspect.unwrap(fn)(*args, **kwargs)

# Hypothesis raises/restores the recursion limit around each example;
# with py4j's callback threads alive it cannot restore it ("changed
# from another thread") and a later assertion-rewrite compile() of a
# large test module dies with "AST constructor recursion depth
# mismatch" (SystemError), taking neighboring tests down as spurious
# RecursionErrors — observed twice in full-suite runs. A generous
# floor set before any test makes both modes unreachable.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

from efficient_llm_data_wrangling_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[8]")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from efficient_llm_data_wrangling_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
