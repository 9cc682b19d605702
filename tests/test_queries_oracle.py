"""Every registered query runs and hash-matches its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import compare  # noqa: E402

from efficient_llm_data_wrangling_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: must run
        return
    odf = duck.execute(spec.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_driver_grade_window_is_exactly_full():
    """The driver grades the first 50 queries() entries. The pinned
    priority list must (a) name only real queries — _ordered_names
    raises otherwise — and (b) hold exactly 50 names, so no graded
    slot is wasted and no pinned query silently falls outside the
    window (the r3 post-pin-additions failure mode)."""
    from efficient_llm_data_wrangling_spark.registry import (
        DRIVER_GRADE_PRIORITY,
        _ordered_names,
    )

    names = _ordered_names()
    assert len(DRIVER_GRADE_PRIORITY) == 50
    assert len(set(DRIVER_GRADE_PRIORITY)) == 50
    assert names[:50] == list(DRIVER_GRADE_PRIORITY)
