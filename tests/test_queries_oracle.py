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
