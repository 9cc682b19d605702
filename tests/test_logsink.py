"""S11 log sink: reference setup_logger contract + zero-scan metric
logging through df.observe."""

from __future__ import annotations

import json
import logging

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.sources.catalog import load_table
from efficient_llm_data_wrangling_spark.sources.logsink import (
    log_metrics,
    observed_with_log,
    setup_logger,
)

from conftest import SF_SMOKE


def test_setup_logger_creates_dir_and_file(tmp_path):
    log_dir = tmp_path / "runs" / "r1"
    logger = setup_logger(str(log_dir))
    assert log_dir.is_dir()
    log_metrics(logger, "smoke", {"rows": 3})
    text = (log_dir / "log.txt").read_text()
    assert '"rows": 3' in text and "[INFO]" in text


def test_setup_logger_idempotent_handlers(tmp_path):
    a = setup_logger(str(tmp_path))
    b = setup_logger(str(tmp_path))
    assert a is b
    file_handlers = [h for h in a.handlers if isinstance(h, logging.FileHandler)]
    assert len(file_handlers) == 1
    log_metrics(a, "once", {"k": 1})
    lines = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert len(lines) == 1  # one handler -> one line, not two


def test_observed_with_log_rides_the_consuming_action(tmp_path, spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    logger = setup_logger(str(tmp_path))
    df, flush = observed_with_log(
        orders,
        logger,
        "orders_scan",
        {
            "n_rows": F.count(F.lit(1)),
            "null_keys": F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
        },
    )
    n = df.count()  # the observe metrics are computed BY this action
    got = flush()
    assert got["n_rows"] == n and got["null_keys"] == 0
    payload = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1].split("] ", 2)[-1])
    assert payload == {"stage": "orders_scan", "n_rows": n, "null_keys": 0}
