"""Log / observability sink (SURVEY.md §2 S11).

Re-expresses the reference's run logger
(``fast_ai_wrangler/utils/utils.py:9-18``, ``setup_logger``: create the
log directory, attach a ``log.txt`` file handler with a
module/level/message format) and extends it with the piece that
matters on a cluster: pipeline metrics captured via ``df.observe``
(:func:`..operators.quality.observed`) are appended to the log as
structured JSON lines by the SAME action that consumes the DataFrame —
no second scan, no driver-side collect of data rows. At 100 TB an
extra validation pass is a second 100 TB read; the observe path is
free, and the log sink only ever sees a handful of scalar metrics per
stage.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

from pyspark.sql import Column, DataFrame

from efficient_llm_data_wrangling_spark.operators.quality import observed

_FORMAT = "%(asctime)s [%(module)s] [%(levelname)s] %(message)s"


def setup_logger(log_dir: str, name: str = "elldw") -> logging.Logger:
    """Create ``log_dir`` (parents included) and return a logger with a
    ``log.txt`` file handler — the reference's contract, minus its rich
    console handler (a cluster driver logs to files/stdout collectors,
    not a TTY). Idempotent: re-running in one process never stacks a
    duplicate handler onto the same file."""
    path = Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    log_path = str(path / "log.txt")
    logger = logging.getLogger(f"{name}.{log_path}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not any(
        isinstance(h, logging.FileHandler) and h.baseFilename == log_path
        for h in logger.handlers
    ):
        handler = logging.FileHandler(log_path)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    return logger


def log_metrics(logger: logging.Logger, stage: str, metrics: dict[str, Any]) -> str:
    """Append one structured JSON line ``{"stage": ..., **metrics}``.
    Returns the serialized line (for tests / re-emission)."""
    line = json.dumps({"stage": stage, **metrics}, default=str, sort_keys=True)
    logger.info(line)
    return line


def observed_with_log(
    df: DataFrame, logger: logging.Logger, stage: str, metrics: dict[str, Column]
):
    """Wrap :func:`observed` with the log sink: returns ``(df, flush)``
    where ``flush()`` — called after the action that consumed ``df`` —
    writes the observation's metrics as one JSON log line and returns
    them. The metrics ride along with the consuming action (observe),
    so the sink costs zero extra scans."""
    out, obs = observed(df, stage, metrics)

    def flush() -> dict[str, Any]:
        got = dict(obs.get)
        log_metrics(logger, stage, got)
        return got

    return out, flush
