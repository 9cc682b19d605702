"""Persistent function cache (SURVEY §4 X2 extended).

The reference keeps a per-episode candidate stack
(function_generator.py:217-223) and dumps learned functions to JSON at
the end (run_wrangler.py:270-271). Here synthesis results are memoized
across runs, keyed by (task, instruction, demonstrations-hash) — same
intent ⇒ zero LLM calls on re-run.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from collections.abc import Sequence


def intent_key(task: str, instruction: str | None, examples: Sequence[tuple[str, str]]) -> str:
    payload = json.dumps([task, instruction or "", list(map(list, examples))], sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


class FunctionCache:
    """Tiny JSON-file-backed cache; in-memory when path is None."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._mem: dict[str, dict] = {}
        # concurrent trials (wrangler.run_wrangling_task max_workers>1)
        # may put() simultaneously; the lock serializes the snapshot
        # write so two threads never race on the same .tmp file
        self._lock = threading.Lock()
        if path and os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                self._mem = json.load(fh)

    def get(self, key: str) -> dict | None:
        return self._mem.get(key)

    def put(self, key: str, source: str, accuracy: float) -> None:
        with self._lock:
            self._mem[key] = {"source": source, "accuracy": accuracy}
            if self.path:
                tmp = f"{self.path}.tmp"
                with open(tmp, "w", encoding="utf-8") as fh:
                    json.dump(self._mem, fh, indent=2)
                os.replace(tmp, self.path)
