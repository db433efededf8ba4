"""Structured per-step/per-epoch metric logging.

The reference only prints loss aggregates to stdout (reference:
src/train_encoders_bert.py:102-119). Here every entry point also appends
structured JSONL records so runs are diffable and benchmarkable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        if self._fh is not None:
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()
        if self.echo:
            shown = {k: (round(v, 6) if isinstance(v, float) else v)
                     for k, v in record.items() if k != "ts"}
            print(" | ".join(f"{k} {v}" for k, v in shown.items()))

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
