"""Structured JSONL metrics + stdout mirror.

Parity target: the reference's per-epoch print/append logging [SURVEY §5
"Metrics"], upgraded to structured JSONL (step, loss, acc, edges/s/chip,
wall-clock) per the build spec.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, mirror_stdout: bool = True):
        self.path = path
        self.mirror = mirror_stdout
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, **kv) -> dict:
        kv.setdefault("wall_s", round(time.time() - self._t0, 3))
        line = json.dumps(kv, default=float)
        if self._fh:
            self._fh.write(line + "\n")
        if self.mirror:
            print(line, file=sys.stdout, flush=True)
        return kv

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
