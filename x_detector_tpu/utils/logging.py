"""Structured metrics logging: per-step JSONL + stdout.

Replaces tf.logging + tf.summary scalar streams (SURVEY.md §5 metrics/
observability) with a dependency-free JSONL writer; TensorBoard, if wanted,
can be pointed at the JSONL via external tooling.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional, TextIO


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 echo_every: int = 50):
        self._file: Optional[TextIO] = open(path, "a") if path else None
        self._echo = echo
        self._echo_every = max(echo_every, 1)
        self._t0 = time.monotonic()

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step,
               "wall_time_s": round(time.monotonic() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._echo and step % self._echo_every == 0:
            parts = " ".join(f"{k}={rec[k]:.4g}" if isinstance(rec[k], float)
                             else f"{k}={rec[k]}" for k in sorted(rec))
            print(f"[step {step}] {parts}", file=sys.stderr)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
