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
    """JSONL + stderr scalars; optional TensorBoard events (+ image
    summaries with drawn boxes, mirroring the reference's tf.summary usage).

    TensorBoard support uses TF's host-side summary writer and is enabled by
    passing ``tensorboard_dir``; it degrades to a no-op if TF is missing.
    """

    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 echo_every: int = 50,
                 tensorboard_dir: Optional[str] = None):
        self._file: Optional[TextIO] = open(path, "a") if path else None
        self._echo = echo
        self._echo_every = max(echo_every, 1)
        self._t0 = time.monotonic()
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf
                tf.config.set_visible_devices([], "GPU")
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception as e:  # pragma: no cover - env without TF
                print(f"tensorboard disabled: {e}", file=sys.stderr)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step,
               "wall_time_s": round(time.monotonic() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in rec.items():
                    if isinstance(v, float) and k != "step":
                        tf.summary.scalar(k, v, step=step)
        if self._echo and step % self._echo_every == 0:
            parts = " ".join(f"{k}={rec[k]:.4g}" if isinstance(rec[k], float)
                             else f"{k}={rec[k]}" for k in sorted(rec))
            print(f"[step {step}] {parts}", file=sys.stderr)

    def log_image(self, step: int, tag: str, image) -> None:
        """Write one HWC uint8/float image summary (no-op without TB)."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        with self._tb.as_default():
            tf.summary.image(tag, img[None], step=step)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()
