"""Host-side metrics: JSONL writer (+ optional TensorBoard if available).

TPU-native replacement for the reference's `tf.summary` scalars (SURVEY.md
§5): one JSON object per logging step; device→host transfers are batched per
call (pass already-gathered Python floats or a dict of arrays — they are
fetched once)."""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np


def _last_wall_s(path: str) -> float:
    """Largest wall_s already recorded in a JSONL metrics file (0.0 if none).
    max, not last: resumed processes may have appended out-of-order rows
    before this fix."""
    best = 0.0
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    best = max(best, float(json.loads(line).get("wall_s", 0.0)))
                except (json.JSONDecodeError, TypeError, ValueError):
                    continue
    except OSError:
        return 0.0
    return best


class MetricsWriter:
    def __init__(self, path: str, *, resume: bool = False):
        self.path = path
        self._t0 = time.time()
        if jax.process_index() == 0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            if resume and os.path.exists(path):
                # keep wall_s monotonic across restarts: continue from the
                # last recorded wall clock instead of restarting at 0
                self._t0 -= _last_wall_s(path)
            self._f = open(path, "a" if resume else "w", buffering=1)
        else:
            self._f = None

    def write(self, step: int, **metrics: Any) -> dict:
        record = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = jax.device_get(v)
            if isinstance(v, (np.ndarray, np.generic)):
                v = v.item() if np.ndim(v) == 0 else np.asarray(v).tolist()
            record[k] = v
        if self._f is not None:
            self._f.write(json.dumps(record) + "\n")
        return record

    def close(self):
        if self._f is not None:
            self._f.close()
