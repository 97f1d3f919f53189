"""Minimal observation/action space types (gym is not a dependency).

API-compatible with the subset of gym.spaces the reference relies on
(shape, low, high, sample) — reference engine.py:296-300,386-418.
"""

from __future__ import annotations

import numpy as np


class Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            low = np.asarray(low, dtype=dtype)
            high = np.asarray(high, dtype=dtype)
            shape = low.shape
        else:
            low = np.broadcast_to(np.asarray(low, dtype=dtype), shape).copy()
            high = np.broadcast_to(np.asarray(high, dtype=dtype), shape).copy()
        self.low, self.high, self.shape, self.dtype = low, high, tuple(shape), dtype

    def sample(self, rng=None):
        rng = rng or np.random
        lo = np.where(np.isfinite(self.low), self.low, -1.0)
        hi = np.where(np.isfinite(self.high), self.high, 1.0)
        return rng.uniform(lo, hi).astype(self.dtype)

    def __repr__(self):
        return f"Box{self.shape}"
