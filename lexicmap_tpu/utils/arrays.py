"""Small shared array utilities."""

from __future__ import annotations

import numpy as np


def ranges_to_indices(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Concatenate ranges [lo_i, hi_i) into one flat index array."""
    counts = (np.asarray(hi) - np.asarray(lo)).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out_off = np.zeros(counts.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    idx = np.arange(total, dtype=np.int64)
    seg = np.searchsorted(out_off[1:], idx, side="right")
    return np.asarray(lo)[seg].astype(np.int64) + (idx - out_off[seg])
