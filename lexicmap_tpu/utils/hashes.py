"""Integer hash functions shared across the framework.

wang_hash64 is Thomas Wang's 64-bit integer hash — the reference's
`util.Hash64` (ref: lexicmap/cmd/util/util.go:27-37).  It is used for

- FracMinHash k-mer sampling in genome search
  (ref: lib-index-search-genome3.go:154,208,288; lib-genome_compare.go:186);
- lexichash mask-suffix generation (the 24-base random suffixes are
  wang_hash64 of consecutive Go math/rand Uint64 draws; reconstructed
  against the 21-mask oracle in the reference docs, see
  scripts/lexichash_mask_variants.py).
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def wang_hash64(x: np.ndarray) -> np.ndarray:
    """Vectorized Thomas Wang 64-bit hash (ref: util/util.go:27-37)."""
    key = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        key = (~key) + (key << _U(21))
        key = key ^ (key >> _U(24))
        key = key + (key << _U(3)) + (key << _U(8))
        key = key ^ (key >> _U(14))
        key = key + (key << _U(2)) + (key << _U(4))
        key = key ^ (key >> _U(28))
        key = key + (key << _U(31))
    return key


_M64 = (1 << 64) - 1


def wang_hash64_int(key: int) -> int:
    """Scalar Python-int version (no numpy overflow warnings)."""
    key = ((~key & _M64) + ((key << 21) & _M64)) & _M64
    key ^= key >> 24
    key = (key + ((key << 3) & _M64) + ((key << 8) & _M64)) & _M64
    key ^= key >> 14
    key = (key + ((key << 2) & _M64) + ((key << 4) & _M64)) & _M64
    key ^= key >> 28
    key = (key + ((key << 31) & _M64)) & _M64
    return key
