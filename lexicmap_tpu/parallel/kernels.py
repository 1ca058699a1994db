"""JAX device kernels for the hot search phases.

These are the TPU-native formulations of the reference's inner loops:

- seed matching: the reference's per-mask anchor-jump + varint scan
  (ref: cmd/kv/kv-searcher.go:330-611) becomes a fixed-shape vectorized
  binary search over a padded [masks, entries] k-mer matrix — one fused
  XLA kernel for ALL masks of a shard at once.
- chaining: the reference's per-genome goroutine DP (ref: lib-chaining2.go)
  becomes a banded scan: for each anchor, score = max over a fixed backward
  band of (score[j] + len - gap), computed with lax.scan over anchors and
  vectorized over the band dimension.

Static shapes everywhere; padding uses sentinel values (kmer=all-ones,
length 0 anchors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: these generic kernels are dtype-polymorphic.  The PRODUCTION paths
# (device_search / sharded / pseudo_device / wfa_device / build_device) use
# hi/lo uint32 splits exclusively — never enable jax_enable_x64 globally:
# it flips bool-sum result dtypes to int64, which the Mosaic TPU lowering
# of the Pallas kernels rejects, and creating jnp constants at import time
# would initialize the backend before ensure_jax can pick the platform.
PAD_KMER = np.uint64(0xFFFFFFFFFFFFFFFF)


def searchsorted_rows(sorted_rows: jnp.ndarray, queries: jnp.ndarray, side_left: bool):
    """Per-row binary search: sorted_rows [M, E], queries [M] -> [M] indices.

    Vectorized bisection over log2(E) steps (static trip count).
    """
    M, E = sorted_rows.shape
    lo = jnp.zeros((M,), dtype=jnp.int32)
    hi = jnp.full((M,), E, dtype=jnp.int32)
    steps = max(1, E.bit_length())

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(sorted_rows, mid[:, None], axis=1)[:, 0]
        if side_left:
            right = v < queries
        else:
            right = v <= queries
        active = lo < hi
        lo2 = jnp.where(active & right, mid + 1, lo)
        hi2 = jnp.where(active & ~right, mid, hi)
        return lo2, hi2

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def kmer_lcp_bases(a: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
    """LCP in bases of packed k-mers (device version of utils.kmers.kmer_lcp).

    Dtype-polymorphic: works on uint64 k-mers (2k bits) or uint32 k-mers
    (for k <= 16, packed right-aligned)."""
    x = jnp.bitwise_xor(a, b)
    nbits = jnp.iinfo(x.dtype).bits
    # bit length via float trick is unsafe; use clz via iterative smear + popcount
    y = x
    s = 1
    while s < nbits:
        y = y | (y >> x.dtype.type(s))
        s *= 2
    bitlen = jax.lax.population_count(y).astype(jnp.int32)
    return ((nbits - bitlen) >> 1) + (k - nbits // 2)
