"""Pallas TPU kernels.

The seed-matching kernel here uses the TPU-native data layout: packed k-mers
are split into (hi, lo) uint32 words — 64-bit integer emulation is avoided
entirely.  A >=p-prefix range query (p >= 15 bases <= 16 bases of the hi
word) reduces to a clamped range test on the hi word plus an LCP refinement
over both words, all elementwise VPU work over a [TM, E] tile:

    n_hits[m] = sum_e (lb[m] <= hi[m,e] <= rb[m])
    e0[m]     = sum_e (hi[m,e] < lb[m])
    best_lcp  = max_e LCP(query, entry) over in-range entries

This trades the host's O(log E) binary search for an O(E) scan that is fully
vectorized and fuses into one VMEM-resident pass — the right trade on the
VPU for the entry counts per mask seen in practice (<= a few thousand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; interpret mode used in tests
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

PAD_HI = np.uint32(0xFFFFFFFF)


def split_kmers_hi_lo(kmers: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Split packed k-mers (2k bits) into hi/lo uint32 words.

    hi = the first 16 bases (bits [2k-32, 2k)); lo = the remaining bases,
    left-aligned in 32 bits.
    """
    kk = kmers.astype(np.uint64)
    hi = (kk >> np.uint64(2 * k - 32)).astype(np.uint32)
    lo_bits = 2 * k - 32
    lo = ((kk & np.uint64((1 << lo_bits) - 1)) << np.uint64(32 - lo_bits)).astype(
        np.uint32
    )
    return hi, lo


def _seed_locate_kernel(qhi_ref, shi_ref, nh_ref, e0_ref, *, p):
    """Hi-word-only >=p-prefix range locate (p <= 16 bases live entirely in
    the hi word; rows are sorted by (hi, lo) so equal-hi entries cluster).
    LCP refinement happens host-side on the gathered entries, so neither the
    lo words nor an LCP output are needed — this halves HBM and h2d bytes."""
    qhi = qhi_ref[:]  # [TM, 1]
    shi = shi_ref[:]  # [TM, E]

    suf = jnp.uint32((1 << (32 - 2 * p)) - 1)
    lb = qhi & ~suf
    rb = qhi | suf

    has_query = qhi != PAD_HI
    in_range = (shi >= lb) & (shi <= rb) & has_query
    nh_ref[:] = jnp.sum(in_range.astype(jnp.int32), axis=1, keepdims=True)
    e0_ref[:] = jnp.sum(((shi < lb) & has_query).astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("p", "tile_m", "interpret"))
def seed_locate_pallas(
    seed_hi: jnp.ndarray,  # [M, E] uint32, rows sorted
    query_hi: jnp.ndarray,  # [M] uint32 (PAD_HI = no captured k-mer)
    p: int = 15,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Per-mask >=p-prefix entry ranges; returns (n_hits [M], e0 [M])."""
    M, E = seed_hi.shape
    assert M % tile_m == 0, (M, tile_m)
    grid = (M // tile_m,)
    kernel = functools.partial(_seed_locate_kernel, p=p)
    nh, e0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_m, E), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
        ],
        interpret=interpret,
    )(query_hi[:, None], seed_hi)
    return nh[:, 0], e0[:, 0]


def _seed_match_kernel(qhi_ref, qlo_ref, shi_ref, slo_ref, nh_ref, e0_ref, lcp_ref, *, p, k):
    qhi = qhi_ref[:]  # [TM, 1]
    qlo = qlo_ref[:]
    shi = shi_ref[:]  # [TM, E]
    slo = slo_ref[:]

    # prefix range on the hi word: p bases = 2p bits of hi (p <= 16)
    suf = jnp.uint32((1 << (32 - 2 * p)) - 1)
    lb = qhi & ~suf
    rb = qhi | suf

    in_range = (shi >= lb) & (shi <= rb)
    has_query = (qhi != PAD_HI) | (qlo != PAD_HI)
    in_range = in_range & has_query

    nh_ref[:] = jnp.sum(in_range.astype(jnp.int32), axis=1, keepdims=True)
    e0_ref[:] = jnp.sum(((shi < lb) & has_query).astype(jnp.int32), axis=1, keepdims=True)

    # LCP in bases over hi+lo words (int32 throughout: Mosaic has no
    # unsigned reductions)
    xhi = shi ^ qhi
    xlo = slo ^ qlo
    lz_hi = jax.lax.clz(xhi).astype(jnp.int32)
    lz_lo = jax.lax.clz(xlo).astype(jnp.int32)
    lcp_bits = jnp.where(xhi != 0, lz_hi, 32 + jnp.where(xlo != 0, lz_lo, 32))
    lcp_bases = jnp.minimum(lcp_bits >> 1, k)
    lcp_bases = jnp.where(in_range, lcp_bases, 0)
    lcp_ref[:] = jnp.max(lcp_bases, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("p", "k", "tile_m", "interpret"))
def seed_match_pallas(
    seed_hi: jnp.ndarray,  # [M, E] uint32, rows sorted by (hi, lo)
    seed_lo: jnp.ndarray,  # [M, E] uint32
    query_hi: jnp.ndarray,  # [M] uint32 (PAD_HI = no captured k-mer)
    query_lo: jnp.ndarray,  # [M] uint32
    p: int = 15,
    k: int = 31,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Per-mask seed matching; returns (n_hits [M], e0 [M], best_lcp [M])."""
    M, E = seed_hi.shape
    assert M % tile_m == 0, (M, tile_m)
    grid = (M // tile_m,)

    kernel = functools.partial(_seed_match_kernel, p=p, k=k)
    out_shape = [
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
    ]
    in_specs = [
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_m, E), lambda i: (i, 0)),
        pl.BlockSpec((tile_m, E), lambda i: (i, 0)),
    ]
    out_specs = [
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),
    ]
    nh, e0, lcp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(query_hi[:, None], query_lo[:, None], seed_hi, seed_lo)
    return nh[:, 0], e0[:, 0], lcp[:, 0]


def pack_index_for_device(chunk_readers, m_total: int, k: int, pad_entries: int | None = None):
    """Pack a columnar seed index into the device [M, E] hi/lo layout.

    Rows are per-mask entry k-mers padded with PAD_HI; E is the max entry
    count rounded up to a multiple of 128 (lane width).
    """
    per_mask: list[np.ndarray] = []
    for rdr in chunk_readers:
        kmers = np.asarray(rdr.kmers)
        off = np.asarray(rdr.mask_offsets)
        for mi in range(rdr.mask_end - rdr.mask_begin):
            per_mask.append(kmers[off[mi] : off[mi + 1]])
    assert len(per_mask) == m_total
    E = max((a.shape[0] for a in per_mask), default=1)
    E = max(((E + 127) // 128) * 128, 128)
    if pad_entries:
        E = max(E, pad_entries)
    hi = np.full((m_total, E), PAD_HI, dtype=np.uint32)
    lo = np.full((m_total, E), PAD_HI, dtype=np.uint32)
    for i, arr in enumerate(per_mask):
        h, l = split_kmers_hi_lo(arr, k)
        hi[i, : h.shape[0]] = h
        lo[i, : l.shape[0]] = l
    return hi, lo, E
