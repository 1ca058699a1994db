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


def _seed_locate_kernel(qhi_ref, qvalid_ref, shi_ref, cnt_ref, nh_ref, e0_ref, *, p):
    """Hi-word-only >=p-prefix range locate (p <= 16 bases live entirely in
    the hi word; rows are sorted by (hi, lo) so equal-hi entries cluster).
    LCP refinement happens host-side on the gathered entries, so neither the
    lo words nor an LCP output are needed — this halves HBM and h2d bytes.

    Validity is carried OUT-OF-BAND: `qvalid` marks real query k-mers
    (a poly-T query k-mer legitimately has hi == 0xFFFFFFFF) and `cnt`
    gives each mask's real entry count so padded lanes never count as
    hits even when rb saturates to 0xFFFFFFFF (15 leading T bases)."""
    qhi = qhi_ref[:]  # [TM, 1] uint32
    qvalid = qvalid_ref[:] != 0  # [TM, 1]
    shi = shi_ref[:]  # [TM, E]
    cnt = cnt_ref[:]  # [TM, 1] int32

    suf = jnp.uint32((1 << (32 - 2 * p)) - 1)
    lb = qhi & ~suf
    rb = qhi | suf

    lane = jax.lax.broadcasted_iota(jnp.int32, shi.shape, 1)
    real = lane < cnt
    in_range = (shi >= lb) & (shi <= rb) & qvalid & real
    nh_ref[:] = jnp.sum(in_range.astype(jnp.int32), axis=1, keepdims=True)
    e0_ref[:] = jnp.sum(
        ((shi < lb) & qvalid & real).astype(jnp.int32), axis=1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("p", "tile_m", "interpret"))
def seed_locate_pallas(
    seed_hi: jnp.ndarray,  # [M, E] uint32, rows sorted
    seed_cnt: jnp.ndarray,  # [M] int32 real entry count per mask row
    query_hi: jnp.ndarray,  # [M] uint32
    query_valid: jnp.ndarray,  # [M] int32/bool — 1 where a k-mer was captured
    p: int = 15,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Per-mask >=p-prefix entry ranges; returns (n_hits [M], e0 [M])."""
    M, E = seed_hi.shape
    assert M % tile_m == 0, (M, tile_m)
    grid = (M // tile_m,)
    kernel = functools.partial(_seed_locate_kernel, p=p)
    col = pl.BlockSpec((tile_m, 1), lambda i: (i, 0))
    nh, e0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            col,
            col,
            pl.BlockSpec((tile_m, E), lambda i: (i, 0)),
            col,
        ],
        out_specs=[col, col],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        query_hi[:, None],
        query_valid.astype(jnp.int32)[:, None],
        seed_hi,
        seed_cnt.astype(jnp.int32)[:, None],
    )
    return nh[:, 0], e0[:, 0]


@functools.partial(jax.jit, static_argnames=("p", "tile_m", "interpret"))
def seed_locate_batch_pallas(
    seed_hi: jnp.ndarray,  # [M, E] uint32, rows sorted
    seed_cnt: jnp.ndarray,  # [M] int32 real entry count per mask row
    query_hi: jnp.ndarray,  # [B, M] uint32
    query_valid: jnp.ndarray,  # [B, M] int32/bool
    p: int = 15,
    tile_m: int = 256,
    interpret: bool = False,
):
    """Batched >=p-prefix locate: the whole query batch in ONE kernel.

    The batch is a native grid dimension (minor, so each seed tile stays
    VMEM-resident across all B queries) rather than a `jax.vmap` over
    single-query pallas_calls — batching by grid is the TPU-idiomatic
    form, and vmap-of-pallas_call hangs the compiler on some backends
    (observed on the axon tunnel backend, 2026-08: same kernel compiles
    unbatched in <1s but never finishes once vmap's batching rule prepends
    the batch dim).  Queries are flattened to a [B*M, 1] column so every
    block keeps the unbatched kernel's [tile_m, 1] shape (Mosaic requires
    the minor block dim to be 128-divisible or full-size).
    Returns (n_hits [B, M], e0 [B, M])."""
    M, E = seed_hi.shape
    assert M % tile_m == 0, (M, tile_m)
    B = query_hi.shape[0]
    nt = M // tile_m
    grid = (nt, B)  # B minor: each seed tile stays resident across queries
    kernel = functools.partial(_seed_locate_kernel, p=p)
    qcol = pl.BlockSpec((tile_m, 1), lambda i, b: (b * nt + i, 0))
    scol = pl.BlockSpec((tile_m, 1), lambda i, b: (i, 0))
    tbl = pl.BlockSpec((tile_m, E), lambda i, b: (i, 0))
    nh, e0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qcol, qcol, tbl, scol],
        out_specs=[qcol, qcol],
        out_shape=[
            jax.ShapeDtypeStruct((B * M, 1), jnp.int32),
            jax.ShapeDtypeStruct((B * M, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        query_hi.reshape(B * M, 1),
        query_valid.astype(jnp.int32).reshape(B * M, 1),
        seed_hi,
        seed_cnt.astype(jnp.int32)[:, None],
    )
    return nh.reshape(B, M), e0.reshape(B, M)


def _seed_match_kernel(
    qhi_ref, qlo_ref, qvalid_ref, shi_ref, slo_ref, cnt_ref, nh_ref, e0_ref, lcp_ref, *, p, k
):
    qhi = qhi_ref[:]  # [TM, 1]
    qlo = qlo_ref[:]
    qvalid = qvalid_ref[:] != 0
    shi = shi_ref[:]  # [TM, E]
    slo = slo_ref[:]
    cnt = cnt_ref[:]  # [TM, 1]

    # prefix range on the hi word: p bases = 2p bits of hi (p <= 16)
    suf = jnp.uint32((1 << (32 - 2 * p)) - 1)
    lb = qhi & ~suf
    rb = qhi | suf

    lane = jax.lax.broadcasted_iota(jnp.int32, shi.shape, 1)
    real = lane < cnt
    in_range = (shi >= lb) & (shi <= rb) & qvalid & real

    nh_ref[:] = jnp.sum(in_range.astype(jnp.int32), axis=1, keepdims=True)
    e0_ref[:] = jnp.sum(
        ((shi < lb) & qvalid & real).astype(jnp.int32), axis=1, keepdims=True
    )

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
    seed_cnt: jnp.ndarray,  # [M] int32 real entry count per mask row
    query_hi: jnp.ndarray,  # [M] uint32
    query_lo: jnp.ndarray,  # [M] uint32
    query_valid: jnp.ndarray,  # [M] int32/bool
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
    col = pl.BlockSpec((tile_m, 1), lambda i: (i, 0))
    tbl = pl.BlockSpec((tile_m, E), lambda i: (i, 0))
    in_specs = [col, col, col, tbl, tbl, col]
    out_specs = [col, col, col]
    nh, e0, lcp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        query_hi[:, None],
        query_lo[:, None],
        query_valid.astype(jnp.int32)[:, None],
        seed_hi,
        seed_lo,
        seed_cnt.astype(jnp.int32)[:, None],
    )
    return nh[:, 0], e0[:, 0], lcp[:, 0]


