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

# Packed k-mers need 64-bit integers.  XLA emulates u64 on TPU; a hi/lo
# uint32 split representation is the follow-up optimization for the MXU/VPU
# fast path (min_prefix range search only needs the top 30 bits).
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

PAD_KMER = jnp.uint64(0xFFFFFFFFFFFFFFFF)


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
    """LCP in bases of packed k-mers (device version of utils.kmers.kmer_lcp)."""
    x = jnp.bitwise_xor(a, b)
    # bit length via float trick is unsafe; use clz via iterative smear + popcount
    y = x
    for s in (1, 2, 4, 8, 16, 32):
        y = y | (y >> jnp.uint64(s))
    bitlen = jax.lax.population_count(y).astype(jnp.int32)
    return ((64 - bitlen) >> 1) + (k - 32)


@functools.partial(jax.jit, static_argnames=("k", "min_prefix"))
def seed_match(
    seed_kmers: jnp.ndarray,  # [M, E] uint64, row-sorted, padded with PAD_KMER
    query_kmers: jnp.ndarray,  # [M] uint64 (0 = no captured k-mer)
    k: int = 31,
    min_prefix: int = 15,
):
    """Prefix seed matching for all masks of a shard.

    Returns (e0, e1, n_hits, best_lcp):
      e0/e1: entry ranges per mask whose k-mers share >= min_prefix bases
      n_hits: e1-e0 (0 where the query has no captured k-mer)
      best_lcp: LCP of the first matched entry (0 if none)
    """
    suf = jnp.uint64((1 << (2 * (k - min_prefix))) - 1)
    lb = jnp.bitwise_and(query_kmers, jnp.bitwise_not(suf))
    rb = jnp.bitwise_or(query_kmers, suf)
    e0 = searchsorted_rows(seed_kmers, lb, side_left=True)
    e1 = searchsorted_rows(seed_kmers, rb, side_left=False)
    has_query = query_kmers != 0
    n_hits = jnp.where(has_query, e1 - e0, 0)
    first = jnp.take_along_axis(
        seed_kmers, jnp.minimum(e0, seed_kmers.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    best_lcp = jnp.where(n_hits > 0, kmer_lcp_bases(first, query_kmers, k), 0)
    return e0, e1, n_hits, best_lcp


@functools.partial(jax.jit, static_argnames=("band", "max_gap"))
def chain2_scores(
    qbegin: jnp.ndarray,  # [N] int32, sorted ascending (padded with large)
    tbegin: jnp.ndarray,  # [N] int32
    length: jnp.ndarray,  # [N] int32 (0 = padding)
    band: int = 64,
    max_gap: int = 50,
):
    """Banded chaining DP scores (device analog of Chainer2's forward pass,
    ref: lib-chaining2.go:222-307).

    For each anchor i, considers the previous `band` anchors j and computes
    score[i] = max(len[i], max_j score[j] + len[j]... ) with the same gap
    formula; returns (scores [N] float32, best_prev [N] int32).
    """
    N = qbegin.shape[0]

    def step(carry, i):
        scores, prevs = carry
        aq = qbegin[i]
        at = tbegin[i]
        al = length[i]
        js = i - 1 - jnp.arange(band)
        ok = (js >= 0) & (al > 0)
        jsc = jnp.maximum(js, 0)
        bq = qbegin[jsc]
        bt = tbegin[jsc]
        bl = length[jsc]
        ok = ok & (bq != aq) & (bt <= at) & (bl > 0)
        qd = jnp.abs(aq - bq)
        td = jnp.abs(at - bt)
        g = jnp.abs(qd - td)
        ok = ok & (g <= max_gap)
        cand = jnp.where(ok, scores[jsc] + bl.astype(jnp.float32) - g.astype(jnp.float32), -jnp.inf)
        best = jnp.max(cand)
        bestj = jnp.where(
            best > -jnp.inf, jsc[jnp.argmax(cand)], i
        )
        m = jnp.maximum(al.astype(jnp.float32), best)
        mj = jnp.where(best >= al.astype(jnp.float32), bestj, i)
        scores = scores.at[i].set(m)
        prevs = prevs.at[i].set(mj)
        return (scores, prevs), None

    scores0 = jnp.zeros((N,), dtype=jnp.float32)
    prevs0 = jnp.arange(N, dtype=jnp.int32)
    (scores, prevs), _ = jax.lax.scan(step, (scores0, prevs0), jnp.arange(N))
    return scores, prevs


@functools.partial(jax.jit, static_argnames=("k",))
def mask_capture_scores(
    seq_kmers: jnp.ndarray,  # [L] uint64 sorted candidate k-mers (padded)
    masks: jnp.ndarray,  # [M] uint64
    k: int = 31,
):
    """Per-mask XOR-argmin capture over a sorted candidate array (device
    analog of ops/masking.capture's trie descent): returns the captured
    k-mer per mask via a fixed-depth bisection descent."""
    M = masks.shape[0]
    L = seq_kmers.shape[0]
    lo = jnp.zeros((M,), dtype=jnp.int32)
    hi = jnp.full((M,), L, dtype=jnp.int32)
    prefix = jnp.zeros((M,), dtype=jnp.uint64)

    def body(bit, state):
        lo, hi, prefix = state
        b = jnp.uint64(1) << jnp.uint64(bit)
        mid_val = jnp.bitwise_or(prefix, b)
        split = jnp.searchsorted(seq_kmers, mid_val, side="left").astype(jnp.int32)
        split = jnp.clip(split, lo, hi)
        desired = jnp.bitwise_and(masks, b) != 0
        has0 = split > lo
        has1 = hi > split
        go1 = jnp.where(desired, has1, ~has0)
        lo = jnp.where(go1, split, lo)
        hi = jnp.where(go1, hi, split)
        prefix = jnp.where(go1, jnp.bitwise_or(prefix, b), prefix)
        return lo, hi, prefix

    # descend from the top bit; static unroll over 2k bits via fori_loop
    def wrapped(i, state):
        bit = 2 * k - 1 - i
        return body(bit, state)

    lo, hi, prefix = jax.lax.fori_loop(0, 2 * k, wrapped, (lo, hi, prefix))
    return seq_kmers[jnp.minimum(lo, L - 1)]
