"""Pallas seed-match kernel vs brute force (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.parallel.pallas_kernels import (
    PAD_HI,
    seed_match_pallas,
    split_kmers_hi_lo,
)


def test_split_hi_lo_order_preserved():
    rng = np.random.default_rng(0)
    k = 31
    kmers = np.sort(rng.integers(0, 1 << 62, size=1000, dtype=np.uint64))
    hi, lo = split_kmers_hi_lo(kmers, k)
    # (hi, lo) lexicographic order == kmer order
    packed = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    assert (np.diff(packed.astype(np.int64)) >= 0).all()


def test_seed_match_pallas_matches_bruteforce():
    rng = np.random.default_rng(1)
    k = 31
    p = 15
    M, E = 256, 128
    table = np.sort(
        rng.integers(0, 1 << 62, size=(M, E - 16), dtype=np.uint64), axis=1
    )
    queries = np.zeros(M, dtype=np.uint64)
    has = rng.random(M) < 0.8
    pick = rng.integers(0, E - 16, size=M)
    queries[has] = table[np.arange(M), pick][has]

    hi = np.full((M, E), PAD_HI, dtype=np.uint32)
    lo = np.full((M, E), PAD_HI, dtype=np.uint32)
    th, tl = split_kmers_hi_lo(table.ravel(), k)
    hi[:, : E - 16] = th.reshape(M, E - 16)
    lo[:, : E - 16] = tl.reshape(M, E - 16)
    qh = np.full(M, PAD_HI, dtype=np.uint32)
    ql = np.full(M, PAD_HI, dtype=np.uint32)
    qh2, ql2 = split_kmers_hi_lo(queries, k)
    qh[has] = qh2[has]
    ql[has] = ql2[has]

    nh, e0, lcp = seed_match_pallas(hi, lo, qh, ql, p=p, k=k, tile_m=128, interpret=True)
    nh = np.asarray(nh)
    e0 = np.asarray(e0)
    lcp = np.asarray(lcp)

    suf = np.uint64((1 << (2 * (k - p))) - 1)
    for m in range(M):
        if not has[m]:
            assert nh[m] == 0
            continue
        q = queries[m]
        lb, rb = q & ~suf, q | suf
        row = table[m]
        expect_n = int(((row >= lb) & (row <= rb)).sum())
        expect_e0 = int((row < lb).sum())
        assert nh[m] == expect_n, m
        assert e0[m] == expect_e0, m
        if expect_n:
            # best LCP among in-range entries
            import lexicmap_tpu.utils.kmers as KM

            sel = row[(row >= lb) & (row <= rb)]
            lcps = KM.kmer_lcp(sel, np.full(sel.shape[0], q, dtype=np.uint64), k)
            assert lcp[m] == int(lcps.max()), m
