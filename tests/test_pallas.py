"""Pallas seed-match kernel vs brute force (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.parallel.pallas_kernels import (
    PAD_HI,
    seed_locate_pallas,
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
    cnt = np.full(M, E - 16, dtype=np.int32)
    qh = np.zeros(M, dtype=np.uint32)
    ql = np.zeros(M, dtype=np.uint32)
    qh2, ql2 = split_kmers_hi_lo(queries, k)
    qh[has] = qh2[has]
    ql[has] = ql2[has]

    nh, e0, lcp = seed_match_pallas(
        hi, lo, cnt, qh, ql, has, p=p, k=k, tile_m=128, interpret=True
    )
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


def test_seed_locate_polyT_queries_exact():
    """Regression for the PAD_HI in-band sentinel bug (ADVICE round 2):
    (a) a query k-mer whose first 16 bases are all T has hi == 0xFFFFFFFF
        and must still match; (b) a query with 15 leading T's saturates the
        range upper bound to 0xFFFFFFFF, and padded table lanes must NOT be
        counted as hits."""
    k, p = 31, 15
    M, E = 128, 128
    polyT16 = np.uint64(0xFFFFFFFF) << np.uint64(2 * k - 32)  # TTTT...T + zeros
    polyT15 = np.uint64(0x3FFFFFFF) << np.uint64(2 * k - 30)  # 15 T's then A's

    table = np.zeros((M, E), dtype=np.uint64)
    cnt = np.zeros(M, dtype=np.int32)
    queries = np.zeros(M, dtype=np.uint64)
    has = np.zeros(M, dtype=bool)

    # mask 0: poly-T query, 3 real entries sharing its 15-base prefix
    queries[0] = polyT16 | np.uint64(0x123)
    has[0] = True
    table[0, :3] = [polyT16 | np.uint64(1), polyT16 | np.uint64(0x100), polyT16]
    table[0, :3].sort()
    cnt[0] = 3

    # mask 1: 15-leading-T query (rb saturates), only 2 real entries,
    # the rest of the row is PAD_HI padding that must not count
    queries[1] = polyT15 | np.uint64(7)
    has[1] = True
    table[1, :2] = [polyT15 | np.uint64(3), polyT15 | np.uint64(9)]
    cnt[1] = 2

    hi = np.full((M, E), PAD_HI, dtype=np.uint32)
    for m in range(M):
        if cnt[m]:
            h, _ = split_kmers_hi_lo(table[m, : cnt[m]], k)
            hi[m, : cnt[m]] = h

    qh = np.zeros(M, dtype=np.uint32)
    qh2, _ = split_kmers_hi_lo(queries, k)
    qh[has] = qh2[has]

    nh, e0 = seed_locate_pallas(hi, cnt, qh, has, p=p, tile_m=128, interpret=True)
    nh, e0 = np.asarray(nh), np.asarray(e0)

    assert nh[0] == 3 and e0[0] == 0  # (a) poly-T query still matches
    assert nh[1] == 2 and e0[1] == 0  # (b) padded lanes not counted
    assert (nh[2:] == 0).all()
