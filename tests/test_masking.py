import numpy as np

from lexicmap_tpu.masks import MaskSet
from lexicmap_tpu.ops.masking import (
    capture,
    candidate_kmers,
    find_gap_regions,
    skip_mask_from_regions,
)
from lexicmap_tpu.utils.kmers import kmers_fwd_rc, seq_to_codes


def brute_capture(masks: np.ndarray, codes: np.ndarray, k: int, exclude=None):
    """Reference implementation: per-mask argmin over all candidate kmers."""
    fwd, rc = kmers_fwd_rc(codes, k)
    n = fwd.shape[0]
    keep = np.ones(n, dtype=bool) if exclude is None else ~exclude
    kms, locs = [], []
    for i in range(n):
        if keep[i]:
            kms.append(fwd[i])
            locs.append(i << 1)
            kms.append(rc[i])
            locs.append(i << 1 | 1)
    kms = np.array(kms, dtype=np.uint64)
    locs = np.array(locs, dtype=np.uint32)
    out_k = np.zeros(masks.shape[0], dtype=np.uint64)
    out_p = []
    for j, mask in enumerate(masks):
        x = kms ^ mask
        w = kms[np.argmin(x)]
        out_k[j] = w
        pos = np.sort(locs[kms == w])
        out_p.append(pos)
    return out_k, out_p


def test_capture_matches_bruteforce():
    rng = np.random.default_rng(5)
    k = 11
    ms = MaskSet.generate(k=k, m=64, seed=2)
    seq = rng.integers(0, 4, size=500).astype(np.uint8)
    res = capture(ms, seq)
    bk, bp = brute_capture(ms.masks, seq, k)
    assert (res.kmers == bk).all()
    for i in range(ms.m):
        assert res.positions(i).tolist() == bp[i].tolist()


def test_capture_with_skip_regions():
    rng = np.random.default_rng(6)
    k = 11
    ms = MaskSet.generate(k=k, m=64, seed=2)
    seq = rng.integers(0, 4, size=400).astype(np.uint8)
    regions = [(100, 150), (300, 310)]
    excl = skip_mask_from_regions(seq.shape[0], k, regions)
    res = capture(ms, seq, skip_regions=regions)
    bk, bp = brute_capture(ms.masks, seq, k, exclude=excl)
    assert (res.kmers == bk).all()
    for i in range(ms.m):
        assert res.positions(i).tolist() == bp[i].tolist()
    # no captured kmer may start inside an excluded area
    for i in range(ms.m):
        for loc in res.positions(i):
            assert not excl[loc >> 1]


def test_capture_prefix_restricted():
    # with a short sequence most mask prefixes are absent -> no capture
    rng = np.random.default_rng(7)
    k = 31
    ms = MaskSet.generate(k=k, m=4096, seed=2)  # prefix_len = 6
    seq = rng.integers(0, 4, size=100).astype(np.uint8)
    res = capture(ms, seq, check_shorter_prefix=False)
    n_captured = int((res.kmers != 0).sum())
    # ~138 candidate kmers over 4096 6-prefixes -> only a few captures
    assert 0 < n_captured < 300
    res_full = capture(ms, seq, check_shorter_prefix=True)
    assert int((res_full.kmers != 0).sum()) == ms.m


def test_find_gap_regions():
    seq = b"ACGT" + b"N" * 5 + b"ACGT" + b"N" * 4 + b"AC" + b"n" * 6
    regions = find_gap_regions(seq)
    assert regions == [(4, 8), (19, 24)]
