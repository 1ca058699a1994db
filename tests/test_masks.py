import numpy as np

from lexicmap_tpu.masks import MaskSet, xor_argmin_sorted
from lexicmap_tpu.utils.kmers import decode_kmer


def test_generate_basic():
    ms = MaskSet.generate(k=31, m=1000, seed=1)
    assert ms.m == 1000
    assert ms.k == 31
    assert ms.prefix_len == 4  # 4^4=256 <= 1000 < 4^5
    assert np.unique(ms.masks).shape[0] == 1000
    # all 4^p prefixes present
    prefs = ms.masks >> np.uint64(2 * (31 - ms.prefix_len))
    assert np.unique(prefs).shape[0] == 256
    # sorted
    assert (np.diff(ms.masks.astype(np.int64)) > 0).all()


def test_generate_deterministic():
    a = MaskSet.generate(k=21, m=256, seed=7)
    b = MaskSet.generate(k=21, m=256, seed=7)
    assert (a.masks == b.masks).all()
    c = MaskSet.generate(k=21, m=256, seed=8)
    assert not (a.masks == c.masks).all()


def test_io_roundtrip(tmp_path):
    ms = MaskSet.generate(k=31, m=128, seed=3)
    p = tmp_path / "masks.bin"
    ms.save(str(p))
    ms2 = MaskSet.load(str(p))
    assert ms2.k == ms.k and ms2.seed == ms.seed
    assert (ms2.masks == ms.masks).all()

    t = tmp_path / "masks.txt"
    ms.save_text(str(t))
    ms3 = MaskSet.load_text(str(t))
    assert ms3.k == ms.k
    assert (ms3.masks == ms.masks).all()
    # text format: "idx\tBASES"
    line = open(t).readline().strip().split("\t")
    assert line[0] == "1"
    assert line[1] == decode_kmer(int(ms.masks[0]), 31)


def test_xor_argmin_sorted_bruteforce():
    rng = np.random.default_rng(42)
    k = 16
    vals = np.sort(rng.integers(0, 1 << (2 * k), size=500, dtype=np.uint64))
    vals = np.unique(vals)
    queries = rng.integers(0, 1 << (2 * k), size=200, dtype=np.uint64)
    got = xor_argmin_sorted(vals, queries, k)
    for q, g in zip(queries, got):
        xs = vals ^ q
        assert xs[g] == xs.min()


def test_nearest_mask():
    ms = MaskSet.generate(k=31, m=256, seed=1)
    # the nearest mask of a mask itself is itself
    got = ms.nearest_mask(ms.masks[:50])
    assert (got == np.arange(50)).all()
