"""Tests for the bit-exact Go math/rand reconstruction (utils/gorand.py)."""

import numpy as np

from lexicmap_tpu.utils.gorand import GoRand


def test_int63_stream_seed1_matches_go_stdlib():
    """rand.New(rand.NewSource(1)).Int63() canonical outputs (documented in
    countless Go examples; deterministic across Go versions <= 1.x math/rand)."""
    r = GoRand(1)
    got = [r.int63() for _ in range(5)]
    assert got[:3] == [
        5577006791947779410,
        8674665223082153551,
        6129484611666145821,
    ]


def test_seed_normalization():
    # seed is reduced mod 2^31-1; 0 maps to 89482311
    a = GoRand(1)
    b = GoRand(1 + (2**31 - 1))
    assert a.int63() == b.int63()


def test_intn_small_range_deterministic():
    r = GoRand(42)
    vals = [r.intn(4) for _ in range(8)]
    assert all(0 <= v < 4 for v in vals)
    r2 = GoRand(42)
    assert vals == [r2.intn(4) for _ in range(8)]


def test_shuffle_reproduces_reference_duplicated_mask_prefixes():
    """lexichash's default-mask generation (seed=1, m=20000, k=31) starts by
    Fisher-Yates-shuffling the 16384 7-bp prefixes and duplicating the first
    3616 (derived by matching docs/content/usage/utils/masks.md of the
    reference, which lists the masks of a default demo index: the duplicated
    prefixes below are exactly the ones shown there)."""
    r = GoRand(1)
    xs = list(range(16384))
    r.shuffle_list(xs)
    extras = set(xs[:3616])
    # from the masks.md head (masks 1-10): dup prefixes codes among 0..28
    assert {x for x in extras if x <= 28} == {3, 5, 7, 10, 11, 15, 20, 21, 24, 28}
    # from the masks.md tail (masks 19991-20000): dups among 16376..16383
    assert {x for x in extras if x >= 16376} == {16380, 16383}


def test_perm_is_fisher_yates_variant():
    r = GoRand(7)
    p = r.perm(10)
    assert sorted(p) == list(range(10))
    r2 = GoRand(7)
    assert p == r2.perm(10)


def test_uint64_wraps():
    r = GoRand(3)
    for _ in range(1000):
        v = r.uint64()
        assert 0 <= v < (1 << 64)


def test_cooked_table_shape():
    from lexicmap_tpu.utils import gorand

    c = np.load(gorand._COOKED_PATH)
    assert c.shape == (607,) and c.dtype == np.uint64
    # first two values as they appear (as int64) in go/src/math/rand/rng.go
    assert int(c[:2].view(np.int64)[0]) == -4181792142133755926
    assert int(c[:2].view(np.int64)[1]) == -4576982950128230565
