import numpy as np
import pytest

from lexicmap_tpu.ops.align import align
from lexicmap_tpu.ops.wfa import wfa_align
from lexicmap_tpu.utils.kmers import seq_to_codes


def ops_cost(ops, x=4, o=6, e=2):
    c = 0
    for op, n in ops:
        if op == "X":
            c += n * x
        elif op in ("I", "D"):
            c += o + n * e
    return c


def ops_consume(ops):
    qi = ti = 0
    for op, n in ops:
        if op in ("M", "X", "I"):
            qi += n
        if op in ("M", "X", "D"):
            ti += n
    return qi, ti


def test_wfa_identical():
    q = seq_to_codes(b"ACGTACGTACGTACGTACGTACGTACGTACGTACGT")
    r = wfa_align(q, q)
    assert r.cost == 0
    assert r.ops == [("M", len(q))]


def test_wfa_long_identical():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=5000).astype(np.uint8)
    r = wfa_align(q, q)
    assert r.cost == 0 and r.matches == 5000


def test_wfa_single_mismatch():
    q = seq_to_codes(b"ACGTACGTACGTACGT")
    t = bytearray(b"ACGTACGTACGTACGT")
    t[7] = ord("A") if t[7] != ord("A") else ord("C")
    r = wfa_align(q, seq_to_codes(bytes(t)))
    assert r.cost == 4
    assert r.matches == 15 and r.align_len == 16


def test_wfa_gap():
    q = seq_to_codes(b"ACGTACGTCCACGTACGTAA")
    t = seq_to_codes(b"ACGTACGTACGTACGTAA")
    r = wfa_align(q, t)
    assert r.cost == 6 + 2 * 2
    qi, ti = ops_consume(r.ops)
    assert qi == len(q) and ti == len(t)


def test_wfa_optimal_matches_gotoh():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(10, 80))
        q = rng.integers(0, 4, size=n).astype(np.uint8)
        t = q.copy()
        for _ in range(int(rng.integers(0, 7))):
            kind = rng.integers(0, 3)
            p = int(rng.integers(0, max(len(t) - 1, 1)))
            if kind == 0:
                t[p] = (t[p] + 1) % 4
            elif kind == 1 and len(t) > 8:
                t = np.delete(t, p)
            else:
                t = np.insert(t, p, rng.integers(0, 4))
        rw = wfa_align(q, t, adaptive=False)
        rg = align(q, t)
        assert rw is not None
        assert rw.cost == rg.cost, f"trial {trial}: {rw.cost} != {rg.cost}"
        assert ops_cost(rw.ops) == rw.cost
        qi, ti = ops_consume(rw.ops)
        assert qi == len(q) and ti == len(t)


def test_wfa_divergent_pair():
    """~10% divergence, like the worst demo 16S hits."""
    rng = np.random.default_rng(11)
    q = rng.integers(0, 4, size=1500).astype(np.uint8)
    t = q.copy()
    for _ in range(150):
        p = int(rng.integers(0, len(t)))
        t[p] = (t[p] + int(rng.integers(1, 4))) % 4
    rw = wfa_align(q, t, adaptive=False)
    rg = align(q, t)
    assert rw.cost == rg.cost
    assert rw.matches >= 1300


def test_wfa_empty_sides():
    q = seq_to_codes(b"ACGT")
    r = wfa_align(q, np.empty(0, dtype=np.uint8))
    assert r.ops == [("I", 4)]
    r2 = wfa_align(np.empty(0, dtype=np.uint8), q)
    assert r2.ops == [("D", 4)]
