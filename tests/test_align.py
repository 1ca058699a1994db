import numpy as np
import pytest

from lexicmap_tpu.ops.align import align, alignment_text, score_and_evalue, trim_ops
from lexicmap_tpu.utils.kmers import seq_to_codes


def brute_gotoh_cost(q, t, x=4, o=6, e=2):
    """Full-matrix affine-gap global alignment cost (minimization)."""
    n, m = len(q), len(t)
    INF = 1 << 30
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    Q = np.full((n + 1, m + 1), INF, dtype=np.int64)
    T = np.full((n + 1, m + 1), INF, dtype=np.int64)
    M[0, 0] = 0
    for i in range(1, n + 1):
        Q[i, 0] = o + e * i
    for j in range(1, m + 1):
        T[0, j] = o + e * j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 0 if q[i - 1] == t[j - 1] else x
            M[i, j] = min(M[i - 1, j - 1], Q[i - 1, j - 1], T[i - 1, j - 1]) + sub
            Q[i, j] = min(
                min(M[i - 1, j], T[i - 1, j], Q[i - 1, j]) + o + e, Q[i - 1, j] + e
            )
            T[i, j] = min(
                min(M[i, j - 1], Q[i, j - 1], T[i, j - 1]) + o + e, T[i, j - 1] + e
            )
    return int(min(M[n, m], Q[n, m], T[n, m]))


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


def test_align_identical():
    q = seq_to_codes(b"ACGTACGTACGTACGT")
    r = align(q, q)
    assert r.cost == 0
    assert r.ops == [("M", 16)]
    assert r.matches == 16 and r.align_len == 16 and r.gaps == 0
    assert (r.qbegin, r.qend, r.tbegin, r.tend) == (1, 16, 1, 16)


def test_align_mismatch_and_gap():
    q = seq_to_codes(b"ACGTACGTAAACGTACGT")
    t = seq_to_codes(b"ACGTACGTACGTACGT")  # 2bp deletion in t relative to q
    r = align(q, t)
    assert r.cost == 6 + 2 * 2
    qi, ti = ops_consume(r.ops)
    assert qi == 18 and ti == 16
    assert r.gaps == 2
    assert r.matches == 16


def test_align_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    for trial in range(25):
        n = int(rng.integers(5, 60))
        q = rng.integers(0, 4, size=n).astype(np.uint8)
        t = q.copy()
        # mutate
        for _ in range(int(rng.integers(0, 6))):
            kind = rng.integers(0, 3)
            p = int(rng.integers(0, max(len(t) - 1, 1)))
            if kind == 0:
                t[p] = (t[p] + 1) % 4
            elif kind == 1 and len(t) > 6:
                t = np.delete(t, p)
            else:
                t = np.insert(t, p, rng.integers(0, 4))
        r = align(q, t, band_extra=4)  # small band to exercise regrowth
        expect = brute_gotoh_cost(q, t)
        assert r.cost == expect, f"trial {trial}: {r.cost} != {expect}"
        # ops consistency
        assert ops_cost(r.ops) == r.cost
        qi, ti = ops_consume(r.ops)
        assert qi == len(q) and ti == len(t)


def test_trim_ops():
    ops = [("D", 3), ("X", 2), ("M", 5), ("I", 1), ("M", 4), ("X", 3)]
    assert trim_ops(ops) == [("M", 5), ("I", 1), ("M", 4)]
    assert trim_ops([("X", 5)]) == []


def test_score_and_evalue():
    # 100 matches: score 200, even; bitscore = (0.625*200 - ln 0.41)/ln2 = 181
    s, b, ev = score_and_evalue([("M", 100)], qlen=100, total_bases=10_000_000)
    assert s == 200
    import math

    expect_bits = (0.625 * 200 - math.log(0.41)) / math.log(2)
    assert b == int(expect_bits)
    assert ev == pytest.approx(10_000_000 * 2.0 ** (-expect_bits) * 100)
    # odd score rounds down: 99M 1X -> 99*2-3 = 195 -> 194
    s2, b2, _ = score_and_evalue([("M", 99), ("X", 1)], 100, 1000)
    assert s2 == 195
    expect_bits2 = (0.625 * 194 - math.log(0.41)) / math.log(2)
    assert b2 == int(expect_bits2)


def test_alignment_text():
    q = b"ACGTAC"
    t = b"ACTTC"
    # ops: M2 X1 M1 I1 M1  => q ACGTAC / t ACTT-C
    ops = [("M", 2), ("X", 1), ("M", 1), ("I", 1), ("M", 1)]
    qr, ar, tr = alignment_text(ops, q, t)
    assert qr == b"ACGTAC"
    assert tr == b"ACTT-C"
    assert ar == b"|| | |"
