import numpy as np
import pytest

from lexicmap_tpu.utils.kmers import (
    decode_kmer,
    dust_scores,
    homopolymer_codes,
    is_low_complexity_dust,
    kmer_lcp,
    kmers_fwd,
    kmers_fwd_rc,
    ns_code,
    revcomp_kmers,
    revcomp_seq,
    reverse_kmers,
    seq_to_codes,
)


def encode(s: str, k: int) -> int:
    code = 0
    for c in seq_to_codes(s.encode()):
        code = (code << 2) | int(c)
    return code


def test_seq_to_codes_degenerate():
    codes = seq_to_codes(b"ACGTacgtNRYSWKMBDHVU")
    # degenerate -> lexicographic first base (ref: lexicmap/cmd/index.go:73-92)
    expect = [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 1, 1, 0, 2, 0, 1, 0, 0, 0, 3]
    assert codes.tolist() == expect


def test_kmers_fwd_rc():
    seq = b"ACGTTGCA"
    k = 4
    codes = seq_to_codes(seq)
    fwd, rc = kmers_fwd_rc(codes, k)
    assert fwd.shape[0] == 5
    for i in range(5):
        sub = seq[i : i + k].decode()
        assert decode_kmer(int(fwd[i]), k) == sub
        assert decode_kmer(int(rc[i]), k) == revcomp_seq(sub.encode()).decode()


def test_reverse_kmers():
    k = 31
    x = np.array([encode("A" * 28 + "CGT", k)], dtype=np.uint64)
    r = reverse_kmers(x, k)
    assert decode_kmer(int(r[0]), k) == "TGC" + "A" * 28


def test_revcomp_kmers():
    k = 7
    x = np.array([encode("ACGTTGA", k)], dtype=np.uint64)
    r = revcomp_kmers(x, k)
    assert decode_kmer(int(r[0]), k) == "TCAACGT"


def test_kmer_lcp():
    k = 31
    a = encode("ACGT" * 7 + "ACG", k)
    b_same = a
    b_diff0 = encode("CCGT" * 7 + "ACG", k)
    b_mid = encode("ACGT" * 3 + "T" + "ACGT" * 4 + "AC", k)
    arr_a = np.array([a, a, a], dtype=np.uint64)
    arr_b = np.array([b_same, b_diff0, b_mid], dtype=np.uint64)
    got = kmer_lcp(arr_a, arr_b, k)
    assert got[0] == k
    assert got[1] == 0
    assert got[2] == 12


def test_ns_code():
    assert ns_code(0b01, 4) == 0b01010101
    c, g, t, *_ = homopolymer_codes(4)[1:]
    assert decode_kmer(c, 4) == "CCCC"


def test_dust():
    k = 31
    polya = np.array([0], dtype=np.uint64)
    assert is_low_complexity_dust(polya, k)[0]
    # a random-ish diverse kmer should not be low-complexity
    div = np.array([encode("ACGTGATCCGTAGCATGCTAGCTAGGATCCA", k)], dtype=np.uint64)
    assert not is_low_complexity_dust(div, k)[0]
    # dinucleotide repeat is low-complexity
    rep = np.array([encode("ACACACACACACACACACACACACACACACA", k)], dtype=np.uint64)
    assert is_low_complexity_dust(rep, k)[0]


def test_dust_score_matches_bruteforce():
    rng = np.random.default_rng(0)
    k = 31
    kmers = rng.integers(0, 1 << 62, size=50, dtype=np.uint64)
    scores = dust_scores(kmers, k)
    for kmer, score in zip(kmers, scores):
        counts = {}
        for i in range(k - 1):
            t = (int(kmer) >> (2 * i)) & 63
            counts[t] = counts.get(t, 0) + 1
        expect = sum(c * (c - 1) // 2 for c in counts.values())
        assert score == expect
