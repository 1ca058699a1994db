"""Vectorized 2-bit k-mer codecs (NumPy host side).

Re-derives the semantics of shenwei356/kmers + lexicmap/cmd/util/kmers.go as
array kernels instead of per-k-mer scalar functions:

- base encoding with degenerate bases mapped to their lexicographically first
  base (ref: lexicmap/cmd/index.go:73-92 documentation table),
- sliding-window k-mer extraction for both strands,
- base-order reversal (for the suffix index; ref: kmers.MustReverse),
- LCP of packed k-mers (ref: util.MustKmerLongestPrefix2),
- DUST-like low-complexity filter (ref: util/kmers.go:162-329 IsLowComplexityDust),
- homopolymer codes (ref: util/kmers.go:434 Ns).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# base encoding

# degenerate -> lexicographically first base (ref: lexicmap/cmd/index.go:73-92)
_DEGENERATE_FIRST = {
    "A": 0, "C": 1, "G": 2, "T": 3, "U": 3,
    "M": 0, "R": 0, "W": 0, "S": 1, "Y": 1, "K": 2,
    "V": 0, "H": 0, "D": 0, "B": 1, "N": 0,
}

BASE_CODES = np.zeros(256, dtype=np.uint8)  # unknown chars -> A(0)
for _b, _c in _DEGENERATE_FIRST.items():
    BASE_CODES[ord(_b)] = _c
    BASE_CODES[ord(_b.lower())] = _c

# base is a known nucleotide character (incl. degenerate codes)
IS_BASE = np.zeros(256, dtype=bool)
for _b in _DEGENERATE_FIRST:
    IS_BASE[ord(_b)] = True
    IS_BASE[ord(_b.lower())] = True

_CODE2BASE = np.frombuffer(b"ACGT", dtype=np.uint8)

COMPLEMENT = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTUMRWSYKVHDBN", b"TGCAAKYWSRMBDHVN"):
    COMPLEMENT[_a] = _b
    COMPLEMENT[_a + 32] = _b + 32  # lowercase


def seq_to_codes(seq: bytes | np.ndarray) -> np.ndarray:
    """Encode an ASCII sequence to 2-bit codes (uint8, 0..3)."""
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else seq
    return BASE_CODES[arr]


def codes_to_seq(codes: np.ndarray) -> bytes:
    return _CODE2BASE[codes].tobytes()


def revcomp_seq(seq: bytes) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8)
    return COMPLEMENT[arr][::-1].tobytes()


# --------------------------------------------------------------------------
# k-mer extraction

def kmers_fwd(codes: np.ndarray, k: int) -> np.ndarray:
    """All forward k-mers of `codes` packed into uint64 (first base at the top).

    Returns an array of length len(codes)-k+1 (empty if shorter than k).
    """
    n = codes.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    c = codes.astype(np.uint64)
    for j in range(k):
        out |= c[j : j + n] << np.uint64(2 * (k - 1 - j))
    return out


def kmers_fwd_rc(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward and reverse-complement k-mers at every position.

    Native path: one rolling C pass (kmers_fwd_rc_batch).  Fallback: buffered
    Horner accumulation — shift/or into preallocated buffers to avoid
    per-iteration temporaries (2x over the naive version on 5 Mb genomes).
    """
    L = codes.shape[0]
    n = L - k + 1
    if n <= 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    try:
        from ..native import kmers_fwd_rc_native

        native = kmers_fwd_rc_native(codes, k)
        if native is not None:
            return native
    except ImportError:  # pragma: no cover
        pass
    c = codes.astype(np.uint64)
    cc = np.uint64(3) - c  # complement

    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    for j in range(k):
        np.left_shift(c[j : j + n], np.uint64(2 * (k - 1 - j)), out=tmp)
        np.bitwise_or(fwd, tmp, out=fwd)
        np.left_shift(cc[j : j + n], np.uint64(2 * j), out=tmp)
        np.bitwise_or(rc, tmp, out=rc)
    return fwd, rc


# --------------------------------------------------------------------------
# bit manipulation on packed k-mers

def reverse_kmers(kmers: np.ndarray, k: int) -> np.ndarray:
    """Reverse the base ORDER of packed k-mers (not complemented).

    Equivalent of kmers.MustReverse (ref: lib-index-build.go:812): used to
    build/query the suffix index.
    """
    x = kmers.astype(np.uint64, copy=True)
    # reverse 2-bit groups within 64 bits, then shift down
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> np.uint64(2)) & m2) | ((x & m2) << np.uint64(2))
    x = ((x >> np.uint64(4)) & m4) | ((x & m4) << np.uint64(4))
    x = x.view(np.uint8).reshape(-1, 8)[:, ::-1].copy().view(np.uint64).reshape(kmers.shape)
    return x >> np.uint64(64 - 2 * k)


def revcomp_kmers(kmers: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of packed k-mers."""
    mask = np.uint64((1 << (2 * k)) - 1)
    return reverse_kmers(kmers ^ mask, k)


def bitlen64(x: np.ndarray) -> np.ndarray:
    """Number of significant bits of each uint64 (0 for 0)."""
    y = x.astype(np.uint64, copy=True)
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    return popcount64(y)


def popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    y = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    y -= (y >> np.uint64(1)) & m1
    y = (y & m2) + ((y >> np.uint64(2)) & m2)
    y = (y + (y >> np.uint64(4))) & m4
    return ((y * h01) >> np.uint64(56)).astype(np.int64)


def kmer_lcp(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Longest common prefix (in bases) of two packed k-mer arrays.

    Equivalent of `bits.LeadingZeros64(a^b)>>1 + (k-32)`
    (ref: cmd/kv/kv-searcher.go:461).
    """
    x = np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    # lcp = (clz64(x) >> 1) + k - 32 ; clz64 = 64 - bitlen
    return ((np.int64(64) - bitlen64(x)) >> 1) + (k - 32)


def ns_code(base_code: int, k: int) -> int:
    """Packed k-mer of one base repeated k times (ref: util.Ns)."""
    code = 0
    for _ in range(k):
        code = (code << 2) | base_code
    return code


# --------------------------------------------------------------------------
# low-complexity (DUST-like) filter

def dust_scores(kmers: np.ndarray, k: int) -> np.ndarray:
    """DUST-like score: sum over 3-mers t of C(count_t, 2).

    Matches util.IsLowComplexityDust exactly: it scans shifts i in [0, k-2]
    (k-1 windows, the last one being a partial 3-mer of the top 2 bases).
    """
    n = kmers.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nt = k - 1  # number of (partial) triplets
    tri = np.empty((n, nt), dtype=np.uint8)
    kk = kmers.astype(np.uint64)
    for i in range(nt):
        tri[:, i] = ((kk >> np.uint64(2 * i)) & np.uint64(63)).astype(np.uint8)
    tri.sort(axis=1)
    eq = tri[:, 1:] == tri[:, :-1]
    # score = sum C(run,2) = number of equal (sorted-adjacent-run) pairs:
    # for a run of length r there are C(r,2) pairs; count via cumulative runs
    run = np.zeros((n, nt), dtype=np.int64)
    run[:, 0] = 0
    for i in range(1, nt):
        run[:, i] = np.where(eq[:, i - 1], run[:, i - 1] + 1, 0)
    return run.sum(axis=1)


def is_low_complexity_dust(kmers: np.ndarray, k: int) -> np.ndarray:
    """score > 50 (ref: util/kmers.go:328)."""
    try:
        from ..native import dust_batch_native

        native = dust_batch_native(np.asarray(kmers, dtype=np.uint64), k)
        if native is not None:
            return native
    except ImportError:  # pragma: no cover
        pass
    return dust_scores(kmers, k) > 50


def homopolymer_codes(k: int) -> tuple[int, int, int, int]:
    """(AAA.., CCC.., GGG.., TTT..) packed codes used for filtering."""
    return ns_code(0, k), ns_code(1, k), ns_code(2, k), ns_code(3, k)


def decode_kmer(kmer: int, k: int) -> str:
    """Decode a packed k-mer to a string (debug helper)."""
    return "".join("ACGT"[(int(kmer) >> (2 * (k - 1 - i))) & 3] for i in range(k))
