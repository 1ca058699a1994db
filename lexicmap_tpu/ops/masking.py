"""LexicHash capture: for every mask, the k-mer minimizing (mask XOR k-mer).

Equivalent of lh.MaskKnownDistinctPrefixes(seq, skipRegions, checkShorterPrefix)
(ref call sites: lib-index-build.go:1026,1196; lib-index-search.go:1175).

Semantics implemented here (reconstructed; see masks.py docstring):
- Candidates are all k-mers of the sequence on BOTH strands whose span does
  not overlap any skip region (contig-junction intervals and >=5bp N runs;
  ref: lib-index-build.go:968-1014, reGaps at lib-index-build.go:2344).
- Per mask: captured k-mer = argmin over candidates of (kmer XOR mask);
  captured positions = ALL occurrences of that k-mer, encoded pos<<1|strand,
  sorted ascending.
- check_shorter_prefix=False (the BUILD-side rule; ref: lib-index-build.go
  :1026,1196): a mask only captures when the winner shares the mask's full
  DISTINCT prefix (masks.py distinct_prefix_len; p+1 for generated sets
  with duplicated prefixes).  Verified against the reference demo's
  seed-prefix histogram (demo/prefix.hist.png: no forward seed shares < 8
  bases with its mask, even for masks whose 8-prefix is depleted in a
  genome, e.g. CTAG-avoiding species) and the docs' `utils kmers` dumps.
- check_shorter_prefix=True (the QUERY-side rule; ref:
  lib-index-search.go:1175): global argmin, sub-distinct-prefix winners
  kept — they matter for suffix matching, where a low-LCP query k-mer can
  still share a long SUFFIX with a stored seed.

The host implementation below is a vectorized bit-trie descent over the sorted
candidate k-mer array (NumPy).  The batched TPU capture lives in
parallel/build_device.py (sort-join over the distinct-prefix axis).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.arrays import ranges_to_indices as _ranges_to_indices

from ..masks import MaskSet
from ..utils.kmers import kmer_lcp, kmers_fwd_rc


@dataclass
class CaptureResult:
    """Per-mask captured k-mer and its occurrence positions.

    kmers[i] == 0 with empty positions means "no capture" (matches the
    reference convention of zeroing filtered k-mers).
    """

    kmers: np.ndarray  # uint64 [m]
    # ragged positions: loc<<1|strand values
    pos_flat: np.ndarray  # uint32 [total]
    pos_offsets: np.ndarray  # int64 [m+1]

    def positions(self, i: int) -> np.ndarray:
        return self.pos_flat[self.pos_offsets[i] : self.pos_offsets[i + 1]]

    def n_positions(self) -> np.ndarray:
        return self.pos_offsets[1:] - self.pos_offsets[:-1]


def skip_mask_from_regions(length: int, k: int, regions: list[tuple[int, int]]) -> np.ndarray:
    """Boolean array over k-mer start positions: True = k-mer is EXCLUDED.

    A region [s, e] (inclusive) excludes k-mers starting in [s-k+1, e]
    (any k-mer overlapping the region; ref: lib-index-build.go:983,1003).
    """
    n = length - k + 1
    excl = np.zeros(max(n, 0), dtype=bool)
    for s, e in regions:
        a = max(s - k + 1, 0)
        b = min(e, n - 1)
        if a <= b:
            excl[a : b + 1] = True
    return excl


def find_gap_regions(seq: bytes, min_len: int = 5) -> list[tuple[int, int]]:
    """0-based inclusive [start, end] regions of runs of N/n with length >= 5
    (ref: reGaps = `[Nn]{5,}`, lib-index-build.go:2344)."""
    arr = np.frombuffer(seq, dtype=np.uint8)
    isn = (arr == ord("N")) | (arr == ord("n"))
    if not isn.any():
        return []
    d = np.diff(isn.astype(np.int8))
    starts = np.where(d == 1)[0] + 1
    ends = np.where(d == -1)[0]
    if isn[0]:
        starts = np.concatenate([[0], starts])
    if isn[-1]:
        ends = np.concatenate([ends, [arr.shape[0] - 1]])
    out = []
    for s, e in zip(starts, ends):
        if e - s + 1 >= min_len:
            out.append((int(s), int(e)))
    return out


def candidate_kmers(
    codes: np.ndarray,
    k: int,
    exclude: np.ndarray | None = None,
    precomputed: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(all candidate k-mers incl. both strands, their loc<<1|strand encodings)."""
    fwd, rc = precomputed if precomputed is not None else kmers_fwd_rc(codes, k)
    n = fwd.shape[0]
    if exclude is not None and exclude.any():
        keep = ~exclude
        pos = np.nonzero(keep)[0].astype(np.uint32)
        fwd = fwd[keep]
        rc = rc[keep]
    else:
        pos = np.arange(n, dtype=np.uint32)
    allk = np.concatenate([fwd, rc])
    allloc = np.concatenate(
        [pos.astype(np.uint32) << np.uint32(1), (pos.astype(np.uint32) << np.uint32(1)) | np.uint32(1)]
    )
    return allk, allloc


def capture(
    mask_set: MaskSet,
    codes: np.ndarray,
    skip_regions: list[tuple[int, int]] | None = None,
    check_shorter_prefix: bool = True,
    precomputed: tuple[np.ndarray, np.ndarray] | None = None,
) -> CaptureResult:
    k = mask_set.k
    m = mask_set.m
    exclude = None
    if skip_regions:
        exclude = skip_mask_from_regions(codes.shape[0], k, skip_regions)
    allk, allloc = candidate_kmers(codes, k, exclude, precomputed)
    if allk.shape[0] == 0:
        return CaptureResult(
            kmers=np.zeros(m, dtype=np.uint64),
            pos_flat=np.empty(0, dtype=np.uint32),
            pos_offsets=np.zeros(m + 1, dtype=np.int64),
        )

    order = np.argsort(allk, kind="stable")
    sk = allk[order]
    sloc = allloc[order]

    lo, hi = _xor_argmin_ranges(sk, mask_set.masks, k)
    winners = sk[lo]

    if not check_shorter_prefix:
        # a mask only captures k-mers sharing its full DISTINCT prefix
        # (ref: lexichash MaskKnownDistinctPrefixes(_, _, false); see module
        # docstring — the build-side rule, verified vs demo/prefix.hist.png)
        lcp = kmer_lcp(winners, mask_set.masks, k)
        ok = lcp >= mask_set.distinct_prefix_len
    else:
        # checkShorterPrefix=true (query side): keep every winner
        ok = np.ones(m, dtype=bool)

    counts = np.where(ok, hi - lo, 0)
    offsets = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    pos_flat = np.empty(offsets[-1], dtype=np.uint32)
    # gather winner positions; ranges are small (usually 1-3 occurrences)
    idx = _ranges_to_indices(lo[ok], hi[ok])
    gathered = sloc[idx]
    pos_flat[:] = gathered
    # sort each mask's positions ascending by loc value
    pos_flat = _sort_segments(pos_flat, offsets)

    kmers = np.where(ok, winners, np.uint64(0))
    return CaptureResult(kmers=kmers, pos_flat=pos_flat, pos_offsets=offsets)


def _xor_argmin_ranges(sorted_kmers: np.ndarray, masks: np.ndarray, k: int):
    """Vectorized trie descent: per mask the [lo, hi) range of equal winning
    k-mers in the sorted candidate array."""
    n = sorted_kmers.shape[0]
    m = masks.shape[0]
    lo = np.zeros(m, dtype=np.int64)
    hi = np.full(m, n, dtype=np.int64)
    prefix = np.zeros(m, dtype=np.uint64)
    for bit in range(2 * k - 1, -1, -1):
        b = np.uint64(1) << np.uint64(bit)
        mid_val = prefix | b
        split = np.searchsorted(sorted_kmers, mid_val, side="left")
        split = np.clip(split, lo, hi)
        desired = (masks & b) != 0
        has0 = split > lo
        has1 = hi > split
        go1 = np.where(desired, has1, ~has0)
        lo = np.where(go1, split, lo)
        hi = np.where(go1, hi, split)
        prefix = np.where(go1, prefix | b, prefix)
    return lo, hi



def _sort_segments(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sort each segment [offsets[i], offsets[i+1]) of vals independently."""
    if vals.shape[0] == 0:
        return vals
    seg = np.searchsorted(offsets[1:], np.arange(vals.shape[0]), side="right").astype(np.uint64)
    # stable sort by (segment, value) via composite key
    key = (seg << np.uint64(32)) | vals.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    return vals[order]
