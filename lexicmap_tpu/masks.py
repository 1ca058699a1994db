"""LexicHash mask set: generation, IO, prefix indexing.

Re-derivation of the shenwei356/lexichash mask machinery (external Go module,
not vendored in the reference tree). Behavior is reconstructed from:
- the documented generation scheme (ref: docs/content/tutorials/index/_index.md:133-141):
  all 4^p p-bp prefixes (p = max p with 4^p <= m) duplicated to m, plus random
  suffixes, re-rolled on duplicates;
- call sites: lexichash.NewWithSeed(k, m, seed, 0) (ref: lib-index-build.go:235),
  NewFromTextFile / WriteToFile / NewFromFile (ref: lib-index-build.go:228,526;
  lib-index-search.go:424), lh.Masks []uint64, lh.K, lh.Seed.

PARITY: mask generation is BIT-IDENTICAL to the reference's for any
(k, m, seed) with lcPrefix=0 (the index-build path): the Go math/rand
stream is reproduced exactly (utils/gorand.py) and the generation
procedure was reconstructed against the 21 default-seed oracle masks in
the reference docs (scripts/lexichash_mask_variants.py; MaskSet.generate
docstring).  Mask TEXT files are also interchangeable (same format:
"<1-based index>\\t<k bases>").

Masks here are stored SORTED ascending; the mask index is its rank.  Sorting
groups shared prefixes contiguously, which turns every per-prefix operation
into a range operation (a better layout for vectorized/TPU search than the
reference's insertion order).
"""

from __future__ import annotations

import os

import numpy as np

from .utils.kmers import decode_kmer, dust_scores, kmer_lcp, seq_to_codes

MASKS_FILE_MAGIC = b"LXTPMASK"


class MaskSet:
    def __init__(self, masks: np.ndarray, k: int, seed: int = 0):
        masks = np.sort(np.asarray(masks, dtype=np.uint64))
        if np.unique(masks).shape[0] != masks.shape[0]:
            raise ValueError("duplicated masks")
        self.masks = masks
        self.k = int(k)
        self.seed = int(seed)
        self.m = int(masks.shape[0])
        # mask prefix length: max p with 4^p <= m  (ref: lib-index-build.go:246-253)
        p = 1
        while 1 << ((p + 1) * 2) <= self.m:
            p += 1
        self.prefix_len = max(p, 1)

    @property
    def distinct_prefix_len(self) -> int:
        """Minimal L such that every mask's L-base prefix is unique.

        This is lexichash's "known distinct prefixes" length: generated mask
        sets guarantee it is prefix_len (m == 4^p) or prefix_len+1 (m > 4^p;
        the dup-pass re-roll forces the two masks of a duplicated prefix to
        differ right after it).  MaskKnownDistinctPrefixes(seq, _, false)
        (the desert-filling capture, ref: lib-index-build.go:1196) only lets
        a mask capture k-mers sharing this full distinct prefix — verified
        against the reference docs' `utils kmers` demo dumps, where mask 1's
        forward seeds all share >= 8 bases with the mask.
        """
        if not hasattr(self, "_distinct_prefix_len"):
            if self.m > 1:
                max_lcp = int(np.max(kmer_lcp(self.masks[1:], self.masks[:-1], self.k)))
            else:
                max_lcp = 0
            self._distinct_prefix_len = min(max(max_lcp + 1, self.prefix_len), self.k)
        return self._distinct_prefix_len

    def distinct_prefix_lens(self) -> np.ndarray:
        """Per-mask shortest-unique-prefix lengths (int array, sorted order).

        dlen[j] = 1 + max LCP of mask j with its sorted neighbors — the
        shortest prefix distinguishing it from every other mask.  For the
        default 20k set these are 7 (12768 masks) and 8 (7232 masks).
        """
        if not hasattr(self, "_distinct_prefix_lens"):
            nb = np.zeros(self.m, dtype=np.int64)
            if self.m > 1:
                lcps = kmer_lcp(self.masks[1:], self.masks[:-1], self.k)
                nb[1:] = np.maximum(nb[1:], lcps)
                nb[:-1] = np.maximum(nb[:-1], lcps)
            self._distinct_prefix_lens = np.minimum(nb + 1, self.k)
        return self._distinct_prefix_lens

    # -- generation -------------------------------------------------------

    @classmethod
    def generate(cls, k: int, m: int, seed: int = 1, lc_prefix: int = 0) -> "MaskSet":
        """Generate m masks of size k — BIT-IDENTICAL to lexichash.NewWithSeed.

        Reconstructed procedure (verified 21/21 against the default-seed
        oracle masks printed in the reference's docs/content/usage/utils/
        masks.md; see scripts/lexichash_mask_variants.py):

        1. p = max p with 4^p <= m.  r = Go math/rand source seeded with
           ``seed`` (bit-exact stream: utils/gorand.py).
        2. If m > 4^p: rand.Shuffle the 4^p prefixes; the first m-4^p
           shuffled prefixes will be duplicated.
        3. Base pass: for prefix 0..4^p-1 in ascending order, suffix =
           wang_hash64(r.Uint64()) masked to the low 2(k-p) bits.
        4. Dup pass: for the duplicated prefixes in shuffled order, draw
           suffixes the same way, re-rolling while the new suffix's FIRST
           BASE equals an existing same-prefix mask's (guarantees the two
           masks of a duplicated prefix diverge right after the prefix).

        With lc_prefix > 0 (only the `utils masks --prefix` path; the index
        build always passes 0, ref: lib-index-build.go:235), masks whose
        first lc_prefix bases are low-complexity (DUST) are additionally
        re-rolled — an approximation of lexichash's lcPrefix check.
        """
        from .utils.gorand import GoRand
        from .utils.hashes import wang_hash64_int

        if k < 5 or k > 32:
            raise ValueError(f"invalid k: {k}")
        if m < 64:
            raise ValueError(f"number of masks should be >=64: {m}")
        p = 1
        while 1 << ((p + 1) * 2) <= m:
            p += 1
        npref = 1 << (2 * p)
        suf_bits = 2 * (k - p)
        suf_mask = (1 << suf_bits) - 1
        lc_shift = 2 * (k - lc_prefix) if lc_prefix > 0 else 0

        def lc_ok(mask: int) -> bool:
            if lc_prefix <= 0:
                return True
            pl = np.array([mask >> lc_shift], dtype=np.uint64)
            return bool(dust_scores(pl, lc_prefix)[0] <= 50)

        r = GoRand(seed)
        extras: list[int] = []
        if m > npref:
            prefixes = list(range(npref))
            r.shuffle_list(prefixes)
            need = m - npref
            while need > npref:  # prefixes duplicated 3+ times (m > 2*4^p)
                extras.extend(prefixes)
                need -= npref
            extras.extend(prefixes[:need])

        masks: list[int] = []
        # first suffix bases already used per prefix, as a bitmask of 4
        first_bases = np.zeros(npref, dtype=np.uint8)
        fb_shift = suf_bits - 2
        for pref in range(npref):
            while True:
                suf = wang_hash64_int(r.uint64()) & suf_mask
                mask = (pref << suf_bits) | suf
                if lc_ok(mask):
                    break
            masks.append(mask)
            if suf_bits >= 2:
                first_bases[pref] |= 1 << (suf >> fb_shift)
        for pref in extras:
            while True:
                suf = wang_hash64_int(r.uint64()) & suf_mask
                mask = (pref << suf_bits) | suf
                if suf_bits >= 2 and (first_bases[pref] >> (suf >> fb_shift)) & 1:
                    continue  # ref re-rolls until the base after the prefix differs
                if lc_ok(mask):
                    break
            masks.append(mask)
            if suf_bits >= 2:
                first_bases[pref] |= 1 << (suf >> fb_shift)
        return cls(np.array(masks, dtype=np.uint64), k, seed)

    # -- IO ---------------------------------------------------------------

    def save(self, path: str) -> None:
        """Binary mask file (this implementation's own format)."""
        with open(path, "wb") as fh:
            fh.write(MASKS_FILE_MAGIC)
            header = np.array([1, self.k, self.m, self.seed], dtype=np.int64)
            fh.write(header.tobytes())
            fh.write(self.masks.tobytes())

    @classmethod
    def load(cls, path: str) -> "MaskSet":
        with open(path, "rb") as fh:
            magic = fh.read(8)
            if magic != MASKS_FILE_MAGIC:
                raise ValueError(f"invalid masks file: {path}")
            header = np.frombuffer(fh.read(32), dtype=np.int64)
            _ver, k, m, seed = (int(x) for x in header)
            masks = np.frombuffer(fh.read(8 * m), dtype=np.uint64)
        return cls(masks, k, seed)

    def save_text(self, path_or_fh) -> None:
        """Text format interchangeable with `lexicmap utils masks` output
        (ref: masks.go:131-143): "<1-based index>\\t<bases>"."""
        own = isinstance(path_or_fh, (str, os.PathLike))
        fh = open(path_or_fh, "w") if own else path_or_fh
        try:
            for i, code in enumerate(self.masks):
                fh.write(f"{i + 1}\t{decode_kmer(int(code), self.k)}\n")
        finally:
            if own:
                fh.close()

    @classmethod
    def load_text(cls, path: str) -> "MaskSet":
        masks = []
        k = None
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                parts = line.split("\t")
                s = parts[-1]
                if k is None:
                    k = len(s)
                elif len(s) != k:
                    raise ValueError("masks with different lengths")
                codes = seq_to_codes(s.encode())
                code = 0
                for c in codes:
                    code = (code << 2) | int(c)
                masks.append(code)
        return cls(np.array(masks, dtype=np.uint64), k, 0)

    # -- prefix ops -------------------------------------------------------

    def prefix_ranges(self) -> tuple[np.ndarray, np.ndarray]:
        """(lo, hi) ranges into the sorted mask array per p-base prefix.

        Masks are sorted, so all masks sharing a prefix are contiguous;
        this replaces the reference's IndexMasks hash table
        (ref: lib-index-build.go:297) with two searchsorted tables.
        """
        if not hasattr(self, "_prefix_ranges"):
            p = self.prefix_len
            npref = 1 << (2 * p)
            shift = np.uint64(2 * (self.k - p))
            prefs = self.masks >> shift
            bounds = np.searchsorted(prefs, np.arange(npref + 1, dtype=np.uint64))
            self._prefix_ranges = (bounds[:-1], bounds[1:])
        return self._prefix_ranges

    def nearest_mask(self, kmers: np.ndarray) -> np.ndarray:
        """Index of the mask minimizing mask XOR kmer, for each query k-mer.

        Equivalent to lh.MaskKmer + argmin-XOR loop (ref: lib-index-build.go
        :813-821, lib-index-search.go:1287-1295).  Implemented as a vectorized
        bit-trie descent over the sorted mask array.
        """
        from .native import xor_argmin_batch_native

        native = xor_argmin_batch_native(self.masks, kmers, 2 * self.k)
        if native is not None:
            return native
        return xor_argmin_sorted(self.masks, kmers, self.k)

    def lcp_with_mask(self, idx: np.ndarray, kmers: np.ndarray) -> np.ndarray:
        return kmer_lcp(self.masks[idx], kmers, self.k)


def xor_argmin_sorted(sorted_vals: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """For each query q, the index (into sorted_vals) minimizing v XOR q.

    Vectorized binary-trie descent: at each bit (MSB->LSB) split the candidate
    range [lo, hi) at prefix|bit via a global searchsorted (valid because the
    range is exactly the contiguous block sharing the common prefix), then
    follow the branch matching q's bit when non-empty.
    """
    n = sorted_vals.shape[0]
    if n == 0:
        raise ValueError("empty array")
    q = np.asarray(queries, dtype=np.uint64)
    nq = q.shape[0]
    lo = np.zeros(nq, dtype=np.int64)
    hi = np.full(nq, n, dtype=np.int64)
    prefix = np.zeros(nq, dtype=np.uint64)
    for bit in range(2 * k - 1, -1, -1):
        b = np.uint64(1) << np.uint64(bit)
        mid_val = prefix | b
        split = np.searchsorted(sorted_vals, mid_val, side="left")
        split = np.clip(split, lo, hi)
        desired = (q & b) != 0
        has0 = split > lo
        has1 = hi > split
        go1 = np.where(desired, has1, ~has0)
        lo = np.where(go1, split, lo)
        hi = np.where(go1, hi, split)
        prefix = np.where(go1, prefix | b, prefix)
    return lo
