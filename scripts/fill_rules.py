"""Brute-force search of window-capture rule variants for desert filling.

Evaluates each candidate capture rule against position-exact oracles mined
from the reference docs (seed-pos.md first-10 rows, kv fill rows) expressed
as accept/reject constraints on (window, position, strand).

Constraint sets (GCF_000017205.1, 0-based positions):
  desert (159,359), window [0,1390):   slot 209: 209+- F, 208+ F, 208- T
                                       slot 258: 258+ F, 258- T
                                       slot 308: 308+ T
                                       slot 358: 358+- F, 357+- F, 356+ T
  desert (359,1226), window [0,2257):  409..387 both strands F, 386+ F, 386- T
GCF_000742135.1 desert (989275,989799), window [988275,990830):
  slot-chain implies: ref accepted 989337- (kv row), so scanning from the
  first slot the rule must reject everything tested before it.
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicmap_tpu.index.build import _dust_scalar  # noqa: E402
from lexicmap_tpu.utils.kmers import kmers_fwd_rc, decode_kmer  # noqa: E402

CACHE = "/tmp/fillcache"
K = 31

masks = np.load(os.path.join(CACHE, "masks.npy")).astype(np.uint64)
NM = len(masks)
sorted_masks = np.sort(masks)
sorted_order = np.argsort(masks)

# distinct prefix length per mask (shortest unique among masks), in SORTED order
def _distinct_lens():
    lens = np.zeros(NM, dtype=np.int64)
    for L in range(1, 16):
        pref = sorted_masks >> np.uint64(2 * (K - L))
        uniq = np.ones(NM, dtype=bool)
        uniq[1:] &= pref[1:] != pref[:-1]
        uniq[:-1] &= pref[:-1] != pref[1:]
        newly = uniq & (lens == 0)
        lens[newly] = L
        if (lens > 0).all():
            break
    return lens

DLEN_SORTED = _distinct_lens()


def load(gid):
    with open(os.path.join(CACHE, gid + ".pkl"), "rb") as fh:
        d = pickle.load(fh)
    fwd, rc = kmers_fwd_rc(d["codes"], K)
    return fwd, rc, d["locs"]


class Window:
    """All per-window capture rules share this precomputation."""

    def __init__(self, wf, wr):
        n = len(wf)
        self.n = n
        # interleave like the reference kmerList: pos<<1|strand order
        vals = np.empty(2 * n, dtype=np.uint64)
        vals[0::2] = wf
        vals[1::2] = wr
        self.vals = vals            # index = pos<<1|strand
        self.order = np.argsort(vals, kind="stable")
        self.svals = vals[self.order]

    def bucket(self, prefix, plen):
        """Indices (pos<<1|strand) of window kmers with the given prefix."""
        shift = np.uint64(2 * (K - plen))
        lo_val = np.uint64(prefix) << shift
        hi_val = lo_val | ((np.uint64(1) << shift) - np.uint64(1))
        lo = int(np.searchsorted(self.svals, lo_val, side="left"))
        hi = int(np.searchsorted(self.svals, hi_val, side="right"))
        return self.order[lo:hi]


def mask_candidates(x, plen_mode):
    """Masks whose lookup prefix matches kmer x. Returns (sorted_idx list, plen list)."""
    out = []
    if plen_mode == "p8":
        p = np.uint64(x) >> np.uint64(2 * (K - 8))
        pref = sorted_masks >> np.uint64(2 * (K - 8))
        lo = int(np.searchsorted(pref, p, side="left"))
        hi = int(np.searchsorted(pref, p, side="right"))
        for j in range(lo, hi):
            out.append((j, 8))
    elif plen_mode == "distinct":
        for L in (7, 8):
            p = np.uint64(x) >> np.uint64(2 * (K - L))
            pref = sorted_masks >> np.uint64(2 * (K - L))
            lo = int(np.searchsorted(pref, p, side="left"))
            hi = int(np.searchsorted(pref, p, side="right"))
            for j in range(lo, hi):
                if DLEN_SORTED[j] == L:
                    out.append((j, L))
    return out


def capture_ok(win: Window, idx, rule):
    """Is window kmer at interleaved index idx capturable under `rule`?"""
    x = int(win.vals[idx])
    if x == 0:
        return False
    cands = mask_candidates(x, rule["plen_mode"])
    if not cands:
        return False
    for j, L in cands:
        mval = int(sorted_masks[j])
        bidx = win.bucket(np.uint64(mval) >> np.uint64(2 * (K - L)), L)
        bvals = win.vals[bidx]
        if rule["winner"] == "xor":
            key = bvals ^ np.uint64(mval)
        elif rule["winner"] == "value":
            key = bvals
        best = key.min()
        mykey = (np.uint64(x) ^ np.uint64(mval)) if rule["winner"] == "xor" else np.uint64(x)
        if rule.get("positions", "all") == "all":
            if mykey == best:
                return True
        else:
            # only one position of the winner value counts
            wmask = win.vals[bidx] == win.vals[bidx[int(np.argmin(key))]]
            wpos = bidx[np.nonzero(win.vals[bidx] == bvals[int(np.argmin(key))])[0]]
            wpos = np.sort(wpos)
            if mykey == best:
                if rule["positions"] == "first" and idx == int(wpos[0]):
                    return True
                if rule["positions"] == "last" and idx == int(wpos[-1]):
                    return True
    return False


def eval_constraints(rule, verbose=False):
    fwd, rc, _ = load("GCF_000017205.1")
    tests = []
    w1 = Window(fwd[: 1390 - K + 1], rc[: 1390 - K + 1])
    w2 = Window(fwd[: 2257 - K + 1], rc[: 2257 - K + 1])
    def T(w, p, s, exp):
        tests.append((w, p, s, exp))
    for p, s, e in [(209, 0, 0), (209, 1, 0), (208, 0, 0), (208, 1, 1),
                    (258, 0, 0), (258, 1, 1), (308, 0, 1),
                    (358, 0, 0), (358, 1, 0), (357, 0, 0), (357, 1, 0), (356, 0, 1)]:
        T(w1, p, s, e)
    for p in range(409, 386, -1):
        T(w2, p, 0, 0); T(w2, p, 1, 0)
    T(w2, 386, 0, 0); T(w2, 386, 1, 1)

    fwd2, rc2, _ = load("GCF_000742135.1")
    start, end = 988275, 990830
    w3 = Window(fwd2[start : end - K + 1], rc2[start : end - K + 1])
    # slot chain: first slot 989325 (rel 1050); ref accepted 989337- (rel 1062, strand -)
    # upstream tests rel 1050..1026 both strands F, downstream 1051..1062: F until 1062-
    for p in range(1050, 1025, -1):
        T(w3, p, 0, 0); T(w3, p, 1, 0)
    for p in range(1051, 1062):
        T(w3, p, 0, 0); T(w3, p, 1, 0)
    T(w3, 1062, 0, 0)
    T(w3, 1062, 1, 1)

    nfail = 0
    fails = []
    for w, p, s, exp in tests:
        idx = (p << 1) | s
        x = int(w.vals[idx])
        got = bool(x) and not _dust_scalar(x, K) and capture_ok(w, idx, rule)
        if got != bool(exp):
            nfail += 1
            fails.append((p, "+-"[s], exp, got))
    if verbose and fails:
        for f in fails[:20]:
            print("   FAIL", f)
    return nfail, len(tests)


if __name__ == "__main__":
    rules = []
    for plen_mode in ("p8", "distinct"):
        for winner in ("xor", "value"):
            for positions in ("all", "first", "last"):
                rules.append({"plen_mode": plen_mode, "winner": winner, "positions": positions})
    for rule in rules:
        nf, nt = eval_constraints(rule)
        print(f"{rule}: {nt-nf}/{nt} constraints satisfied")
