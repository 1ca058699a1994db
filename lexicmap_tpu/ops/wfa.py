"""Wavefront alignment (WFA), gap-affine, with traceback.

The exact-equivalent of the reference's shenwei356/wfa usage
(ref: lib-index-search.go:1867-1868: global alignment, DefaultPenalties,
AdaptiveReduction).  Unlike ops/align.py's banded Gotoh (O(n*band)), WFA is
O(n*s): for the high-identity windows this pipeline aligns, s (the alignment
cost) is tiny, and the wavefronts are short arrays.

Formulation (cost minimization, match=0, mismatch=x, gap=o+e*len):
  diagonal k = j - i  (target index minus query index)
  offset   f = j      (target progress); i = f - k
  D-wavefront: consume target (op 'D'):  D_s[k] = max(M_{s-o-e}[k-1],
                                                      D_{s-e}[k-1]) + 1
  I-wavefront: consume query  (op 'I'):  I_s[k] = max(M_{s-o-e}[k+1],
                                                      I_{s-e}[k+1])
  M_s[k] = max(M_{s-x}[k]+1, I_s[k], D_s[k]), then greedy match extension.

Match extension is bit-parallel: 32-base packed words compared via XOR +
leading-zero count, vectorized over all live diagonals.

The traceback preference among co-optimal sources is configurable
(`pref`): the reference library's exact order is not documented, so the
default was calibrated against the reference's committed demo outputs.
"""

from __future__ import annotations

import numpy as np

from .align import AlignmentResult, _finalize

NEG = np.int64(-(10**15))


def _pack_words(codes: np.ndarray) -> np.ndarray:
    """w[i] = 32 bases starting at i packed 2-bit MSB-first (A-padded)."""
    n = codes.shape[0]
    w = np.zeros(n + 1, dtype=np.uint64)
    c = codes.astype(np.uint64)
    for i in range(n - 1, -1, -1):
        w[i] = (w[i + 1] >> np.uint64(2)) | (c[i] << np.uint64(62))
    return w


def _extend(f, ks, qw, tw, n, m):
    """Greedy match extension of offsets f on diagonals ks (vectorized)."""
    f = f.copy()
    i = f - ks
    active = (f < m) & (i < n) & (f >= 0) & (i >= 0)
    while active.any():
        ii = np.where(active, i, 0)
        jj = np.where(active, f, 0)
        x = qw[ii] ^ tw[jj]
        # number of leading matching bases in this 32-base word
        nz = x != 0
        lead = np.where(nz, _clz64(x) >> 1, 32)
        # remaining bases on each side
        rem = np.minimum(n - ii, m - jj)
        ext = np.minimum(lead, rem)
        ext = np.where(active, ext, 0)
        f = f + ext
        i = i + ext
        # continue only where a full 32-base word matched and bases remain
        active = active & (lead >= 32) & (ext == np.minimum(32, rem)) & (ext > 0) & (
            f < m
        ) & (i < n)
    return f


def _clz64(x: np.ndarray) -> np.ndarray:
    y = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    if hasattr(np, "bitwise_count"):
        return 64 - np.bitwise_count(y).astype(np.int64)
    from ..utils.kmers import popcount64

    return 64 - popcount64(y)


class _WF:
    """One score's wavefronts: arrays over diagonals [lo, hi]."""

    __slots__ = ("lo", "M", "I", "D")

    def __init__(self, lo: int, width: int):
        self.lo = lo
        self.M = np.full(width, NEG, dtype=np.int64)
        self.I = np.full(width, NEG, dtype=np.int64)
        self.D = np.full(width, NEG, dtype=np.int64)

    def get(self, arr_name: str, k: int) -> int:
        arr = getattr(self, arr_name)
        idx = k - self.lo
        if idx < 0 or idx >= arr.shape[0]:
            return int(NEG)
        return int(arr[idx])


def wfa_align(
    q: np.ndarray,
    t: np.ndarray,
    mismatch: int = 4,
    gap_open: int = 6,
    gap_ext: int = 2,
    pref: str = "XDI",
    gap_pref_ext_first: bool = False,
    adaptive: bool = True,
    min_wf_len: int = 10,
    max_dist_diff: int = 50,
    max_score: int | None = None,
) -> AlignmentResult | None:
    """Global gap-affine WFA; returns AlignmentResult (see ops/align.py).

    pref: traceback source order at M-nodes among {'I','D','X'} ties.
    gap_pref_ext_first: prefer gap-extension over gap-open on ties.
    adaptive: heuristic wavefront reduction (ref: wfa.AdaptiveReduction).
    """
    x, o, e = mismatch, gap_open, gap_ext
    n = int(q.shape[0])
    m = int(t.shape[0])

    # native fast path (identical semantics; see lexicmap_tpu/native)
    if pref == "XDI" and not gap_pref_ext_first and max_score is None:
        from ..native import wfa_align_native

        ops_native = wfa_align_native(
            q, t, x, o, e, adaptive=adaptive,
            min_wf_len=min_wf_len, max_dist_diff=max_dist_diff,
        )
        if ops_native is not None:
            cost = 0
            for op, cnt in ops_native:
                if op == "X":
                    cost += cnt * x
                elif op in ("I", "D"):
                    cost += o + cnt * e
            return _finalize(ops_native, cost, n, m)

    if n == 0 or m == 0:
        ops: list[tuple[str, int]] = []
        cost = 0
        if n:
            ops.append(("I", n))
            cost += o + e * n
        if m:
            ops.append(("D", m))
            cost += o + e * m
        return _finalize(ops, cost, n, m)

    qw = _pack_words(q)
    tw = _pack_words(t)

    k_end = m - n
    wfs: dict[int, _WF] = {}

    # s = 0
    wf0 = _WF(0, 1)
    f0 = _extend(np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64), qw, tw, n, m)
    wf0.M[0] = f0[0]
    wfs[0] = wf0
    if k_end == 0 and wf0.M[0] >= m:
        return _traceback(wfs, 0, q, t, x, o, e, n, m, pref, gap_pref_ext_first)

    if max_score is None:
        max_score = x * max(n, m) + 2 * (o + e * max(n, m)) + 10

    s = 0
    while s < max_score:
        s += 1
        src_x = wfs.get(s - x)
        src_oe = wfs.get(s - o - e)
        src_e = wfs.get(s - e)
        if src_x is None and src_oe is None and src_e is None:
            continue

        los = []
        his = []
        for w, dk in ((src_x, 0), (src_oe, 1), (src_e, 1)):
            if w is not None:
                los.append(w.lo - dk)
                his.append(w.lo + w.M.shape[0] - 1 + dk)
        lo = min(los)
        hi = max(his)
        width = hi - lo + 1
        wf = _WF(lo, width)
        ks = np.arange(lo, hi + 1, dtype=np.int64)

        def fetch(src: _WF | None, name: str, kk: np.ndarray) -> np.ndarray:
            if src is None:
                return np.full(kk.shape[0], NEG, dtype=np.int64)
            idx = kk - src.lo
            ok = (idx >= 0) & (idx < getattr(src, name).shape[0])
            out = np.full(kk.shape[0], NEG, dtype=np.int64)
            out[ok] = getattr(src, name)[idx[ok]]
            return out

        # D: consume target, from k-1
        d_open = fetch(src_oe, "M", ks - 1)
        d_ext = fetch(src_e, "D", ks - 1)
        D = np.maximum(d_open, d_ext)
        D = np.where(D > NEG, D + 1, NEG)
        # I: consume query, from k+1
        i_open = fetch(src_oe, "M", ks + 1)
        i_ext = fetch(src_e, "I", ks + 1)
        I = np.maximum(i_open, i_ext)
        # X: mismatch
        mis = fetch(src_x, "M", ks)
        mis = np.where(mis > NEG, mis + 1, NEG)

        M = np.maximum(np.maximum(mis, I), D)
        # validity: i = f - k in [0, n], f in [0, m]
        iv = M - ks
        valid = (M > NEG) & (M <= m) & (iv >= 0) & (iv <= n)
        M = np.where(valid, M, NEG)
        Ivalid = (I > NEG) & (I <= m) & ((I - ks) >= 0) & ((I - ks) <= n)
        I = np.where(Ivalid, I, NEG)
        Dvalid = (D > NEG) & (D <= m) & ((D - ks) >= 0) & ((D - ks) <= n)
        D = np.where(Dvalid, D, NEG)

        # extend M
        has = M > NEG
        if has.any():
            Mext = M.copy()
            Mext[has] = _extend(M[has], ks[has], qw, tw, n, m)
            M = Mext

        # adaptive reduction (ref: wfa DefaultAdaptiveOption)
        if adaptive and int(has.sum()) >= min_wf_len:
            ii = M - ks
            dist = np.where(M > NEG, (m - M) + (n - ii), np.int64(1 << 60))
            dmin = dist.min()
            prune = (dist - dmin > max_dist_diff) & (dist < (1 << 59))
            if prune.any():
                M = np.where(prune, NEG, M)
                I = np.where(prune, NEG, I)
                D = np.where(prune, NEG, D)

        wf.M = M
        wf.I = I
        wf.D = D
        wfs[s] = wf

        if lo <= k_end <= hi and M[k_end - lo] >= m:
            return _traceback(wfs, s, q, t, x, o, e, n, m, pref, gap_pref_ext_first)

    return None  # exceeded max_score


def _traceback(wfs, s, q, t, x, o, e, n, m, pref, gap_ext_first):
    k = m - n
    f = m
    state = "M"
    rev: list[str] = []

    while True:
        wf = wfs[s]
        if state == "M":
            if s == 0:
                # all remaining are matches back to the origin of diagonal 0
                rev.extend("M" * f)
                break
            src_x = wfs.get(s - x)
            src_g = wfs.get(s)  # I/D at same score
            mis = src_x.get("M", k) + 1 if src_x is not None else int(NEG)
            ins = src_g.get("I", k)
            dele = src_g.get("D", k)
            f_pred = max(mis, ins, dele)
            if f_pred <= NEG + 2:
                raise RuntimeError("WFA traceback failed (M)")
            nmatch = f - f_pred
            rev.extend("M" * nmatch)
            f = f_pred
            chosen = None
            for c in pref:
                if c == "X" and mis == f_pred:
                    chosen = "X"
                    break
                if c == "I" and ins == f_pred:
                    chosen = "I"
                    break
                if c == "D" and dele == f_pred:
                    chosen = "D"
                    break
            if chosen == "X":
                rev.append("X")
                s -= x
                f -= 1
                # state stays M ... but the M we came from was post-extension?
                # M_{s-x}[k] is the stored (post-extension) value; continue
            elif chosen == "I":
                state = "I"
            else:
                state = "D"
        elif state == "I":
            # consume query: op 'I', from k+1, f unchanged
            src_oe = wfs.get(s - o - e)
            src_e = wfs.get(s - e)
            op_val = src_oe.get("M", k + 1) if src_oe is not None else int(NEG)
            ext_val = src_e.get("I", k + 1) if src_e is not None else int(NEG)
            rev.append("I")
            first, second = (
                (("ext", ext_val), ("open", op_val))
                if gap_ext_first
                else (("open", op_val), ("ext", ext_val))
            )
            if first[1] == f:
                kind = first[0]
            elif second[1] == f:
                kind = second[0]
            else:
                raise RuntimeError("WFA traceback failed (I)")
            k += 1
            if kind == "ext":
                s -= e
            else:
                s -= o + e
                state = "M"
        else:  # 'D': consume target, from k-1, f -> f-1
            src_oe = wfs.get(s - o - e)
            src_e = wfs.get(s - e)
            op_val = src_oe.get("M", k - 1) if src_oe is not None else int(NEG)
            ext_val = src_e.get("D", k - 1) if src_e is not None else int(NEG)
            rev.append("D")
            first, second = (
                (("ext", ext_val), ("open", op_val))
                if gap_ext_first
                else (("open", op_val), ("ext", ext_val))
            )
            if first[1] == f - 1:
                kind = first[0]
            elif second[1] == f - 1:
                kind = second[0]
            else:
                raise RuntimeError("WFA traceback failed (D)")
            k -= 1
            f -= 1
            if kind == "ext":
                s -= e
            else:
                s -= o + e
                state = "M"

    ops: list[tuple[str, int]] = []
    for ch in reversed(rev):
        if ops and ops[-1][0] == ch:
            ops[-1] = (ch, ops[-1][1] + 1)
        else:
            ops.append((ch, 1))
    cost = 0
    for op, cnt in ops:
        if op == "X":
            cost += cnt * x
        elif op in ("I", "D"):
            cost += o + cnt * e
    return _finalize(ops, cost, n, m)
