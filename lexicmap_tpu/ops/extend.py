"""HSP boundary extension via 2-mer chaining
(ref: extendMatch/_extendRight, lib-index-search-util.go:34-200)."""

from __future__ import annotations

import numpy as np

from .chaining import Anchors
from .chaining2 import chain3


def _extend_right(s1: np.ndarray, s2: np.ndarray) -> tuple[int, int]:
    """2-mer match + single-chain extension (ref: _extendRight,
    lib-index-search-util.go:98-200).  Returns (ext1, ext2)."""
    n1 = s1.shape[0] - 1
    n2 = s2.shape[0] - 1
    if n1 <= 0 or n2 <= 0:
        return 0, 0
    k1 = (s1[:-1].astype(np.int64) << 2) | s1[1:].astype(np.int64)
    k2 = (s2[:-1].astype(np.int64) << 2) | s2[1:].astype(np.int64)
    # join on 2-mer value: for each position j in s2, all positions i in s1
    # with the same 2-mer -> anchor (QBegin=i, TBegin=j, Len=2)
    order1 = np.argsort(k1, kind="stable")
    sk1 = k1[order1]
    lo = np.searchsorted(sk1, k2, side="left")
    hi = np.searchsorted(sk1, k2, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return 0, 0
    out_off = np.zeros(n2 + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    idx = np.arange(total, dtype=np.int64)
    seg = np.searchsorted(out_off[1:], idx, side="right")
    q_idx = order1[lo[seg] + (idx - out_off[seg])]
    t_idx = seg
    z = np.zeros(total, dtype=bool)
    a = Anchors(q_idx, t_idx, np.full(total, 2, dtype=np.int32), z, z)
    # sort (QBegin asc, QEnd desc, TBegin asc) (ref: lib-index-search-util.go:172)
    a = a.sort_for_chaining()

    from ..native import chain3_native

    nres = chain3_native(a.qbegin, a.tbegin, a.length)
    if nres is not None:
        ok, qt = nres
        if not ok:
            return 0, 0
        return qt[0] + 1, qt[1] + 1

    res = chain3(a)
    if res is None:
        return 0, 0
    qe, te = res
    return qe + 1, te + 1


def extend_match(
    seq1: np.ndarray,
    seq2: np.ndarray,
    start1: int,
    end1: int,
    start2: int,
    end2: int,
    ext_len: int,
    t_begin: int,
    max_ext_len: int,
    rc: bool,
):
    """Greedy 2-mer extension of an aligned region on both flanks
    (ref: extendMatch, lib-index-search-util.go:34-96).

    seq1/seq2 are full 2-bit code arrays; [start, end) are half-open bounds.
    Returns (q_slice, t_slice, s1, e1, s2, e2): the extended subsequences and
    the per-side extension lengths.
    """
    m = 2
    _start1, _end1, _start2, _end2 = start1, end1, start2, end2
    _s1 = _e1 = _s2 = _e2 = 0

    # 3' (right)
    if end1 + m < seq1.shape[0] and end2 + m < seq2.shape[0]:
        _ext = min(ext_len, t_begin) if rc else min(ext_len, max_ext_len)
        if _ext > 2:
            e1b = min(end1 + _ext, seq1.shape[0])
            e2b = min(end2 + _ext, seq2.shape[0])
            _e1, _e2 = _extend_right(seq1[end1:e1b], seq2[end2:e2b])
            if _e1 > 0 or _e2 > 0:
                end1 += _e1
                end2 += _e2

    # 5' (left)
    if start1 > m and start2 > m:
        _ext = min(ext_len, max_ext_len) if rc else min(ext_len, t_begin)
        if _ext > 2:
            s1b = max(start1 - _ext, 0)
            s2b = max(start2 - _ext, 0)
            _s1, _s2 = _extend_right(seq1[s1b:start1][::-1], seq2[s2b:start2][::-1])
            if _s1 > 0 or _s2 > 0:
                start1 -= _s1
                start2 -= _s2

    if start1 < 0 or start2 < 0:
        start1, start2 = _start1, _start2
    if end1 > seq1.shape[0] or end2 > seq2.shape[0]:
        end1, end2 = _end1, _end2

    return seq1[start1:end1], seq2[start2:end2], _s1, _e1, _s2, _e2
