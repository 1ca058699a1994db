"""Phase-1 seed chaining (Chainer): sparse DP over per-genome anchors.

Faithful re-derivation of lib-chaining.go:122-667 with the scoring formulas
kept bit-compatible (float32 arithmetic, same operation order):

    seedWeight(l) = 0.1 * l * l                      (lib-chaining.go:635)
    gapScore(g)   = 0.1*g + 0.5*log2(g), 0 for g=0   (lib-chaining.go:662)
    direction     = sign(a.TBegin - b.TBegin)        (lib-chaining.go:647)

Predecessor candidates are anchors with |TBegin diff| <= maxDistance and
QBegin diff <= maxDistance (the reference uses a RangeIndex over TBegin;
here the filter is evaluated vectorized per anchor).  Scan order semantics
(descending j, strict improvement) are preserved so tie-breaking matches.

Anchors must arrive sorted by (QBegin asc, QEnd desc, TBegin asc) — the
order produced by ClearSubstrPairs (ref: lib-index-search.go:827).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ChainingOptions:
    max_gap: float = 5000.0
    min_score: float = 40.0
    max_distance: float = 10000.0
    top_chains: int = -1  # <=0: unlimited


def seed_weight(l):
    return np.float32(0.1) * np.float32(l) * np.float32(l)


def _gap_score_vec(g: np.ndarray) -> np.ndarray:
    out = np.zeros_like(g, dtype=np.float32)
    nz = g > 0
    gg = g[nz].astype(np.float64)
    out[nz] = (np.float32(0.1) * g[nz]) + (
        np.float32(0.5) * np.log2(gg).astype(np.float32)
    )
    return out


class Anchors:
    """Struct-of-arrays anchor set (ref: SubstrPair, lib-index-search.go:768)."""

    __slots__ = ("qbegin", "tbegin", "length", "qrc", "trc")

    def __init__(self, qbegin, tbegin, length, qrc, trc):
        self.qbegin = np.asarray(qbegin, dtype=np.int32)
        self.tbegin = np.asarray(tbegin, dtype=np.int32)
        self.length = np.asarray(length, dtype=np.int32)
        self.qrc = np.asarray(qrc, dtype=bool)
        self.trc = np.asarray(trc, dtype=bool)

    def __len__(self):
        return int(self.qbegin.shape[0])

    def take(self, idx) -> "Anchors":
        return Anchors(
            self.qbegin[idx], self.tbegin[idx], self.length[idx], self.qrc[idx], self.trc[idx]
        )

    def qend(self):  # exclusive-end helper: QBegin + Len
        return self.qbegin + self.length

    def sort_for_chaining(self) -> "Anchors":
        """Sort by (QBegin asc, QEnd desc, TBegin asc); ref ClearSubstrPairs."""
        order = np.lexsort((self.tbegin, -(self.qbegin + self.length), self.qbegin))
        return self.take(order)


def chain(anchors: Anchors, opt: ChainingOptions) -> tuple[list[np.ndarray], np.float32]:
    """Returns (chains as lists of anchor indices, score of the best chain).

    Mirrors Chainer.Chain (lib-chaining.go:122-633).
    """
    n = len(anchors)
    min_score = np.float32(opt.min_score)
    if n == 0:
        return [], np.float32(0)
    if n == 1:
        w = seed_weight(anchors.length[0])
        if w >= min_score:
            return [np.array([0], dtype=np.int32)], w
        return [], w

    qb = anchors.qbegin
    tb = anchors.tbegin
    ln = anchors.length
    max_gap = np.float32(opt.max_gap)
    max_dist = np.int32(opt.max_distance)

    from ..native import chain1_forward_native

    native = chain1_forward_native(
        qb, tb, ln, float(opt.max_gap), float(min_score), int(opt.max_distance)
    )
    if native is not None:
        max_scores, prev_idx, directions = native
        return _chain_backtrack(max_scores, prev_idx, directions, min_score, opt)

    max_scores = np.empty(n, dtype=np.float32)
    prev_idx = np.empty(n, dtype=np.int64)
    directions = np.zeros(n, dtype=np.int8)

    max_scores[0] = seed_weight(ln[0])
    prev_idx[0] = 0

    for i in range(1, n):
        aq = qb[i]
        at = tb[i]
        al = ln[i]
        m0 = seed_weight(al)

        j_arr = np.arange(i)
        td = at - tb[:i]
        qd = aq - qb[:i]
        cand = (
            (np.abs(td) <= max_dist)
            & (td != 0)
            & (qd != 0)
            & (qd <= max_dist)
        )
        if not cand.any():
            max_scores[i] = m0
            prev_idx[i] = i
            directions[i] = 0
            continue

        j_arr = j_arr[cand]
        bq = qb[j_arr]
        bt = tb[j_arr]
        bl = ln[j_arr]
        tdj = np.abs(at - bt).astype(np.float64)
        qdj = np.abs(aq - bq).astype(np.float64)
        # gap: direction-dependent (lib-chaining.go:655-660)
        fwd_dir = at >= bt
        alt = np.abs(np.abs(aq - bq) - np.abs((at + al) - (bt + bl))).astype(np.float64)
        g64 = np.where(fwd_dir, np.abs(qdj - tdj), alt)
        g = g64.astype(np.float32)
        ok_gap = g <= max_gap
        if not ok_gap.any():
            max_scores[i] = m0
            prev_idx[i] = i
            directions[i] = 0
            continue
        j_arr = j_arr[ok_gap]
        bq = bq[ok_gap]
        bt = bt[ok_gap]
        bl = bl[ok_gap]
        g = g[ok_gap]

        # effective seed length (lib-chaining.go:429-446)
        bqe = bq + bl
        no_overlap = aq > bqe
        length = np.where(no_overlap, al, np.where(g == 0, aq + al - bq, aq + al - bqe))
        w = np.where(
            no_overlap | (g != 0),
            seed_weight(length.astype(np.float32)),
            -seed_weight(bl.astype(np.float32)) + seed_weight(length.astype(np.float32)),
        ).astype(np.float32)

        dirs = np.where(at >= bt, np.int8(1), np.int8(-1))
        same_dir = (directions[j_arr] == 0) | (directions[j_arr] == dirs)
        base = np.where(same_dir, max_scores[j_arr], seed_weight(ln[j_arr].astype(np.float32)))
        s = (base.astype(np.float32) + w) - _gap_score_vec(g)

        valid = (s >= min_score) & (s > m0)
        if valid.any():
            sv = np.where(valid, s, np.float32(-np.inf))
            best = sv.max()
            # descending-j scan with strict improvement: largest j among ties
            pick = j_arr[sv == best].max()
            pos = np.nonzero(j_arr == pick)[0][0]
            max_scores[i] = best
            prev_idx[i] = pick
            directions[i] = dirs[pos]
        else:
            max_scores[i] = m0
            prev_idx[i] = i
            directions[i] = 0

    return _chain_backtrack(max_scores, prev_idx, directions, min_score, opt)


def _chain_backtrack(max_scores, prev_idx, directions, min_score, opt: ChainingOptions):
    n = max_scores.shape[0]
    # backtrack (lib-chaining.go:490-629)
    visited = np.zeros(n, dtype=bool)
    # sort by (score bits, index) ascending like the packed uint64 sort
    score_bits = max_scores.view(np.uint32).astype(np.uint64)
    packed = (score_bits << np.uint64(32)) | np.arange(n, dtype=np.uint64)
    order = np.argsort(packed)[::-1]  # descending

    paths: list[np.ndarray] = []
    max_score = np.float32(0)
    first = True
    top_chains = opt.top_chains
    n_checked = 0
    oi = 0
    while True:
        n_checked += 1
        if top_chains > 0 and n_checked > top_chains:
            break
        M = np.float32(0)
        Mi = -1
        while oi < n:
            cand_i = int(order[oi])
            if not visited[cand_i]:
                M = max_scores[cand_i]
                Mi = cand_i
                oi += 1
                break
            oi += 1
        if Mi < 0 or M < min_score:
            break
        if first:
            max_score = M
            first = False
        path: list[int] = []
        i = Mi
        while True:
            j = int(prev_idx[i])
            change_dir = i != j and directions[j] != 0 and directions[i] != directions[j]
            if visited[j] and not change_dir:
                path = []
                visited[i] = True
                break
            path.append(i)
            visited[i] = True
            if i == j or change_dir:
                if change_dir:
                    path.append(j)
                path.reverse()
                paths.append(np.array(path, dtype=np.int32))
                break
            i = j
    return paths, max_score


def clear_substr_pairs(anchors: Anchors, k: int) -> Anchors:
    """Remove duplicated and nested anchors (ref: ClearSubstrPairs,
    lib-index-search.go:826-953).  Returns anchors sorted by
    (QBegin asc, QEnd desc, TBegin asc) with nested ones dropped."""
    n = len(anchors)
    if n <= 1:
        return anchors.sort_for_chaining() if n else anchors
    a = anchors.sort_for_chaining()

    from ..native import clear_mark_native

    drop = clear_mark_native(a.qbegin, a.tbegin, a.length, k)
    if drop is None:
        qb = a.qbegin
        qe = a.qbegin + a.length  # exclusive end ~ QBegin+Len
        tb = a.tbegin
        te = a.tbegin + a.length
        drop = np.zeros(n, dtype=bool)
        for i in range(1, n):
            upbound = max(int(qe[i]) - k, 0)
            start = int(np.searchsorted(qb[: i + 1], upbound, side="left"))
            for j in range(start, i):
                if qe[i] <= qe[j] and tb[i] >= tb[j] and te[i] <= te[j]:
                    drop[i] = True
                    break
    if drop.any():
        return a.take(~drop)
    return a


def trim_substr_pairs(anchors: Anchors, k: int, min_dist: float = 100.0) -> Anchors:
    """Trim tandem-repeat artifacts at either end (ref: TrimSubStrPairs,
    lib-seq_compare.go:553-621)."""
    n = len(anchors)
    if n < 2:
        return anchors

    qb, tb, ln = anchors.qbegin, anchors.tbegin, anchors.length

    def dist(i, j):  # distance(p, _p)
        return max(abs(int(qb[i]) - int(qb[j])), abs(int(tb[i]) - int(tb[j])))

    def gap2(i, j):
        return abs(abs(int(qb[i]) - int(qb[j])) - abs(int(tb[i]) - int(tb[j])))

    def overlap(i, j):  # i in front of j
        qo = to = 0
        if qb[j] >= qb[i] and qb[j] <= qb[i] + ln[i]:
            qo = int(qb[i]) + int(ln[i]) - int(qb[j]) + 1
        if tb[j] >= tb[i] and tb[j] <= tb[i] + ln[i]:
            to = int(tb[i]) + int(ln[i]) - int(tb[j]) + 1
        return max(qo, to)

    # head
    prev = 0
    start = 0
    for i in range(1, n):
        if dist(i, prev) < min_dist and (
            (qb[i] == qb[prev] or tb[i] == tb[prev])
            or (gap2(prev, i) > 11 and overlap(prev, i) / int(ln[prev]) > 0.8)
        ):
            start = i - 1  # matches ref: start = index within subs[1:]
            prev = i
            continue
        break
    # tail
    prev = n - 1
    end = n - 1
    for i in range(n - 2, -1, -1):
        if dist(i, prev) < min_dist and (
            (qb[i] == qb[prev] or tb[i] == tb[prev])
            or (gap2(i, prev) > 11 and overlap(i, prev) / int(ln[prev]) > 0.8)
        ):
            end = i
            prev = i
            continue
        break

    if start == 0 and end == n:
        return anchors
    if start >= end:
        return anchors.take(np.zeros(0, dtype=np.int64))
    return anchors.take(np.arange(start, end + 1))
