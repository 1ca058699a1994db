"""Pseudo-alignment chaining (Chainer2) and 2-mer chaining (Chainer3).

Faithful re-derivation of lib-chaining2.go:152-658 / lib-chaining3.go:111-299:
banded DP over dense anchors with score = prevScore + len(b) - gap, backward
band limited by BandBase/BandCount, plus the recursive region-splitting
backtrack that emits all disjoint chains (chainARegion).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .chaining import Anchors


@dataclass
class Chaining2Options:
    max_gap: int = 50
    min_score: int = 50
    min_align_len: int = 50
    min_identity: float = 70.0
    max_distance: int = 100
    band_count: int = 50
    band_base: int = 100
    heuristic_kmer_pident_threshold: float = 15.0


@dataclass
class Chain2Result:
    """(ref: Chain2Result, lib-chaining2.go:106-135)"""

    n_anchors: int = 0
    aligned_fraction: float = 0.0
    matched_bases: int = 0
    aligned_bases_q: int = 0
    aligned_bases_t: int = 0
    pident: float = 0.0
    aligned_length: int = 0
    gaps: int = 0
    qbegin: int = 0
    qend: int = 0
    tbegin: int = 0
    tend: int = 0
    max_ext_len: int = 0
    t_pos_offset_begin: int = 0
    cigar: bytes = b""
    qseq: bytes = b""
    tseq: bytes = b""
    alignment: bytes = b""
    score: int = 0
    bit_score: int = 0
    evalue: float = 0.0


def chain2(anchors: Anchors, opt: Chaining2Options):
    """Returns (chains, n_matched, n_aligned_q, n_aligned_t, qB, qE, tB, tE)
    or (None, 0, ...) — mirrors Chainer2.Chain (lib-chaining2.go:152-358)."""
    n = len(anchors)
    if n == 0:
        return None, 0, 0, 0, 0, 0, 0, 0
    if n == 1:
        slen = int(anchors.length[0])
        if slen >= opt.min_score and slen >= opt.min_align_len:
            qb, tb = int(anchors.qbegin[0]), int(anchors.tbegin[0])
            c = Chain2Result(
                n_anchors=1,
                qbegin=qb,
                qend=qb + slen - 1,
                tbegin=tb,
                tend=tb + slen - 1,
                matched_bases=slen,
                pident=100.0,
                aligned_bases_q=slen,
            )
            return [c], slen, slen, slen, c.qbegin, c.qend, c.tbegin, c.tend
        return None, 0, 0, 0, 0, 0, 0, 0

    qb = anchors.qbegin.astype(np.int64)
    tb = anchors.tbegin.astype(np.int64)
    ln = anchors.length.astype(np.int64)
    band_base = opt.band_base
    band_count = opt.band_count
    max_gap = float(opt.max_gap)

    from ..native import chain2_forward_native

    native = chain2_forward_native(qb, tb, ln, band_base, band_count, max_gap)
    if native is not None:
        max_scores, prev_idx = native
        Mi = int(np.argmax(max_scores))
        M = float(max_scores[Mi])
        # match the scalar loop's strict-> tie behavior: first maximum wins
        return _chain2_finish(anchors, max_scores, prev_idx, M, Mi, opt)

    max_scores = np.empty(n, dtype=np.float64)
    prev_idx = np.empty(n, dtype=np.int64)
    max_scores[0] = float(ln[0])
    prev_idx[0] = 0
    M = 0.0
    Mi = 0

    for i in range(1, n):
        aq, at, al = int(qb[i]), int(tb[i]), int(ln[i])
        m = float(al)
        mj = i

        js = np.arange(i - 1, -1, -1)
        bq = qb[js]
        bt = tb[js]
        bl = ln[js]
        skip = (bq == aq) | (bt > at)
        bcount = np.cumsum(~skip)
        bbase = aq - bq - bl
        stop = ~((bbase <= band_base) | (bcount <= band_count)) & ~skip
        if stop.any():
            last = int(np.argmax(stop))  # first True: break BEFORE scoring it?
        else:
            last = i
        # NOTE: the reference increments _bCount and computes _bBase before the
        # break test, and the break happens before scoring anchor j — but only
        # for non-skipped anchors (skipped ones 'continue' before the test).
        # So the scan covers js[:last] minus skipped, where js[last] is the
        # first non-skipped anchor failing the band test.
        window = js[:last]
        wskip = skip[:last]
        cand = window[~wskip]
        if cand.shape[0]:
            cq = qb[cand]
            ct = tb[cand]
            qd = np.abs(aq - cq)
            td = np.abs(at - ct)
            g = np.abs(qd - td).astype(np.float64)
            okg = g <= max_gap
            if okg.any():
                cc = cand[okg]
                s = max_scores[cc] + ln[cc].astype(np.float64) - g[okg]
                # descending-j scan, s >= m updates -> min j among max wins
                best = s.max()
                if best >= m:
                    m = best
                    mj = int(cc[s == best].min())
        max_scores[i] = m
        prev_idx[i] = mj
        if m > M:
            M, Mi = m, i

    return _chain2_finish(anchors, max_scores, prev_idx, M, Mi, opt)


def _chain2_finish(anchors, max_scores, prev_idx, M, Mi, opt: Chaining2Options):
    n = len(anchors)
    if M < opt.min_score:
        return None, 0, 0, 0, 0, 0, 0, 0

    from ..native import chain2_backtrack_native

    native = chain2_backtrack_native(
        anchors.qbegin.astype(np.int64), anchors.tbegin.astype(np.int64),
        anchors.length.astype(np.int64), max_scores, prev_idx,
        float(opt.min_score), opt.min_align_len,
        float(opt.heuristic_kmer_pident_threshold),
    )
    if native is not None:
        rows, pidents, totals = native
        if rows.shape[0] == 0:
            return None, 0, 0, 0, 0, 0, 0, 0
        paths = [
            Chain2Result(
                n_anchors=int(r[0]), aligned_bases_q=int(r[1]),
                aligned_bases_t=int(r[2]), matched_bases=int(r[3]),
                pident=float(p), qbegin=int(r[4]), qend=int(r[5]),
                tbegin=int(r[6]), tend=int(r[7]),
            )
            for r, p in zip(rows, pidents)
        ]
        qB = min(c.qbegin for c in paths)
        qE = max(c.qend for c in paths)
        tB = min(c.tbegin for c in paths)
        tE = max(c.tend for c in paths)
        return paths, int(totals[0]), int(totals[1]), int(totals[2]), qB, qE, tB, tE

    paths: list[Chain2Result] = []
    totals = {"matched": 0, "aligned_q": 0, "aligned_t": 0}
    _, qB, qE, tB, tE = _chain_a_region(
        anchors, max_scores, prev_idx, 0, n, opt, paths, totals, Mi
    )
    if not paths:
        return None, 0, 0, 0, 0, 0, 0, 0
    return (
        paths,
        totals["matched"],
        totals["aligned_q"],
        totals["aligned_t"],
        qB,
        qE,
        tB,
        tE,
    )


def _chain_a_region(
    anchors: Anchors,
    max_scores: np.ndarray,
    prev_idx: np.ndarray,
    lo: int,
    hi: int,
    opt: Chaining2Options,
    paths: list[Chain2Result],
    totals: dict,
    Mi0: int,
):
    """Mirrors chainARegion (lib-chaining2.go:360-658); indices are absolute,
    the region is [lo, hi)."""
    if hi <= lo:
        return 0.0, -1, -1, -1, -1
    if Mi0 < 0:
        seg = max_scores[lo:hi]
        Mi = int(np.argmax(seg)) + lo
        M = float(seg[Mi - lo])
        # Go picks the FIRST maximum (m > M strict); np.argmax does the same.
        if M < opt.min_score:
            return 0.0, -1, -1, -1, -1
    else:
        Mi = Mi0
        M = float(max_scores[Mi])

    qb_arr, tb_arr, ln_arr = anchors.qbegin, anchors.tbegin, anchors.length

    n_matched = 0
    n_aligned_q = 0
    n_aligned_t = 0
    i = Mi
    qb = tb = 1 << 60
    qe = te = -1
    first = True
    n_anchors = 0
    begin_of_next = 0
    j = i

    while True:
        j = int(prev_idx[i])
        if j < lo:
            j = -1  # the chain's predecessor lies outside this region
            break
        n_anchors += 1
        if first:
            first = False
            qe = int(qb_arr[i]) + int(ln_arr[i]) - 1
            te = int(tb_arr[i]) + int(ln_arr[i]) - 1
            qb, tb = int(qb_arr[i]), int(tb_arr[i])
            n_matched += int(ln_arr[i])
        else:
            qb, tb = int(qb_arr[i]), int(tb_arr[i])
            if int(qb_arr[i]) + int(ln_arr[i]) - 1 >= begin_of_next:
                n_matched += begin_of_next - int(qb_arr[i])
            else:
                n_matched += int(ln_arr[i])
        begin_of_next = int(qb_arr[i])

        if i == j:
            if first:
                break
            n_aligned_q += qe - qb + 1
            if n_aligned_q < opt.min_align_len:
                first = True
                break
            n_aligned_t += te - tb + 1
            pident = n_matched / max(n_aligned_q, n_aligned_t) * 100
            if pident < opt.heuristic_kmer_pident_threshold:
                first = True
                break
            pident = min(pident, 100.0)
            paths.append(
                Chain2Result(
                    n_anchors=n_anchors,
                    aligned_bases_q=n_aligned_q,
                    aligned_bases_t=n_aligned_t,
                    matched_bases=n_matched,
                    pident=pident,
                    qbegin=qb,
                    qend=qe,
                    tbegin=tb,
                    tend=te,
                )
            )
            totals["aligned_q"] += n_aligned_q
            totals["aligned_t"] += n_aligned_t
            totals["matched"] += n_matched
            first = True
            break
        i = j

    if j == -1 and n_anchors > 0:
        # chain continues into the previous region (lib-chaining2.go:534-569)
        n_aligned_q += qe - qb + 1
        n_aligned_t += te - tb + 1
        if n_aligned_q >= opt.min_align_len:
            pident = n_matched / max(n_aligned_q, n_aligned_t) * 100
            if pident >= opt.heuristic_kmer_pident_threshold:
                pident = min(pident, 100.0)
                paths.append(
                    Chain2Result(
                        n_anchors=n_anchors,
                        aligned_bases_q=n_aligned_q,
                        aligned_bases_t=n_aligned_t,
                        matched_bases=n_matched,
                        pident=pident,
                        qbegin=qb,
                        qend=qe,
                        tbegin=tb,
                        tend=te,
                    )
                )
                totals["aligned_q"] += n_aligned_q
                totals["aligned_t"] += n_aligned_t
                totals["matched"] += n_matched

    qB, qE_, tB, tE_ = qb, qe, tb, te

    # the unchecked region on the right
    if Mi != hi - 1:
        s, a, b, c, d = _chain_a_region(
            anchors, max_scores, prev_idx, Mi + 1, hi, opt, paths, totals, -1
        )
        if s > 0:
            qB, qE_, tB, tE_ = min(qB, a), max(qE_, b), min(tB, c), max(tE_, d)
    # the unchecked region on the left
    if i > lo:
        s, a, b, c, d = _chain_a_region(
            anchors, max_scores, prev_idx, lo, i, opt, paths, totals, -1
        )
        if s > 0:
            qB, qE_, tB, tE_ = min(qB, a), max(qE_, b), min(tB, c), max(tE_, d)

    return M, qB, qE_, tB, tE_


# --------------------------------------------------------------------------
# Chainer3: single best chain of tiny (2-mer) anchors, used by extendMatch


@dataclass
class Chaining3Options:
    max_gap: int = 5
    min_score: int = 1
    min_align_len: int = 2
    max_distance: int = 10
    band_count: int = 20
    band_base: int = 10


def chain3(anchors: Anchors, opt: Chaining3Options | None = None):
    """Single best chain (ref: Chainer3.Chain, lib-chaining3.go:111-299).
    Returns (qend, tend) of the best chain (0-based inclusive), or None."""
    if opt is None:
        opt = Chaining3Options()
    n = len(anchors)
    if n == 0:
        return None
    qb = anchors.qbegin.astype(np.int64)
    tb = anchors.tbegin.astype(np.int64)
    ln = anchors.length.astype(np.int64)

    def d0g0(i):
        # distance2(sub0, a) + gap2(sub0, a) for the zero anchor
        d = max(abs(int(qb[i])), abs(int(tb[i])))
        g = abs(abs(int(qb[i])) - abs(int(tb[i])))
        return d, g

    max_scores = np.empty(n, dtype=np.float64)
    prev_idx = np.empty(n, dtype=np.int64)
    d, g = d0g0(0)
    max_scores[0] = float(ln[0]) - d - g
    prev_idx[0] = 0
    M = 0.0
    Mi = 0
    if max_scores[0] > M:
        M, Mi = max_scores[0], 0

    for i in range(1, n):
        aq, at, al = int(qb[i]), int(tb[i]), int(ln[i])
        d, g = d0g0(i)
        m = float(al) - d - g
        mj = i
        bcount = 0
        j = i
        while True:
            j -= 1
            if j < 0:
                break
            bq2, bt2, bl2 = int(qb[j]), int(tb[j]), int(ln[j])
            if bq2 == aq or bt2 > at:
                continue
            bcount += 1
            bbase = aq - bq2 - bl2
            if not (bbase <= opt.band_base or bcount <= opt.band_count):
                break
            dd = max(abs(aq - bq2), abs(at - bt2))
            if dd > opt.max_distance:
                continue
            gg = abs(abs(aq - bq2) - abs(at - bt2))
            if gg > opt.max_gap:
                continue
            s = max_scores[j] + bl2 - dd - gg
            if s >= m:
                m = s
                mj = j
        max_scores[i] = m
        prev_idx[i] = mj
        if m > M:
            M, Mi = m, i

    if M < opt.min_score:
        return None

    # backtrack single chain
    i = Mi
    qb_b = tb_b = 1 << 60
    qe = te = -1
    first = True
    n_matched = 0
    begin_of_next = 0
    while True:
        j = int(prev_idx[i])
        if j < 0:
            break
        if first:
            first = False
            qe = int(qb[i]) + int(ln[i]) - 1
            te = int(tb[i]) + int(ln[i]) - 1
            qb_b, tb_b = int(qb[i]), int(tb[i])
            n_matched += int(ln[i])
        else:
            qb_b, tb_b = int(qb[i]), int(tb[i])
            if int(qb[i]) + int(ln[i]) - 1 >= begin_of_next:
                n_matched += begin_of_next - int(qb[i])
            else:
                n_matched += int(ln[i])
        begin_of_next = int(qb[i])
        if i == j:
            if first:
                break
            n_aligned_q = qe - qb_b + 1
            if n_aligned_q < opt.min_align_len:
                return None
            n_aligned_t = te - tb_b + 1
            pident = n_matched / max(n_aligned_q, n_aligned_t) * 100
            if pident < 15:
                return None
            return (qe, te)
        i = j
    return None
