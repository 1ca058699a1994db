"""Base-level global alignment (gap-affine) with CIGAR traceback.

Role of shenwei356/wfa in the reference (ref: lib-index-search.go:1867-1868,
2218): global gap-affine alignment of the extended query/target windows with
penalties {match 0, mismatch 4, gap-open 6, gap-ext 2}; the alignment result
feeds pident/gaps and the BLAST-style scoring.

This implementation is a banded Gotoh DP (same optimum as WFA for the same
penalties) with a rigorous band-growing loop: a result is accepted only when
its cost is <= gap_open + band_extra*gap_ext (no path leaving the band can
beat it) or the band covers the whole matrix.  Rows are computed vectorized;
the in-row horizontal-gap recurrence is resolved with a prefix-min scan.
The diagonal-wavefront TPU kernel lives in ops/align_jax.py.

Ops convention (SAM-like, equal to what the reference prints after its D/I
swap, ref: lib-index-search.go:2284-2297):
    'M' match, 'X' mismatch, 'I' consumes query only, 'D' consumes target only
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

INF = np.int64(1) << np.int64(55)

# Optional lexicographic objective (cost, -matches): penalties are scaled by
# _SCALE and each match column contributes _MATCH_BONUS.  With bonus 0 the
# traceback prefers diagonal steps, which empirically matches the reference's
# WFA output on MORE demo rows than globally maximizing matches (the WFA path
# is furthest-reaching-greedy, i.e. between the two extremes).  Exact parity
# needs a true WFA forward pass; see ops/align_wfa.py.
_SCALE = np.int64(1) << np.int64(21)
_MATCH_BONUS = np.int64(0)


@dataclass
class AlignmentResult:
    """Mirror of wfa.AlignmentResult as consumed by the search pipeline.

    qbegin/qend/tbegin/tend are 1-based and refer to the match-trimmed region
    (first 'M' run .. last 'M' run), like the reference's cigar.QBegin etc.
    """

    ops: list[tuple[str, int]]  # full (untrimmed) run-length ops
    cost: int
    qlen: int
    tlen: int
    qbegin: int = 0
    qend: int = 0
    tbegin: int = 0
    tend: int = 0
    align_len: int = 0  # columns in the trimmed region
    matches: int = 0
    gaps: int = 0  # gap BASES in the trimmed region

    def trimmed_ops(self) -> list[tuple[str, int]]:
        return trim_ops(self.ops)


def trim_ops(ops: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Keep only the region bounded by the first and last match run
    (ref: trimOps, lib-index-search-util.go:238-257)."""
    start = end = -1
    for i, (op, _n) in enumerate(ops):
        if op == "M":
            start = i
            break
    for i in range(len(ops) - 1, -1, -1):
        if ops[i][0] == "M":
            end = i
            break
    if start < 0:
        return []
    return ops[start : end + 1]


def align(
    q: np.ndarray,
    t: np.ndarray,
    mismatch: int = 4,
    gap_open: int = 6,
    gap_ext: int = 2,
    band_extra: int = 64,
) -> AlignmentResult:
    """Global gap-affine alignment of 2-bit code arrays q and t."""
    n = int(q.shape[0])
    m = int(t.shape[0])
    if n == 0 or m == 0:
        ops: list[tuple[str, int]] = []
        cost = 0
        if n:
            ops.append(("I", n))
            cost += gap_open + gap_ext * n
        if m:
            ops.append(("D", m))
            cost += gap_open + gap_ext * m
        return _finalize(ops, cost, n, m)

    extra = band_extra
    maxdim = max(n, m)
    while True:
        out = _align_banded(q, t, mismatch, gap_open, gap_ext, extra)
        full_band = extra >= maxdim
        if out is not None:
            ops = out
            cost = _ops_cost(ops, mismatch, gap_open, gap_ext)
            if cost <= gap_open + gap_ext * extra or full_band:
                return _finalize(ops, cost, n, m)
        if full_band:
            # should not happen: full band always yields a result
            raise RuntimeError("alignment failed with full band")
        extra *= 2


def _ops_cost(ops: list[tuple[str, int]], x: int, o: int, e: int) -> int:
    c = 0
    for op, n in ops:
        if op == "X":
            c += n * x
        elif op in ("I", "D"):
            c += o + n * e
    return c


def _align_banded(q, t, x, o, e, extra):
    n = int(q.shape[0])
    m = int(t.shape[0])
    dlo = min(0, m - n) - extra
    dhi = max(0, m - n) + extra
    B = dhi - dlo + 1

    # scaled penalties with -1 per match column (see _SCALE above)
    x = np.int64(x) * _SCALE
    o = np.int64(o) * _SCALE
    e = np.int64(e) * _SCALE

    M = np.full((n + 1, B), INF, dtype=np.int64)
    Q = np.full((n + 1, B), INF, dtype=np.int64)  # gap consuming query ('I')
    T = np.full((n + 1, B), INF, dtype=np.int64)  # gap consuming target ('D')

    qq = q.astype(np.int64)
    tt = t.astype(np.int64)

    for i in range(0, n + 1):
        jlo = max(0, i + dlo)
        jhi = min(m, i + dhi)
        if jlo > jhi:
            return None
        js = np.arange(jlo, jhi + 1)
        od = js - i - dlo

        if i == 0:
            M[0, -dlo] = 0  # (0,0)
        else:
            # M[i,j] from H[i-1,j-1]: banded offset identical
            prevH = np.minimum(np.minimum(M[i - 1], Q[i - 1]), T[i - 1])
            diag = prevH[od]
            valid = js >= 1
            sub = np.where(
                valid,
                np.where(tt[np.maximum(js - 1, 0)] == qq[i - 1], _MATCH_BONUS, x),
                INF,
            )
            M[i, od] = np.where(valid & (diag < INF), diag + sub, INF)

            # Q[i,j] from row i-1 same j: offset od+1
            up = od + 1
            okup = up < B
            upM = np.where(okup, M[i - 1, np.minimum(up, B - 1)], INF)
            upQ = np.where(okup, Q[i - 1, np.minimum(up, B - 1)], INF)
            upT = np.where(okup, T[i - 1, np.minimum(up, B - 1)], INF)
            upH = np.minimum(np.minimum(upM, upT), upQ)
            open_c = np.where(upH < INF, upH + o + e, INF)
            ext_c = np.where(upQ < INF, upQ + e, INF)
            Q[i, od] = np.minimum(open_c, ext_c)

        # T[i,j] within the row: prefix-min scan over openings from min(M,Q)
        width = js.shape[0]
        if width > 0:
            mq = np.minimum(M[i, od], Q[i, od])
            # T[i,j] = min_{k<j} (mq[i,k] + o + e*(j-k))
            #        = prefix-min(mq[k] - e*k) + o + e*j
            adj = np.where(mq < INF, mq - e * js, INF)
            run = np.minimum.accumulate(adj)
            tvals = np.full(width, INF, dtype=np.int64)
            if width > 1:
                tvals[1:] = np.where(
                    run[:-1] < INF // 2, run[:-1] + o + e * js[1:], INF
                )
            T[i, od] = tvals

    end_off = m - n - dlo
    final = np.array([M[n, end_off], Q[n, end_off], T[n, end_off]])
    state = int(np.argmin(final))  # tie order: M, Q, T
    if final[state] >= INF:
        return None

    # ---- traceback (cost-based; prefer extend over open, M over gaps) ----
    ops_rev: list[str] = []
    i, j = n, m
    while i > 0 or j > 0:
        off = j - i - dlo
        if state == 0:
            ops_rev.append("M" if q[i - 1] == t[j - 1] else "X")
            i -= 1
            j -= 1
            offp = j - i - dlo
            vals = (M[i, offp], Q[i, offp], T[i, offp])
            state = int(np.argmin(vals))
        elif state == 1:  # gap consuming query -> 'I'
            ops_rev.append("I")
            cur = Q[i, off]
            up = off + 1
            i -= 1
            if up < B and Q[i, up] + e == cur:
                state = 1
            else:
                offp = j - i - dlo
                vals = (M[i, offp], INF, T[i, offp])
                state = int(np.argmin(vals))
        else:  # gap consuming target -> 'D'
            ops_rev.append("D")
            cur = T[i, off]
            j -= 1
            offp = j - i - dlo
            if offp >= 0 and T[i, offp] + e == cur:
                state = 2
            else:
                vals = (M[i, offp], Q[i, offp], INF)
                state = int(np.argmin(vals))
        if i == 0 and j > 0:
            state = 2
        elif j == 0 and i > 0:
            state = 1

    # run-length encode
    ops: list[tuple[str, int]] = []
    for opch in reversed(ops_rev):
        if ops and ops[-1][0] == opch:
            ops[-1] = (opch, ops[-1][1] + 1)
        else:
            ops.append((opch, 1))
    return ops


def _finalize(ops: list[tuple[str, int]], cost: int, qlen: int, tlen: int) -> AlignmentResult:
    res = AlignmentResult(ops=ops, cost=cost, qlen=qlen, tlen=tlen)
    trimmed = trim_ops(ops)
    if not trimmed:
        return res
    # query/target consumed before the trimmed region
    qpre = tpre = 0
    first_m = last_m = -1
    for idx, (op, cnt) in enumerate(ops):
        if op == "M":
            if first_m < 0:
                first_m = idx
            last_m = idx
    qpos = tpos = 0
    for idx, (op, cnt) in enumerate(ops):
        if idx == first_m:
            qpre, tpre = qpos, tpos
        if op in ("M", "X", "I"):
            qpos += cnt
        if op in ("M", "X", "D"):
            tpos += cnt
        if idx == last_m:
            res.qend = qpos
            res.tend = tpos
            break
    res.qbegin = qpre + 1
    res.tbegin = tpre + 1
    align_len = matches = gaps = 0
    for op, cnt in trimmed:
        align_len += cnt
        if op == "M":
            matches += cnt
        elif op in ("I", "D"):
            gaps += cnt
    res.align_len = align_len
    res.matches = matches
    res.gaps = gaps
    return res


# --------------------------------------------------------------------------
# BLAST-like score / e-value (ref: scoreAndEvalue, lib-index-search-util.go:259)


def score_and_evalue(
    trimmed: list[tuple[str, int]],
    qlen: int,
    total_bases: int,
    match: int = 2,
    mismatch: int = -3,
    gap_open: int = 5,
    gap_ext: int = 2,
    lam: float = 0.625,
    kk: float = 0.41,
) -> tuple[int, int, float]:
    """Returns (raw score, bit score, e-value)."""
    import math

    if not trimmed:
        return 0, 0, float("inf")
    score = 0
    for op, n in trimmed:
        if op == "M":
            score += n * match
        elif op == "X":
            score += n * mismatch
        elif op in ("I", "D", "H"):
            score -= gap_open + n * gap_ext
    bits, evalue = score_to_bit_evalue(score, qlen, total_bases, lam, kk)
    return score, bits, evalue


def score_to_bit_evalue(
    score: int, qlen: int, total_bases: int, lam: float = 0.625, kk: float = 0.41
) -> tuple[int, float]:
    """(bit score, e-value) from a raw score (shared by the tuple-based and
    native-stats paths; ref: scoreAndEvalue, lib-index-search-util.go:259)."""
    import math

    s = score
    # any odd score is rounded down before the e-value (NCBI BLAST behavior)
    if s & 1 == 1:
        s -= 1
    bit_score = (lam * s - math.log(kk)) / math.log(2)
    evalue = float(total_bases) * math.pow(2.0, -bit_score) * qlen
    return int(bit_score), evalue


def alignment_text(
    ops: list[tuple[str, int]], q: bytes, t: bytes
) -> tuple[bytes, bytes, bytes]:
    """ASCII alignment rows (query, match line, target) over the given ops.

    Equivalent of wfa AlignmentText as used for -a output
    (ref: lib-index-search.go:2299)."""
    qrow = bytearray()
    arow = bytearray()
    trow = bytearray()
    qi = ti = 0
    for op, n in ops:
        for _ in range(n):
            if op in ("M", "X"):
                qrow.append(q[qi])
                trow.append(t[ti])
                arow.append(ord("|") if op == "M" else ord(" "))
                qi += 1
                ti += 1
            elif op == "I":
                qrow.append(q[qi])
                trow.append(ord("-"))
                arow.append(ord(" "))
                qi += 1
            else:  # D
                qrow.append(ord("-"))
                trow.append(t[ti])
                arow.append(ord(" "))
                ti += 1
    return bytes(qrow), bytes(arow), bytes(trow)
