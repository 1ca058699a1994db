"""Device (TPU) pseudo-alignment of candidate windows: the SeqComparator
probe -> anchor sort -> nested-anchor dedup -> tandem trim -> Chainer2
forward DP -> region-splitting backtrack, for a whole BATCH of windows in a
handful of device dispatches.

This replaces the per-window host calls ``compare_prepare_native`` +
``chain2_backtrack_native`` (the dominant host cost of phase 4,
~40 ms/query on the demo) with batched device execution.  Results are
bit-identical to the host path: all scoring is integer, the reference's
float comparisons are replaced by exact rational integer comparisons, and
every heuristic band/break rule of the host code is replicated
(ref: lib-seq_compare.go:335-521, lib-chaining2.go:152-658;
native/core.cpp compare_prepare / chain2_forward / c2_region).

TPU-first design notes:
  - NO per-element gathers (TPU has no hardware gather): the probe is a
    sort-join.  Query-table entries and target-window k-mers are tagged and
    sorted together by their 22-bit prefix (= the m=11-base minimum-prefix
    requirement) with ``lax.sort`` carrying payload operands; the matching
    query k-mer is then propagated to each target lane by a segmented
    doubling scan (log-steps of shift+select), forming anchors in place.
  - k-mers are built from window codes with shift-compose (log doubling),
    not per-position loops.
  - all 64-bit k-mers live as (hi, lo) uint32 pairs: TPUs have no native
    int64, and 2-key ``lax.sort`` gives the same ordering.
  - anchors are ENCODED IN THE SORT KEYS (qb, qe, tb, rc fit in 2x u32), so
    the anchor sort needs no payload and doubles as compaction (invalid
    lanes sort to the end).
  - the banded DP runs one anchor per step (sequential dependency), but is
    vectorized over all windows of a size bucket and over a fixed
    predecessor window D; the reference's data-dependent break rules are
    evaluated as masks.  Windows whose scan provably needs more than D
    predecessors are flagged and re-run on the host (exactness by
    detection, not by hope).
  - the recursive backtrack becomes an explicit per-window region stack in
    a lockstep while_loop.

Per-window host fallbacks (flag bits) keep parity unconditional: window
longer than L_PAD, query longer than QLEN_CAP, >A_CAP anchors, dedup/DP
window overflow, >C_CAP chains, region-stack overflow, or a query k-mer
22-bit prefix shared by THREE or more entries (the segmented fill carries
two query candidates per prefix run, so J<=2 — the common birthday-pair
case for ~kb-scale queries — stays on device; see scripts/phase4_stats.py).
"""

from __future__ import annotations

import numpy as np

K = 31  # SeqComparator k (constants.CMP_K; ref: lib-seq_compare.go:117)
M_PREFIX = 11  # minimum prefix (CMP_MIN_PREFIX); windows needing m>11 -> host

QLEN_CAP = 2048  # max query length on device (qb/qe fit 13-bit key fields)
QK_PAD = 4096  # max query-table entries = 2*(QLEN_CAP-K+1) padded
L_PAD = 4096  # max window length on device
N_REC = QK_PAD + 2 * L_PAD  # union records per window
A_CAP = 3072  # max anchors per window after the probe
D_DEDUP = 256  # nested-anchor check window (overflow detected exactly)
D_DP = 256  # DP predecessor window (overflow detected exactly)
C_CAP = 16  # max chains per window
S_CAP = 24  # region stack depth
INVALID_KEY = np.uint32(0x00FFFFFF)  # > any (prefix22<<1|tag)
INV32 = np.uint32(0xFFFFFFFF)
BIG = 1 << 20

# flags (bitmask) returned per window; nonzero -> host fallback
F_ANCHOR_OVERFLOW = 1
F_MULTI_PREFIX = 2
F_DEDUP_OVERFLOW = 4
F_DP_OVERFLOW = 8
F_CHAIN_OVERFLOW = 16
F_STACK_OVERFLOW = 32


def _get_jnp():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ---------------------------------------------------------------------------
# host-side packing helpers


def pack_codes_2bit(codes: np.ndarray, pad_to: int) -> np.ndarray:
    """[L] uint8 codes -> [pad_to//16] uint32, base i at bits 2*(i%16)."""
    buf = np.zeros(pad_to, dtype=np.uint32)
    buf[: codes.shape[0]] = codes
    buf = buf.reshape(-1, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return np.bitwise_or.reduce(buf << shifts, axis=1).astype(np.uint32)


def build_query_table(qk: np.ndarray, qv: np.ndarray):
    """Split the sorted u64 query k-mer table into device halves.

    Returns (kh [QK_PAD] u32, kl [QK_PAD] u32, v [QK_PAD] u32, n, multi)
    where multi=True if any 22-bit prefix is shared by >=2 entries (device
    pairing handles only J=1; such queries run on the host wholesale).
    """
    n = qk.shape[0]
    kh = np.full(QK_PAD, INV32, dtype=np.uint32)
    kl = np.full(QK_PAD, INV32, dtype=np.uint32)
    v = np.zeros(QK_PAD, dtype=np.uint32)
    if n > QK_PAD:
        return kh, kl, v, n, True
    kh[:n] = (qk >> np.uint64(32)).astype(np.uint32)
    kl[:n] = (qk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    v[:n] = qv
    pref = (qk >> np.uint64(2 * K - 22)).astype(np.uint32)
    # the device fill pairs each target lane with up to TWO query entries
    # per 22-bit prefix (J<=2); only >=3-way prefix collisions go to host
    multi = bool(n > 2 and (pref[2:] == pref[:-2]).any())
    return kh, kl, v, n, multi


# ---------------------------------------------------------------------------
# device helpers


def _shift_left(x, d, fill):
    """out[:, i] = x[:, i+d]; right-pad with fill."""
    _, jnp = _get_jnp()
    return jnp.pad(x[:, d:], ((0, 0), (0, d)), constant_values=fill)


def _shift_right(x, d, fill):
    """out[:, i] = x[:, i-d]; left-pad with fill."""
    _, jnp = _get_jnp()
    return jnp.pad(x[:, :-d], ((0, 0), (d, 0)), constant_values=fill)


def _shift_right_dyn(x, d, fill):
    """_shift_right with a traced shift amount."""
    jax, jnp = _get_jnp()
    A = x.shape[1]
    padded = jnp.concatenate([jnp.full_like(x, fill), x], axis=1)
    return jax.lax.dynamic_slice_in_dim(padded, A - d, A, axis=1)


def _window_kmers(codes):
    """codes [W, L_PAD] uint32 (values 0..3) -> per-position k-mer halves.

    Forward k-mer at pos i = bases i..i+30 MSB-first: hi 30 bits = bases
    i..i+14, lo 32 bits = bases i+15..i+30.  Reverse complement likewise
    (ref: native/core.cpp compare_probe_codes rolling window).
    """
    _, jnp = _get_jnp()
    w = codes
    d = 1
    for shift_bits in (2, 4, 8, 16):
        w = (w << jnp.uint32(shift_bits)) | _shift_left(w, d, jnp.uint32(0))
        d *= 2
    w16 = w  # bases i..i+15, MSB-first
    flo = _shift_left(w16, 15, jnp.uint32(0))
    fhi = w16 >> jnp.uint32(2)
    r = jnp.uint32(3) - codes
    d = 1
    for shift_bits in (2, 4, 8, 16):
        r = r | (_shift_left(r, d, jnp.uint32(0)) << jnp.uint32(shift_bits))
        d *= 2
    r16 = r  # sum_z (3-c[i+z]) << 2z
    rlo = r16
    rhi = _shift_left(r16, 16, jnp.uint32(0)) & jnp.uint32((1 << 30) - 1)
    return fhi, flo, rhi, rlo


def _clz32(x):
    jax, jnp = _get_jnp()
    return jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def _homopolymer_halves():
    out = []
    for b in (1, 2, 3):
        v = 0
        for _ in range(K):
            v = (v << 2) | b
        out.append((np.uint32(v >> 32), np.uint32(v & 0xFFFFFFFF)))
    return out


def _unpack_anchors(ak1, ak2):
    _, jnp = _get_jnp()
    aqb = (ak1 >> jnp.uint32(13)).astype(jnp.int32)
    ake = 8191 - (ak1 & jnp.uint32(0x1FFF)).astype(jnp.int32)
    atb = (ak2 >> jnp.uint32(1)).astype(jnp.int32)
    return aqb, ake, atb


# ---------------------------------------------------------------------------
# launch 1: probe + sort + dedup + trim


def build_probe_fn(resident: bool = False):
    """Jitted: packed window codes + query tables -> sorted/deduped/trimmed
    anchors (device-resident) + per-window counts and fallback flags.

    Inputs:
      packed  [W, L_PAD//16] u32, wlen [W] i32, qidx [W] i32,
      begin [W] i32, end [W] i32,
      qkh/qkl/qv [NQ, QK_PAD] u32
    Outputs:
      ak1, ak2 [W, A_CAP] u32; counts [W] i32; flags [W] i32

    resident=True: instead of `packed`, takes (blob, word_base, phase, rc)
    and extracts the window codes from the HBM-resident genome blob
    (parallel/resident.py) — the window bytes never cross the transport.
    """
    jax, jnp = _get_jnp()
    lax = jax.lax
    HOMO = _homopolymer_halves()

    def fn(packed, wlen, qidx, begin, end, qkh, qkl, qv):
        W = packed.shape[0]
        shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
        codes = ((packed[:, :, None] >> shifts) & jnp.uint32(3)).reshape(W, L_PAD)

        fhi, flo, rhi, rlo = _window_kmers(codes)
        pos = jnp.arange(L_PAD, dtype=jnp.int32)[None, :]
        valid = (pos <= (wlen[:, None] - K)) & ((fhi != 0) | (flo != 0))
        for hh, ll in HOMO:
            valid &= ~((fhi == hh) & (flo == ll))

        # union records: query entries (tag 0) + target fwd/rc k-mers (tag 1)
        qrow_kh = qkh[qidx]
        qrow_kl = qkl[qidx]
        qrow_v = qv[qidx]
        q_valid = qrow_kh != INV32
        q_key = jnp.where(
            q_valid, (qrow_kh >> jnp.uint32(8)) << jnp.uint32(1), INVALID_KEY
        )
        t_key_f = jnp.where(
            valid, ((fhi >> jnp.uint32(8)) << jnp.uint32(1)) | jnp.uint32(1),
            INVALID_KEY,
        )
        t_key_r = jnp.where(
            valid, ((rhi >> jnp.uint32(8)) << jnp.uint32(1)) | jnp.uint32(1),
            INVALID_KEY,
        )
        posu = pos.astype(jnp.uint32)
        aux_f = jnp.broadcast_to(posu, (W, L_PAD))
        aux_r = jnp.broadcast_to(posu | jnp.uint32(1 << 13), (W, L_PAD))

        key = jnp.concatenate([q_key, t_key_f, t_key_r], axis=1)
        kh = jnp.concatenate([qrow_kh, fhi, rhi], axis=1)
        kl = jnp.concatenate([qrow_kl, flo, rlo], axis=1)
        aux = jnp.concatenate([qrow_v, aux_f, aux_r], axis=1)

        key, kh, kl, aux = lax.sort(
            (key, kh, kl, aux), dimension=1, num_keys=1, is_stable=True
        )

        # segmented forward fill of up to TWO query entries per prefix run:
        # query lanes sort before target lanes within a prefix, so the run's
        # LAST query lane is the nearest preceding query entry of every
        # target lane (candidate 1); that lane's immediate predecessor, if a
        # same-prefix query lane, is candidate 2 and rides along in the fill.
        # Runs with >=3 query entries flag the window for host fallback.
        prefix = key >> jnp.uint32(1)
        is_q = ((key & jnp.uint32(1)) == 0) & (key != INVALID_KEY)
        have = is_q
        pkh, pkl, paux = kh, kl, aux
        same1 = prefix == _shift_right(prefix, 1, jnp.uint32(0x7FFFFF))
        q1 = _shift_right(is_q, 1, False)
        has2 = is_q & q1 & same1
        pkh2 = jnp.where(has2, _shift_right(kh, 1, INV32), INV32)
        pkl2 = jnp.where(has2, _shift_right(kl, 1, INV32), INV32)
        paux2 = jnp.where(has2, _shift_right(aux, 1, jnp.uint32(0)), jnp.uint32(0))
        multi = (
            has2
            & _shift_right(is_q, 2, False)
            & (prefix == _shift_right(prefix, 2, jnp.uint32(0x7FFFFF)))
        )
        d = 1
        while d < N_REC:
            sp = _shift_right(prefix, d, jnp.uint32(0x7FFFFF))
            same = sp == prefix
            sh = same & _shift_right(have, d, False)
            take = sh & (~have)
            pkh = jnp.where(take, _shift_right(pkh, d, INV32), pkh)
            pkl = jnp.where(take, _shift_right(pkl, d, INV32), pkl)
            paux = jnp.where(take, _shift_right(paux, d, jnp.uint32(0)), paux)
            pkh2 = jnp.where(take, _shift_right(pkh2, d, INV32), pkh2)
            pkl2 = jnp.where(take, _shift_right(pkl2, d, INV32), pkl2)
            paux2 = jnp.where(take, _shift_right(paux2, d, jnp.uint32(0)), paux2)
            multi = multi | (same & _shift_right(multi, d, False))
            have = have | sh
            d *= 2

        # anchors at target lanes (ref: compare_probe_codes emission rules),
        # one anchor set per propagated query candidate
        is_t = ((key & jnp.uint32(1)) == 1) & (key != INVALID_KEY)
        tpos = (aux & jnp.uint32(0x1FFF)).astype(jnp.int32)
        tstrand = ((aux >> jnp.uint32(13)) & jnp.uint32(1)).astype(jnp.int32)
        bgn = begin[:, None]
        endn = end[:, None]

        def emit_anchors(ckh, ckl, caux):
            paired = is_t & have & (ckh != INV32)
            qstrand = (caux & jnp.uint32(1)).astype(jnp.int32)
            qpos = (caux >> jnp.uint32(1)).astype(jnp.int32)
            pair_ok = paired & (tstrand == qstrand)

            x_hi = kh ^ ckh
            x_lo = kl ^ ckl
            clz64 = jnp.where(x_hi != 0, _clz32(x_hi), 32 + _clz32(x_lo))
            lcp = jnp.where((x_hi == 0) & (x_lo == 0), K, clz64 // 2 - 1)

            p_fwd = qpos
            p_rc = qpos + K - lcp
            ok = pair_ok & jnp.where(
                tstrand == 0,
                (p_fwd >= bgn) & (p_fwd + lcp <= endn),
                ~((p_rc + lcp < bgn) | (p_rc > endn)),
            )

            aq = jnp.where(tstrand == 0, p_fwd, p_rc)
            at = jnp.where(tstrand == 0, tpos, tpos + K - lcp)
            ke = aq + lcp  # exclusive query end

            c1 = jnp.where(
                ok,
                (aq.astype(jnp.uint32) << jnp.uint32(13))
                | (jnp.uint32(8191) - ke.astype(jnp.uint32)),
                INV32,
            )
            c2 = jnp.where(
                ok,
                (at.astype(jnp.uint32) << jnp.uint32(1)) | tstrand.astype(jnp.uint32),
                INV32,
            )
            return ok, c1, c2

        ok_a, k1_a, k2_a = emit_anchors(pkh, pkl, paux)
        ok_b, k1_b, k2_b = emit_anchors(pkh2, pkl2, paux2)
        k1 = jnp.concatenate([k1_a, k1_b], axis=1)
        k2 = jnp.concatenate([k2_a, k2_b], axis=1)
        multi_hit = jnp.any((ok_a | ok_b) & multi, axis=1)

        n_total = jnp.sum((k1 != INV32).astype(jnp.int32), axis=1)
        ak1, ak2 = lax.sort((k1, k2), dimension=1, num_keys=2, is_stable=False)
        ak1 = ak1[:, :A_CAP]
        ak2 = ak2[:, :A_CAP]
        anchor_overflow = n_total > A_CAP

        # ---- dedup: nested-anchor removal (core.cpp:1199-1226) ----
        lane = jnp.arange(A_CAP, dtype=jnp.int32)[None, :]
        aqb, ake, atb = _unpack_anchors(ak1, ak2)
        a_ok = ak1 != INV32
        aqb = jnp.where(a_ok, aqb, BIG)
        ate = atb + (ake - aqb)
        ke_as_j = jnp.where(a_ok, ake, 0)  # invalid predecessor contains nothing
        upbound = jnp.maximum(ake - K, 0)

        def dedup_body(d, dropped):
            qb_j = _shift_right_dyn(aqb, d, jnp.int32(-BIG))
            ke_j = _shift_right_dyn(ke_as_j, d, jnp.int32(0))
            tb_j = _shift_right_dyn(atb, d, jnp.int32(BIG))
            te_j = _shift_right_dyn(ate, d, jnp.int32(-BIG))
            hit = (qb_j >= upbound) & (ake <= ke_j) & (atb >= tb_j) & (ate <= te_j)
            return dropped | hit

        dropped = lax.fori_loop(
            1, D_DEDUP + 1, dedup_body, jnp.zeros_like(a_ok)
        )
        dropped = dropped & a_ok
        # conservative overflow: predecessor at distance D_DEDUP still in range
        qb_D = _shift_right(aqb, D_DEDUP, jnp.int32(-BIG))
        dedup_overflow = jnp.any(
            a_ok & (qb_D >= upbound) & (qb_D > -BIG), axis=1
        )

        # compact kept anchors (stable)
        dk = jnp.where(a_ok & ~dropped, jnp.uint32(0), jnp.uint32(1))
        _, ak1, ak2 = lax.sort((dk, ak1, ak2), dimension=1, num_keys=1, is_stable=True)
        nv = jnp.sum((dk == 0).astype(jnp.int32), axis=1)
        a_ok = lane < nv[:, None]
        ak1 = jnp.where(a_ok, ak1, INV32)
        ak2 = jnp.where(a_ok, ak2, INV32)
        aqb, ake, atb = _unpack_anchors(ak1, ak2)
        aln = ake - aqb

        # ---- trim (TrimSubStrPairs, min_dist=100; core.cpp:1229-1285) ----
        qb_p = _shift_right(aqb, 1, jnp.int32(0))
        tb_p = _shift_right(atb, 1, jnp.int32(0))
        ln_p = _shift_right(aln, 1, jnp.int32(0))
        # forward loop: cond(i, prev=i-1), overlap(prev, i)/ln[prev]
        dq1 = jnp.abs(aqb - qb_p)
        dt1 = jnp.abs(atb - tb_p)
        gap21 = jnp.abs(dq1 - dt1)
        qo1 = jnp.where((aqb >= qb_p) & (aqb <= qb_p + ln_p), qb_p + ln_p - aqb + 1, 0)
        to1 = jnp.where((atb >= tb_p) & (atb <= tb_p + ln_p), tb_p + ln_p - atb + 1, 0)
        ov1 = jnp.maximum(qo1, to1)
        cf = (jnp.maximum(dq1, dt1) < 100) & (
            ((aqb == qb_p) | (atb == tb_p)) | ((gap21 > 11) & (5 * ov1 > 4 * ln_p))
        )
        cf = cf & a_ok & _shift_right(a_ok, 1, False) & (lane >= 1)
        pf = jnp.cumprod(jnp.where(lane >= 1, cf, True).astype(jnp.int32), axis=1)
        runf = jnp.sum(pf * (lane >= 1), axis=1)
        start = jnp.maximum(runf - 1, 0)

        qb_n = _shift_left(aqb, 1, jnp.int32(0))
        tb_n = _shift_left(atb, 1, jnp.int32(0))
        ln_n = _shift_left(aln, 1, jnp.int32(0))
        # backward loop: cond(i, prev=i+1), overlap(i, prev)/ln[prev]
        dq2 = jnp.abs(aqb - qb_n)
        dt2 = jnp.abs(atb - tb_n)
        gap22 = jnp.abs(dq2 - dt2)
        qo2 = jnp.where((qb_n >= aqb) & (qb_n <= aqb + aln), aqb + aln - qb_n + 1, 0)
        to2 = jnp.where((tb_n >= atb) & (tb_n <= atb + aln), atb + aln - tb_n + 1, 0)
        ov2 = jnp.maximum(qo2, to2)
        cb = (jnp.maximum(dq2, dt2) < 100) & (
            ((aqb == qb_n) | (atb == tb_n)) | ((gap22 > 11) & (5 * ov2 > 4 * ln_n))
        )
        iband = lane < (nv[:, None] - 1)
        rev_ok = jnp.where(iband, cb, True).astype(jnp.int32)
        rcp = jnp.flip(jnp.cumprod(jnp.flip(rev_ok, axis=1), axis=1), axis=1)
        runb = jnp.sum(rcp * iband, axis=1)
        endi = nv - 1 - runb

        do_trim = (nv >= 2) & ~((start == 0) & (endi == nv - 1))
        empty = do_trim & (start >= endi)
        lo_i = jnp.where(do_trim, start, 0)
        hi_i = jnp.where(do_trim, endi, nv - 1)
        keep = (
            a_ok
            & (lane >= lo_i[:, None])
            & (lane <= hi_i[:, None])
            & (~empty[:, None])
        )
        tk = jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
        _, ak1, ak2 = lax.sort((tk, ak1, ak2), dimension=1, num_keys=1, is_stable=True)
        counts = jnp.sum(keep.astype(jnp.int32), axis=1)
        a_ok = lane < counts[:, None]
        ak1 = jnp.where(a_ok, ak1, INV32)
        ak2 = jnp.where(a_ok, ak2, INV32)

        flags = (
            jnp.where(anchor_overflow, F_ANCHOR_OVERFLOW, 0)
            | jnp.where(multi_hit, F_MULTI_PREFIX, 0)
            | jnp.where(dedup_overflow, F_DEDUP_OVERFLOW, 0)
        ).astype(jnp.int32)
        return ak1, ak2, counts, flags

    if resident:
        from .resident import extract_packed

        def fn_res(blob, word_base, phase, rc, wlen, qidx, begin, end,
                   qkh, qkl, qv):
            packed = extract_packed(blob, word_base, phase, wlen, rc,
                                    L_PAD // 16)
            return fn(packed, wlen, qidx, begin, end, qkh, qkl, qv)

        return jax.jit(fn_res)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# launch 2: Chainer2 forward DP + region-splitting backtrack


def build_chain_fn(band_base: int, band_count: int, max_gap: int,
                   min_score: int, min_align_len: int, dp_only: bool = False):
    """Jitted: packed anchors [Wb, A] -> chains [Wb, C_CAP, 8] + counts/flags.

    Mirrors native/core.cpp chain2_forward (banded integer DP with the
    monotone-early-exit break rules evaluated as masks over a fixed
    predecessor window D_DP) and c2_region (explicit region stack).
    heuristic pident threshold 15.0 is the exact rational 20*matched >=
    3*max(naq, nat).
    """
    jax, jnp = _get_jnp()
    lax = jax.lax
    NEG = jnp.int32(-(1 << 30))

    def fn(ak1, ak2, counts):
        Wb, A = ak1.shape
        # x64 mode (enabled by parallel/kernels.py) promotes jnp.sum and
        # py-int where() results to int64; the loop carries are all int32
        counts = counts.astype(jnp.int32)
        aqb, ake, atb = _unpack_anchors(ak1, ak2)
        aln = ake - aqb
        lane = jnp.arange(A, dtype=jnp.int32)[None, :]
        a_ok = lane < counts[:, None]
        # padding so invalid predecessors can never be eligible
        qb = jnp.where(a_ok, aqb, -BIG)
        tb = jnp.where(a_ok, atb, BIG)
        ln = jnp.where(a_ok, aln, 0)
        max_ln = jnp.max(jnp.where(a_ok, aln, 0), axis=1)

        # ---- forward DP ----
        # full-prefix predecessor window (D = A): the break rules are exact
        # masks and no window can ever need a deeper scan, so there is no
        # DP fallback.  Cost is A^2 per window, bounded by the size buckets.
        D = A
        qb_pad = jnp.pad(qb, ((0, 0), (D, 0)), constant_values=-BIG)
        tb_pad = jnp.pad(tb, ((0, 0), (D, 0)), constant_values=BIG)
        ln_pad = jnp.pad(ln, ((0, 0), (D, 0)), constant_values=0)
        dlane = jnp.arange(D, dtype=jnp.int32)[None, :]

        msl0 = jnp.zeros((Wb, A), dtype=jnp.int32).at[:, 0].set(2 * ln[:, 0])
        scores0 = jnp.zeros((Wb, A), dtype=jnp.int32).at[:, 0].set(ln[:, 0])
        prev0 = jnp.zeros((Wb, A), dtype=jnp.int32)
        msl_pad0 = jnp.pad(msl0, ((0, 0), (D, 0)), constant_values=NEG)

        def dp_body(i, carry):
            msl_pad, scores, prev, dp_ovf = carry
            aq = lax.dynamic_slice_in_dim(qb, i, 1, axis=1)[:, 0]
            at = lax.dynamic_slice_in_dim(tb, i, 1, axis=1)[:, 0]
            al = lax.dynamic_slice_in_dim(ln, i, 1, axis=1)[:, 0]
            # predecessor slice j in [i-D, i): padded index [i, i+D)
            qb_j = lax.dynamic_slice_in_dim(qb_pad, i, D, axis=1)
            tb_j = lax.dynamic_slice_in_dim(tb_pad, i, D, axis=1)
            ln_j = lax.dynamic_slice_in_dim(ln_pad, i, D, axis=1)
            msl_j = lax.dynamic_slice_in_dim(msl_pad, i, D, axis=1)

            aqn = aq[:, None]
            atn = at[:, None]
            eligible = (qb_j != aqn) & (tb_j <= atn) & (qb_j > -BIG)
            # counts of eligible after lane jl (descending scan order)
            e_i32 = eligible.astype(jnp.int32)
            csum = jnp.cumsum(e_i32, axis=1)
            total = csum[:, -1:]
            suffix_excl = total - csum  # eligible strictly after lane jl
            thr = (aq - max_ln - band_base)[:, None]
            break1 = (suffix_excl >= band_count) & (qb_j < thr)
            break2 = (
                eligible
                & ((aqn - qb_j - ln_j) > band_base)
                & ((suffix_excl + 1) > band_count)
            )
            brk = break1 | break2
            cut = jnp.max(jnp.where(brk, dlane, -1), axis=1)[:, None]
            qd = aqn - qb_j
            td = atn - tb_j
            g = jnp.abs(qd - td)
            ok = eligible & (dlane > cut) & (g <= max_gap)
            sc = jnp.where(ok, msl_j - g, NEG)
            best = jnp.max(sc, axis=1)
            mj_lane = jnp.min(jnp.where(sc == best[:, None], dlane, BIG), axis=1)
            use = best >= al
            m = jnp.where(use, best, al)
            mj = jnp.where(use, i - D + mj_lane, i).astype(jnp.int32)
            # window needed deeper scan: no break fired and j=i-D not the floor
            deeper = (cut[:, 0] < 0) & (i > D)
            active = i < counts
            dp_ovf = dp_ovf | (deeper & active)

            msl_pad = lax.dynamic_update_slice_in_dim(
                msl_pad, (m + al)[:, None], D + i, axis=1
            )
            scores = lax.dynamic_update_slice_in_dim(
                scores, m[:, None], i, axis=1
            )
            prev = lax.dynamic_update_slice_in_dim(
                prev, mj[:, None], i, axis=1
            )
            return msl_pad, scores, prev, dp_ovf

        msl_pad, scores, prev, dp_ovf = lax.fori_loop(
            1, A, dp_body, (msl_pad0, scores0, prev0, jnp.zeros((Wb,), bool))
        )
        scores = jnp.where(a_ok, scores, -1)
        if dp_only:  # profiling aid
            return scores, prev, dp_ovf

        # ---- backtrack with explicit region stack (core.cpp c2_region) ----
        glob_Mi = jnp.argmax(scores, axis=1).astype(jnp.int32)
        glob_M = jnp.max(scores, axis=1)

        out0 = jnp.zeros((Wb, C_CAP, 8), dtype=jnp.int32)
        clane = jnp.arange(C_CAP, dtype=jnp.int32)[None, :]

        def emit(st, valid_extra):
            """Emit the walked chain if it passes the reference checks."""
            (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
             bnext, stack_lo, stack_hi, sp, out, cnt, flg) = st
            naq = wqe - wqb + 1
            nat = wte - wtb + 1
            maxv = jnp.maximum(naq, nat)
            good = (
                valid_extra
                & (nanch > 0)
                & (naq >= min_align_len)
                & (20 * matched >= 3 * maxv)
            )
            row = jnp.stack([nanch, naq, nat, matched, wqb, wqe, wtb, wte], axis=-1)
            sel = good[:, None] & (clane == cnt[:, None]) & (cnt[:, None] < C_CAP)
            out = jnp.where(sel[:, :, None], row[:, None, :], out)
            ovf = good & (cnt >= C_CAP)
            cnt = jnp.where(good & (cnt < C_CAP), cnt + 1, cnt)
            flg = flg | jnp.where(ovf, jnp.int32(F_CHAIN_OVERFLOW), jnp.int32(0))
            return (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
                    bnext, stack_lo, stack_hi, sp, out, cnt, flg)

        def push(stack_lo, stack_hi, sp, flg, do, lo_v, hi_v):
            sel = do[:, None] & (jnp.arange(S_CAP, dtype=jnp.int32)[None, :] == sp[:, None])
            stack_lo = jnp.where(sel, lo_v[:, None], stack_lo)
            stack_hi = jnp.where(sel, hi_v[:, None], stack_hi)
            ovf = do & (sp >= S_CAP)
            sp = jnp.where(do & (sp < S_CAP), sp + 1, sp)
            flg = flg | jnp.where(ovf, jnp.int32(F_STACK_OVERFLOW), jnp.int32(0))
            return stack_lo, stack_hi, sp, flg

        def take1(arr2d, idx):
            return jnp.take_along_axis(arr2d, idx[:, None], axis=1)[:, 0]

        MAXIT = 2 * A + 8 * S_CAP + 64

        def bt_cond(st):
            phase, it = st[0], st[18]
            return jnp.any(phase != 2) & (it < MAXIT)

        def bt_body(st):
            (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
             bnext, stack_lo, stack_hi, sp, out, cnt, flg, it) = st

            # ---------- phase 0: pop a region and find its argmax ----------
            pop = phase == 0
            done_now = pop & (sp == 0)
            phase = jnp.where(done_now, 2, phase)
            do_pop = pop & (sp > 0)
            spm1 = jnp.maximum(sp - 1, 0)
            plo = take1(stack_lo, spm1)
            phi = take1(stack_hi, spm1)
            sp = jnp.where(do_pop, spm1, sp)
            in_rng = (lane >= plo[:, None]) & (lane < phi[:, None])
            mscores = jnp.where(in_rng, scores, -1)
            rMi = jnp.argmax(mscores, axis=1).astype(jnp.int32)
            rM = jnp.max(mscores, axis=1)
            dead = do_pop & (rM < min_score)
            start_walk = do_pop & ~dead
            # dead regions just loop back to phase 0 (pop again)
            lo = jnp.where(start_walk, plo, lo)
            hi = jnp.where(start_walk, phi, hi)
            Mi = jnp.where(start_walk, rMi, Mi)
            wi = jnp.where(start_walk, rMi, wi)
            nanch = jnp.where(start_walk, 0, nanch)
            matched = jnp.where(start_walk, 0, matched)
            phase = jnp.where(start_walk, 1, phase)

            # ---------- phase 1: one walk step ----------
            walk = phase == 1
            j = take1(prev, wi)
            qb_i = take1(qb, wi)
            tb_i = take1(tb, wi)
            ln_i = take1(ln, wi)
            left_exit = walk & (j < lo)
            step = walk & ~left_exit

            first = nanch == 0
            nanch = jnp.where(step, nanch + 1, nanch)
            wqe = jnp.where(step & first, qb_i + ln_i - 1, wqe)
            wte = jnp.where(step & first, tb_i + ln_i - 1, wte)
            add = jnp.where(
                first,
                ln_i,
                jnp.where(qb_i + ln_i - 1 >= bnext, bnext - qb_i, ln_i),
            )
            matched = jnp.where(step, matched + add, matched)
            wqb = jnp.where(step, qb_i, wqb)
            wtb = jnp.where(step, tb_i, wtb)
            bnext = jnp.where(step, qb_i, bnext)

            self_loop = step & (wi == j)
            st = (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
                  bnext, stack_lo, stack_hi, sp, out, cnt, flg)
            st = emit(st, self_loop | left_exit)
            (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
             bnext, stack_lo, stack_hi, sp, out, cnt, flg) = st

            walk_end = self_loop | left_exit
            # push left [lo, wi) first, then right [Mi+1, hi) (LIFO: right pops
            # first, matching the reference's recursion order)
            stack_lo, stack_hi, sp, flg = push(
                stack_lo, stack_hi, sp, flg, walk_end & (wi > lo), lo, wi
            )
            stack_lo, stack_hi, sp, flg = push(
                stack_lo, stack_hi, sp, flg, walk_end & (Mi != hi - 1), Mi + 1, hi
            )
            phase = jnp.where(walk_end, 0, phase)
            wi = jnp.where(step & ~walk_end, j, wi)

            return (phase, lo, hi, Mi, wi, nanch, matched, wqb, wtb, wqe, wte,
                    bnext, stack_lo, stack_hi, sp, out, cnt, flg, it + 1)

        z = jnp.zeros((Wb,), dtype=jnp.int32)
        # seed: one region [0, n) with the global argmax, unless M < min_score
        # (covers n==1 too: the single-anchor branch of chain2 has the same
        # min_score/min_align_len conditions; ref lib-chaining2.go:163-180)
        live = (counts >= 1) & (glob_M >= min_score)
        phase0 = jnp.where(live, 1, 2).astype(jnp.int32)
        st0 = (
            phase0, z, counts, glob_Mi, glob_Mi, z, z, z, z, z, z, z,
            jnp.zeros((Wb, S_CAP), dtype=jnp.int32),
            jnp.zeros((Wb, S_CAP), dtype=jnp.int32),
            z, out0, z, jnp.where(dp_ovf, F_DP_OVERFLOW, 0).astype(jnp.int32),
            jnp.int32(0),
        )
        st = lax.while_loop(bt_cond, bt_body, st0)
        out, cnt, flg, phase = st[15], st[16], st[17], st[0]
        # windows not finished at the iteration cap fall back to the host
        flg = flg | jnp.where(phase != 2, F_STACK_OVERFLOW, 0)

        # ---- device-side compaction: most windows emit 1-2 chains, so
        # fetching the dense [Wb, C_CAP, 8] block moves ~8x more bytes than
        # exist.  Valid rows sort to the front keyed by (window, chain) and
        # only R_CAP rows (key + 8 columns) are fetched; windows whose rows
        # fall past R_CAP are detected by the host via the key column and
        # re-run there (order inside a window is the emission order).
        wrow = jnp.arange(Wb, dtype=jnp.int32)[:, None]
        crow = jnp.arange(C_CAP, dtype=jnp.int32)[None, :]
        valid = (crow < cnt[:, None]) & (flg[:, None] == 0)
        key = jnp.where(valid, wrow * C_CAP + crow, Wb * C_CAP).reshape(-1)
        cols = tuple(out[:, :, j].reshape(-1) for j in range(8))
        sorted_ = lax.sort((key, *cols), dimension=0, num_keys=1, is_stable=True)
        R_CAP = min(2 * Wb, Wb * C_CAP)
        rows = jnp.stack([s[:R_CAP] for s in sorted_], axis=1)  # [R_CAP, 9]
        return rows, cnt, flg

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# host orchestrator


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# fixed chunk shapes: every device program compiles for at most a handful of
# shapes (compiles through the axon tunnel cost minutes; the persistent XLA
# cache then reuses them across processes)
W_CHUNKS = (256, 1024)  # probe chunk sizes (small batches use 256)
NQ_BUCKETS = (4, 32)
A_BUCKETS = (384, 768, 1536, A_CAP)
WB_OF_A = {384: 512, 768: 256, 1536: 128, A_CAP: 64}  # chain chunk rows


class DevicePseudoAligner:
    """Batched device pseudo-alignment with per-window host fallback.

    run_batch(queries, windows) -> list of per-window results:
      ('rows', int64 [C, 9] array)  chains in emission order, columns
          [n_anchors, aligned_q, aligned_t, matched, qb, qe, tb, te] plus
          pident recomputed host-side in float64 — the exact output of
          native chain2_backtrack;
      ('host', None)  caller must use the host compare path;
      ('none', None)  no chains (window had no anchors / none survived).
    """

    def __init__(self, band_base=100, band_count=50, max_gap=20,
                 min_score=35, min_align_len=50, mesh=None):
        self.band_base = band_base
        self.band_count = band_count
        self.max_gap = max_gap
        self.min_score = min_score
        self.min_align_len = min_align_len
        #: optional jax.sharding.Mesh — window chunks are sharded over ALL
        #: mesh devices (windows are independent, so phase 4 is pure data
        #: parallelism over the window axis; XLA partitions the vmapped
        #: probe/chain programs with no collectives).  None = single device.
        self.mesh = mesh
        from . import ensure_jax

        ensure_jax()
        self._probe_fn = None
        self._probe_res_fn = None
        self._chain_fns = {}
        #: optional DeviceGenomeBlob — when set and run_batch receives
        #: window geometry, the probe extracts window codes from HBM
        #: instead of receiving them over the transport
        self.blob = None
        self.stats = {"windows": 0, "host_windows": 0, "host_queries": 0}
        #: cumulative wall per internal stage (seconds) — populated every
        #: run_batch; read by the regime benches to locate the bottleneck
        self.times = {"tables": 0.0, "probe_pack": 0.0, "probe_fetch": 0.0,
                      "chain_dispatch": 0.0, "chain_fetch": 0.0, "decode": 0.0}

    def _put_windows(self, arrays):
        """device_put window-major arrays, sharded over the mesh when set."""
        import jax

        if self.mesh is None:
            return jax.device_put(arrays)
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(self.mesh.axis_names)
        shardings = tuple(
            NamedSharding(self.mesh, P(axes, *([None] * (a.ndim - 1))))
            for a in arrays
        )
        return jax.device_put(arrays, shardings)

    def _put_replicated(self, arrays):
        import jax

        if self.mesh is None:
            return jax.device_put(arrays)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            arrays, tuple(NamedSharding(self.mesh, P()) for _ in arrays)
        )

    def _probe(self):
        if self._probe_fn is None:
            self._probe_fn = build_probe_fn()
        return self._probe_fn

    def _probe_res(self):
        if self._probe_res_fn is None:
            self._probe_res_fn = build_probe_fn(resident=True)
        return self._probe_res_fn

    def _chain(self):
        key = (self.band_base, self.band_count, self.max_gap,
               self.min_score, self.min_align_len)
        fn = self._chain_fns.get(key)
        if fn is None:
            fn = build_chain_fn(*key)
            self._chain_fns[key] = fn
        return fn

    def run_batch(self, queries, windows, geoms=None):
        """queries: list of (qk u64 sorted, qv u32) per batch query.
        windows: list of (qidx, tcodes uint8[L], begin, end).
        geoms: optional list aligned with windows of (word_base, phase, rc)
        blob geometry (words_out = L_PAD//16); with self.blob set, window
        codes are then extracted on device from the resident genome blob
        instead of being packed + uploaded per chunk."""
        import jax
        import jax.numpy as jnp

        n_win = len(windows)
        results = [("host", None)] * n_win
        if n_win == 0:
            return results
        from . import device_tripped

        if device_tripped():  # hung-transport breaker: all windows to host
            self.stats["windows"] += n_win
            self.stats["host_windows"] += n_win
            return results
        self.stats["windows"] += n_win

        import time as _time

        _t0 = _time.perf_counter()
        # query routing
        q_ok = []
        tables = []
        for qk, qv in queries:
            kh, kl, v, n, multi = build_query_table(qk, qv)
            qlen_ok = n <= QK_PAD and (n == 0 or int(qv.max() >> 1) < QLEN_CAP)
            q_ok.append(not multi and qlen_ok)
            tables.append((kh, kl, v))
        self.stats["host_queries"] += sum(1 for ok in q_ok if not ok)

        use_resident = self.blob is not None and geoms is not None
        dev_idx = []
        for i, (qidx, tcodes, begin, end) in enumerate(windows):
            L = tcodes.shape[0]
            if not q_ok[qidx] or L > L_PAD or L < K or end >= 8191 - K:
                continue
            if use_resident and geoms[i] is None:
                continue  # no geometry for this window -> host path
            dev_idx.append(i)
        if not dev_idx:
            self.stats["host_windows"] += n_win
            return results

        NQ = _bucket(len(queries), NQ_BUCKETS)
        qkh = np.full((NQ, QK_PAD), INV32, dtype=np.uint32)
        qkl = np.full((NQ, QK_PAD), INV32, dtype=np.uint32)
        qv_a = np.zeros((NQ, QK_PAD), dtype=np.uint32)
        for qi, (kh, kl, v) in enumerate(tables):
            qkh[qi] = kh
            qkl[qi] = kl
            qv_a[qi] = v
        from . import count_h2d

        count_h2d("device pseudo-align probe", qkh, qkl, qv_a)
        tables_d = self._put_replicated((qkh, qkl, qv_a))
        self.times["tables"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # ---- probe in fixed-size chunks (bounded compile variants) ----
        WC = W_CHUNKS[0] if len(dev_idx) <= 2 * W_CHUNKS[0] else W_CHUNKS[1]
        chunks = [dev_idx[o: o + WC] for o in range(0, len(dev_idx), WC)]
        probe = self._probe_res() if use_resident else self._probe()
        chunk_out = []  # (idx_list, ak1, ak2, counts_d)
        small = []
        for idxs in chunks:
            wlen = np.zeros(WC, dtype=np.int32)
            qidx_a = np.zeros(WC, dtype=np.int32)
            begin_a = np.zeros(WC, dtype=np.int32)
            end_a = np.zeros(WC, dtype=np.int32)
            if use_resident:
                wb_a = np.zeros(WC, dtype=np.int32)
                ph_a = np.zeros(WC, dtype=np.int32)
                rc_a = np.zeros(WC, dtype=bool)
            else:
                packed = np.zeros((WC, L_PAD // 16), dtype=np.uint32)
            for row, i in enumerate(idxs):
                qidx, tcodes, begin, end = windows[i]
                wlen[row] = tcodes.shape[0]
                qidx_a[row] = qidx
                begin_a[row] = begin
                end_a[row] = end
                if use_resident:
                    wb_a[row], ph_a[row], rc_a[row] = geoms[i]
                else:
                    packed[row] = pack_codes_2bit(tcodes, L_PAD)
            if use_resident:
                count_h2d("device pseudo-align probe", wb_a, ph_a, rc_a,
                          wlen, qidx_a, begin_a, end_a)
                dev_in = self._put_windows(
                    (wb_a, ph_a, rc_a, wlen, qidx_a, begin_a, end_a)
                )
                ak1, ak2, counts_d, flags_d = probe(
                    self.blob.d_blob, *dev_in, *tables_d
                )
            else:
                count_h2d("device pseudo-align probe", packed, wlen, qidx_a,
                          begin_a, end_a)
                dev_in = self._put_windows((packed, wlen, qidx_a, begin_a, end_a))
                ak1, ak2, counts_d, flags_d = probe(*dev_in, *tables_d)
            chunk_out.append((idxs, ak1, ak2, counts_d))
            small.append((counts_d, flags_d))
        from . import fetch_guarded

        self.times["probe_pack"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        fetched = fetch_guarded(
            small, "device pseudo-align probe",
            compile_key=(NQ, WC, use_resident),
        )
        self.times["probe_fetch"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if fetched is None:  # watchdog tripped: every window to the host
            self.stats["host_windows"] += n_win
            return [("host", None)] * n_win

        # ---- route windows; bucket by anchor count, chunked chain calls ----
        pending = []
        chain_shapes: set = set()  # (Wb, A_b) compile buckets used this call
        for (idxs, ak1, ak2, counts_d), (counts, flags) in zip(chunk_out, fetched):
            by_bucket = {}
            for row, i in enumerate(idxs):
                f = int(flags[row])
                if f != 0:
                    self.stats[f"flag{f}"] = self.stats.get(f"flag{f}", 0) + 1
                    self.stats["host_windows"] += 1
                    continue
                n = int(counts[row])
                if n == 0:
                    results[i] = ("none", None)
                    continue
                by_bucket.setdefault(_bucket(n, A_BUCKETS), []).append(row)
            for A_b, rows in sorted(by_bucket.items()):
                Wb = WB_OF_A[A_b]
                chain_shapes.add((Wb, A_b))
                for o in range(0, len(rows), Wb):
                    part = rows[o: o + Wb]
                    ridx = np.zeros(Wb, dtype=np.int32)
                    ridx[: len(part)] = part
                    count_h2d("device pseudo-align chain", ridx)
                    ridx_d = jax.device_put(ridx)
                    sub1 = ak1[ridx_d][:, :A_b]
                    sub2 = ak2[ridx_d][:, :A_b]
                    subc = counts_d[ridx_d]
                    if self.mesh is not None:
                        sub1, sub2, subc = self._put_windows((sub1, sub2, subc))
                    rows_d, cnt, flg = self._chain()(sub1, sub2, subc)
                    pending.append(([idxs[r] for r in part], rows_d, cnt, flg))

        self.times["chain_dispatch"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        fetched2 = fetch_guarded(
            [(r, c, f) for _, r, c, f in pending],
            "device pseudo-align chain",
            compile_key=tuple(sorted(chain_shapes)),
        )
        self.times["chain_fetch"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if fetched2 is None:  # pending windows keep their ("host", None) default
            self.stats["host_windows"] += n_win - len(dev_idx)
            return results
        for (win_ids, *_), (rows, cnt, flg) in zip(pending, fetched2):
            self._decode_chain_rows(win_ids, rows, cnt, flg, results)

        self.times["decode"] += _time.perf_counter() - _t0
        self.stats["host_windows"] += n_win - len(dev_idx)
        return results

    def _decode_chain_rows(self, win_ids, rows, cnt, flg, results):
        """Decode one chain call's compacted output into `results`.

        rows: [R_CAP, 9] (key=win*C_CAP+chain, then the 8 row columns),
        valid rows sorted to the front, contiguous per window in
        (window, emission) order.  A window whose rows fell past R_CAP is
        detected by the key column (its first expected row carries a
        later window's key, or ptr ran off the cap) and keeps its
        ("host", None) default — exactness by detection."""
        R_CAP = rows.shape[0]
        ptr = 0
        for k, i in enumerate(win_ids):
            if flg[k] != 0:
                self.stats[f"flag{int(flg[k])}"] = (
                    self.stats.get(f"flag{int(flg[k])}", 0) + 1
                )
                self.stats["host_windows"] += 1
                continue
            c = int(cnt[k])
            if c == 0:
                results[i] = ("none", None)
                continue
            if ptr + c > R_CAP or int(rows[ptr, 0]) != k * C_CAP:
                # truncated past the compaction cap (or key mismatch
                # safeguard): this window re-runs on the host
                self.stats["host_windows"] += 1
                self.stats["compact_overflow"] = (
                    self.stats.get("compact_overflow", 0) + 1
                )
                continue
            results[i] = ("rows", rows[ptr : ptr + c, 1:].astype(np.int64))
            ptr += c
