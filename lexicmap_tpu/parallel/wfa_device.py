"""Batched gap-affine WFA on the TPU (forward + traceback), bit-exact with
ops/wfa.py / native wfa_align.

The reference calls WFA once per HSP extension window
(ref: lib-index-search.go:2218; shenwei356/wfa with DefaultPenalties and
AdaptiveReduction).  On the host that is ~0.5 ms per 1.5 kb window and the
dominant phase-4 cost; here every HSP window of a whole query batch runs as
ONE device dispatch:

- forward pass: a `lax.while_loop` over scores; per score the M/I/D
  wavefronts live in a fixed-width diagonal window (width W, per-score
  offset `lo`), all HSPs advancing in lockstep via `vmap`.  Wavefront
  history is written to [S, W] int16 buffers for the traceback.
- greedy match extension compares 16-base packed words (2-bit MSB-first)
  with XOR + count-leading-zeros, exactly like the host's 32-base version
  (ops/wfa.py:_extend) — both stop at the first mismatching base.
- adaptive reduction replicates wfa.DefaultAdaptiveOption: when a
  wavefront has >= min_wf_len live M cells, cells whose distance-to-end
  exceeds (min distance + max_dist_diff) are pruned from M/I/D.
- traceback: a second vmapped `lax.while_loop` walking the stored
  wavefronts with the host's exact tie-break order (pref "XDI", gap-open
  before gap-extension), emitting (op, count) pairs.

HSPs whose live diagonal span outgrows W or whose cost exceeds S set an
overflow flag and are re-aligned on the host (rare; the adaptive reduction
keeps live spans ~<= max_dist_diff * 2), so parity is unconditional.
"""

from __future__ import annotations

import numpy as np

NEG16 = -20000  # NEG sentinel that survives +1 in int16


def _get_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def dense_words(L: int) -> int:
    """u32 word count of a dense 2-bit LSB-first buffer whose in-jit
    expansion to sliding compare-words needs codes up to L+16."""
    return L // 16 + 2


def build_wfa_step(N: int, M: int, S: int, W: int, x: int, o: int, e: int,
                   min_wf_len: int, max_dist_diff: int):
    """Returns a jitted function aligning a batch of padded windows.

    Inputs (device arrays):
      qp [B, dense_words(N)] u32 DENSE 2-bit LSB-first query codes
      tp [B, dense_words(M)] u32 likewise for targets
      n  [B] int32 query lengths;  m  [B] int32 target lengths
    The 16-base sliding compare-words (w[i] = bases i..i+15 MSB-first;
    the 16-base analogue of ops/wfa.py:_pack_words) are expanded IN-JIT: the dense
    upload is 16x smaller than shipping the sliding words — at many-hit
    span counts that is the difference between a ~4 MB and a ~0.25 MB
    h2d payload per batch through the ~40 MB/s tunnel.
    Outputs:
      hist_M/I/D [B, S, W] int16 (f offsets, NEG16 = dead)
      lo   [B, S] int32 window offsets (diagonal of column 0)
      done_s [B] int32 final score (-1 = overflow/failure)
    """
    jax, jnp = _get_jax()
    lax = jax.lax

    NEG = jnp.int32(NEG16)

    def expand(cp, L):
        """[dense_words(L)] u32 dense codes -> [L+1] int32 sliding words."""
        shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
        c = ((cp[:, None] >> shifts) & jnp.uint32(3)).reshape(-1)
        acc = jnp.zeros(L + 1, dtype=jnp.uint32)
        for z in range(16):
            acc = acc | (c[z : z + L + 1] << jnp.uint32(30 - 2 * z))
        return acc.astype(jnp.int32)

    def clz32(v):
        v = v | (v >> 1)
        v = v | (v >> 2)
        v = v | (v >> 4)
        v = v | (v >> 8)
        v = v | (v >> 16)
        return 32 - lax.population_count(v.astype(jnp.uint32)).astype(jnp.int32)

    def extend(f, ks, qw, tw, n, m):
        """Greedy match extension of offsets f (int32 [W]) on diagonals ks."""

        def cond(state):
            f, active = state
            return active.any()

        def body(state):
            f, active = state
            i = f - ks
            ii = jnp.where(active, i, 0)
            jj = jnp.where(active, f, 0)
            xw = (qw[ii] ^ tw[jj]).astype(jnp.uint32).astype(jnp.int32)
            lead = jnp.where(xw != 0, clz32(xw) >> 1, 16)
            rem = jnp.minimum(n - ii, m - jj)
            ext = jnp.minimum(lead, rem)
            ext = jnp.where(active, jnp.maximum(ext, 0), 0)
            f2 = f + ext
            i2 = i + ext
            active2 = (
                active
                & (lead >= 16)
                & (ext == jnp.minimum(16, rem))
                & (ext > 0)
                & (f2 < m)
                & (i2 < n)
            )
            return f2, active2

        active0 = (f >= 0) & (f < m) & ((f - ks) >= 0) & ((f - ks) < n)
        f, _ = lax.while_loop(cond, body, (f, active0))
        return f

    def align_one(qp, tp, n, m):
        qw = expand(qp, N)
        tw = expand(tp, M)
        k_end = m - n

        hist_M = jnp.full((S, W), NEG, dtype=jnp.int16)
        hist_I = jnp.full((S, W), NEG, dtype=jnp.int16)
        hist_D = jnp.full((S, W), NEG, dtype=jnp.int16)
        los = jnp.full((S,), jnp.int32(1 << 20), dtype=jnp.int32)

        # s = 0: M[0] = extend(0 on diagonal 0)
        lo0 = -(W // 2)
        ks0 = lo0 + jnp.arange(W, dtype=jnp.int32)
        f0 = jnp.where(ks0 == 0, 0, NEG)
        f0 = jnp.where(ks0 == 0, extend(f0, ks0, qw, tw, n, m), NEG)
        hist_M = hist_M.at[0].set(f0.astype(jnp.int16))
        los = los.at[0].set(lo0)
        done0 = (k_end >= lo0) & (k_end < lo0 + W) & (
            f0[jnp.clip(k_end - lo0, 0, W - 1)] >= m
        )

        def fetch(hist, lo_arr, s_src, kk):
            """Row s_src of hist at diagonals kk (NEG when s_src < 0 / OOB)."""
            ok_s = s_src >= 0
            s_safe = jnp.maximum(s_src, 0)
            row = hist[s_safe]
            lo_src = lo_arr[s_safe]
            idx = kk - lo_src
            ok = ok_s & (idx >= 0) & (idx < W)
            vals = row[jnp.clip(idx, 0, W - 1)].astype(jnp.int32)
            return jnp.where(ok, vals, NEG)

        def cond(state):
            s, done, overflow, *_ = state
            return (~done) & (~overflow) & (s + 1 < S)

        def body(state):
            s, done, overflow, hist_M, hist_I, hist_D, los = state
            s = s + 1

            # live span of the sources determines the new window
            def span_of(s_src, dk):
                ok_s = s_src >= 0
                s_safe = jnp.maximum(s_src, 0)
                lo_src = los[s_safe]
                mrow = hist_M[s_safe].astype(jnp.int32)
                irow = hist_I[s_safe].astype(jnp.int32)
                drow = hist_D[s_safe].astype(jnp.int32)
                live = (mrow > NEG) | (irow > NEG) | (drow > NEG)
                idxs = jnp.arange(W, dtype=jnp.int32)
                big = jnp.int32(1 << 20)
                kmin = jnp.min(jnp.where(live, lo_src + idxs, big))
                kmax = jnp.max(jnp.where(live, lo_src + idxs, -big))
                kmin = jnp.where(ok_s & (kmin < big), kmin - dk, big)
                kmax = jnp.where(ok_s & (kmax > -big), kmax + dk, -big)
                return kmin, kmax

            kmin_x, kmax_x = span_of(s - x, 0)
            kmin_oe, kmax_oe = span_of(s - o - e, 1)
            kmin_e, kmax_e = span_of(s - e, 1)
            kmin = jnp.minimum(jnp.minimum(kmin_x, kmin_oe), kmin_e)
            kmax = jnp.maximum(jnp.maximum(kmax_x, kmax_oe), kmax_e)
            has_src = kmin <= kmax
            overflow = overflow | (has_src & ((kmax - kmin + 1) > W))

            lo = jnp.where(has_src, kmin, jnp.int32(1 << 20))
            ks = lo + jnp.arange(W, dtype=jnp.int32)

            d_open = fetch(hist_M, los, s - o - e, ks - 1)
            d_ext = fetch(hist_D, los, s - e, ks - 1)
            D = jnp.maximum(d_open, d_ext)
            D = jnp.where(D > NEG, D + 1, NEG)
            i_open = fetch(hist_M, los, s - o - e, ks + 1)
            i_ext = fetch(hist_I, los, s - e, ks + 1)
            I = jnp.maximum(i_open, i_ext)
            mis = fetch(hist_M, los, s - x, ks)
            mis = jnp.where(mis > NEG, mis + 1, NEG)

            Mv = jnp.maximum(jnp.maximum(mis, I), D)
            iv = Mv - ks
            Mv = jnp.where(
                (Mv > NEG) & (Mv <= m) & (iv >= 0) & (iv <= n), Mv, NEG
            )
            I = jnp.where(
                (I > NEG) & (I <= m) & ((I - ks) >= 0) & ((I - ks) <= n), I, NEG
            )
            D = jnp.where(
                (D > NEG) & (D <= m) & ((D - ks) >= 0) & ((D - ks) <= n), D, NEG
            )

            # greedy extension of valid M cells
            Mext = extend(jnp.where(Mv > NEG, Mv, NEG), ks, qw, tw, n, m)
            Mv = jnp.where(Mv > NEG, Mext, NEG)

            # adaptive reduction (ops/wfa.py:229-237)
            has = Mv > NEG
            n_live = has.sum()
            ii = Mv - ks
            big = jnp.int32(1 << 20)
            dist = jnp.where(has, (m - Mv) + (n - ii), big)
            dmin = dist.min()
            prune = (
                (n_live >= min_wf_len)
                & (dist - dmin > max_dist_diff)
                & (dist < big)
            )
            Mv = jnp.where(prune, NEG, Mv)
            I = jnp.where(prune, NEG, I)
            D = jnp.where(prune, NEG, D)

            skip = done | overflow | (~has_src)
            Mv = jnp.where(skip, NEG, Mv)
            I = jnp.where(skip, NEG, I)
            D = jnp.where(skip, NEG, D)
            lo = jnp.where(skip, jnp.int32(1 << 20), lo)

            hist_M = hist_M.at[s].set(Mv.astype(jnp.int16))
            hist_I = hist_I.at[s].set(I.astype(jnp.int16))
            hist_D = hist_D.at[s].set(D.astype(jnp.int16))
            los = los.at[s].set(lo)

            hit = (k_end >= lo) & (k_end < lo + W) & (
                Mv[jnp.clip(k_end - lo, 0, W - 1)] >= m
            )
            done = done | (hit & (~skip))
            return s, done, overflow, hist_M, hist_I, hist_D, los

        s0 = jnp.int32(0)
        s, done, overflow, hist_M, hist_I, hist_D, los = lax.while_loop(
            cond, body, (s0, done0, jnp.bool_(False), hist_M, hist_I, hist_D, los)
        )
        done_s = jnp.where(done & (~overflow), s, jnp.int32(-1))
        return hist_M, hist_I, hist_D, los, done_s

    return jax.jit(jax.vmap(align_one))


def build_wfa_traceback(S: int, W: int, CAP: int, x: int, o: int, e: int):
    """Returns a jitted vmapped traceback over stored wavefronts.

    Emits (op_code, count) pairs, op codes: 0=M 1=X 2=I 3=D, newest first
    (the host reverses and RLE-merges).  Mirrors ops/wfa.py:_traceback with
    pref="XDI" and gap-open preferred (the calibrated reference order)."""
    jax, jnp = _get_jax()
    lax = jax.lax
    NEG = jnp.int32(NEG16)

    def fetch(hist, los, s_src, k):
        ok_s = (s_src >= 0) & (s_src < S)
        s_safe = jnp.clip(s_src, 0, S - 1)
        lo_src = los[s_safe]
        idx = k - lo_src
        ok = ok_s & (idx >= 0) & (idx < W)
        return jnp.where(ok, hist[s_safe, jnp.clip(idx, 0, W - 1)].astype(jnp.int32), NEG)

    def tb_one(hist_M, hist_I, hist_D, los, done_s, n, m):
        ops = jnp.zeros((CAP,), dtype=jnp.int8)
        cnts = jnp.zeros((CAP,), dtype=jnp.int32)

        # state codes: 0=M 1=I 2=D 3=done 4=failed
        def cond(st):
            s, k, f, state, w, ops, cnts = st
            return (state < 3) & (w < CAP)

        def body(st):
            s, k, f, state, w, ops, cnts = st

            # ---- M state ----
            def m_state(_):
                def at_zero(_):
                    ops2 = ops.at[w].set(jnp.int8(0))
                    cnts2 = cnts.at[w].set(f)
                    w2 = jnp.where(f > 0, w + 1, w)
                    return s, k, f, jnp.int32(3), w2, ops2, cnts2

                def step(_):
                    mis = fetch(hist_M, los, s - x, k)
                    mis = jnp.where(mis > NEG, mis + 1, NEG)
                    ins = fetch(hist_I, los, s, k)
                    dele = fetch(hist_D, los, s, k)
                    f_pred = jnp.maximum(jnp.maximum(mis, ins), dele)
                    fail = f_pred <= NEG + 2
                    nmatch = f - f_pred
                    ops2 = ops.at[w].set(jnp.int8(0))
                    cnts2 = cnts.at[w].set(nmatch)
                    w2 = jnp.where(nmatch > 0, w + 1, w)
                    f2 = f_pred
                    # pref X, D, I
                    is_x = mis == f_pred
                    is_d = (~is_x) & (dele == f_pred)
                    # X: emit, s -= x, f -= 1, stay M
                    ops3 = ops2.at[w2].set(jnp.int8(1))
                    cnts3 = cnts2.at[w2].set(1)
                    s_x = s - x
                    f_x = f2 - 1
                    w_x = w2 + 1
                    s2 = jnp.where(is_x, s_x, s)
                    f3 = jnp.where(is_x, f_x, f2)
                    w3 = jnp.where(is_x, w_x, w2)
                    ops4 = jnp.where(is_x, ops3, ops2)
                    cnts4 = jnp.where(is_x, cnts3, cnts2)
                    state2 = jnp.where(
                        fail,
                        jnp.int32(4),
                        jnp.where(is_x, jnp.int32(0), jnp.where(is_d, jnp.int32(2), jnp.int32(1))),
                    )
                    return s2, k, f3, state2, w3, ops4, cnts4

                return lax.cond(s == 0, at_zero, step, None)

            # ---- I state: consume query, from k+1, f unchanged ----
            def i_state(_):
                op_val = fetch(hist_M, los, s - o - e, k + 1)
                ext_val = fetch(hist_I, los, s - e, k + 1)
                ops2 = ops.at[w].set(jnp.int8(2))
                cnts2 = cnts.at[w].set(1)
                w2 = w + 1
                is_open = op_val == f
                is_ext = (~is_open) & (ext_val == f)
                fail = (~is_open) & (~is_ext)
                s2 = jnp.where(is_open, s - o - e, s - e)
                state2 = jnp.where(
                    fail, jnp.int32(4), jnp.where(is_open, jnp.int32(0), jnp.int32(1))
                )
                return s2, k + 1, f, state2, w2, ops2, cnts2

            # ---- D state: consume target, from k-1, f -> f-1 ----
            def d_state(_):
                op_val = fetch(hist_M, los, s - o - e, k - 1)
                ext_val = fetch(hist_D, los, s - e, k - 1)
                ops2 = ops.at[w].set(jnp.int8(3))
                cnts2 = cnts.at[w].set(1)
                w2 = w + 1
                is_open = op_val == f - 1
                is_ext = (~is_open) & (ext_val == f - 1)
                fail = (~is_open) & (~is_ext)
                s2 = jnp.where(is_open, s - o - e, s - e)
                state2 = jnp.where(
                    fail, jnp.int32(4), jnp.where(is_open, jnp.int32(0), jnp.int32(2))
                )
                return s2, k - 1, f - 1, state2, w2, ops2, cnts2

            return lax.switch(state, [m_state, i_state, d_state], None)

        k0 = m - n
        st0 = (done_s, k0, m, jnp.where(done_s < 0, jnp.int32(4), jnp.int32(0)),
               jnp.int32(0), ops, cnts)
        s, k, f, state, w, ops, cnts = lax.while_loop(cond, body, st0)
        ok = state == 3
        return ops, cnts, w, ok

    return jax.jit(jax.vmap(tb_one))


# --------------------------------------------------------------------------
# host-facing batch API


class DeviceWFA:
    """Aligns batches of HSP windows on the device, returning op lists
    identical to ops/wfa.py:wfa_align's.  Falls back to the host for
    overflowing cases (span > W or score > S)."""

    #            (N,     M,     S,    W)
    BUCKETS = (
        (512, 512, 256, 128),
        (2048, 2048, 768, 128),
        (8192, 8192, 2048, 192),
        (30000, 30000, 4096, 256),  # offsets must fit int16 (< 32768)
    )

    def __init__(self, mismatch=4, gap_open=6, gap_ext=2,
                 min_wf_len=10, max_dist_diff=50, mesh=None):
        import threading

        from . import ensure_jax

        ensure_jax()

        self.x, self.o, self.e = mismatch, gap_open, gap_ext
        self.min_wf_len = min_wf_len
        self.max_dist_diff = max_dist_diff
        #: optional jax.sharding.Mesh — alignment pairs are independent, so
        #: the batch axis shards over ALL mesh devices (pure dp, no
        #: collectives; XLA partitions the jitted wavefront programs).
        self.mesh = mesh
        # (fwd, tb) published atomically per bucket: align_batch runs
        # concurrently from the phase-4 worker threads
        self._built = {}
        self._build_lock = threading.Lock()

    def _fns(self, bucket):
        fns = self._built.get(bucket)
        if fns is None:
            with self._build_lock:
                fns = self._built.get(bucket)
                if fns is None:
                    N, M, S, W = bucket
                    fwd = build_wfa_step(
                        N, M, S, W, self.x, self.o, self.e,
                        self.min_wf_len, self.max_dist_diff,
                    )
                    tb = build_wfa_traceback(S, W, S + 8, self.x, self.o, self.e)
                    fns = self._built[bucket] = (fwd, tb)
        return fns

    def _bucket_for(self, n, m):
        for b in self.BUCKETS:
            if n <= b[0] and m <= b[1]:
                return b
        return None

    def align_batch(self, pairs):
        """pairs: list of (qcodes uint8[n], tcodes uint8[m]).
        Returns list of ops-lists ([(op, count), ...], same as wfa_align)."""
        from ..ops.wfa import wfa_align

        results = [None] * len(pairs)
        from . import device_tripped

        if device_tripped():  # hung-transport breaker: host WFA downstream
            return results
        groups = {}
        for idx, (q, t) in enumerate(pairs):
            n, m = q.shape[0], t.shape[0]
            b = self._bucket_for(n, m) if n > 0 and m > 0 else None
            if b is None:
                r = wfa_align(q, t)
                results[idx] = r.ops if r is not None else None
                continue
            groups.setdefault(b, []).append(idx)

        for b, all_idxs in groups.items():
            N, M, S, W = b
            # wavefront history is [B, S, W] int16 x3: bound the batch dim
            # so a many-hit batch (thousands of spans) cannot exceed HBM —
            # ~512 MB of history per dispatch, pow2 so chunk shapes reuse
            # compiled kernels
            b_max = 8
            while b_max * S * W * 6 * 2 <= (512 << 20):
                b_max <<= 1
            for c0 in range(0, len(all_idxs), b_max):
                idxs = all_idxs[c0 : c0 + b_max]
                self._align_bucket(b, idxs, pairs, results)
        return results

    def _align_bucket(self, b, idxs, pairs, results):
        """One padded dispatch of bucket `b` over `idxs` (<= the bucket's
        memory-bounded max batch)."""
        from ..ops.wfa import wfa_align

        N, M, S, W = b
        fwd, tb = self._fns(b)
        # pad the batch dim to a power of two (min 8): B is otherwise a
        # fresh jit specialization per distinct batch size — through a
        # remote transport each compile costs seconds, dwarfing the
        # alignment itself.  Padding rows replicate row 0 (valid work,
        # discarded) so the kernels see no degenerate inputs.
        B = len(idxs)
        B_pad = 8
        while B_pad < B:
            B_pad <<= 1
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            B_pad = ((B_pad + n_dev - 1) // n_dev) * n_dev
        from .pseudo_device import pack_codes_2bit

        qw = np.zeros((B_pad, dense_words(N)), dtype=np.uint32)
        tw = np.zeros((B_pad, dense_words(M)), dtype=np.uint32)
        ns = np.zeros(B_pad, dtype=np.int32)
        ms = np.zeros(B_pad, dtype=np.int32)
        for row, idx in enumerate(idxs):
            q, t = pairs[idx]
            qw[row] = pack_codes_2bit(q, 16 * dense_words(N))
            tw[row] = pack_codes_2bit(t, 16 * dense_words(M))
            ns[row] = q.shape[0]
            ms[row] = t.shape[0]
        if B < B_pad:
            qw[B:] = qw[0]
            tw[B:] = tw[0]
            ns[B:] = ns[0]
            ms[B:] = ms[0]
        from . import count_h2d

        count_h2d("device WFA", qw, tw, ns, ms)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = tuple(self.mesh.axis_names)
            row_sh = NamedSharding(self.mesh, P(axes, None))
            vec_sh = NamedSharding(self.mesh, P(axes))
            qw = jax.device_put(qw, row_sh)
            tw = jax.device_put(tw, row_sh)
            ns = jax.device_put(ns, vec_sh)
            ms = jax.device_put(ms, vec_sh)
        from . import fetch_guarded

        hist_M, hist_I, hist_D, los, done_s = fwd(qw, tw, ns, ms)
        fetched = fetch_guarded(
            tb(hist_M, hist_I, hist_D, los, done_s, ns, ms),
            "device WFA",
            compile_key=(b, B_pad),
        )
        if fetched is None:  # watchdog tripped: bucket to the host WFA
            for idx in idxs:
                q, t = pairs[idx]
                r = wfa_align(q, t)
                results[idx] = r.ops if r is not None else None
            return
        ops_a, cnts_a, ws, oks = fetched
        code2op = "MXID"
        for row, idx in enumerate(idxs):
            if not oks[row]:
                # overflow / failure: host fallback (rare)
                q, t = pairs[idx]
                r = wfa_align(q, t)
                results[idx] = r.ops if r is not None else None
                continue
            w = int(ws[row])
            ops: list[tuple[str, int]] = []
            for j in range(w - 1, -1, -1):  # stored newest-first
                opch = code2op[int(ops_a[row, j])]
                cnt = int(cnts_a[row, j])
                if cnt <= 0:
                    continue
                if ops and ops[-1][0] == opch:
                    ops[-1] = (opch, ops[-1][1] + cnt)
                else:
                    ops.append((opch, cnt))
            results[idx] = ops
