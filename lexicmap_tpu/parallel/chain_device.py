"""Device twin of the phase-3 chainer (Chainer.Chain's forward DP).

The forward DP of ops/chaining.py::chain (ref: lib-chaining.go:122-633,
mirrored by native chain1_forward) runs as a lax.scan over the anchor
index with a fixed-width predecessor window, vmapped over genomes — so the
chaining of EVERY genome of EVERY query in an engine batch is a handful of
device dispatches.  Backtracking (pointer chasing with visited marks)
stays on the host, exactly like the native path.

Bit-exactness strategy (the host DP is float32 except one float64 log2):

* seed weight 0.1f*l*l and the score sum (base + w) - gap are pure float32
  IEEE ops on both sides (anchor coordinates < 2^24 cast exactly).
* the gap value g is integer-valued (differences of integer coordinates),
  so it is computed in int32 on the device — exact — and the gap score
  0.1f*g + 0.5f*float32(log2(float64(g))) is looked up from a
  host-precomputed table indexed by g (g <= max_gap, 50 by default), which
  reproduces the host's float64 rounding without needing x64 on the TPU.
* the predecessor window is exact when it spans the whole bucket
  (n_pad <= window); larger anchor sets detect window truncation
  (a candidate with qd <= max_distance fell outside the window) and flag
  the genome for the host chainer — exactness by detection, the same
  contract as the device pseudo-aligner.
"""

from __future__ import annotations

import numpy as np

from . import ensure_jax

#: bucket sizes for padded anchor counts; window = min(bucket, WINDOW)
BUCKETS = (128, 512, 2048, 8192)
WINDOW = 512

#: sentinel for front-padding / end-padding anchor coordinates: qd becomes
#: huge so padded lanes never qualify as predecessors
_SENT = np.int32(-(1 << 30))


def gap_score_table(max_gap: float) -> np.ndarray:
    """Host-side table of the chain1 gap score for integer g in
    [0, floor(max_gap)], computed with the exact host formula
    (ops/chaining.py::_gap_score_vec, float64 log2 rounded to float32)."""
    n = int(np.floor(max_gap)) + 1
    g = np.arange(n, dtype=np.float32)
    out = np.zeros(n, dtype=np.float32)
    nz = g > 0
    out[nz] = (np.float32(0.1) * g[nz]) + (
        np.float32(0.5) * np.log2(g[nz].astype(np.float64)).astype(np.float32)
    )
    return out


def build_chain1_fn(n_pad: int, window: int, max_gap: float, min_score: float,
                    max_dist: int):
    """Returns a jitted fn(qb, tb, ln, n, gtab) vmapped over genomes:

      qb/tb/ln: int32 [B, n_pad] anchor coords (sorted by qb asc; padded
                rows carry the _SENT sentinel)
      n:        int32 [B] real anchor counts
      gtab:     float32 [floor(max_gap)+1] gap-score table

    -> (max_scores f32 [B, n_pad], prev_idx i32 [B, n_pad],
        directions i32 [B, n_pad], truncated bool [B])
    """
    import jax
    import jax.numpy as jnp

    ensure_jax()
    W = window
    max_gap_f = np.float32(max_gap)
    min_score_f = np.float32(min_score)
    max_dist_i = np.int32(max_dist)

    def one(qb, tb, ln, n, gtab):
        # front-pad by W so the predecessor window of step i is a static
        # slice [i, i+W) of the padded arrays (orig j = i-W .. i-1)
        pad = jnp.full((W,), _SENT, dtype=jnp.int32)
        qb_p = jnp.concatenate([pad, qb])
        tb_p = jnp.concatenate([pad, tb])
        ln_p = jnp.concatenate([pad, ln])

        sw0 = jnp.float32(0.1) * ln.astype(jnp.float32) * ln.astype(jnp.float32)

        def step(state, i):
            ms_p, dir_p, trunc = state
            aq = qb_p[W + i]
            at = tb_p[W + i]
            al = ln_p[W + i]
            m0 = jnp.float32(0.1) * al.astype(jnp.float32) * al.astype(jnp.float32)

            bq = jax.lax.dynamic_slice(qb_p, (i,), (W,))
            bt = jax.lax.dynamic_slice(tb_p, (i,), (W,))
            bl = jax.lax.dynamic_slice(ln_p, (i,), (W,))
            bms = jax.lax.dynamic_slice(ms_p, (i,), (W,))
            bdir = jax.lax.dynamic_slice(dir_p, (i,), (W,))
            j_orig = i - W + jnp.arange(W, dtype=jnp.int32)

            qd = aq - bq
            td = at - bt
            atd = jnp.abs(td)
            cand = (qd > 0) & (qd <= max_dist_i) & (td != 0) & (atd <= max_dist_i)

            # gap: integer-exact, direction dependent (lib-chaining.go:655-660)
            alt = jnp.abs((at + al) - (bt + bl))
            g_int = jnp.where(at >= bt, jnp.abs(qd - atd), jnp.abs(qd - alt))
            ok_gap = g_int.astype(jnp.float32) <= max_gap_f
            gap = gtab[jnp.clip(g_int, 0, gtab.shape[0] - 1)]

            # effective seed weight (lib-chaining.go:429-446)
            bqe = bq + bl
            no_ovl = aq > bqe
            length = jnp.where(
                no_ovl, al, jnp.where(g_int == 0, aq + al - bq, aq + al - bqe)
            ).astype(jnp.float32)
            # optimization_barrier: the host rounds each 0.1*l*l product to
            # float32 before the sums; without the barrier XLA fuses the
            # final multiply into the following add as an FMA (1-2 ulp off)
            sw_len = jax.lax.optimization_barrier(
                jnp.float32(0.1) * length * length
            )
            sw_bl = jax.lax.optimization_barrier(
                jnp.float32(0.1) * bl.astype(jnp.float32) * bl.astype(jnp.float32)
            )
            w = jnp.where(no_ovl | (g_int != 0), sw_len, -sw_bl + sw_len)

            dirs = jnp.where(at >= bt, jnp.int32(1), jnp.int32(-1))
            same = (bdir == 0) | (bdir == dirs)
            base = jnp.where(same, bms, sw_bl)
            s = (base + w) - gap

            valid = cand & ok_gap & (s >= min_score_f) & (s > m0)
            s_m = jnp.where(valid, s, -jnp.inf)
            best = jnp.max(s_m)
            any_valid = jnp.any(valid)
            # largest j among score ties (native scans j descending with
            # strict improvement)
            pick = jnp.max(jnp.where(valid & (s_m == best), j_orig, -1))
            pos = pick - (i - W)
            dir_i = jnp.where(any_valid, dirs[jnp.clip(pos, 0, W - 1)], 0)
            ms_i = jnp.where(any_valid, best, m0)
            prev_i = jnp.where(any_valid, pick, i)

            # window truncation: the first excluded predecessor (orig
            # j = i-W-1, padded index i-1) still satisfies qd <= max_dist
            t_i = (qb_p[jnp.maximum(i - 1, 0)] != _SENT) & (
                (aq - qb_p[jnp.maximum(i - 1, 0)]) <= max_dist_i
            ) & (i - 1 >= 0) & (i < n)

            ms_p = jax.lax.dynamic_update_slice(ms_p, ms_i[None], (W + i,))
            dir_p = jax.lax.dynamic_update_slice(dir_p, dir_i[None], (W + i,))
            return (ms_p, dir_p, trunc | t_i), (ms_i, prev_i, dir_i)

        ms0 = jnp.zeros((W + n_pad,), dtype=jnp.float32)
        ms0 = ms0.at[W].set(sw0[0])
        dir0 = jnp.zeros((W + n_pad,), dtype=jnp.int32)
        (ms_p, dir_p, trunc), (ms_s, prev_s, dir_s) = jax.lax.scan(
            step, (ms0, dir0, jnp.bool_(False)),
            jnp.arange(1, n_pad, dtype=jnp.int32),
        )
        ms = jnp.concatenate([sw0[:1], ms_s])
        prev = jnp.concatenate([jnp.zeros(1, jnp.int32), prev_s])
        dirs = jnp.concatenate([jnp.zeros(1, jnp.int32), dir_s])
        return ms, prev, dirs, trunc

    import jax

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, None)))


class DeviceChainer:
    """Batched phase-3 forward DP on the device with host backtracking.

    chain_batch() takes per-genome anchor arrays (already cleared/sorted by
    the host, ops/chaining.py::clear_substr_pairs) and returns per genome
    either ('ok', (max_scores, prev_idx, directions)) for the host
    backtrack, or ('host', None) when the genome must use the host chainer
    (window truncation or anchor count above the largest bucket)."""

    def __init__(self, max_gap: float, min_score: float, max_dist: int,
                 mesh=None):
        ensure_jax()
        self.max_gap = float(max_gap)
        self.min_score = float(min_score)
        self.max_dist = int(max_dist)
        self.mesh = mesh
        self._fns = {}
        self._gtab = gap_score_table(self.max_gap)
        self._gtab_dev = None
        self.stats = {"genomes": 0, "host_genomes": 0}

    def _fn(self, n_pad):
        fn = self._fns.get(n_pad)
        if fn is None:
            fn = build_chain1_fn(
                n_pad, min(n_pad, WINDOW), self.max_gap, self.min_score,
                self.max_dist,
            )
            self._fns[n_pad] = fn
        return fn

    def _pad_rows(self, b):
        if self.mesh is None:
            return b
        n_dev = self.mesh.devices.size
        return ((b + n_dev - 1) // n_dev) * n_dev

    def chain_batch(self, anchor_sets):
        """anchor_sets: list of (qb, tb, ln) int32 arrays (host order).
        Returns a list aligned with the input (see class docstring)."""
        import jax

        from . import device_tripped

        if device_tripped():  # hung-transport breaker: host chainer
            return [("host", None)] * len(anchor_sets)

        out = [None] * len(anchor_sets)
        groups: dict[int, list[int]] = {}
        for idx, (qb, tb, ln) in enumerate(anchor_sets):
            n = qb.shape[0]
            n_pad = next((b for b in BUCKETS if n <= b), None)
            if n_pad is None or n < 2:
                out[idx] = ("host", None)
                continue
            groups.setdefault(n_pad, []).append(idx)

        if self._gtab_dev is None:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._gtab_dev = jax.device_put(
                    self._gtab, NamedSharding(self.mesh, P())
                )
            else:
                self._gtab_dev = jax.device_put(self._gtab)

        for n_pad, idxs in groups.items():
            B = len(idxs)
            B_pad = 8
            while B_pad < B:
                B_pad <<= 1
            B_pad = self._pad_rows(B_pad)
            qb = np.full((B_pad, n_pad), _SENT, dtype=np.int32)
            tb = np.full((B_pad, n_pad), _SENT, dtype=np.int32)
            ln = np.full((B_pad, n_pad), 1, dtype=np.int32)
            ns = np.zeros(B_pad, dtype=np.int32)
            for row, idx in enumerate(idxs):
                a, b, c = anchor_sets[idx]
                n = a.shape[0]
                qb[row, :n] = a
                tb[row, :n] = b
                ln[row, :n] = c
                ns[row] = n
            if B < B_pad:
                qb[B:] = qb[0]
                tb[B:] = tb[0]
                ln[B:] = ln[0]
                ns[B:] = ns[0]
            from . import count_h2d

            count_h2d("device chain DP", qb, tb, ln, ns)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                axes = tuple(self.mesh.axis_names)
                row_sh = NamedSharding(self.mesh, P(axes, None))
                vec_sh = NamedSharding(self.mesh, P(axes))
                qb = jax.device_put(qb, row_sh)
                tb = jax.device_put(tb, row_sh)
                ln = jax.device_put(ln, row_sh)
                ns = jax.device_put(ns, vec_sh)
            from . import fetch_guarded

            fetched = fetch_guarded(
                self._fn(n_pad)(qb, tb, ln, ns, self._gtab_dev),
                "device chain DP",
                compile_key=n_pad,
            )
            if fetched is None:  # watchdog tripped: bucket to the host chainer
                for idx in idxs:
                    self.stats["genomes"] += 1
                    self.stats["host_genomes"] += 1
                    out[idx] = ("host", None)
                continue
            ms, prev, dirs, trunc = fetched
            for row, idx in enumerate(idxs):
                n = anchor_sets[idx][0].shape[0]
                self.stats["genomes"] += 1
                if trunc[row]:
                    self.stats["host_genomes"] += 1
                    out[idx] = ("host", None)
                else:
                    out[idx] = (
                        "ok",
                        (
                            ms[row, :n].astype(np.float32),
                            prev[row, :n].astype(np.int64),
                            dirs[row, :n].astype(np.int8),
                        ),
                    )
        return out
