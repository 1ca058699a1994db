"""Speed-of-light audit for the flagship device kernels.

Measures ON-DEVICE kernel time by chaining K iterations inside one jit
(the ~25 ms tunnel dispatch latency is paid once per measurement, not per
iteration) and compares against the roofline bound.

Kernels audited:
  1. seed_locate_batch_pallas — the phase-2a seed-matching kernel at the
     demo index's dominant bucket shape.  Arithmetic intensity ~1.5 int32
     VPU ops per byte of seed table -> HBM-bandwidth bound.
  2. The device WFA forward pass (wavefront DP) at a typical HSP shape.

Chip model (TPU v5 lite / v5e, one chip):
  HBM bandwidth  ~819 GB/s
  VPU int32      ~4 ops/lane/cycle * 8 sublanes * 128 lanes * ~0.94 GHz
                 ~3.9e12 ops/s   (vector units only; the MXU does not help
                 these elementwise/DP kernels)

Usage: python scripts/roofline.py [k2]
  k2 = depth of the LONG chain in the two-depth fit (default 96; values
  below 96 are clamped up to 96).  The short chain is fixed at k1=8; the
  fit t(K) = RTT + K*kern across the two depths separates transport from
  kernel time, so k2 only controls fit leverage, not the iteration count
  of a single timing loop.
Writes a markdown table to stdout; docs/performance.md quotes the result.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lexicmap_tpu.parallel import ensure_jax

ensure_jax()

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0  # TPU v5e
VPU_OPS = 3.9e12  # int32 elementwise ops/s (approx; see header)


def audit_seed_locate(iters: int):
    from lexicmap_tpu.parallel.pallas_kernels import seed_locate_batch_pallas

    # demo index's dominant bucket: 14,000 masks x 128 entries, tile 200,
    # engine batch B=32
    M, E, tile, B = 14000, 128, 200, 32
    rng = np.random.default_rng(0)
    seed_hi = jnp.asarray(
        np.sort(rng.integers(0, 2**32, (M, E), dtype=np.uint64).astype(np.uint32), axis=1)
    )
    seed_cnt = jnp.asarray(np.full(M, E, np.int32))
    qh0 = jnp.asarray(rng.integers(0, 2**32, (B, M), dtype=np.uint64).astype(np.uint32))
    qv = jnp.asarray(np.ones((B, M), np.int32))

    # Two straight-line chains of K sequential pallas calls inside one jit
    # (fori-loop-of-pallas hangs this backend's compiler) at two depths;
    # a whole chain costs ONE tunnel round-trip, so fitting
    #   t(K) = RTT + K * kern
    # across the depths separates the transport from the kernel.
    def make_chain(k):
        @jax.jit
        def chained(qh):
            for _ in range(k):
                nh, e0 = seed_locate_batch_pallas(
                    seed_hi, seed_cnt, qh, qv, p=15, tile_m=tile
                )
                # REAL data dependency (a *0 trick constant-folds and XLA
                # dead-code-eliminates the whole chain); the kernel's
                # compares are data-independent so perf is representative
                qh = qh ^ nh.astype(jnp.uint32) ^ e0.astype(jnp.uint32)
            return qh

        return chained

    k1, k2 = 8, max(iters, 96)
    times = {}
    for k in (k1, k2):
        fn = make_chain(k)
        fn(qh0).block_until_ready()  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn(qh0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    kern = max((times[k2] - times[k1]) / (k2 - k1), 1e-9)
    rtt = max(times[k1] - k1 * kern, 0.0)
    dt = kern

    # roofline: the seed table is the dominant HBM traffic.  With the batch
    # minor in the grid each table tile is loaded once per query row unless
    # the pipeline keeps it resident; count the worst case (B loads) and the
    # best case (1 load) to bracket the bound.
    table_bytes = M * E * 4
    q_bytes = 2 * B * M * 4 + 2 * B * M * 4  # qh+qv in, nh+e0 out
    best_bytes = table_bytes + q_bytes
    worst_bytes = table_bytes * B + q_bytes
    ops = 6.0 * M * E * B  # cmp lb, cmp rb, and-chain, 2 sums, select
    bound_best = max(best_bytes / (HBM_GBPS * 1e9), ops / VPU_OPS)
    bound_worst = max(worst_bytes / (HBM_GBPS * 1e9), ops / VPU_OPS)
    return {
        "kernel": "seed_locate_batch (14000x128, B=32)",
        "measured_us": dt * 1e6,
        "bound_us": bound_best * 1e6,
        "bound_worst_us": bound_worst * 1e6,
        "of_bound": bound_best / dt * 100,
        "note": (
            f"{ops/1e6:.0f}M VPU ops, table {table_bytes/1e6:.1f} MB; "
            f"fit over {k1}/{k2}-deep chains, transport RTT {rtt*1e3:.1f} ms "
            f"paid once per dispatch"
        ),
    }


def audit_wfa(iters: int):
    from lexicmap_tpu.parallel.wfa_device import DeviceWFA

    wfa = DeviceWFA()
    rng = np.random.default_rng(1)
    # typical demo HSP: ~1.6 kb pair at ~1% divergence, batch of 64
    n = 1542
    B = 64
    pairs = []
    for _ in range(B):
        q = rng.integers(0, 4, n).astype(np.uint8)
        t = q.copy()
        mut = rng.integers(0, n, max(n // 100, 1))
        t[mut] = (t[mut] + 1) % 4
        pairs.append((q, t))

    r = wfa.align_batch(pairs)  # warm-up: jit compile + tunnel ramp
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = wfa.align_batch(pairs)
        best = min(best, time.perf_counter() - t0)
    dt_all = best
    ok = sum(1 for x in r if x is not None)

    # WFA wavefront DP: s waves of 2s+1 diagonals; at divergence d the
    # score ~ x*errors ~ 4*n/100.  Memory: wavefront history (3 arrays of
    # [smax, 2smax+1] i32) written once -> bytes ~ 3*smax^2*4 per pair.
    smax = 4 * n // 100 + 20
    bytes_pair = 3 * smax * (2 * smax + 1) * 4
    ops_pair = 3 * smax * (2 * smax + 1) * 8  # extend+minmax per cell
    bound = max(B * bytes_pair / (HBM_GBPS * 1e9), B * ops_pair / VPU_OPS)
    return {
        "kernel": f"device WFA fwd+tb ({n} bp x {B} pairs, ~1% div)",
        "measured_us": dt_all * 1e6,
        "bound_us": bound * 1e6,
        "bound_worst_us": bound * 1e6,
        "of_bound": bound / dt_all * 100,
        "note": f"{ok}/{B} device-aligned; includes 1 dispatch + h2d/d2h",
    }


def audit_wfa_batch_scaling(Bs=(64, 256, 1024)):
    """ms/pair of the WFA FORWARD pass vs batch size, chain-fit method
    (comparable to the seed-locate row, unlike audit_wfa's end-to-end
    number): K forward passes chained inside one jit with an opaque
    always-zero data dependency, t(K) = RTT + K*kern fitted over two
    depths.  The sequential wavefront depth is amortized across the
    batch's lanes, so per-pair cost should fall ~1/B until the VPU is
    saturated — the knee is where the many-hit regime (thousands of
    spans per batch) should run."""
    from lexicmap_tpu.parallel.pseudo_device import pack_codes_2bit
    from lexicmap_tpu.parallel.wfa_device import build_wfa_step, dense_words

    N = M = 512  # the bucket many-hit spans land in
    S, W = 256, 128
    rng = np.random.default_rng(2)
    n = 480
    rows = []
    for B in Bs:
        qp = np.zeros((B, dense_words(N)), dtype=np.uint32)
        tp = np.zeros((B, dense_words(M)), dtype=np.uint32)
        ns = np.full(B, n, dtype=np.int32)
        ms = np.full(B, n, dtype=np.int32)
        for b in range(B):
            q = rng.integers(0, 4, n).astype(np.uint8)
            t = q.copy()
            mut = rng.integers(0, n, max(n // 100, 1))
            t[mut] = (t[mut] + 1) % 4
            qp[b] = pack_codes_2bit(q, 16 * dense_words(N))
            tp[b] = pack_codes_2bit(t, 16 * dense_words(M))

        fwd = build_wfa_step(N, M, S, W, 4, 6, 2, 10, 50)

        def make_chain(k):
            @jax.jit
            def chained(qp_a, tp_a, ns_a, ms_a):
                for _ in range(k):
                    hM, hI, hD, lo, done = fwd(qp_a, tp_a, ns_a, ms_a)
                    # opaque always-zero dependency (done >= -1 at runtime,
                    # unprovable through the while_loop, so no DCE)
                    dep = (done < jnp.int32(-1)).astype(jnp.uint32)
                    qp_a = qp_a ^ dep[:, None]
                return qp_a, done

            return chained

        k1, k2 = 2, 8
        times = {}
        args = tuple(jnp.asarray(a) for a in (qp, tp, ns, ms))
        for k in (k1, k2):
            fn = make_chain(k)
            jax.block_until_ready(fn(*args))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        kern = max((times[k2] - times[k1]) / (k2 - k1), 1e-9)
        rows.append(
            {
                "kernel": f"WFA fwd {n}bp ~1% div, B={B}",
                "measured_us": kern * 1e6 / B,
                "bound_us": float("nan"),
                "bound_worst_us": float("nan"),
                "of_bound": float("nan"),
                "note": f"{kern*1e3:.1f} ms/batch forward (chain-fit, "
                        f"transport excluded); {kern*1e6/B:.0f} us/pair",
            }
        )
    return rows


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"platform: {jax.devices()[0]}")
    rows = []
    rows.append(audit_seed_locate(iters))
    rows.append(audit_wfa(iters))
    rows.extend(audit_wfa_batch_scaling())
    print()
    print("| kernel | measured | roofline bound | % of bound | note |")
    print("|---|---|---|---|---|")
    for r in rows:
        import math

        if math.isnan(r["bound_us"]):
            b = pct = "-"
        else:
            b = f"{r['bound_us']:.0f} us"
            if r["bound_worst_us"] != r["bound_us"]:
                b += f" (worst-case {r['bound_worst_us']:.0f})"
            pct = f"{r['of_bound']:.0f}%"
        print(
            f"| {r['kernel']} | {r['measured_us']:.0f} us | {b} "
            f"| {pct} | {r['note']} |"
        )


if __name__ == "__main__":
    main()
