"""Warm-throughput sizing for the device phase 4: DevicePseudoAligner and
DeviceWFA on realistic demo workloads, at 1x..32x query multiplicity.
Prints marginal ms/query for each stage.  Diagnostic only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__ as g

g._enable_compile_cache()

DB = "/tmp/lexicmap_tpu_bench/demo.lmt"
QUERY = "/root/reference/demo/q.gene.fasta"


def main():
    from scripts.pseudo_device_diff import collect_windows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.ops.seqcompare import SeqComparator
    from lexicmap_tpu.parallel.pseudo_device import DevicePseudoAligner
    from lexicmap_tpu.parallel.wfa_device import DeviceWFA
    from lexicmap_tpu.utils.fasta import read_fastx
    from lexicmap_tpu.utils.kmers import seq_to_codes

    import jax
    print(jax.devices())

    idx = IndexSearcher(DB, SearchOptions())
    rec = next(read_fastx(QUERY))
    qcodes = seq_to_codes(rec.seq.upper())
    cpr = SeqComparator(idx.opt.seqcompare_options())
    cpr.index(qcodes)
    wins = collect_windows(idx, qcodes)
    print(f"windows/query: {len(wins)}")

    copt = cpr.opt.chaining
    dev = DevicePseudoAligner(
        band_base=copt.band_base, band_count=copt.band_count,
        max_gap=int(copt.max_gap), min_score=int(copt.min_score),
        min_align_len=copt.min_align_len,
    )

    for mult in (1, 4, 16, 32):
        queries = [(cpr.qk, cpr.qv)] * min(mult, 32)
        windows = [
            (q, t, b, e)
            for q in range(min(mult, 32))
            for _ in range(mult // min(mult, 32))
            for (t, b, e) in wins
        ]
        # warm
        dev.run_batch(queries, windows)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            dev.run_batch(queries, windows)
        dt = (time.time() - t0) / reps
        print(f"pseudo-align x{mult}: {dt*1000:.0f}ms total, "
              f"{dt/mult*1000:.1f}ms/query, {dt/len(windows)*1e6:.0f}us/window")

    # WFA: synthesize realistic HSP pairs (1.5kb, ~99% identity with indels)
    rng = np.random.default_rng(0)
    base = qcodes[: 1542]

    def mutate(c):
        c = c.copy()
        n_sub = 12
        pos = rng.integers(0, c.shape[0], size=n_sub)
        c[pos] = (c[pos] + rng.integers(1, 4, size=n_sub)) % 4
        # one small indel
        p = int(rng.integers(100, c.shape[0] - 100))
        return np.concatenate([c[:p], c[p + 3:]])

    wdev = DeviceWFA()
    for mult in (1, 4, 16, 32):
        pairs = [(base, np.ascontiguousarray(mutate(base))) for _ in range(84 * mult)]
        wdev.align_batch(pairs[:84])  # warm bucket
        t0 = time.time()
        out = wdev.align_batch(pairs)
        dt = time.time() - t0
        nf = sum(1 for r in out if r is None)
        print(f"wfa x{mult} ({len(pairs)} pairs): {dt*1000:.0f}ms total, "
              f"{dt/mult*1000:.1f}ms/query, {dt/len(pairs)*1e6:.0f}us/pair, none={nf}")


if __name__ == "__main__":
    main()
