#!/usr/bin/env python
"""TPU device-path benchmark (separate from the host bench in bench.py).

Measures, on the available TPU chip:
  1. raw Pallas seed-match kernel latency over the full demo index
     (20000 masks x E entries per mask), steady state;
  2. batched `search_many` end-to-end throughput (one vmapped dispatch per
     batch + host phases 2-4).

Prints one JSON line. First kernel compile through the axon tunnel takes
minutes; this script reports warm steady-state numbers, which are what a
serving deployment would see.

Usage: python scripts/tpu_bench.py  (needs the bench demo index; run
bench.py once first to build it at /tmp/lexicmap_tpu_bench/demo.lmt)
"""

import json
import os
import sys
import time

DEMO_DB = os.environ.get(
    "LEXICMAP_TPU_BENCH_DB", "/tmp/lexicmap_tpu_bench/demo.lmt"
)
GENE_QUERY = "/root/reference/demo/q.gene.fasta"


def main():
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    import jax

    # persistent compilation cache: the cold vmapped-kernel compile through
    # the axon tunnel takes minutes; later runs start warm
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    platform = jax.devices()[0].platform
    s = IndexSearcher(DEMO_DB, SearchOptions(engine="device"))
    if s.device_matcher is None:
        print(json.dumps({"error": "device matcher unavailable"}))
        return 1
    rec = next(read_fastx(GENE_QUERY))

    # 1) raw kernel latency: mask the query once, then time match() warm
    from lexicmap_tpu.utils.kmers import seq_to_codes

    qcodes = seq_to_codes(rec.seq.upper())
    kmers, _ = s._mask_query(qcodes)
    s.device_matcher.match(kmers, s.opt.min_prefix)  # compile + warm
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        s.device_matcher.match(kmers, s.opt.min_prefix)
    kernel_ms = (time.time() - t0) / reps * 1000

    # 2) batched end-to-end: one vmapped dispatch per 32-query batch
    seqs = [rec.seq] * 32
    s.search_many(seqs)  # compile + warm
    t0 = time.time()
    for _ in range(3):
        s.search_many(seqs)
    batch_s = (time.time() - t0) / 3
    qpm = 32 / batch_s * 60

    print(
        json.dumps(
            {
                "metric": "tpu_device_search",
                "platform": platform,
                # includes the host<->device transport round-trip; the pure
                # on-device kernel time is ~0.25 ms (tests/test_pallas.py)
                "dispatch_ms_per_query": round(kernel_ms, 3),
                "batched_e2e_qpm": round(qpm, 1),
                "batched_e2e_s_per_query": round(batch_s / 32, 4),
                "masks": s.mask_set.m,
                "entries_per_mask": s.device_matcher.E,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
