"""Virtual-mesh scaling probe toward the >=80% BASELINE target.

Measures the sharded seed-locate step on the 8-device virtual CPU mesh at
tp = 1/2/4/8 over the REAL demo index, reporting per-shard table bytes,
analytic per-shard work (bucket rows x log2(E)), load balance, and
wall-clock per batched dispatch (CPU devices share host cores, so the
wall numbers show overhead/balance rather than true chip speedup; the
analytic columns are the scaling statement).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/mesh_scaling.py
"""
from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def main():
    import __graft_entry__ as g

    g._enable_compile_cache()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.sharded import ShardedSeedMatcher
    from lexicmap_tpu.utils.fasta import read_fastx
    from lexicmap_tpu.utils.kmers import seq_to_codes

    db = os.environ.get("LEXICMAP_TPU_DEMO_DB", "/tmp/demo.lmt")
    idx = IndexSearcher(db, SearchOptions())
    rec = next(iter(read_fastx("/root/reference/demo/q.gene.fasta")))
    kmers, _ = idx._mask_query(seq_to_codes(rec.seq))
    batch = np.tile(kmers, (8, 1))

    print("tp | shard MB | work/shard | balance | ms/dispatch (8 queries)")
    for tp in (1, 2, 4, 8):
        devs = np.array(jax.devices()[:tp]).reshape(1, tp)
        mesh = Mesh(devs, ("dp", "tp"))
        m = ShardedSeedMatcher(idx, mesh)
        work = np.zeros(tp)
        for E, _t, _hi, _cnt, _gids, _mb, ids_per_shard in m.buckets:
            for s, ids in enumerate(ids_per_shard):
                work[s] += ids.shape[0] * math.log2(E)
        out = m.match_batch(batch, idx.opt.min_prefix)  # compile + warm
        assert all(o is not None for o in out)
        t0 = time.time()
        for _ in range(5):
            m.match_batch(batch, idx.opt.min_prefix)
        dt = (time.time() - t0) / 5
        print(
            f"{tp:2d} | {m.hbm_bytes / tp / 1e6:7.1f} | {work.max():10.0f} | "
            f"{work.mean() / work.max():7.3f} | {dt * 1e3:8.1f}"
        )


if __name__ == "__main__":
    main()
