"""Warm throughput of the device engine vs the host engine on the demo
gene query (batch of N identical queries, like bench.py's workload)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as g

g._enable_compile_cache()

DB = "/tmp/lexicmap_tpu_bench/demo.lmt"
QUERY = "/root/reference/demo/q.gene.fasta"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    rec = next(read_fastx(QUERY))
    seqs = [rec.seq] * N

    from lexicmap_tpu import parallel

    idx_d = IndexSearcher(DB, SearchOptions(engine="device"))
    idx_d.search_many(seqs[:32])  # warm (compiles)
    f0 = parallel.fetch_count
    snap = {k: dict(v) for k, v in parallel.transport.items()}
    t0 = time.time()
    out = idx_d.search_many(seqs)
    dt = time.time() - t0
    nf = parallel.fetch_count - f0
    print(f"device engine: {dt:.2f}s for {N} queries = {dt/N*1000:.1f}ms/q "
          f"= {N/dt*60:.0f} q/min; {nf} guarded fetches "
          f"({nf/max(N//32,1):.1f}/32-q batch); "
          f"stats={idx_d._device_engine.pseudo.stats}; "
          f"tripped={parallel.device_tripped()}")
    print(f"transport per stage (measured run only, {N} queries):")
    for k, v in parallel.transport_summary().items():
        s = snap.get(k, {"fetches": 0, "d2h_bytes": 0, "h2d_bytes": 0})
        if k == "TOTAL":
            s = {f: sum(x[f] for x in snap.values()) for f in s}
        df, dh, du = (v["fetches"] - s["fetches"], v["d2h_bytes"] - s["d2h_bytes"],
                      v["h2d_bytes"] - s["h2d_bytes"])
        print(f"  {k}: {df} fetches, h2d {du/1e6:.2f} MB, d2h {dh/1e6:.2f} MB")

    idx_h = IndexSearcher(DB, SearchOptions())
    idx_h.search_bytes(rec.seq)  # warm
    t0 = time.time()
    for s in seqs[: N // 2]:
        idx_h.search_bytes(s)
    dt = time.time() - t0
    n = N // 2
    print(f"host engine (1 proc): {dt:.2f}s for {n} queries = {dt/n*1000:.1f}ms/q "
          f"= {n/dt*60:.0f} q/min")


if __name__ == "__main__":
    main()
    from lexicmap_tpu.parallel import hard_exit_if_abandoned

    hard_exit_if_abandoned(0)
