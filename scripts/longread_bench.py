"""Long-read benchmark: mapping rate + throughput on the demo index.

Read set: scripts/gen_long_reads.py output (Badread-parameter-faithful ONT
reads; the reference's demo/q.long-reads.fasta.gz itself is not in the
mount).  Reports per engine: queries/min, reads mapped (any hit), reads
mapped to their source genome (recall), using the reference's long-read
guidance defaults.

Usage: python scripts/longread_bench.py [n_reads] [engine...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

READS = "/tmp/lexicmap_tpu_bench/q.long-reads.fasta.gz"
DB = "/tmp/lexicmap_tpu_bench/demo.lmt"


def main():
    n_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    engines = sys.argv[2:] or ["host", "device"]

    import __graft_entry__ as g

    g._enable_compile_cache()
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    reads = []
    for rec in read_fastx(READS):
        reads.append((rec.id.decode(), rec.seq))
        if len(reads) >= n_cap:
            break
    total_bp = sum(len(s) for _, s in reads)
    print(f"{len(reads)} reads, {total_bp:,} bp")

    for engine in engines:
        idx = IndexSearcher(DB, SearchOptions(engine=engine, top_n=0))
        # warm
        idx.search_many([reads[0][1]] * (32 if engine == "device" else 1))
        t0 = time.time()
        if engine == "device":
            results = idx.search_many([s for _, s in reads])
        else:
            results = [idx.search_bytes(s) for _, s in reads]
        dt = time.time() - t0
        mapped = src = 0
        for (rid, _), hits in zip(reads, results):
            if hits:
                mapped += 1
                source = rid.rsplit("_r", 1)[0]
                if any(h.genome_id.decode() == source for h in hits):
                    src += 1
        print(
            f"engine={engine}: {len(reads)/dt*60:.1f} reads/min "
            f"({total_bp/dt/1e6:.2f} Mbp/s), mapped {mapped}/{len(reads)} "
            f"({mapped/len(reads)*100:.1f}%), to source {src}/{len(reads)} "
            f"({src/len(reads)*100:.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
