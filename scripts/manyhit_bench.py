"""MANY-HIT regime benchmark: queries that each hit every genome of a
clone index (scripts/gen_manyhit.py) — the shape of the reference's
headline workloads (41k-1.9M genome hits/query, ref: README.md:81-84).

Usage:
  python scripts/gen_manyhit.py /tmp/lexicmap_tpu_bench/manyhit_refs 1000 200
  python -m lexicmap_tpu ... (or the CLI) to build manyhit.lmt, then:
  python scripts/manyhit_bench.py [INDEX] [N_QUERIES] [--engine host|device]

Each query is the source 16S copy mutated at 0.5% (deterministic seeds),
so successive queries don't share a seed-match cache.  Reports q/min,
genome hits/s and peak RSS.
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gen_manyhit import ALPHA, SRC, mutate  # noqa: E402

from lexicmap_tpu.index.search import IndexSearcher, SearchOptions  # noqa: E402
from lexicmap_tpu.utils.fasta import read_fastx  # noqa: E402
from lexicmap_tpu.utils.kmers import seq_to_codes  # noqa: E402


def queries(n: int) -> list[bytes]:
    rec = next(read_fastx(SRC))
    base = np.frombuffer(rec.seq.upper(), dtype=np.uint8)[458558:460100]
    out = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        out.append(mutate(rng, base, 0.005).tobytes())
    return out


def main() -> None:
    index = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lexicmap_tpu_bench/manyhit.lmt"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    engine = "device" if "--engine=device" in sys.argv or "device" in sys.argv[3:] else "host"

    qs = queries(n_q)
    opt = SearchOptions()
    if engine == "device":
        opt.engine = "device"
        # optional device twins for phases 3/5 ("wfa"/"chain" argv tokens)
        if "wfa" in sys.argv[3:]:
            opt.wfa_engine = "device"
        if "chain" in sys.argv[3:]:
            opt.chain_engine = "device"
    idx = IndexSearcher(index, opt)

    # warm-up (mmap pages, native lib, device compile) — at the SAME batch
    # shape as the measured run, or the measured run pays the compiles
    idx.search_many([qs[0]] * min(n_q, 32))

    snap = {}
    tsnap = psnap = {}
    if engine == "device":
        from lexicmap_tpu import parallel

        snap = {k: dict(v) for k, v in parallel.transport.items()}
        eng = getattr(idx, "_device_engine", None)
        if eng is not None:
            tsnap = dict(eng.times)
            psnap = dict(eng.pseudo.times)
    t0 = time.time()
    res = idx.search_many(qs)
    dt = time.time() - t0
    hits = [len(r) for r in res]
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    tripped = ""
    if engine == "device":
        from lexicmap_tpu.parallel import device_tripped

        tripped = f" device_tripped={device_tripped()}"
    print(
        f"engine={engine} queries={n_q} wall={dt:.2f}s "
        f"rate={n_q / dt * 60:.0f} q/min "
        f"genome_hits/query={np.mean(hits):.0f} "
        f"hits/s={sum(hits) / dt:.0f} peak_rss={rss_mb:.0f} MB{tripped}"
    )
    if engine == "device":
        from lexicmap_tpu import parallel

        eng = getattr(idx, "_device_engine", None)
        if eng is not None:
            print(f"engine phase wall (measured run only, {n_q} queries):")
            print("  " + " ".join(
                f"{k}={v - tsnap.get(k, 0):.2f}s" for k, v in eng.times.items()))
            print("  pseudo: " + " ".join(
                f"{k}={v - psnap.get(k, 0):.2f}s"
                for k, v in eng.pseudo.times.items()))
        print(f"transport per stage (measured run only, {n_q} queries):")
        for k, v in parallel.transport_summary().items():
            s = snap.get(k, {"fetches": 0, "d2h_bytes": 0, "h2d_bytes": 0})
            if k == "TOTAL":
                s = {f: sum(x[f] for x in snap.values()) for f in s}
            print(f"  {k}: {v['fetches'] - s['fetches']} fetches, "
                  f"h2d {(v['h2d_bytes'] - s['h2d_bytes'])/1e6:.2f} MB, "
                  f"d2h {(v['d2h_bytes'] - s['d2h_bytes'])/1e6:.2f} MB")


if __name__ == "__main__":
    main()
