"""10k-genome scale probe: build + throughput-vs-index-size curve.

Generates 10,000 synthetic genomes (300-500 kb, ~4 Gbp total — the largest
scale this 2-core VM can build in reasonable time), builds the index
(exercising the hierarchical multi-round batch merge at 400 batches with
batch_size=25), then measures search throughput for 40 sampled 1.5 kb
mutated queries with the host and device engines.

Usage: python scripts/scale_10k.py [gen|build|search]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/lexi_scale10k"
N_GENOMES = 10_000
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen():
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(f"{ROOT}/genomes")
    rng = np.random.default_rng(23)
    t0 = time.time()
    qrecs = []
    for g in range(N_GENOMES):
        L = int(rng.integers(300_000, 500_000))
        seq = ACGT[rng.integers(0, 4, L)].tobytes()
        with open(f"{ROOT}/genomes/g{g:05d}.fasta", "wb") as fh:
            fh.write(b">chr1\n")
            fh.write(seq + b"\n")
        if g % 250 == 0:  # 40 queries
            s = int(rng.integers(0, L - 1500))
            frag = bytearray(seq[s : s + 1500])
            for p in rng.integers(0, 1500, 45):
                frag[p] = ACGT[rng.integers(0, 4)]
            qrecs.append((f"q_from_g{g:05d}", bytes(frag)))
    with open(f"{ROOT}/queries.fasta", "wb") as fh:
        for qid, s in qrecs:
            fh.write(f">{qid}\n".encode() + s + b"\n")
    print(f"generated {N_GENOMES} genomes in {time.time()-t0:.0f}s", flush=True)


def build():
    from lexicmap_tpu.index.build import BuildOptions, build_index

    files = sorted(
        os.path.join(f"{ROOT}/genomes", f) for f in os.listdir(f"{ROOT}/genomes")
    )
    t0 = time.time()
    build_index(f"{ROOT}/db.lmt", files, BuildOptions(force=True))
    dt = time.time() - t0
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(f"{ROOT}/db.lmt")
        for f in fs
    )
    print(f"built {len(files)} genomes in {dt:.0f}s, index {size/1e9:.2f} GB", flush=True)


def search():
    import __graft_entry__ as g

    g._enable_compile_cache()
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    recs = [(r.id.decode(), r.seq) for r in read_fastx(f"{ROOT}/queries.fasta")]
    for engine in ("host", "device"):
        try:
            idx = IndexSearcher(f"{ROOT}/db.lmt", SearchOptions(engine=engine))
        except Exception as e:
            print(f"engine={engine}: unavailable ({e})")
            continue
        idx.search_many([recs[0][1]] * (32 if engine == "device" else 1))  # warm
        t0 = time.time()
        res = idx.search_many([s for _, s in recs])
        dt = time.time() - t0
        correct = sum(
            1
            for (qid, _), hits in zip(recs, res)
            if hits and hits[0].genome_id.decode() == qid.split("q_from_")[1]
        )
        print(
            f"engine={engine}: {len(recs)} queries in {dt:.2f}s "
            f"({len(recs)/dt*60:.0f} q/min), top-hit correct {correct}/{len(recs)}",
            flush=True,
        )


if __name__ == "__main__":
    steps = sys.argv[1:] or ["gen", "build", "search"]
    for s in steps:
        {"gen": gen, "build": build, "search": search}[s]()
    # a timed-out device fetch leaves a thread blocked in the runtime that
    # aborts normal interpreter teardown
    from lexicmap_tpu.parallel import hard_exit_if_abandoned

    hard_exit_if_abandoned(0)
