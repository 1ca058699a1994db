"""50k-genome scale probe: genome-COUNT scaling past the 10k envelope.

The seed-table axis that actually grows with genome count is entries per
mask (~2x the genome count) and postings per k-mer — not genome length —
so this probe holds total bases near the 10k run (~5 Gbp) while scaling
the COUNT 5x: 50,000 genomes of 80-120 kb.  At 50k genomes the per-mask
entry counts (~106k) exceed one packed row (E_CAP=2^14) so the matcher
column-chunks them, and the whole-table HBM residency (~8 GB hi-words)
presses against the LEXICMAP_TPU_HBM_BUDGET tier (device_search.py):
rows that fit the budget stay HBM-resident (granular, row-prefix
admission), the tail matches on the vectorized host tier, and --debug /
describe() report the entry-coverage split.

Usage: python scripts/scale_50k.py [gen|build|search] [--n 50000]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GENOMES = 50_000
for a in sys.argv[1:]:
    if a.startswith("--n="):
        N_GENOMES = int(a.split("=")[1])
ROOT = f"/tmp/lexi_scale{N_GENOMES // 1000}k"
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen():
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(f"{ROOT}/genomes")
    rng = np.random.default_rng(29)
    t0 = time.time()
    qrecs = []
    # one FASTA per genome (the builder's unit), grouped 500/dir so no
    # directory holds 50k entries
    per_dir = 500
    for g in range(N_GENOMES):
        L = int(rng.integers(80_000, 120_000))
        seq = ACGT[rng.integers(0, 4, L)].tobytes()
        d = f"{ROOT}/genomes/d{g // per_dir:03d}"
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/g{g:05d}.fasta", "wb") as fh:
            fh.write(b">chr1\n")
            fh.write(seq + b"\n")
        if g % (N_GENOMES // 40) == 0:  # 40 queries
            s = int(rng.integers(0, L - 1500))
            frag = bytearray(seq[s : s + 1500])
            for p in rng.integers(0, 1500, 45):
                frag[p] = ACGT[rng.integers(0, 4)]
            qrecs.append((f"q_from_g{g:05d}", bytes(frag)))
        if g and g % 10000 == 0:
            print(f"  {g} genomes ({time.time()-t0:.0f}s)", flush=True)
    with open(f"{ROOT}/queries.fasta", "wb") as fh:
        for qid, s in qrecs:
            fh.write(f">{qid}\n".encode() + s + b"\n")
    print(f"generated {N_GENOMES} genomes in {time.time()-t0:.0f}s", flush=True)


def build():
    from lexicmap_tpu.index.build import BuildOptions, build_index

    files = []
    gdir = f"{ROOT}/genomes"
    for d in sorted(os.listdir(gdir)):
        for f in sorted(os.listdir(os.path.join(gdir, d))):
            files.append(os.path.join(gdir, d, f))
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
        if engine == "device" and idx.device_matcher is not None:
            print(f"  {idx.device_matcher.describe()}", flush=True)
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
    steps = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "gen", "build", "search"
    ]
    for s in steps:
        {"gen": gen, "build": build, "search": search}[s]()
    from lexicmap_tpu.parallel import hard_exit_if_abandoned

    hard_exit_if_abandoned(0)
