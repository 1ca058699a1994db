"""Generate the MANY-HIT regime dataset: N near-identical genomes so one
16S query hits hundreds-to-thousands of genomes — the shape of the
reference's headline workloads (1.3-kb gene: 41,718 genome hits; 16S:
1,955,167 hits; ref: README.md:81-84), which the demo (15 genomes) never
exercises.

Each clone is a window of GCF_003697165.2 (E. coli) around a 16S rRNA
copy (golden top hit at NZ_CP033092.2:458559-460100), mutated at a
per-clone divergence drawn from U(0.2%, 2%) with the 25/25/50
mismatch/ins/del mix.  Deterministic (seed 7 + clone index).

Usage: python scripts/gen_manyhit.py OUT_DIR [n_clones] [window_kb]
"""

from __future__ import annotations

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/reference/demo/refs/GCF_003697165.2.fa.gz"
ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)
# window anchored around the first 16S copy (1-based 458559-460100 on
# NZ_CP033092.2, the first contig of the assembly)
CENTER = 459330


def mutate(rng, seq: np.ndarray, div: float) -> np.ndarray:
    n = seq.shape[0]
    n_err = rng.poisson(div * n)
    if n_err == 0:
        return seq
    pos = np.sort(rng.integers(0, n, size=n_err))
    kinds = rng.choice(3, size=n_err, p=[0.5, 0.25, 0.25])  # X/I/D
    out = []
    prev = 0
    for p, kd in zip(pos, kinds):
        out.append(seq[prev:p])
        if kd == 0:
            out.append(ALPHA[rng.integers(0, 4, size=1)])
            prev = p + 1
        elif kd == 1:
            out.append(seq[p : p + 1])
            out.append(ALPHA[rng.integers(0, 4, size=1)])
            prev = p + 1
        else:
            prev = p + 1
    out.append(seq[prev:])
    return np.concatenate(out)


def generate(out_dir: str, n_clones: int = 1000, window_kb: int = 200) -> list[str]:
    from lexicmap_tpu.utils.fasta import read_fastx

    os.makedirs(out_dir, exist_ok=True)
    rec = next(read_fastx(SRC))
    full = np.frombuffer(rec.seq.upper(), dtype=np.uint8)
    half = window_kb * 1000 // 2
    window = full[max(CENTER - half, 0) : CENTER + half]

    files = []
    for i in range(n_clones):
        rng = np.random.default_rng(7 + i)
        div = float(rng.uniform(0.002, 0.02))
        clone = mutate(rng, window, div)
        path = os.path.join(out_dir, f"CLONE_{i:05d}.fa.gz")
        with gzip.open(path, "wb", compresslevel=1) as fh:
            fh.write(f">CLONE_{i:05d}\n".encode())
            fh.write(clone.tobytes() + b"\n")
        files.append(path)
    return files


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lexicmap_tpu_bench/manyhit_refs"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    kb = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    files = generate(out_dir, n, kb)
    print(f"wrote {len(files)} clones ({kb} kb each) to {out_dir}")
