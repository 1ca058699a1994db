"""Generate a Badread-parameter-faithful ONT long-read set from the demo
genomes (the reference's demo/q.long-reads.fasta.gz is ABSENT from this
mount — 3,692 reads, 54.4 Mbp, min 67 / avg 14,728 / max 90,376 bp,
simulated with `badread simulate --quantity 1x` per genome;
ref: demo/README.md:44-63).

Faithful parameters (Badread defaults for v0.4 ONT R10.4.1 profile):
  - read lengths ~ gamma with mean 15,000, stdev 13,000 (shape k = (15/13)^2)
  - per-read identity ~ beta scaled to (mean 95%, max 100%, stdev 2.5%)
  - errors: mismatches/insertions/deletions ~ 25/25/50 (ONT-ish del bias)
  - both strands uniformly; 1x quantity per genome
Omitted Badread extras (junk/random/chimera reads, glitches, adapters):
they are ~2% of reads and don't change the throughput/recall picture.

Usage: python scripts/gen_long_reads.py [out.fasta.gz]
"""

from __future__ import annotations

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO_REFS = "/root/reference/demo/refs"
ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}


def revcomp(seq: np.ndarray) -> np.ndarray:
    lut = np.zeros(256, dtype=np.uint8)
    for a, b in COMP.items():
        lut[a] = b
    return lut[seq][::-1]


def mutate(rng, read: np.ndarray, identity: float) -> np.ndarray:
    """Apply mismatches/ins/del at rate (1-identity), mix 25/25/50."""
    n = read.shape[0]
    err = max(1.0 - identity, 0.0)
    n_err = rng.poisson(err * n)
    if n_err == 0:
        return read
    pos = np.sort(rng.integers(0, n, size=n_err))
    kinds = rng.choice(3, size=n_err, p=[0.25, 0.25, 0.5])  # 0=X 1=I 2=D
    out = []
    prev = 0
    for p, kd in zip(pos, kinds):
        out.append(read[prev:p])
        if kd == 0:
            out.append(ALPHA[rng.integers(0, 4, size=1)])
            prev = p + 1
        elif kd == 1:
            out.append(read[p : p + 1])
            out.append(ALPHA[rng.integers(0, 4, size=1)])
            prev = p + 1
        else:
            prev = p + 1  # deletion
    out.append(read[prev:])
    return np.concatenate(out)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lexicmap_tpu_bench/q.long-reads.fasta.gz"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    from lexicmap_tpu.utils.fasta import read_fastx

    rng = np.random.default_rng(42)
    # gamma: mean 15000, stdev 13000 -> shape k=(15/13)^2, scale mean/k
    shape = (15000.0 / 13000.0) ** 2
    scale = 15000.0 / shape

    n_reads = 0
    total = 0
    with gzip.open(out_path, "wb", compresslevel=5) as out:
        for fn in sorted(os.listdir(DEMO_REFS)):
            if not fn.endswith(".fa.gz"):
                continue
            gid = fn.replace(".fa.gz", "")
            contigs = [
                np.frombuffer(rec.seq.upper(), dtype=np.uint8)
                for rec in read_fastx(os.path.join(DEMO_REFS, fn))
            ]
            glen = sum(c.shape[0] for c in contigs)
            covered = 0
            r = 0
            while covered < glen:  # --quantity 1x
                L = int(rng.gamma(shape, scale))
                L = max(L, 50)
                # pick contig weighted by length, then a start
                w = np.array([c.shape[0] for c in contigs], dtype=np.float64)
                ci = rng.choice(len(contigs), p=w / w.sum())
                c = contigs[ci]
                if L >= c.shape[0]:
                    L = c.shape[0]
                start = int(rng.integers(0, c.shape[0] - L + 1))
                frag = c[start : start + L]
                if rng.integers(0, 2):
                    frag = revcomp(frag)
                # identity ~ beta(mean .95, max 1.0, stdev .025)
                mean, stdev = 0.95, 0.025
                a = mean * (mean * (1 - mean) / stdev**2 - 1)
                b = (1 - mean) * (mean * (1 - mean) / stdev**2 - 1)
                ident = float(np.clip(rng.beta(a, b), 0.7, 1.0))
                read = mutate(rng, frag, ident)
                r += 1
                n_reads += 1
                total += read.shape[0]
                covered += L
                out.write(f">{gid}_r{r}\n".encode())
                out.write(read.tobytes() + b"\n")
    print(f"wrote {n_reads} reads, {total:,} bp to {out_path}")


if __name__ == "__main__":
    main()
