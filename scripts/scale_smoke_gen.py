import numpy as np, os, time, shutil, subprocess, sys

root = "/tmp/lexi_scale"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(f"{root}/genomes")
rng = np.random.default_rng(7)
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)

t0 = time.time()
qrecs = []
for g in range(200):
    L = int(rng.integers(400_000, 700_000))
    seq = ACGT[rng.integers(0, 4, L)].tobytes()
    with open(f"{root}/genomes/g{g:03d}.fasta", "wb") as fh:
        fh.write(b">chr1\n")
        for i in range(0, L, 70):
            fh.write(seq[i:i+70] + b"\n")
    if g % 10 == 0:  # sample a 1.5kb query with 3% mutations
        s = int(rng.integers(0, L - 1500))
        frag = bytearray(seq[s:s+1500])
        for p in rng.integers(0, 1500, 45):
            frag[p] = ACGT[rng.integers(0, 4)]
        qrecs.append((f"q_from_g{g:03d}", bytes(frag)))
print(f"generated 200 genomes in {time.time()-t0:.0f}s", flush=True)

with open(f"{root}/queries.fasta", "wb") as fh:
    for qid, s in qrecs:
        fh.write(f">{qid}\n".encode() + s + b"\n")
