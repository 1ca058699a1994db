"""Multi-process scaling measurement: the ≥2-hosts clause of BASELINE.md.

Each "host" = one OS process pinned to one CPU core (taskset) with one
local XLA device, connected by jax.distributed (gloo).  The demo q.gene
query repeated R times is searched at nprocs = 1 and 2 (and 4 if the
machine has cores); scaling efficiency = qpm(n) / (n * qpm(1)).

The seed table is sharded across the processes (each holds ~1/n of the
seed entries), phase 2a's all_gather crosses process boundaries, and host
phases divide by query — so this measures the real distributed engine,
not an offline file split.

Usage: python scripts/multiproc_scaling.py [repeat]
Appends nothing; prints a markdown table to paste into scale_smoke.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DB = os.environ.get("LEXICMAP_TPU_DEMO_DB", "/tmp/demo.lmt")
QUERY = "/root/reference/demo/q.gene.fasta"
GOLDEN = "/root/reference/demo/q.gene.fasta.lexicmap.tsv"


def run(nprocs: int, repeat: int):
    work = tempfile.mkdtemp(prefix=f"lexicmap_mp{nprocs}_")
    out = os.path.join(work, "out.tsv")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "lexicmap_tpu.parallel.multiproc",
         "--db", DB, "-q", QUERY, "-o", out,
         "--nprocs", str(nprocs), "--repeat", str(repeat),
         "--pin", "--workdir", work],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )
    wall_total = time.time() - t0
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.load(open(os.path.join(work, "summary.json")))
    summary["wall_total_s"] = round(wall_total, 2)
    # parity: every repeat of the query must emit the golden 84 rows
    got = open(out).read().splitlines()
    golden_rows = open(GOLDEN).read().splitlines()[1:]
    assert len(got) - 1 == len(golden_rows) * repeat, (len(got), repeat)
    summary["parity_rows"] = all(
        got[1 + i * len(golden_rows) : 1 + (i + 1) * len(golden_rows)] == golden_rows
        for i in range(repeat)
    )
    return summary


def main():
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ncores = os.cpu_count() or 1
    # nprocs=4 runs even on a 2-core box (workers pin to core p%ncores,
    # 2 procs/core): there it measures work-BALANCE and oversubscription
    # overhead, not scaling — efficiency is reported against the cores
    # actually used
    ns = [1, 2, 4]
    results = {}
    for n in ns:
        s = run(n, repeat)
        qpm = s["queries"] / s["wall_s"] * 60
        results[n] = (s, qpm)
        print(f"nprocs={n}: {json.dumps(s)}  -> {qpm:.1f} q/min", flush=True)

    base = results[1][1]
    print("\n| procs | cores used | wall s | q/min | efficiency vs cores | host balance | parity |")
    print("|---|---|---|---|---|---|---|")
    for n in ns:
        s, qpm = results[n]
        cores = min(n, ncores)
        eff = qpm / (cores * base)
        print(
            f"| {n} | {cores} (pinned) | {s['wall_s']} | {qpm:.0f} | "
            f"{eff * 100:.0f}% | {s['host_balance']} | {s['parity_rows']} |"
        )


if __name__ == "__main__":
    main()
