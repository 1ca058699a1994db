"""Multi-process (multi-"host") distributed search via jax.distributed.

This is the ≥2-hosts leg of the framework's scaling story (BASELINE.md:
≥80% scaling efficiency at ≥2 hosts).  The reference is a single-node
program whose only multi-index story is offline TSV merging (ref:
merge-search-results.go:38-52); here the SAME live engine runs across
N OS processes connected by jax.distributed (gloo on CPU; ICI/DCN on real
TPU pods), with:

  * phase 2a (seed matching) on the GLOBAL mesh: the seed table lives
    sharded across the processes' device memories along the mask axis
    (each process holds ~1/N of the index's seed entries — the memory
    story that lets an index larger than one host's RAM serve queries),
    and the per-shard Pallas locate results ride an all_gather ACROSS
    process boundaries back to every host;
  * host phases (posting gather, chaining, pseudo-alignment, WFA,
    assembly) divided across processes by query (qidx % nprocs — the
    reference's -J worker pool, spread over hosts);
  * a final rank-0 merge of the per-process row sets, preserving global
    query order — byte-identical to the single-process TSV.

SPMD contract: every process executes the identical sequence of global
device dispatches (all queries flow through match_batch in every
process); only the HOST work after the collective is divided.  That is
exactly how the reference divides work too — its seed-chunk goroutines
all scan every query, then per-query workers divide downstream work
(lib-index-search.go:1531-1599, search.go:537-604).

Usage (launcher, spawns workers and merges):
  python -m lexicmap_tpu.parallel.multiproc --db DB -q QUERY.fa -o OUT.tsv \
      --nprocs 2 [--local-devices 1] [--pin] [--repeat 1]

Each worker re-executes this module with --procid set.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time


def _parse(argv):
    ap = argparse.ArgumentParser(prog="lexicmap_tpu.parallel.multiproc")
    ap.add_argument("--db", required=True)
    ap.add_argument("-q", "--query", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--procid", type=int, default=-1, help="internal: worker rank")
    ap.add_argument("--coordinator", default="localhost:12391")
    ap.add_argument("--local-devices", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=1,
                    help="search the query stream this many times (timing)")
    ap.add_argument("--pin", action="store_true",
                    help="pin worker i to CPU core i%%ncores (scaling runs)")
    ap.add_argument("--twins", choices=["host", "device"], default="host",
                    help="run phase-3 chain DP + phase-5 WFA on each "
                    "worker's LOCAL device (the TPU path composed with the "
                    "distributed path; host = pure host phases)")
    ap.add_argument("--workdir", default="",
                    help="internal: shared scratch dir for worker parts")
    return ap.parse_args(argv)


# ---------------------------------------------------------------------------
# worker


def worker_main(args) -> int:
    # environment BEFORE any jax import: CPU platform with the requested
    # virtual local device count (on real hardware the local devices are the
    # host's attached chips and these two lines are dropped)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.nprocs, process_id=args.procid
    )
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from ..cli import format_hit_rows
    from ..index.search import IndexSearcher, SearchOptions
    from ..utils.fasta import read_fastx
    from ..utils.kmers import seq_to_codes
    from .sharded import ShardedSeedMatcher

    pid, n = args.procid, args.nprocs
    t_init0 = time.time()
    devs = jax.devices()
    assert len(devs) == n * args.local_devices
    mesh = Mesh(np.array(devs).reshape(1, -1), ("dp", "tp"))

    opt = SearchOptions()
    if args.twins == "device":
        # phase-3/5 device twins on each worker's LOCAL device: every
        # worker dispatches chain DP + WFA for ITS query subset only, so
        # these are per-process single-device programs (on a real pod,
        # the process's own chips), composed with the cross-process
        # sharded phase 2a below
        opt.chain_engine = "device"
        opt.wfa_engine = "device"
    idx = IndexSearcher(args.db, opt)
    matcher = ShardedSeedMatcher(idx, mesh)
    if pid == 0:
        print(f"[multiproc] {n} processes x {args.local_devices} devices; "
              f"twins={args.twins}; {matcher.describe()}", file=sys.stderr)

    records = [(r.id.decode(), bytes(r.seq)) for r in read_fastx(args.query)]
    queries = records * args.repeat

    t_dev = 0.0   # global-mesh phase 2a wall (every proc, every query)
    t_host = 0.0  # this process's host-phase wall (its query subset)
    rows_of: dict[int, list[str]] = {}

    t_run0 = time.time()
    B = args.batch
    for b0 in range(0, len(queries), B):
        batch = queries[b0 : b0 + B]
        codes = [seq_to_codes(s.upper()) for _, s in batch]
        valid = [i for i, c in enumerate(codes) if c.shape[0] >= idx.k]
        if not valid:
            continue
        # phase 1+2a (all processes, SPMD): mask + global-mesh seed match
        t0 = time.time()
        masked = {i: idx._mask_query(codes[i]) for i in valid}
        dev = None
        if idx.opt.min_prefix <= 16:
            kb = np.stack([masked[i][0] for i in valid])
            dev = matcher.match_batch(kb, idx.opt.min_prefix)
        t_dev += time.time() - t0

        # host phases: only this process's queries
        t0 = time.time()
        for bi, i in enumerate(valid):
            qidx = b0 + i
            if qidx % n != pid:
                continue
            dh = None
            if dev is not None:
                dh = dev[bi] if dev[bi] is not None else False
            hits = idx.search(codes[i], premasked=masked[i], dev_hits_pre=dh)
            qid, seq = batch[i]
            rows_of[qidx] = list(format_hit_rows(qid, len(seq), hits))
        t_host += time.time() - t0
    t_run = time.time() - t_run0

    # ---- collective merge: the per-process row sets ride the distributed
    # backend as an all_gather of (pickled, padded) byte buffers — every
    # process receives every part; rank 0 writes the TSV in global query
    # order.  This is the live-engine form of the reference's offline
    # per-index TSV merge (ref: merge-search-results.go:38-52; SURVEY §2.4
    # "channel-based reduction -> allgather of per-shard hit lists").
    t_merge0 = time.time()
    payload = pickle.dumps(
        {
            "rows_of": rows_of,
            "t_dev": t_dev,
            "t_host": t_host,
            "t_run": t_run,
            "t_init": t_run0 - t_init0,
            "n_queries": len(rows_of),
        }
    )
    buf = np.frombuffer(payload, dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([buf.shape[0]], dtype=np.int64)
    ).reshape(n)
    cap = int(sizes.max())
    padded = np.zeros(cap, dtype=np.uint8)
    padded[: buf.shape[0]] = buf
    parts = multihost_utils.process_allgather(padded).reshape(n, cap)
    stats = [
        pickle.loads(parts[p, : int(sizes[p])].tobytes()) for p in range(n)
    ]
    t_merge = time.time() - t_merge0

    if pid == 0:
        from ..cli import TSV_HEADER

        merged: dict[int, list[str]] = {}
        for d in stats:
            merged.update(d["rows_of"])
        with open(args.out, "w") as out:
            out.write(TSV_HEADER + "\n")
            for qidx in sorted(merged):
                for row in merged[qidx]:
                    out.write(row + "\n")
        summary = {
            "nprocs": n,
            "local_devices": args.local_devices,
            "twins": args.twins,
            "queries": len(merged),
            "wall_s": round(max(d["t_run"] for d in stats), 3),
            "merge_s": round(t_merge, 3),
            "per_proc_host_s": [round(d["t_host"], 3) for d in stats],
            "per_proc_dev_s": [round(d["t_dev"], 3) for d in stats],
            "per_proc_queries": [d["n_queries"] for d in stats],
            "host_balance": round(
                min(d["t_host"] for d in stats)
                / max(max(d["t_host"] for d in stats), 1e-9),
                3,
            ),
        }
        with open(os.path.join(args.workdir, "summary.json"), "w") as fh:
            json.dump(summary, fh)
        print(f"[multiproc] {json.dumps(summary)}", file=sys.stderr)
    return 0


# ---------------------------------------------------------------------------
# launcher


def launch(args) -> int:
    import shutil
    import subprocess
    import tempfile

    workdir = args.workdir or tempfile.mkdtemp(prefix="lexicmap_mp_")
    os.makedirs(workdir, exist_ok=True)
    if args.coordinator == "localhost:12391":
        # pick a free port so concurrent launches (tests) don't collide
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            args.coordinator = f"localhost:{s.getsockname()[1]}"
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ncores = os.cpu_count() or 1
    procs = []
    for p in range(args.nprocs):
        cmd = [
            sys.executable, "-m", "lexicmap_tpu.parallel.multiproc",
            "--db", args.db, "-q", args.query, "-o", args.out,
            "--nprocs", str(args.nprocs), "--procid", str(p),
            "--coordinator", args.coordinator,
            "--local-devices", str(args.local_devices),
            "--batch", str(args.batch), "--repeat", str(args.repeat),
            "--twins", args.twins,
            "--workdir", workdir,
        ]
        if args.pin and shutil.which("taskset"):
            cmd = ["taskset", "-c", str(p % ncores)] + cmd
        env = dict(os.environ)
        procs.append(subprocess.Popen(cmd, cwd=root, env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])
    if args.procid >= 0:
        return worker_main(args)
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
