#!/usr/bin/env python
"""Benchmark: demo-dataset search throughput vs the reference baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference LexicMap demo search speed, 1197.8 queries/min for
the single 16S gene query on a 16-thread PC (ref: docs/content/tutorials/
search.md:240-251; BASELINE.md).  The benchmark also verifies output parity
with the committed golden TSV and reports it in the JSON line.

Engine: the TPU device engine (seed matching + pseudo-alignment on device,
lexicmap_tpu/parallel/engine.py) runs in the parent process while host
fork workers drain the rest of the query stream — the machine number is
TPU + all host cores.  If no device is usable, falls back to host-only.
"""

import json
import os
import subprocess
import sys
import time

BENCH_DIR = os.environ.get("LEXICMAP_TPU_BENCH_DIR", "/tmp/lexicmap_tpu_bench")
DEMO_DB = os.path.join(BENCH_DIR, "demo.lmt")
DEMO_REFS = "/root/reference/demo/refs"
GENE_QUERY = "/root/reference/demo/q.gene.fasta"
GOLDEN = "/root/reference/demo/q.gene.fasta.lexicmap.tsv"
BASELINE_QPM = 1197.8  # reference queries/min on the same demo query


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_index():
    if os.path.exists(os.path.join(DEMO_DB, "info.json")):
        return
    log(f"building demo index at {DEMO_DB} ...")
    os.makedirs(BENCH_DIR, exist_ok=True)
    files = sorted(
        os.path.join(DEMO_REFS, f) for f in os.listdir(DEMO_REFS) if f.endswith(".fa.gz")
    )
    t0 = time.time()
    from lexicmap_tpu.index.build import BuildOptions, build_index

    build_index(DEMO_DB, files, BuildOptions(force=True))
    log(f"index built in {time.time() - t0:.1f}s")


def main():
    ensure_index()

    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    idx = IndexSearcher(DEMO_DB, SearchOptions())
    rec = next(read_fastx(GENE_QUERY))

    # warm-up (first call pays numpy/mmap warmup) + parity check
    hits = idx.search_bytes(rec.seq)
    rows = list(format_hit_rows(rec.id.decode(), len(rec.seq), hits))
    golden = [l.rstrip("\n") for l in open(GOLDEN)][1:]
    parity = rows == golden

    # FORK THE WORKER POOL BEFORE ANY JAX INIT: fork-after-JAX can deadlock
    # (JAX is multithreaded); the pool processes inherit only numpy + the
    # mmap'd index.  One core is reserved for the device engine's host
    # phases when a device shows up (decided below, after the fork).
    import multiprocessing as mp

    # all cores for host workers: the device engine's host phases overlap
    # with device dispatches, so reserving a full core for it wastes more
    # than the oversubscription costs (measured: host pool x2 = 1650 q/min
    # vs x1 = 830 on this 2-core VM; the work-stealing split adapts)
    n_cpus = os.cpu_count() or 1
    workers = n_cpus
    global _BENCH_IDX
    _BENCH_IDX = idx
    ctx = mp.get_context("fork")
    pool = ctx.Pool(workers)

    # optional TPU device engine in the parent process (host fork workers
    # take the remaining cores); compile-cached kernels make warm-up cheap
    idx_dev = None
    device_warmup_s = 0.0
    try:
        import __graft_entry__ as g

        g._enable_compile_cache()
        import jax

        if jax.devices()[0].platform != "cpu":
            t0 = time.time()
            idx_dev = IndexSearcher(DEMO_DB, SearchOptions(engine="device"))
            idx_dev.search_many([rec.seq] * 32)  # warm / compile
            device_warmup_s = time.time() - t0
            log(f"device engine warm in {device_warmup_s:.1f}s "
                "(cold cost = axon session warm-up + jit; excluded from the "
                "measured rounds, which are warm)")
    except Exception as e:  # no TPU / tunnel down -> host-only
        log(f"device engine unavailable ({type(e).__name__}: {e}); host-only")
        idx_dev = None

    # probe per-engine rates (diagnostic only; the split is work-stealing)
    n_probe = 32
    t0 = time.time()
    list(pool.imap_unordered(_bench_one, [rec.seq] * n_probe, chunksize=4))
    host_rate = n_probe / (time.time() - t0)
    dev_rate = 0.0
    if idx_dev is not None:
        try:
            t0 = time.time()
            idx_dev.search_many([rec.seq] * n_probe)
            dev_rate = n_probe / (time.time() - t0)
        except Exception as e:
            log(f"device probe failed ({type(e).__name__}: {e}); host-only")
            idx_dev = None
    log(f"probe rates: host pool {host_rate * 60:.0f} q/min, device {dev_rate * 60:.0f} q/min")

    n_queries = max(128, 16 * workers)

    # work-stealing split: the device engine (parent thread) steals 32-query
    # slices (one engine batch each) while a feeder thread keeps the host
    # pool saturated with 8-query chunks from the same budget — the split
    # adapts to host-VM speed drift instead of trusting the probe.  best of
    # 3 measured rounds after a throwaway warm-up round.
    n_dev_total = 0

    import threading

    def one_round():
        nonlocal n_dev_total
        t0 = time.time()
        state = {"remaining": n_queries}
        lock = threading.Lock()
        outstanding = []

        def take(c):
            with lock:
                c = min(c, state["remaining"])
                state["remaining"] -= c
                return c

        feed_err = []

        def feeder():
            # keep the host pool saturated with small chunks; the device
            # steals from the same budget in the main thread
            try:
                while True:
                    done = [o for o in outstanding if o.ready()]
                    for o in done:
                        o.get()  # re-raise worker exceptions
                        outstanding.remove(o)
                    if len(outstanding) < 2 * workers:
                        c = take(8)
                        if c == 0:
                            if not outstanding:
                                return
                            time.sleep(0.002)
                            continue
                        outstanding.append(
                            pool.map_async(_bench_one, [rec.seq] * c, chunksize=c)
                        )
                    else:
                        time.sleep(0.002)
            except Exception as e:  # surfaced in the main thread below
                feed_err.append(e)

        ft = threading.Thread(target=feeder)
        ft.start()
        try:
            while idx_dev is not None:
                # tail guard: leave the last stretch to the host workers so
                # an occasional tunnel-stalled device dispatch cannot block
                # the round's tail
                with lock:
                    if state["remaining"] <= n_queries // 4:
                        break
                b = take(32)
                if b == 0:
                    break
                idx_dev.search_many([rec.seq] * b)
                n_dev_total += b
        finally:
            ft.join()
        if feed_err:
            raise feed_err[0]
        for o in outstanding:
            o.get()  # re-raise worker exceptions instead of dropping
        return (time.time() - t0) / n_queries

    per_round = []
    rounds = -1  # round -1 is a throwaway warm-up (page cache, engine JIT
    # variants, tunnel ramp); rounds 0-2 are measured
    rounds_run = 0
    while rounds < 3:
        try:
            el = one_round()
            rounds_run += 1
            if rounds >= 0:
                per_round.append(el)
        except Exception as e:
            if idx_dev is None:
                raise
            # mid-run device failure: redo host-only so ONE json line prints
            log(f"device failed mid-run ({type(e).__name__}: {e}); host-only")
            idx_dev = None
            per_round = []
            rounds = -1
            rounds_run = 0
            n_dev_total = 0
            continue
        rounds += 1
    pool.close()
    pool.join()
    elapsed = min(per_round)
    qpm = 60.0 / elapsed
    qpm_rounds = [round(60.0 / e, 1) for e in per_round]

    print(
        json.dumps(
            {
                "metric": "demo_16S_search_throughput",
                "value": round(qpm, 2),
                "unit": "queries/min",
                "vs_baseline": round(qpm / BASELINE_QPM, 4),
                "golden_tsv_parity": parity,
                "seconds_per_query": round(elapsed, 3),
                "engine": ("tpu_device+host" if idx_dev is not None else "host"),
                "device_query_share": (
                    round(n_dev_total / (rounds_run * n_queries), 3) if idx_dev else 0.0
                ),
                "workers": workers,
                "qpm_rounds": qpm_rounds,
                "vs_baseline_worst": round(min(qpm_rounds) / BASELINE_QPM, 4),
                # warm vs cold, reported separately (the measured rounds are
                # warm; the cold cost is the axon session warm-up + jit and
                # is outside client control on this tunnel)
                "device_warmup_s": round(device_warmup_s, 1),
                "probe_qpm": {
                    "host_pool": round(host_rate * 60, 1),
                    "device_warm": round(dev_rate * 60, 1),
                },
            }
        )
    )


_BENCH_IDX = None


def _bench_one(seq):
    return len(_BENCH_IDX.search_bytes(seq))


if __name__ == "__main__":
    main()
    # a timed-out device fetch (hung tunnel dispatch) leaves a thread
    # blocked in the runtime that aborts normal interpreter teardown
    from lexicmap_tpu.parallel import hard_exit_if_abandoned

    hard_exit_if_abandoned(0)
