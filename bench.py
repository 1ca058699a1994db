#!/usr/bin/env python
"""Benchmark: demo-dataset search throughput vs the reference baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference LexicMap demo search speed, 1197.8 queries/min for
the single 16S gene query on a 16-thread PC (ref: docs/content/tutorials/
search.md:240-251; BASELINE.md).  The benchmark also verifies output parity
with the committed golden TSV and reports it in the JSON line.

Engine: the TPU device engine (seed matching + pseudo-alignment on device,
lexicmap_tpu/parallel/engine.py) runs in a CHILD process while host fork
workers drain the rest of the query stream — the machine number is
TPU + all host cores.  If no device is usable, falls back to host-only.

Honesty rules (the recorded JSON must be backed by real device dispatches):
  - the device engine lives in its own process so its watchdog breaker
    state is queryable and a warm-up trip can be retried ONCE in a fresh
    process (the breaker is per-process and latches);
  - after warm-up and after every measured round the parent reads the
    child's `parallel.device_tripped()` and `parallel.fetch_count`;
  - queries are attributed to the device ONLY while the breaker is clear;
    a trip mid-run stops device attribution on the spot;
  - the JSON carries `device_tripped`, `device_fetch_count` and
    `device_retries`, and `engine` says "host (device tripped)" when the
    breaker ended up set with no device-attributed queries.
"""

import json
import os
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


# ---------------------------------------------------------------------------
# Device engine child process.  The parent never imports JAX: the child owns
# the device, reports its breaker/fetch-counter state with every reply, and
# can be killed + respawned to retry a warm-up trip with a fresh breaker.


def _device_child(conn, db_dir, golden_path, query_path):
    status = {"tripped": False, "fetch_count": 0, "platform": None, "parity": None}
    try:
        from lexicmap_tpu import parallel as par

        par.ensure_jax()
        import jax

        status["platform"] = jax.devices()[0].platform
        if status["platform"] == "cpu":
            conn.send(("no_device", status))
            conn.close()
            return
        from lexicmap_tpu.cli import format_hit_rows
        from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
        from lexicmap_tpu.utils.fasta import read_fastx

        rec = next(read_fastx(query_path))
        idx = IndexSearcher(db_dir, SearchOptions(engine="device"))
    except Exception as e:
        try:
            conn.send(("err", f"{type(e).__name__}: {e}"))
        finally:
            conn.close()
        return

    def refresh():
        status["tripped"] = par.device_tripped()
        status["fetch_count"] = par.fetch_count

    while True:
        try:
            cmd = conn.recv()
        except EOFError:
            break
        try:
            if cmd[0] == "warm":
                t0 = time.time()
                idx.search_many([rec.seq] * cmd[1])
                refresh()
                if not status["tripped"]:
                    # device-path parity against the committed golden TSV
                    hits = idx.search_bytes(rec.seq)
                    rows = list(
                        format_hit_rows(rec.id.decode(), len(rec.seq), hits)
                    )
                    golden = [l.rstrip("\n") for l in open(golden_path)][1:]
                    status["parity"] = rows == golden
                    refresh()
                conn.send(("ok", dict(status, seconds=time.time() - t0)))
            elif cmd[0] == "search":
                idx.search_many([rec.seq] * cmd[1])
                refresh()
                conn.send(("ok", dict(status)))
            elif cmd[0] == "status":
                refresh()
                conn.send(("ok", dict(status)))
            else:  # quit
                conn.send(("ok", None))
                break
        except Exception as e:
            refresh()
            try:
                conn.send(("err", f"{type(e).__name__}: {e}"))
            except Exception:
                break
    conn.close()
    # a timed-out fetch leaves a thread blocked in the runtime that aborts
    # normal interpreter teardown
    par.hard_exit_if_abandoned(0)


class DeviceEngine:
    """Parent-side handle on the device child process."""

    def __init__(self):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self.conn, child = ctx.Pipe()
        self.proc = ctx.Process(
            target=_device_child,
            args=(child, DEMO_DB, GOLDEN, GENE_QUERY),
            daemon=True,
        )
        self.proc.start()
        child.close()
        self.status = {}

    def ask(self, cmd, timeout):
        self.conn.send(cmd)
        if not self.conn.poll(timeout):
            raise TimeoutError(
                f"device child did not answer {cmd[0]!r} within {timeout:.0f}s"
            )
        kind, payload = self.conn.recv()
        if isinstance(payload, dict):
            self.status = payload
        if kind == "err":
            raise RuntimeError(payload)
        return kind, payload

    def kill(self):
        try:
            self.proc.kill()
            self.proc.join(10)
        except Exception:
            pass


def start_device_engine():
    """Warm the device engine in a child process; retry ONCE in a fresh
    process if the watchdog trips during warm-up (the breaker latches
    per-process).  Returns (engine_or_None, warmup_s, retries, note)."""
    base_to = float(os.environ.get("LEXICMAP_TPU_DEVICE_TIMEOUT", "600"))
    warm_to = base_to + 180  # index load + JAX init + golden re-check margin
    retries = 0
    note = ""
    for attempt in range(2):
        dev = DeviceEngine()
        try:
            kind, payload = dev.ask(("warm", 32), warm_to)
            if kind == "no_device":
                log("no TPU device (cpu backend); host-only")
                dev.kill()
                return None, 0.0, retries, "no device"
            if payload["tripped"]:
                note = "device watchdog tripped during warm-up"
                log(f"{note}" + ("; retrying once in a fresh process" if attempt == 0 else " again; host-only"))
                dev.kill()
                if attempt == 0:
                    retries += 1
                    continue
                return None, payload["seconds"], retries, note
            log(
                f"device engine warm in {payload['seconds']:.1f}s, "
                f"{payload['fetch_count']} guarded fetches, device parity="
                f"{payload['parity']} (cold cost = axon session warm-up + "
                "jit; excluded from the measured rounds, which are warm)"
            )
            return dev, payload["seconds"], retries, ""
        except Exception as e:
            note = f"device engine unavailable ({type(e).__name__}: {e})"
            log(note + ("; retrying once in a fresh process" if attempt == 0 else "; host-only"))
            dev.kill()
            if attempt == 0:
                retries += 1
                continue
            return None, 0.0, retries, note
    return None, 0.0, retries, note


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
    # mmap'd index.  The device engine lives in a separate spawn child, so
    # the parent itself never initializes JAX.
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

    dev, device_warmup_s, device_retries, dev_note = start_device_engine()

    # probe per-engine rates (diagnostic only; the split is work-stealing)
    n_probe = 32
    t0 = time.time()
    list(pool.imap_unordered(_bench_one, [rec.seq] * n_probe, chunksize=4))
    host_rate = n_probe / (time.time() - t0)
    dev_rate = 0.0
    if dev is not None:
        try:
            t0 = time.time()
            _, payload = dev.ask(("search", n_probe), 240)
            if payload["tripped"]:
                raise RuntimeError("watchdog tripped during probe")
            dev_rate = n_probe / (time.time() - t0)
        except Exception as e:
            log(f"device probe failed ({type(e).__name__}: {e}); host-only")
            dev_note = f"device lost in probe: {e}"
            dev.kill()
            dev = None
    log(f"probe rates: host pool {host_rate * 60:.0f} q/min, device {dev_rate * 60:.0f} q/min")

    n_queries = max(128, 16 * workers)

    # work-stealing split: the device engine (child process, driven from
    # the parent main thread) steals 32-query slices while a feeder thread
    # keeps the host pool saturated with 8-query chunks from the same
    # budget — the split adapts to host-VM speed drift instead of trusting
    # the probe.  best of 3 measured rounds after a throwaway warm-up round.
    import threading

    dev_lost = [None]  # reason string once the device stops being used

    def one_round():
        n_dev = 0
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
            while dev is not None and dev_lost[0] is None:
                # tail guard: leave the last stretch to the host workers so
                # an occasional tunnel-stalled device dispatch cannot block
                # the round's tail
                with lock:
                    if state["remaining"] <= n_queries // 4:
                        break
                b = take(32)
                if b == 0:
                    break
                try:
                    _, payload = dev.ask(("search", b), 240)
                except Exception as e:
                    dev_lost[0] = f"{type(e).__name__}: {e}"
                    log(f"device lost mid-run ({dev_lost[0]}); host workers continue")
                    break
                if payload["tripped"]:
                    # the queries DID complete (host fallback inside the
                    # child) but are not device-attributed
                    dev_lost[0] = "watchdog tripped mid-run"
                    log(f"device {dev_lost[0]}; host workers continue")
                    break
                n_dev += b
        finally:
            ft.join()
        if feed_err:
            raise feed_err[0]
        for o in outstanding:
            o.get()  # re-raise worker exceptions instead of dropping
        return (time.time() - t0) / n_queries, n_dev

    per_round = []
    n_dev_rounds = []
    rounds = -1  # round -1 is a throwaway warm-up (page cache, engine JIT
    # variants, tunnel ramp); rounds 0-2 are measured
    while rounds < 3:
        el, n_dev = one_round()
        if rounds >= 0:
            per_round.append(el)
            n_dev_rounds.append(n_dev)
        rounds += 1
    pool.close()
    pool.join()

    # final device status: fetch_count + breaker state straight from the
    # child (device fields in the JSON must be backed by these, not assumed)
    device_fetches = None
    device_tripped = dev_lost[0] is not None
    device_parity = None
    if dev is not None:
        try:
            _, payload = dev.ask(("status",), 60)
            device_fetches = payload["fetch_count"]
            device_tripped = payload["tripped"]
            device_parity = payload.get("parity")
        except Exception as e:
            log(f"device status query failed ({type(e).__name__}: {e})")
        dev.kill()
    elif dev_note:
        device_tripped = "tripped" in dev_note

    elapsed = min(per_round)
    qpm = 60.0 / elapsed
    qpm_rounds = [round(60.0 / e, 1) for e in per_round]
    n_dev_measured = sum(n_dev_rounds)

    if n_dev_measured > 0 and not device_tripped:
        engine = "tpu_device+host"
    elif n_dev_measured > 0:
        engine = f"tpu_device+host (device lost mid-run: {dev_lost[0]})"
    elif device_tripped:
        engine = "host (device tripped)"
    else:
        engine = "host"

    print(
        json.dumps(
            {
                "metric": "demo_16S_search_throughput",
                "value": round(qpm, 2),
                "unit": "queries/min",
                "vs_baseline": round(qpm / BASELINE_QPM, 4),
                "golden_tsv_parity": parity,
                "seconds_per_query": round(elapsed, 3),
                "engine": engine,
                "device_query_share": round(
                    n_dev_measured / (len(per_round) * n_queries), 3
                ),
                "device_tripped": bool(device_tripped),
                "device_fetch_count": device_fetches,
                "device_retries": device_retries,
                "device_parity": device_parity,
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
