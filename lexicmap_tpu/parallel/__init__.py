"""Device (JAX) components.  ensure_jax() is called by every device entry
point before the first backend use: it honors an explicit JAX_PLATFORMS=cpu
from the environment (the axon sitecustomize force-rewrites the env var, so
only jax.config wins) and enables the repo-local persistent compile cache
(cold TPU compiles through the tunnel take minutes)."""

from __future__ import annotations

import os

_done = False


def ensure_jax() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    want = os.environ.get("LEXICMAP_TPU_JAX_PLATFORM") or None
    if want is None and "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        want = "cpu"
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Device-dispatch watchdog.  The axon tunnel backend intermittently never
# completes a dispatch (observed 2026-08-20: an identical, already-compiled
# program returns in ~1 s on one run and blocks device_get forever on the
# next).  Every device fetch in the search path goes through fetch_guarded:
# on timeout the process-wide circuit breaker trips, the caller falls back
# to its host path, and all later batches skip the device outright — a hung
# transport must never hang the CLI.  LEXICMAP_TPU_DEVICE_TIMEOUT tunes the
# watchdog (seconds; 0 disables it).

_tripped = False
_abandoned: list = []


def device_tripped() -> bool:
    """True once a device fetch has timed out in this process."""
    return _tripped


def abandoned_fetch() -> bool:
    """True if a timed-out fetch thread is still blocked in the runtime.
    Such a thread aborts the process during normal interpreter teardown
    (the C++ runtime throws through the dying thread); callers that own
    the process exit (the CLI, bench) should flush and os._exit instead."""
    return any(t.is_alive() for t in _abandoned)


def hard_exit_if_abandoned(code: int = 0) -> None:
    """os._exit(code) when an abandoned device fetch would otherwise abort
    interpreter teardown; no-op in the healthy case."""
    if abandoned_fetch():
        import sys

        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)


def trip_device(reason: str) -> None:
    global _tripped
    if not _tripped:
        _tripped = True
        import sys

        print(
            f"lexicmap_tpu: {reason}; disabling the device engine for this "
            "process (host fallback)",
            file=sys.stderr,
        )


_warm_whats: set = set()  # (label, compile_key) pairs that have completed a fetch
fetch_count = 0  # guarded device fetches this process (dispatch-budget accounting)

# Per-stage transport accounting: label -> {fetches, d2h_bytes, h2d_bytes}.
# d2h is counted by fetch_guarded on every successful fetch; h2d is counted
# by count_h2d() at each device-stage upload site.  Benches read
# transport_summary() to tabulate the per-regime transport budget
# (bytes moved x tunnel ms/MB + fetches x RTT) against the observed
# device-host gap — the device claim in any doc must be backed by this.
transport: dict = {}


def _tacc(label: str) -> dict:
    return transport.setdefault(label, {"fetches": 0, "d2h_bytes": 0, "h2d_bytes": 0})


def _tree_bytes(trees) -> int:
    n = 0
    for tree in trees:
        if tree is None:
            continue
        if isinstance(tree, (list, tuple)):
            n += _tree_bytes(tree)
            continue
        n += int(getattr(tree, "nbytes", 0))
    return n


def count_h2d(label: str, *trees) -> int:
    """Record host->device upload bytes for a stage label; returns bytes."""
    n = _tree_bytes(trees)
    _tacc(label)["h2d_bytes"] += n
    return n


def transport_summary() -> dict:
    """Snapshot of per-stage transport counters (plus process totals)."""
    tot = {"fetches": 0, "d2h_bytes": 0, "h2d_bytes": 0}
    out = {}
    for k, v in transport.items():
        out[k] = dict(v)
        for f in tot:
            tot[f] += v[f]
    out["TOTAL"] = tot
    return out


def fetch_guarded(
    tree,
    what: str = "device dispatch",
    timeout: float | None = None,
    compile_key=None,
):
    """jax.device_get with a watchdog.  Returns the fetched tree, or None
    when the breaker is (or just got) tripped — the caller must fall back
    to its host path.  The abandoned fetch thread dies with the process.

    Default timeout: 600 s for the first fetch of each (call-site label,
    compile_key) pair — the axon session warm-up alone measures 300-320 s
    (BENCH_r04 and the round-5 re-runs both tripped a 300 s cold timeout
    during legitimate warm-up), and cold compiles through the tunnel take
    minutes on top; 60 s once a fetch with the same pair has completed
    (warm dispatches finish in well under a second).

    compile_key: the shape-bucket / specialization key of the program(s)
    behind this fetch.  Device stages compile per shape bucket (chain DP
    per n_pad, WFA per (N,M,S,W,B_pad), ...), so a new bucket after the
    label is warm still pays a fresh multi-minute tunnel compile — it must
    get the cold grace, not the 60 s warm timeout."""
    global fetch_count
    if _tripped:
        return None
    fetch_count += 1
    import jax

    wkey = (what, compile_key)
    if timeout is None:
        env = os.environ.get("LEXICMAP_TPU_DEVICE_TIMEOUT")
        if env is not None:
            timeout = float(env)
        else:
            timeout = 600.0 if wkey not in _warm_whats else 60.0
    if timeout <= 0:
        v = jax.device_get(tree)
        acc = _tacc(what)
        acc["fetches"] += 1
        acc["d2h_bytes"] += sum(
            int(getattr(l, "nbytes", 0)) for l in jax.tree_util.tree_leaves(v)
        )
        return v
    import threading

    box: dict = {}

    def run():
        try:
            box["v"] = jax.device_get(tree)
        except Exception as e:  # surfaced to the caller below
            box["e"] = e

    t = threading.Thread(target=run, daemon=True, name="lexicmap-fetch")
    t.start()
    t.join(timeout)
    if t.is_alive():
        _abandoned.append(t)
        trip_device(f"{what} did not complete within {timeout:.0f}s")
        return None
    if "e" in box:
        raise box["e"]
    _warm_whats.add(wkey)
    acc = _tacc(what)
    acc["fetches"] += 1
    acc["d2h_bytes"] += sum(
        int(getattr(l, "nbytes", 0)) for l in jax.tree_util.tree_leaves(box["v"])
    )
    return box["v"]
