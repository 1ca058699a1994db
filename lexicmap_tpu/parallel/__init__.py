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
