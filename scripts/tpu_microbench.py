"""TPU primitive microbenchmarks that size the device pseudo-align design:
gather throughput, batched sort, h2d size cliff, while-loop step overhead,
scatter compaction.  Diagnostic only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__ as g

g._enable_compile_cache()

import jax
import jax.numpy as jnp


FIXED = 0.0

_sink = jax.jit(lambda r: jnp.sum(jnp.ravel(r)[:8].astype(jnp.float32)))


def _fetch(r):
    """Force real completion: d2h of a tiny reduction (block_until_ready does
    not synchronize through the axon tunnel)."""
    np.asarray(_sink(r))


def fixed_fetch_cost():
    x = jnp.ones((8,), dtype=jnp.float32)
    _fetch(x)
    t0 = time.time()
    for _ in range(5):
        _fetch(x)
    return (time.time() - t0) / 5


def bench(fn, *args, reps=20):
    r = fn(*args)
    _fetch(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    _fetch(r)
    return (time.time() - t0 - FIXED) / reps


def main():
    global FIXED
    print(jax.devices())
    FIXED = fixed_fetch_cost()
    print(f"fixed scalar fetch: {FIXED*1000:.1f}ms")

    # 1. gather throughput: idx [N] into table [65536]
    table = jnp.arange(65536, dtype=jnp.uint32)
    for N in [1 << 20, 16 << 20]:
        idx = jnp.asarray(np.random.randint(0, 65536, size=N, dtype=np.int32))
        f = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.uint32)))
        dt = bench(f, table, idx)
        print(f"gather {N>>20}M from 64K table: {dt*1000:.1f}ms "
              f"({N/dt/1e6:.0f}M elem/s)")

    # 1b. 2D row gather: qk[qidx, j] style
    qk = jnp.asarray(np.sort(np.random.randint(0, 1 << 62, size=(32, 3072)).astype(np.uint64)))
    wq = jnp.asarray(np.random.randint(0, 32, size=(2700,), dtype=np.int32))
    jj = jnp.asarray(np.random.randint(0, 3072, size=(2700, 4096), dtype=np.int32))
    f2 = jax.jit(lambda qk, wq, jj: jnp.sum(qk[wq[:, None], jj]))
    dt = bench(f2, qk, wq, jj)
    n = 2700 * 4096
    print(f"2D gather {n/1e6:.1f}M: {dt*1000:.1f}ms ({n/dt/1e6:.0f}M elem/s)")

    # 2. batched sort
    for (w, a) in [(2700, 4096), (680, 6144)]:
        x = jnp.asarray(np.random.randint(0, 1 << 63, size=(w, a)).astype(np.uint64))
        f3 = jax.jit(lambda v: jnp.sort(v, axis=1))
        dt = bench(f3, x)
        print(f"sort [{w},{a}] u64: {dt*1000:.1f}ms")
    # argsort variant (needed to reorder several arrays)
    x = jnp.asarray(np.random.randint(0, 1 << 63, size=(2700, 4096)).astype(np.uint64))
    f4 = jax.jit(lambda v: jnp.argsort(v, axis=1))
    dt = bench(f4, x)
    print(f"argsort [2700,4096] u64: {dt*1000:.1f}ms")

    # 3. h2d cliff (synced via tiny readback, fixed cost subtracted)
    for mb in [1, 2, 4, 8]:
        sz = mb << 20
        ts = []
        for _ in range(5):
            y = np.random.randint(0, 255, size=(sz,), dtype=np.uint8)
            t0 = time.time()
            d = jax.device_put(y)
            _fetch(d)
            ts.append(time.time() - t0 - FIXED)
        ts = sorted(ts)
        print(f"h2d {mb}MB: min {ts[0]*1000:.0f}ms med {ts[2]*1000:.0f}ms")

    # 4. while-loop step overhead: [256, 1536] int32 DP-ish body
    def dp(qb):
        def body(i, carry):
            msl = carry
            # fake banded max over all lanes: a few vector ops
            v = msl + qb
            v = jnp.where(qb > i, v, -1)
            m = jnp.max(v, axis=1, keepdims=True)
            return jnp.where(jnp.arange(qb.shape[1])[None, :] == (i % qb.shape[1]), m, msl)

        return jax.lax.fori_loop(0, 1536, body, jnp.zeros_like(qb))

    qb = jnp.asarray(np.random.randint(0, 1536, size=(256, 1536), dtype=np.int32))
    f5 = jax.jit(dp)
    dt = bench(f5, qb)
    print(f"fori 1536 steps x [256,1536] body: {dt*1000:.1f}ms "
          f"({dt/1536*1e6:.1f}us/step)")

    # 5. masked O(A^2) one-shot (dedup-style): [W, A, A] reduced
    def dedup(qb):
        # any j<i with qb[j] >= qb[i]-50 and qb[j] <= qb[i]
        a = qb[:, :, None]
        b = qb[:, None, :]
        m = (b >= a - 50) & (b <= a)
        tri = jnp.tril(jnp.ones((qb.shape[1], qb.shape[1]), dtype=bool), -1)
        return jnp.any(m & tri[None], axis=2)

    for (w, a) in [(256, 1536), (2048, 384)]:
        qb2 = jnp.asarray(np.random.randint(0, 1536, size=(w, a), dtype=np.int32))
        f6 = jax.jit(dedup)
        dt = bench(f6, qb2)
        print(f"O(A^2) masked any [{w},{a}]: {dt*1000:.1f}ms")


if __name__ == "__main__":
    main()
