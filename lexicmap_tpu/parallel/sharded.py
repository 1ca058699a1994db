"""Multi-device sharded search step.

The distribution axes of this engine (SURVEY.md §2.4):
  dp = query batch  (the reference's per-query worker pool, search.go:585)
  tp = mask axis    (the reference's seed chunk files, kv-searcher per chunk)

The seed table lives sharded in HBM along the mask axis; query k-mer batches
are data-parallel.  Each (dp, tp) shard runs the fixed-shape seed-matching
kernel on its local masks, and per-query hit statistics are combined with a
psum over the tp axis — the collective replaces the reference's channel-based
result collection (lib-index-search.go:1316-1528).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .kernels import kmer_lcp_bases, searchsorted_rows


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        # favor tp (mask sharding); dp splits what's left
        dp = 2 if n % 2 == 0 and n > 2 else 1
    tp = n // dp
    arr = np.array(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def seed_match_shard(seed_kmers, query_kmers, k: int, min_prefix: int):
    """Per-shard seed matching: seed_kmers [Ml, E], query_kmers [Bl, Ml].

    Returns per-query (n_hits [Bl, Ml], best_lcp [Bl, Ml]).
    """
    suf = jnp.uint64((1 << (2 * (k - min_prefix))) - 1)

    def one_query(qk):
        lb = jnp.bitwise_and(qk, jnp.bitwise_not(suf))
        rb = jnp.bitwise_or(qk, suf)
        e0 = searchsorted_rows(seed_kmers, lb, side_left=True)
        e1 = searchsorted_rows(seed_kmers, rb, side_left=False)
        has = qk != 0
        n_hits = jnp.where(has, e1 - e0, 0)
        first = jnp.take_along_axis(
            seed_kmers, jnp.minimum(e0, seed_kmers.shape[1] - 1)[:, None], axis=1
        )[:, 0]
        lcp = jnp.where(n_hits > 0, kmer_lcp_bases(first, qk, k), 0)
        return n_hits, lcp

    return jax.vmap(one_query)(query_kmers)


def make_sharded_search_step(mesh: Mesh, k: int = 31, min_prefix: int = 15):
    """Builds the jitted multi-chip search step.

    Inputs:
      seed_kmers  [M, E] uint64 — sharded over tp along the mask axis
      query_kmers [B, M] uint64 — B over dp, M over tp
    Output:
      scores [B] float32 — per-query seed score (sum of hit-weighted LCPs),
      allgathered over tp; the host uses it for candidate screening.
    """

    def step(seed_kmers, query_kmers):
        n_hits, lcp = seed_match_shard(seed_kmers, query_kmers, k, min_prefix)
        # per-query partial score on this tp shard; psum rides the mesh axis
        part = jnp.sum(
            n_hits.astype(jnp.float32) * lcp.astype(jnp.float32), axis=1
        )
        return jax.lax.psum(part, axis_name="tp")

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("tp", None), P("dp", "tp")),
        out_specs=P("dp"),
        # the bisection loop's carry starts unvarying and becomes varying
        # over tp after the first gather; skip the strict vma check
        check_vma=False,
    )
    return jax.jit(smapped)


def shard_arrays(mesh: Mesh, seed_kmers: np.ndarray, query_kmers: np.ndarray):
    """Device-put inputs with the step's shardings."""
    s_seeds = jax.device_put(seed_kmers, NamedSharding(mesh, P("tp", None)))
    s_queries = jax.device_put(query_kmers, NamedSharding(mesh, P("dp", "tp")))
    return s_seeds, s_queries
