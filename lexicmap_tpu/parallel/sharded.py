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

from .kernels import PAD_KMER, kmer_lcp_bases, searchsorted_rows


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


# ---------------------------------------------------------------------------
# Real-pipeline sharded seed matching: the actual index's per-mask entry
# tables sharded over tp, query batches over dp.  Each shard locates its
# local masks' >=p-prefix entry ranges; a tiled all_gather over tp rebuilds
# the full per-query (n_hits, e0) rows, which feed the host phases 2b-4
# unchanged — the collective replaces the reference's per-chunk goroutines +
# channel collection (ref: lib-index-search.go:1316-1528).


def make_sharded_seed_locate(mesh: Mesh, k: int = 31, min_prefix: int = 15):
    """Jitted sharded locate step.

    Inputs:
      seed_kmers  [M, E] uint64 (row-sorted, PAD_KMER padded) — tp over M
      query_kmers [B, M] uint64 (0 = no captured k-mer) — dp over B, tp over M
    Outputs:
      n_hits [B, M] int32, e0 [B, M] int32 — dp over B, replicated over tp.
    """
    suf = jnp.uint64((1 << (2 * (k - min_prefix))) - 1)

    def step(seed_kmers, query_kmers):
        def one_query(qk):
            lb = jnp.bitwise_and(qk, jnp.bitwise_not(suf))
            rb = jnp.bitwise_or(qk, suf)
            e0 = searchsorted_rows(seed_kmers, lb, side_left=True)
            e1 = searchsorted_rows(seed_kmers, rb, side_left=False)
            has = qk != 0
            return jnp.where(has, e1 - e0, 0), e0

        nh, e0 = jax.vmap(one_query)(query_kmers)  # [Bl, Ml]
        nh = jax.lax.all_gather(nh, "tp", axis=1, tiled=True)
        e0 = jax.lax.all_gather(e0, "tp", axis=1, tiled=True)
        return nh, e0

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("tp", None), P("dp", "tp")),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return jax.jit(smapped)


class ShardedSeedMatcher:
    """Drop-in `match_batch` provider (same triples as DeviceSeedMatcher)
    backed by an index sharded over a device mesh.

    The packed per-mask entry table lives distributed over the mesh's tp
    axis; match_batch answers a whole query batch with one sharded dispatch.
    Downstream consumption (posting gather, chaining, alignment) is the
    identical host code, so a multi-device run must reproduce the
    single-device TSV byte-for-byte (asserted by
    tests/test_parallel.py::test_sharded_full_pipeline_tsv_identical and
    __graft_entry__.dryrun_multichip).
    """

    def __init__(self, index_searcher, mesh: Mesh):
        self.idx = index_searcher
        self.mesh = mesh
        self.k = index_searcher.k
        self.m = index_searcher.mask_set.m
        tp = mesh.devices.shape[1]
        self.dp = mesh.devices.shape[0]

        per_mask: list[np.ndarray] = []
        for rdr in index_searcher.chunks:
            km = np.asarray(rdr.kmers)
            off = np.asarray(rdr.mask_offsets)
            for mi in range(rdr.mask_end - rdr.mask_begin):
                per_mask.append(km[off[mi] : off[mi + 1]])
        assert len(per_mask) == self.m
        E = max((a.shape[0] for a in per_mask), default=1)
        E = max(((E + 127) // 128) * 128, 128)
        m_pad = ((self.m + tp - 1) // tp) * tp
        table = np.full((m_pad, E), PAD_KMER, dtype=np.uint64)
        for i, a in enumerate(per_mask):
            table[i, : a.shape[0]] = a
        self.m_pad = m_pad
        self.E = E
        self.table = jax.device_put(table, NamedSharding(mesh, P("tp", None)))
        self._step = make_sharded_seed_locate(mesh, self.k, index_searcher.opt.min_prefix)

    def match_batch(self, query_kmers_batch: np.ndarray, min_prefix: int):
        """query_kmers_batch [B, m] -> per-query (hit_masks, e0, n_hits)."""
        B = query_kmers_batch.shape[0]
        b_pad = ((B + self.dp - 1) // self.dp) * self.dp
        q = np.zeros((b_pad, self.m_pad), dtype=np.uint64)
        q[:B, : self.m] = query_kmers_batch
        sq = jax.device_put(q, NamedSharding(self.mesh, P("dp", "tp")))
        nh, e0 = self._step(self.table, sq)
        nh = np.asarray(nh)[:B, : self.m]
        e0 = np.asarray(e0)[:B, : self.m]
        out = []
        for b in range(B):
            hit = np.nonzero(nh[b] > 0)[0]
            out.append((hit, e0[b][hit].astype(np.int64), nh[b][hit].astype(np.int64)))
        return out
