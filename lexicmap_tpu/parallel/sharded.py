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
    from . import ensure_jax

    ensure_jax()
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

    Dtype-polymorphic (uint32 k-mers for k <= 16; uint64 needs x64 enabled).
    Returns per-query (n_hits [Bl, Ml], best_lcp [Bl, Ml]).
    """
    suf = query_kmers.dtype.type((1 << (2 * (k - min_prefix))) - 1)

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
# tables sharded over tp, query batches over dp — the collective replaces
# the reference's per-chunk goroutines + channel collection
# (ref: lib-index-search.go:1316-1528).


class ShardedSeedMatcher:
    """Drop-in `match_batch` provider (same triples as DeviceSeedMatcher)
    backed by an index sharded over a device mesh.

    Layout is the same transfer-aware design as DeviceSeedMatcher — hi-word
    uint32 entries in quantile-chosen entry-count buckets (the packing code
    is shared: device_search.pack_bucket_rows / bucket_edges_for), so shard
    HBM is ~sum(entry counts)/2 bytes, NOT m_pad * maxE * 8.  Masks are
    dealt round-robin to tp shards (mask i -> shard i % tp), which balances
    the repeat-heavy masks; each shard locates + compacts hits for its local
    masks and an all_gather over tp returns the per-query compacted
    (mask, e0<<16|n_hits) pairs — the collective replaces the reference's
    per-chunk goroutines + channel collection (lib-index-search.go:1531-1599
    + merge-search-results.go:38-52 semantics).

    Downstream consumption (posting gather, chaining, alignment) is the
    identical host code, so a multi-device run must reproduce the
    single-device TSV byte-for-byte (asserted by
    tests/test_parallel.py and __graft_entry__.dryrun_multichip on the real
    demo index, golden 84-row q.gene TSV).
    """

    #: per-(query, shard, bucket) compacted-hit capacity
    H_SHARD = 1536

    def __init__(self, index_searcher, mesh: Mesh, interpret: bool | None = None):
        from . import ensure_jax

        ensure_jax()
        from .device_search import (
            bucket_edges_for,
            collect_per_mask_tables,
            pack_bucket_rows,
        )

        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret
        self.idx = index_searcher
        self.mesh = mesh
        self.k = index_searcher.k
        self.m = index_searcher.mask_set.m
        self.tp = tp = mesh.devices.shape[1]
        self.dp = mesh.devices.shape[0]

        # masks beyond this stay on the host tier (the single-chip matcher
        # column-chunks them instead; the mesh layout keeps whole masks
        # per shard row — chunking across shards is future work)
        SHARD_MAX_E = 1 << 17

        per_mask = collect_per_mask_tables(index_searcher)
        assert len(per_mask) == self.m
        counts = np.array([a.shape[0] for a in per_mask], dtype=np.int64)
        edges = bucket_edges_for(counts, cap=SHARD_MAX_E)
        shard_of = np.arange(self.m) % tp  # round-robin balance

        # per bucket: stacked per-shard tables [tp, mb_pad, E]
        self.buckets = []  # (E, tile, d_hi, d_cnt, d_gids, mb_pad, ids_per_shard)
        self.hbm_bytes = 0
        host_ids = np.nonzero(counts > SHARD_MAX_E)[0]
        assigned = counts > SHARD_MAX_E
        for E in edges:
            sel = ~assigned & (counts <= E)
            assigned |= counts <= E
            if not sel.any():
                continue
            ids_per_shard = [np.nonzero(sel & (shard_of == s))[0] for s in range(tp)]
            mb = max(ids.shape[0] for ids in ids_per_shard)
            tile = _shard_tile_for(E)
            mb_pad = max(((mb + tile - 1) // tile) * tile, tile)
            hi = np.empty((tp, mb_pad, E), dtype=np.uint32)
            cnt = np.empty((tp, mb_pad), dtype=np.int32)
            gids = np.empty((tp, mb_pad), dtype=np.uint32)
            for s, ids in enumerate(ids_per_shard):
                hi[s], cnt[s], gids[s] = pack_bucket_rows(per_mask, ids, self.k, E, mb_pad)
            d_hi = _gput(hi, NamedSharding(mesh, P("tp", None, None)))
            d_cnt = _gput(cnt, NamedSharding(mesh, P("tp", None)))
            d_gids = _gput(gids, NamedSharding(mesh, P("tp", None)))
            self.buckets.append((E, tile, d_hi, d_cnt, d_gids, mb_pad, ids_per_shard))
            self.hbm_bytes += tp * mb_pad * E * 4
        self.host_tables = {int(mi): per_mask[mi] for mi in host_ids}
        self._fns: dict = {}

    def describe(self) -> str:
        parts = [
            f"E={E} x {tp_mb}x{self.tp} shard rows (tile {tile})"
            for E, tile, _, _, _, tp_mb, _ in self.buckets
        ]
        if self.host_tables:
            parts.append(f"host: {len(self.host_tables)} masks")
        return (
            f"sharded seed table: {self.hbm_bytes / 1e6:.1f} MB total HBM over "
            f"tp={self.tp} [" + ", ".join(parts) + "]"
        )

    def _bucket_fn(self, bucket_index: int, min_prefix: int):
        key = (bucket_index, min_prefix)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        import jax.numpy as jnp

        from .pallas_kernels import seed_locate_batch_pallas

        E, tile, _, _, _, mb_pad, _ = self.buckets[bucket_index]
        H = min(self.H_SHARD, mb_pad)
        interpret = self.interpret

        def step(d_hi, d_cnt, d_gids, qh, qv):
            # local shard: strip the leading tp axis (size 1 per shard)
            hi_l, cnt_l, gids_l = d_hi[0], d_cnt[0], d_gids[0]
            qh_l, qv_l = qh[:, 0], qv[:, 0]  # [Bl, mb_pad]
            # whole-batch locate in ONE kernel (batch = grid dim;
            # vmap-of-pallas_call hangs the axon backend's compiler);
            # qv crosses the transport as uint8 and widens here
            nh, e0 = seed_locate_batch_pallas(
                hi_l, cnt_l, qh_l, qv_l.astype(jnp.int32), p=min_prefix,
                tile_m=tile, interpret=interpret,
            )  # [Bl, mb_pad]
            hit = nh > 0
            keys = jnp.where(hit, gids_l[None, :], jnp.uint32(0xFFFFFFFF))
            # e0 and n ride as separate operands (e0 may exceed 2^16 for
            # entry-heavy masks at large genome counts)
            keys, e0s, nhs = jax.lax.sort(
                (keys, e0, nh), dimension=1, num_keys=1, is_stable=False
            )
            keys = keys[:, :H][:, None, :]       # [Bl, 1, H]
            e0s = e0s[:, :H][:, None, :]
            nhs = nhs[:, :H][:, None, :]
            n = jnp.sum(hit.astype(jnp.int32), axis=1)[:, None]  # [Bl, 1]
            keys = jax.lax.all_gather(keys, "tp", axis=1, tiled=True)
            e0s = jax.lax.all_gather(e0s, "tp", axis=1, tiled=True)
            nhs = jax.lax.all_gather(nhs, "tp", axis=1, tiled=True)
            n = jax.lax.all_gather(n, "tp", axis=1, tiled=True)
            return keys, e0s, nhs, n

        smapped = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(P("tp", None, None), P("tp", None), P("tp", None),
                      P("dp", "tp", None), P("dp", "tp", None)),
            out_specs=(P("dp", None, None), P("dp", None, None),
                       P("dp", None, None), P("dp", None)),
            check_vma=False,
        )
        fn = jax.jit(smapped)
        self._fns[key] = fn
        return fn

    def match_batch(self, query_kmers_batch: np.ndarray, min_prefix: int):
        """query_kmers_batch [B, m] -> per-query (hit_masks, e0, n_hits)
        triples (None where a shard overflowed H_SHARD -> host fallback)."""
        from .pallas_kernels import split_kmers_hi_lo

        B = query_kmers_batch.shape[0]
        b_pad = ((B + self.dp - 1) // self.dp) * self.dp
        qh_full = np.zeros((b_pad, self.m), dtype=np.uint32)
        sel = np.zeros((b_pad, self.m), dtype=bool)
        sel[:B] = query_kmers_batch != 0
        if sel.any():
            h, _ = split_kmers_hi_lo(query_kmers_batch[sel[:B]], self.k)
            qh_full[sel] = h

        pending = []
        for bi, (E, tile, d_hi, d_cnt, d_gids, mb_pad, ids_per_shard) in enumerate(
            self.buckets
        ):
            qh = np.zeros((b_pad, self.tp, mb_pad), dtype=np.uint32)
            qv = np.zeros((b_pad, self.tp, mb_pad), dtype=np.uint8)
            for s, ids in enumerate(ids_per_shard):
                qh[:, s, : ids.shape[0]] = qh_full[:, ids]
                qv[:, s, : ids.shape[0]] = sel[:, ids]
            from . import count_h2d

            count_h2d("sharded seed matching", qh, qv)
            sqh = _gput(qh, NamedSharding(self.mesh, P("dp", "tp", None)))
            sqv = _gput(qv, NamedSharding(self.mesh, P("dp", "tp", None)))
            fn = self._bucket_fn(bi, min_prefix)
            pending.append(fn(d_hi, d_cnt, d_gids, sqh, sqv))

        from . import fetch_guarded

        fetched = fetch_guarded(
            pending,
            "sharded seed matching",
            compile_key=(
                min_prefix,
                b_pad,
                tuple((E, tile, mb) for E, tile, _, _, _, mb, _ in self.buckets),
            ),
        )
        if fetched is None:  # watchdog tripped: whole batch to host matching
            return [None] * B

        per_query: list[list] = [[] for _ in range(B)]
        overflow = np.zeros(B, dtype=bool)
        for bi, (keys, e0s, nhs, ncnt) in enumerate(fetched):
            H = keys.shape[2]
            for b in range(B):
                for s in range(self.tp):
                    n = int(ncnt[b, s])
                    if n > H:
                        overflow[b] = True
                    elif n:
                        per_query[b].append(
                            (keys[b, s, :n], e0s[b, s, :n], nhs[b, s, :n])
                        )

        # host bisection for the few over-cap masks
        host_extra: list[list] = [[] for _ in range(B)]
        if self.host_tables:
            suf = np.uint64((1 << (2 * (self.k - min_prefix))) - 1)
            for mi, table in self.host_tables.items():
                col = query_kmers_batch[:, mi]
                for b in np.nonzero(col != 0)[0]:
                    q = col[b]
                    lo_i = int(np.searchsorted(table, q & ~suf, side="left"))
                    hi_i = int(np.searchsorted(table, q | suf, side="right"))
                    if hi_i > lo_i:
                        host_extra[b].append((mi, lo_i, hi_i - lo_i))

        out = []
        for b in range(B):
            if overflow[b]:
                out.append(None)
                continue
            if per_query[b]:
                hm = np.concatenate([k for k, _, _ in per_query[b]]).astype(np.int64)
                e0 = np.concatenate([e for _, e, _ in per_query[b]]).astype(np.int64)
                nh = np.concatenate([n for _, _, n in per_query[b]]).astype(np.int64)
            else:
                hm = np.empty(0, dtype=np.int64)
                e0 = np.empty(0, dtype=np.int64)
                nh = np.empty(0, dtype=np.int64)
            if host_extra[b]:
                hm = np.concatenate([hm, [m for m, _, _ in host_extra[b]]])
                e0 = np.concatenate([e0, [o for _, o, _ in host_extra[b]]])
                nh = np.concatenate([nh, [n for _, _, n in host_extra[b]]])
            if hm.shape[0] > 1:
                order = np.argsort(hm, kind="stable")
                hm, e0, nh = hm[order], e0[order], nh[order]
            out.append((hm, e0, nh))
        return out


def _shard_tile_for(E: int) -> int:
    from .device_search import _tile_for

    return _tile_for(E, 200)


def _gput(arr: np.ndarray, sharding):
    """device_put that also works when the mesh spans multiple PROCESSES
    (jax.distributed): every process holds the identical full host array and
    contributes the shards its local devices own.  Single-process keeps the
    plain device_put fast path."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
