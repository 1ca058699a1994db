"""Device-integrated seed matching for the search pipeline.

DeviceSeedMatcher packs the columnar seed index into the [M, E] hi/lo uint32
layout once (HBM-resident), then answers each query's per-mask >=p-prefix
range queries with ONE Pallas kernel launch instead of per-chunk host
bisection.  The kernel returns (e0, n_hits) per mask; the host gathers the
matched entries/postings from the columnar store — results are identical to
the host path (verified by tests/test_device_search.py).

The suffix (reversed k-mer) search stays on host: after dedup there are only
a handful of reversed k-mers per query and they map to scattered masks.
"""

from __future__ import annotations

import numpy as np

from .pallas_kernels import (
    PAD_HI,
    pack_index_for_device,
    seed_match_pallas,
    split_kmers_hi_lo,
)


class DeviceSeedMatcher:
    def __init__(self, index_searcher, tile_m: int = 200, interpret: bool | None = None):
        import jax
        import jax.numpy as jnp

        self.idx = index_searcher
        self.k = index_searcher.k
        self.m = index_searcher.mask_set.m
        hi, lo, E = pack_index_for_device(
            index_searcher.chunks, self.m, self.k
        )
        # pad M to a tile multiple
        self.tile_m = tile_m
        m_pad = ((self.m + tile_m - 1) // tile_m) * tile_m
        if m_pad != self.m:
            pad = np.full((m_pad - self.m, E), PAD_HI, dtype=np.uint32)
            hi = np.concatenate([hi, pad])
            lo = np.concatenate([lo, pad])
        self.m_pad = m_pad
        self.E = E
        self.d_hi = jnp.asarray(hi)
        self.d_lo = jnp.asarray(lo)
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret

        # per-mask global entry offsets into each chunk, for posting gather
        self.entry_base = np.zeros(self.m, dtype=np.int64)
        self.chunk_of_mask = np.zeros(self.m, dtype=np.int32)
        for ci, rdr in enumerate(index_searcher.chunks):
            off = np.asarray(rdr.mask_offsets)
            for mi in range(rdr.mask_begin, rdr.mask_end):
                self.entry_base[mi] = off[mi - rdr.mask_begin]
                self.chunk_of_mask[mi] = ci

    def match_batch(self, query_kmers_batch: np.ndarray, min_prefix: int):
        """Batched variant: query_kmers_batch [B, M] -> per-query results of
        match() from ONE vmapped kernel launch (dispatch amortized across the
        batch — important through high-latency device transports)."""
        import jax
        import jax.numpy as jnp

        B = query_kmers_batch.shape[0]
        qh = np.full((B, self.m_pad), PAD_HI, dtype=np.uint32)
        ql = np.full((B, self.m_pad), PAD_HI, dtype=np.uint32)
        for b in range(B):
            kk = query_kmers_batch[b]
            sel = kk != 0
            h, l = split_kmers_hi_lo(kk[sel], self.k)
            idxs = np.nonzero(sel)[0]
            qh[b, idxs] = h
            ql[b, idxs] = l

        from .pallas_kernels import seed_match_pallas

        fn = jax.vmap(
            lambda a, b2: seed_match_pallas(
                self.d_hi, self.d_lo, a, b2,
                p=min_prefix, k=self.k, tile_m=self.tile_m,
                interpret=self.interpret,
            )
        )
        nh, e0, _ = fn(jnp.asarray(qh), jnp.asarray(ql))
        nh = np.asarray(nh)[:, : self.m]
        e0 = np.asarray(e0)[:, : self.m]
        out = []
        for b in range(B):
            hit = np.nonzero(nh[b] > 0)[0]
            out.append((hit, e0[b][hit], nh[b][hit]))
        return out

    def match(self, query_kmers: np.ndarray, min_prefix: int):
        """Returns (mask_idx, entry_idx_within_mask_range) pairs for all
        matched entries, like the host searchsorted path."""
        import jax.numpy as jnp

        qh = np.full(self.m_pad, PAD_HI, dtype=np.uint32)
        ql = np.full(self.m_pad, PAD_HI, dtype=np.uint32)
        sel = query_kmers != 0
        h, l = split_kmers_hi_lo(query_kmers[sel], self.k)
        idxs = np.nonzero(sel)[0]
        qh[idxs] = h
        ql[idxs] = l
        nh, e0, _lcp = seed_match_pallas(
            self.d_hi, self.d_lo, jnp.asarray(qh), jnp.asarray(ql),
            p=min_prefix, k=self.k, tile_m=self.tile_m, interpret=self.interpret,
        )
        nh = np.asarray(nh)[: self.m]
        e0 = np.asarray(e0)[: self.m]
        hit_masks = np.nonzero(nh > 0)[0]
        return hit_masks, e0[hit_masks], nh[hit_masks]
