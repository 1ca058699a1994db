"""Device-integrated seed matching for the search pipeline.

DeviceSeedMatcher packs the columnar seed index into HBM-resident
[masks, entries] hi-word uint32 tables and answers each query batch's
per-mask >=p-prefix range queries with one Pallas dispatch per bucket.
The kernel returns (e0, n_hits) per mask; the host gathers the matched
entries/postings from the columnar store — results are identical to the
host path (verified by tests/test_device_search.py).

Transport-aware design (the TPU here sits behind a ~40 MB/s, ~25 ms/round
tunnel; see scripts/tpu_microbench.py):
  - only the HI word of each entry k-mer is resident: a p <= 16-base
    prefix range lives entirely in the top 32 bits, and the host computes
    exact LCPs on the gathered entries anyway — half the HBM, half the h2d.
  - hits are COMPACTED ON DEVICE: (mask_id, e0, n_hits) triples are
    sorted so real hits lead, and only the first H_CAP columns are
    fetched (~1.5 MB instead of the dense [B, 20000] tables).  A query
    with more than H_CAP hit masks (never seen in practice) falls back to
    host seed matching wholesale, so results are unconditionally exact.

Scalable layout: instead of padding every mask to the global max entry
count (one repeat-heavy mask would inflate the whole table), masks are
grouped into entry-count BUCKETS chosen from the count distribution's
quantiles (p50/p90/p99/max, each rounded up to the 128-lane width).  Each
bucket is its own [Mb, Eb] table + dispatch, so HBM is ~sum(count) rather
than M*max(count).  Masks beyond MAX_E (2^14 entries) are matched by host
bisection — on real data that is a handful of low-complexity repeat masks.

The suffix (reversed k-mer) search stays on host: after dedup there are
only a handful of reversed k-mers per query and they map to scattered
masks.
"""

from __future__ import annotations

import os

import numpy as np

from .pallas_kernels import (
    PAD_HI,
    seed_locate_batch_pallas,
    split_kmers_hi_lo,
)

# entry-count ceiling of one PACKED ROW.  Masks with more entries are
# COLUMN-CHUNKED into multiple rows of <= E_CAP contiguous entries each
# (round 5): at the 50k-genome scale a uniform E=106368 bucket forced
# 8-row VMEM tiles (2,500 grid steps per dispatch — the measured reason
# the warm host beat the device there), while E_CAP=2^14 keeps tiles at
# 64 rows.  A range hit spanning chunk rows comes back as multiple
# (mask, e0, n) triples with contiguous ranges; match_batch merges them.
# This also removes the old MAX_E=2^17 host-fallback ceiling entirely —
# arbitrarily entry-heavy masks stay device-resident (HBM budget aside).
E_CAP = 1 << 14
VMEM_BUDGET = 8 << 20  # bytes of VMEM a tile's uint32 blocks may use
H_CAP = 6144  # max hit masks fetched per (query, bucket)
# the hit table is fetched at a SPECULATIVE width: real hit counts (masks
# with a >=p-prefix match) are data-dependent and usually far below H_CAP,
# and d2h is 3 u32 columns x H per query per bucket — at H_CAP that was
# the single largest fetch of the whole engine.  A batch whose device-side
# count exceeds the speculative width re-dispatches at the next bucket
# (rare; the per-matcher hint converges to the workload's width).
H_BUCKETS = (1024, 2048, 4096, H_CAP)
INV_MASK = np.uint32(0xFFFFFFFF)


def _tile_for(E: int, tile_m: int) -> int:
    t = min(tile_m, max(8, (VMEM_BUDGET // (8 * E)) // 8 * 8))
    return int(t)


def collect_per_mask_tables(index_searcher) -> list[np.ndarray]:
    """Per-mask sorted entry k-mer arrays from the columnar seed chunks."""
    per_mask: list[np.ndarray] = []
    for rdr in index_searcher.chunks:
        kmers = np.asarray(rdr.kmers)
        off = np.asarray(rdr.mask_offsets)
        for mi in range(rdr.mask_end - rdr.mask_begin):
            per_mask.append(kmers[off[mi] : off[mi + 1]])
    return per_mask


def bucket_edges_for(counts: np.ndarray, cap: int = E_CAP) -> list[int]:
    """Entry-count bucket edges from the distribution's quantiles
    (p50/p90/p99/max, rounded up to the 128-lane width, capped at `cap`)."""
    qs = np.quantile(counts, [0.5, 0.9, 0.99, 1.0]) if counts.shape[0] else [128]
    edges: list[int] = []
    for q in qs:
        e = max(((int(q) + 127) // 128) * 128, 128)
        if e > cap:
            e = cap
        # merge near-duplicate edges (uniform count distributions at large
        # genome counts would otherwise create several buckets of almost
        # identical E, each paying its own kernel compile)
        if edges and e <= edges[-1] * 9 // 8:
            edges[-1] = max(edges[-1], e)
            continue
        edges.append(e)
    return edges


def pack_bucket_rows(per_mask, ids: np.ndarray, k: int, E: int, mb_pad: int):
    """Pack the masks `ids` into PAD_HI-padded [mb_pad, E] hi-word rows.

    Returns (hi [mb_pad, E] u32, cnt [mb_pad] i32, gids [mb_pad] u32).
    (Mask-granular packing, used by the mesh-sharded matcher; the
    single-chip matcher packs column-chunked virtual rows below.)"""
    hi = np.full((mb_pad, E), PAD_HI, dtype=np.uint32)
    cnt = np.zeros(mb_pad, dtype=np.int32)
    for row, mi in enumerate(ids):
        h, _ = split_kmers_hi_lo(per_mask[mi], k)
        hi[row, : h.shape[0]] = h
        cnt[row] = h.shape[0]
    gids = np.full(mb_pad, INV_MASK, dtype=np.uint32)
    gids[: ids.shape[0]] = ids.astype(np.uint32)
    return hi, cnt, gids


def pack_vrow_bucket(per_mask, vmask, vstart, vcnt, rows, k, E, mb_pad):
    """Pack virtual chunk rows `rows` (indices into vmask/vstart/vcnt)
    into PAD_HI-padded [mb_pad, E] hi-word rows.

    Returns (hi u32 [mb_pad, E], cnt i32, gids u32 (mask id), base i32
    (entry offset of the chunk within its mask))."""
    hi = np.full((mb_pad, E), PAD_HI, dtype=np.uint32)
    cnt = np.zeros(mb_pad, dtype=np.int32)
    gids = np.full(mb_pad, INV_MASK, dtype=np.uint32)
    base = np.zeros(mb_pad, dtype=np.int32)
    for row, vr in enumerate(rows):
        mi, s, c = int(vmask[vr]), int(vstart[vr]), int(vcnt[vr])
        if c:
            h, _ = split_kmers_hi_lo(per_mask[mi][s : s + c], k)
            hi[row, :c] = h
        cnt[row] = c
        gids[row] = mi
        base[row] = s
    return hi, cnt, gids, base


class DeviceSeedMatcher:
    def __init__(self, index_searcher, tile_m: int = 200, interpret: bool | None = None,
                 hbm_budget: int | None = None):
        """hbm_budget: byte cap for the HBM-resident seed table (default
        LEXICMAP_TPU_HBM_BUDGET env or 8 GB).  When the table exceeds it,
        buckets are admitted densest-first (smallest E per mask = most
        masks served per byte) and the remainder matches on host mmap —
        the first tier of the HBM-exceeding index story (SURVEY §7 "Index
        scale"; the reference streams everything from disk,
        ref: kv-searcher.go:330-611)."""
        from . import ensure_jax

        ensure_jax()
        import jax
        import jax.numpy as jnp

        self.idx = index_searcher
        self.k = index_searcher.k
        self.m = index_searcher.mask_set.m
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret
        if hbm_budget is None:
            hbm_budget = int(
                os.environ.get("LEXICMAP_TPU_HBM_BUDGET", 8 << 30)
            )

        per_mask = collect_per_mask_tables(index_searcher)
        assert len(per_mask) == self.m
        counts = np.array([a.shape[0] for a in per_mask], dtype=np.int64)

        # COLUMN-CHUNK entry-heavy masks into virtual rows of <= E_CAP
        # contiguous entries (round 5): one uniform E=106k bucket at 50k
        # genomes forced 8-row VMEM tiles; chunk rows keep tiles tall and
        # remove the old host-fallback ceiling on entry count entirely
        vmask: list[int] = []
        vstart: list[int] = []
        vcnt: list[int] = []
        for mi, c in enumerate(counts):
            c = int(c)
            for r in range(max(1, -(-c // E_CAP))):
                vmask.append(mi)
                vstart.append(r * E_CAP)
                vcnt.append(min(c - r * E_CAP, E_CAP))
        vmask_a = np.array(vmask, dtype=np.int64)
        vstart_a = np.array(vstart, dtype=np.int64)
        vcnt_a = np.array(vcnt, dtype=np.int64)

        # adaptive E buckets: quantiles of the chunk-count distribution,
        # rounded up to the 128-lane width
        edges = bucket_edges_for(vcnt_a)

        self.buckets = []  # (E, tile, vrows, d_hi, d_ids, mb_pad, d_cnt, d_base)
        self.hbm_bytes = 0
        self.budget_spill = 0  # chunk rows pushed to host by the HBM budget
        host_rows: list[int] = []
        assigned = np.zeros(vmask_a.shape[0], dtype=bool)
        for E in edges:
            rows = np.nonzero(~assigned & (vcnt_a <= E))[0]
            assigned |= vcnt_a <= E
            if rows.shape[0] == 0:
                continue
            tile = _tile_for(E, tile_m)
            mb_pad = ((rows.shape[0] + tile - 1) // tile) * tile
            if self.hbm_bytes + mb_pad * E * 4 > hbm_budget:
                # over budget: admit only the row prefix that fits (tile
                # multiple); the rest of this bucket and everything after
                # stays on the host tier.  Granular admission matters when
                # one uniform bucket holds the whole table (50k genomes:
                # a single E=16384 x 125k-row bucket).
                fit = (hbm_budget - self.hbm_bytes) // (E * 4) // tile * tile
                spilled = rows[fit:]
                host_rows.extend(spilled)
                self.budget_spill += spilled.shape[0]
                rows = rows[:fit]
                if rows.shape[0] == 0:
                    continue
                mb_pad = rows.shape[0]
            hi, cnt, gids, base = pack_vrow_bucket(
                per_mask, vmask_a, vstart_a, vcnt_a, rows, self.k, E, mb_pad
            )
            row_masks = vmask_a[rows]  # mask id per packed row (qh routing)
            self.buckets.append(
                (E, tile, row_masks, jnp.asarray(hi), jnp.asarray(gids), mb_pad,
                 jnp.asarray(cnt), jnp.asarray(base))
            )
            self.hbm_bytes += mb_pad * E * 4
        # host-tier chunk rows keep their sorted entry slices,
        # keyed (mask, chunk start)
        self.host_tables = {
            (int(vmask_a[vr]), int(vstart_a[vr])): per_mask[vmask_a[vr]][
                vstart_a[vr] : vstart_a[vr] + vcnt_a[vr]
            ]
            for vr in host_rows
        }
        self.host_entries = int(sum(t.shape[0] for t in self.host_tables.values()))
        self.total_entries = int(counts.sum())
        # concatenated host-tier layout for the vectorized bisection in
        # match_batch (a Python loop over spilled rows x queries measured
        # as the dominant cost of partial-residency runs)
        if self.host_tables:
            items = list(self.host_tables.items())
            self._ht_mi = np.array([mi for (mi, _), _ in items], dtype=np.int64)
            self._ht_start = np.array([s for (_, s), _ in items], dtype=np.int64)
            lens = np.array([t.shape[0] for _, t in items], dtype=np.int64)
            self._ht_off = np.zeros(len(items) + 1, dtype=np.int64)
            np.cumsum(lens, out=self._ht_off[1:])
            self._ht_cat = (
                np.concatenate([np.asarray(t) for _, t in items])
                if len(items)
                else np.empty(0, dtype=np.uint64)
            )

        # per-mask global entry offsets into each chunk, for posting gather
        self.entry_base = np.zeros(self.m, dtype=np.int64)
        self.chunk_of_mask = np.zeros(self.m, dtype=np.int32)
        for ci, rdr in enumerate(index_searcher.chunks):
            off = np.asarray(rdr.mask_offsets)
            for mi in range(rdr.mask_begin, rdr.mask_end):
                self.entry_base[mi] = off[mi - rdr.mask_begin]
                self.chunk_of_mask[mi] = ci

    def _bucket_fn(self, bucket_index: int, min_prefix: int, h_cap: int = H_CAP):
        """Cached jitted locate+compact per (bucket, p, H) — rebuilding the
        vmap wrapper per call would re-trace on every batch."""
        cache = getattr(self, "_fns", None)
        if cache is None:
            cache = self._fns = {}
        key = (bucket_index, min_prefix, h_cap)
        fn = cache.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            E, tile, _, _, _, mb_pad, _, _ = self.buckets[bucket_index]
            H = min(h_cap, mb_pad)

            def call(d_hi, d_cnt, d_ids, d_base, qh_b, qv_b, t=tile,
                     p=min_prefix, H=H):
                # whole-batch locate in ONE kernel (batch = grid dim;
                # vmap-of-pallas_call hangs the axon backend's compiler).
                # qv rides the transport as uint8 (a flag per mask; i32
                # quadrupled the second-largest upload of the whole engine)
                nh, e0 = seed_locate_batch_pallas(
                    d_hi, d_cnt, qh_b, qv_b.astype(jnp.int32), p=p, tile_m=t,
                    interpret=self.interpret,
                )  # [B, mb_pad] i32
                # globalize chunk-local entry offsets (column-chunked rows)
                e0 = e0 + d_base[None, :]
                hit = nh > 0
                keys = jnp.where(hit, d_ids[None, :], jnp.uint32(0xFFFFFFFF))
                # e0 and n ride as separate operands (e0 may exceed 2^16 for
                # entry-heavy masks at large genome counts)
                keys, e0s, nhs = jax.lax.sort(
                    (keys, e0, nh), dimension=1, num_keys=1, is_stable=False
                )
                return keys[:, :H], e0s[:, :H], nhs[:, :H], jnp.sum(
                    hit.astype(jnp.int32), axis=1
                )

            fn = jax.jit(call)
            cache[key] = fn
        return fn

    def describe(self) -> str:
        parts = [
            f"E={E} x {row_masks.shape[0]} rows (tile {tile})"
            for E, tile, row_masks, *_ in self.buckets
        ]
        if self.host_tables:
            cov = 1.0 - self.host_entries / max(self.total_entries, 1)
            parts.append(
                f"host tier: {len(self.host_tables)} chunk rows"
                + (f" ({self.budget_spill} budget-spilled)" if self.budget_spill else "")
                + f"; device covers {cov:.1%} of entries"
            )
        return (
            f"device seed table: {self.hbm_bytes / 1e6:.1f} MB HBM in "
            f"{len(self.buckets)} buckets [" + ", ".join(parts) + "]"
        )

    def match_batch(self, query_kmers_batch: np.ndarray, min_prefix: int):
        """query_kmers_batch [B, m] -> per-query (hit_masks, e0, n_hits)
        triples (or None where the query overflowed H_CAP and must use host
        seed matching), from one dispatch per bucket."""
        import jax.numpy as jnp

        from . import device_tripped

        B_real = query_kmers_batch.shape[0]
        if device_tripped():  # hung-transport breaker: host matching
            return [None] * B_real
        # pad the batch dim to a bucket (8/16/32): every distinct B is a
        # fresh jit specialization, and tail batches would otherwise pay a
        # multi-minute tunnel compile; padded rows have no captured k-mers
        # so they produce zero hits
        B = next((b for b in (8, 16, 32) if b >= B_real), B_real)
        qh = np.zeros((B, self.m), dtype=np.uint32)
        sel = np.zeros((B, self.m), dtype=bool)
        sel[:B_real] = query_kmers_batch != 0  # 0 = "no captured k-mer"
        if sel.any():
            h, _ = split_kmers_hi_lo(query_kmers_batch[sel[:B_real]], self.k)
            qh[sel] = h

        from . import count_h2d, fetch_guarded

        h_cap = getattr(self, "_h_hint", H_BUCKETS[0])
        while True:
            try:
                pending = []
                for bi, (E, tile, row_masks, d_hi, d_ids, mb_pad, d_cnt,
                         d_base) in enumerate(self.buckets):
                    qh_b = np.zeros((B, mb_pad), dtype=np.uint32)
                    qh_b[:, : row_masks.shape[0]] = qh[:, row_masks]
                    qv_b = np.zeros((B, mb_pad), dtype=np.uint8)
                    qv_b[:, : row_masks.shape[0]] = sel[:, row_masks]
                    fn = self._bucket_fn(bi, min_prefix, h_cap)
                    count_h2d("device seed matching", qh_b, qv_b)
                    pending.append(
                        fn(d_hi, d_cnt, d_ids, d_base, jnp.asarray(qh_b),
                           jnp.asarray(qv_b))
                    )

                fetched = fetch_guarded(
                    pending,
                    "device seed matching",
                    compile_key=(
                        min_prefix,
                        h_cap,
                        tuple((b[0], b[1], b[5]) for b in self.buckets),
                    ),
                )
            except Exception as e:
                # a shared chip can refuse the dispatch's transient memory
                # even when the resident table fit at init (observed at
                # 50k: 8.2 GB table + tenant variance).  Degrade to host
                # matching for the process instead of crashing the query.
                if "RESOURCE_EXHAUSTED" in str(e) or "ResourceExhausted" in str(e):
                    from . import trip_device

                    trip_device("device seed matching out of HBM")
                    return [None] * B_real
                raise
            if fetched is None:  # watchdog tripped: whole batch to host
                return [None] * B_real
            # a count past the speculative width but under the bucket's true
            # ceiling means the fetch was too narrow, not a real overflow:
            # grow the hint and re-dispatch (the upload repeats, but only on
            # the rare hint transition)
            retry = False
            for (keys, e0s, nhs, counts), b in zip(fetched, self.buckets):
                H = keys.shape[1]
                ceiling = min(H_CAP, b[5])  # b[5] = mb_pad
                if H < ceiling and any(int(c) > H for c in counts):
                    retry = True
            if not retry:
                break
            h_cap = next(h for h in H_BUCKETS if h > h_cap)
            self._h_hint = h_cap

        per_query: list[list] = [[] for _ in range(B_real)]
        overflow = np.zeros(B_real, dtype=bool)
        for (keys, e0s, nhs, counts) in fetched:
            H = keys.shape[1]
            for b in range(B_real):
                if counts[b] > H:
                    overflow[b] = True
                    continue
                n = int(counts[b])
                if n:
                    per_query[b].append((keys[b, :n], e0s[b, :n], nhs[b, :n]))

        # host bisection for the budget-spilled chunk rows — vectorized
        # over all (row, query) pairs (searchsorted_segments over the
        # concatenated tier; a Python per-row loop dominated
        # partial-residency runs)
        host_extra: list[list] = [[] for _ in range(B_real)]
        if self.host_tables:
            from ..index.search import searchsorted_segments

            suf = np.uint64((1 << (2 * (self.k - min_prefix))) - 1)
            km = query_kmers_batch[:, self._ht_mi]  # [B_real, R]
            bsel, rsel = np.nonzero(km != 0)
            if bsel.shape[0]:
                q = km[bsel, rsel]
                lo0 = self._ht_off[rsel]
                hi0 = self._ht_off[rsel + 1]
                lo_i = searchsorted_segments(self._ht_cat, lo0, hi0, q & ~suf, "left")
                hi_i = searchsorted_segments(self._ht_cat, lo0, hi0, q | suf, "right")
                n = hi_i - lo_i
                for j in np.nonzero(n > 0)[0]:
                    r = rsel[j]
                    host_extra[bsel[j]].append(
                        (
                            int(self._ht_mi[r]),
                            int(self._ht_start[r] + lo_i[j] - self._ht_off[r]),
                            int(n[j]),
                        )
                    )

        out = []
        for b in range(B_real):
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
                order = np.lexsort((e0, hm))
                hm, e0, nh = hm[order], e0[order], nh[order]
                # merge chunk-spanning range hits: a prefix range crossing
                # column-chunk boundaries comes back as multiple triples of
                # the same mask with contiguous [e0, e0+n) — coalesce them
                # so downstream sees the host path's one-triple-per-mask
                # shape
                new_run = np.empty(hm.shape[0], dtype=bool)
                new_run[0] = True
                new_run[1:] = (hm[1:] != hm[:-1]) | (e0[1:] != e0[:-1] + nh[:-1])
                if not new_run.all():
                    starts = np.nonzero(new_run)[0]
                    hm = hm[starts]
                    e0 = e0[starts]
                    nh = np.add.reduceat(nh, starts)
            out.append((hm, e0, nh))
        return out

    def match(self, query_kmers: np.ndarray, min_prefix: int):
        """Single-query variant: (mask_idx, e0, n_hits) triples or None."""
        return self.match_batch(query_kmers[None, :], min_prefix)[0]
