"""The device search engine: a whole query batch flows through the 4-phase
pipeline with the two dominant compute stages on the TPU.

Per 32-query batch:
  1. host: query masking (capture + reversed k-mers)         ~6 ms/query
  2. device: prefix seed matching for ALL queries x 20k masks
     in ONE vmapped Pallas dispatch (device_search.py)
  3. host: posting gather + anchor chaining (phases 2b-3)    ~8 ms/query
  4. device: batched pseudo-alignment of every candidate window of every
     query — probe sort-join + Chainer2 DP + backtrack (pseudo_device.py),
     a handful of dispatches for the whole batch
  5. host: contig assignment + dedup + extension + WFA + scoring via the
     fused native align_paths with the device chain rows injected
     (pre_rows), fanned out over threads
  6. host: result assembly + output ordering

Stages 4 and 5 overlap ACROSS batches: while the host aligns batch N's
HSPs, the device already pseudo-aligns batch N+1 (submit/collect API).

Output is bit-identical to the host engine: the device pseudo-aligner is
exact (flagged windows fall back to the host path inside align_paths), and
everything downstream is the identical host code
(ref: lib-index-search.go:1154-2897 for the phase structure).
"""

from __future__ import annotations

import numpy as np


class DeviceSearchEngine:
    def __init__(self, idx, mesh=None, min_windows_for_device=0):
        """mesh: optional jax.sharding.Mesh — runs phase 2a with the
        mask-sharded ShardedSeedMatcher and phase 4 with window chunks
        sharded over all mesh devices.  None = single chip (same code:
        the mesh only changes array placement).

        min_windows_for_device: batches with fewer candidate windows run
        phase 4 on the host (the fixed device dispatch cost ~22 ms through
        this transport outweighs ~0.5 ms/window of host compare below it);
        0 = always use the device pseudo-aligner."""
        from ..ops.seqcompare import SeqComparator
        from .pseudo_device import DevicePseudoAligner

        self.idx = idx
        self._SeqComparator = SeqComparator
        copt = idx.opt.seqcompare_options().chaining
        self.pseudo = DevicePseudoAligner(
            band_base=copt.band_base,
            band_count=copt.band_count,
            max_gap=int(copt.max_gap),
            min_score=int(copt.min_score),
            min_align_len=copt.min_align_len,
            mesh=mesh,
        )
        # HBM-resident genome blob: phase-4 windows and phase-5 WFA spans
        # are extracted on device from geometry instead of being uploaded
        # (the round-4 many-hit loss was MB-scale window/span payloads
        # through a 40 MB/s tunnel).  LEXICMAP_TPU_NO_RESIDENT=1 disables
        # for A/B transport measurements.
        import os

        self.blob = None
        if not os.environ.get("LEXICMAP_TPU_NO_RESIDENT"):
            try:
                from .resident import DeviceGenomeBlob

                self.blob = DeviceGenomeBlob(idx.genome_stores, mesh=mesh)
                self.pseudo.blob = self.blob
            except Exception:  # HBM/blob build failure -> upload path
                self.blob = None
        if mesh is not None:
            from .sharded import ShardedSeedMatcher

            self.matcher = ShardedSeedMatcher(idx, mesh)
            if idx.device_wfa is not None:
                # phase 5's batched WFA shards its pair batch over the mesh
                # too (pure dp over independent alignments)
                idx.device_wfa.mesh = mesh
            if idx.device_chainer is not None:
                # phase 3's batched chain DP likewise shards its genome
                # batch over the mesh
                idx.device_chainer.mesh = mesh
        else:
            self.matcher = idx.device_matcher
        self.min_windows_for_device = min_windows_for_device
        #: cumulative wall per engine phase (seconds); read by the regime
        #: benches to locate the bottleneck
        self.times = {"mask": 0.0, "match": 0.0, "anchors": 0.0, "chain": 0.0,
                      "winprep": 0.0, "pseudo": 0.0, "p5_prep": 0.0,
                      "p5_wfa": 0.0, "p5_fin": 0.0, "assemble": 0.0}

    # ------------------------------------------------------------------
    def search_batch(self, seqs: list[bytes]):
        """Search up to 32 queries; returns list[list[GenomeHit]]."""
        prepared = self.prepare_batch(seqs)
        return self.finish_batch(prepared)

    # ------------------------------------------------------------------
    # two-stage API so the CLI can overlap host phase 5 of batch N with
    # device phases 2+4 of batch N+1

    def prepare_batch(self, seqs: list[bytes]):
        """Phases 1-4: host masking, device seed matching, host chaining,
        device pseudo-alignment.  Returns an opaque state for finish_batch."""
        import time as _time

        from ..utils.kmers import seq_to_codes

        idx = self.idx
        _t0 = _time.perf_counter()
        codes = [seq_to_codes(s.upper()) for s in seqs]
        valid = [i for i, c in enumerate(codes) if c.shape[0] >= idx.k]
        if not valid:
            return (codes, [], {}, {}, [])
        assert len(valid) <= 32, "engine batches are capped at 32 queries"

        masked = {i: idx._mask_query(codes[i]) for i in valid}
        self.times["mask"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if self.matcher is not None and idx.opt.min_prefix <= 16:
            batch = np.stack([masked[i][0] for i in valid])
            dev = self.matcher.match_batch(batch, idx.opt.min_prefix)
            # None from match_batch = H_CAP overflow: mark "device declined"
            # (False) so _collect_anchors uses host bisection directly
            dev_hits = {i: (dev[b] if dev[b] is not None else False) for b, i in enumerate(valid)}
        else:
            dev_hits = {i: None for i in valid}
        self.times["match"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # phase 2b (host posting gather) for every query, then phase 3:
        # with --chain device the chain1 DP of every genome of every query
        # runs as a few vmapped device dispatches (chain_device.py);
        # otherwise the host chainer runs per query
        pg_of = {
            i: idx._collect_anchors(
                codes[i], premasked=masked[i], dev_hits_pre=dev_hits[i]
            )
            for i in valid
        }
        self.times["anchors"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if idx.device_chainer is not None:
            hits_list = idx._chain_genomes_many([pg_of[i] or {} for i in valid])
            chained_of = dict(zip(valid, hits_list))
        else:
            chained_of = {
                i: (idx._chain_genomes(pg_of[i]) if pg_of[i] else [])
                for i in valid
            }

        self.times["chain"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # window prep, then one device pseudo-align run over every window
        # of every query
        from .pseudo_device import L_PAD

        words_out = L_PAD // 16
        hits_of = {}
        cpr_of = {}
        queries = []
        windows = []
        geoms = [] if self.blob is not None else None
        wmeta = []  # (query_index, hit_pos, path_pos)
        for b, i in enumerate(valid):
            hits = chained_of[i]
            hits_of[i] = hits
            if not hits:
                continue
            cpr = self._SeqComparator(idx.opt.seqcompare_options())
            cpr.index(codes[i])
            cpr_of[i] = cpr
            qpos = len(queries)
            queries.append((cpr.qk, cpr.qv))
            for hi, (hit, anchors, paths) in enumerate(hits):
                spaths = sorted(paths, key=lambda p: int(anchors.tbegin[p[0]]))
                wins, metas, _ = idx._path_windows(codes[i], hit, anchors, spaths)
                for pp, (w, meta) in enumerate(zip(wins, metas)):
                    windows.append((qpos, w, meta[0], meta[1]))
                    wmeta.append((i, hi, pp))
                    if geoms is not None:
                        # meta = (q_begin, q_end, t_begin, t_end, rc, seeds);
                        # t_end is already clipped, so the geometry length
                        # equals the extracted window length
                        wb, ph, L = self.blob.geometry(
                            hit.genome_batch, hit.genome_index,
                            meta[2], meta[3], meta[4], words_out,
                        )
                        geoms.append(
                            (wb, ph, bool(meta[4]))
                            if L == w.shape[0]
                            else None
                        )

        self.times["winprep"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        use_device = len(windows) >= max(self.min_windows_for_device, 1) \
            if self.min_windows_for_device else bool(windows)
        res = self.pseudo.run_batch(queries, windows, geoms) if use_device else \
            [("host", None)] * len(windows)
        self.times["pseudo"] += _time.perf_counter() - _t0
        pseudo_maps: dict[int, dict[int, list]] = {}
        for (i, hi, pp), r in zip(wmeta, res):
            pm = pseudo_maps.setdefault(i, {})
            lst = pm.setdefault(hi, [])
            assert len(lst) == pp
            lst.append(r)
        return (codes, valid, hits_of, pseudo_maps, cpr_of)

    def finish_batch(self, prepared):
        """Phase 5+6 (host): alignment + assembly for a prepared batch.

        With --wfa device the WFA spans of EVERY genome of EVERY query in
        the batch are aligned in ONE device call (DeviceWFA buckets by
        size internally), instead of one dispatch per genome — the
        per-genome granularity was measured to lose through a ~25 ms
        transport (48 vs 1199 q/min at demo scale), while a whole batch is
        a handful of dispatches total."""
        import time as _time

        codes, valid, hits_of, pseudo_maps, cpr_of = prepared
        idx = self.idx
        out = [[] for _ in codes]
        if idx.device_wfa is None or idx.opt.output_seq:
            _t0 = _time.perf_counter()
            for i in valid:
                hits = hits_of[i]
                if not hits:
                    continue
                out[i] = idx._phase4_assemble(codes[i], hits, pseudo_map=pseudo_maps.get(i))
            self.times["p5_fin"] += _time.perf_counter() - _t0
            return out

        # ---- batch-wide device-WFA flow ----
        jobs = []
        for i in valid:
            for hi, (hit, anchors, paths) in enumerate(hits_of[i]):
                spaths = sorted(paths, key=lambda p: int(anchors.tbegin[p[0]]))
                pseudo = pseudo_maps.get(i, {}).get(hi)
                jobs.append(
                    {"i": i, "hi": hi, "hit": hit, "anchors": anchors,
                     "spaths": spaths, "cpr": cpr_of.get(i), "pseudo": pseudo}
                )

        pool = getattr(self, "_phase5_pool", None)
        if pool is None:
            import os
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=min(4, os.cpu_count() or 1))
            self._phase5_pool = pool

        # stage A (threaded; native span collection releases the GIL):
        # prepare align args + collect the WFA spans per (query, genome)
        def _prep(job):
            ctx = idx._align_prepare_native(
                codes[job["i"]], job["hit"], job["anchors"], job["spaths"],
                job["cpr"], job["pseudo"],
            )
            job["ctx"] = ctx
            job["pairs"] = (
                idx._align_spans_native(codes[job["i"]], ctx)
                if isinstance(ctx, dict)
                else []
            )

        _t0 = _time.perf_counter()
        list(pool.map(_prep, jobs))
        self.times["p5_prep"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # stage B: ONE device alignment over every span of the batch
        all_pairs = [p for job in jobs for p in job["pairs"]]
        all_ops = idx.device_wfa.align_batch(all_pairs) if all_pairs else []
        self.times["p5_wfa"] += _time.perf_counter() - _t0
        off = 0
        for job in jobs:
            n = len(job["pairs"])
            job["ops"] = all_ops[off : off + n] if n else None
            off += n

        # stage C (threaded): inject op streams + score + assemble details
        results_of = {i: [None] * len(hits_of[i]) for i in valid}

        def _fin(job):
            i, ctx = job["i"], job["ctx"]
            if ctx is None:
                r = None
            elif ctx is NotImplemented:
                r = idx._align_genome(
                    codes[i], job["hit"], job["anchors"], job["spaths"],
                    job["cpr"], pseudo=job["pseudo"],
                )
            else:
                r = idx._align_finish_native(codes[i], job["hit"], ctx, job["ops"])
                if r is NotImplemented:
                    r = idx._align_genome(
                        codes[i], job["hit"], job["anchors"], job["spaths"],
                        job["cpr"], pseudo=job["pseudo"],
                    )
            results_of[i][job["hi"]] = r

        _t0 = _time.perf_counter()
        list(pool.map(_fin, jobs))
        self.times["p5_fin"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # stage D: per-query chunk merge + qcovGnm + output ordering
        for i in valid:
            res = [r for r in results_of[i] if r is not None]
            out[i] = idx._assemble_results(codes[i], res)
        self.times["assemble"] += _time.perf_counter() - _t0
        return out
