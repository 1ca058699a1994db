"""Workload-shape probe for the batched device phase 4: runs phases 1-3 on
the demo query, prepares every chain window exactly like _align_genome, and
prints per-window anchor counts + chain2 scan shapes.  Diagnostic only."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
from lexicmap_tpu.ops.seqcompare import SeqComparator
from lexicmap_tpu.utils.fasta import read_fastx

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lexicmap_tpu_bench/demo.lmt"
QUERY = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/demo/q.gene.fasta"


def main():
    idx = IndexSearcher(DB, SearchOptions())
    rec = next(read_fastx(QUERY))
    from lexicmap_tpu.utils.kmers import seq_to_codes

    qcodes = seq_to_codes(rec.seq.upper())
    per_genome = idx._collect_anchors(qcodes)
    hits = idx._chain_genomes(per_genome)
    cpr = SeqComparator(idx.opt.seqcompare_options())
    cpr.index(qcodes)
    print(f"genomes kept: {len(hits)}; query len {qcodes.shape[0]}; "
          f"query index kmers {cpr.qk.shape[0]}")

    ext_len = idx.opt.extend_length
    qlen = qcodes.shape[0]
    n_windows = 0
    anchor_counts = []
    win_lens = []
    from lexicmap_tpu.native import compare_prepare_native

    copt = cpr.opt.chaining
    for hit, anchors, paths in hits:
        store = idx.genome_stores[hit.genome_batch]
        gidx = hit.genome_index
        for path in sorted(paths, key=lambda p: int(anchors.tbegin[p[0]])):
            first, last = path[0], path[-1]
            qb = int(anchors.qbegin[first])
            tb = int(anchors.tbegin[first])
            qe = int(anchors.qbegin[last]) + int(anchors.length[last]) - 1
            te = int(anchors.tbegin[last]) + int(anchors.length[last]) - 1
            rc = (bool(anchors.qrc[last]) != bool(anchors.trc[last])) if len(path) == 1 else tb > int(anchors.tbegin[last])
            if rc:
                t_begin = max(int(anchors.tbegin[last]) - ext_len, 0)
                t_end = tb + int(anchors.length[last]) - 1 + ext_len
            else:
                t_begin = max(tb - ext_len, 0)
                t_end = te + ext_len
            q_begin = qb - min(qb, ext_len)
            q_end = qe + min(qlen - qe - 1, ext_len)
            trec = store.subseq(gidx, t_begin, t_end)
            tcodes = np.frombuffer(trec.seq, dtype=np.uint8)
            if rc:
                tcodes = (np.uint8(3) - tcodes)[::-1]
            n_windows += 1
            win_lens.append(tcodes.shape[0])
            prepared = compare_prepare_native(
                cpr.qk, cpr.qv, np.ascontiguousarray(tcodes), cpr.opt.min_prefix,
                cpr.k, q_begin, q_end,
                copt.band_base, copt.band_count, copt.max_gap,
                qtab=cpr.qtab, bbits=cpr.qtab_bits,
            )
            n = 0 if prepared is None else prepared[0].shape[0]
            anchor_counts.append(n)

    ac = np.array(anchor_counts)
    wl = np.array(win_lens)
    print(f"windows: {n_windows}")
    print(f"window len: min={wl.min()} mean={wl.mean():.0f} max={wl.max()}")
    print(f"anchors/window: min={ac.min()} mean={ac.mean():.0f} "
          f"p50={np.percentile(ac,50):.0f} p90={np.percentile(ac,90):.0f} max={ac.max()}")
    print(f"total anchors: {ac.sum()}")


if __name__ == "__main__":
    main()
