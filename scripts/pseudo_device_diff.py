"""Differential check: DevicePseudoAligner vs the host native pseudo-align
path (compare_prepare_native + chain2_backtrack_native) on every window of a
demo query.  Run with JAX_PLATFORMS=cpu for fast iteration or on the TPU.

Usage: python scripts/pseudo_device_diff.py [db] [query_fasta]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lexicmap_tpu_bench/demo.lmt"
QUERY = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/demo/q.gene.fasta"


def collect_windows(idx, qcodes):
    """Mirror _align_genome's window preparation for every kept genome."""
    per_genome = idx._collect_anchors(qcodes)
    hits = idx._chain_genomes(per_genome)
    qlen = qcodes.shape[0]
    ext_len = idx.opt.extend_length
    wins = []
    for hit, anchors, paths in hits:
        store = idx.genome_stores[hit.genome_batch]
        gidx = hit.genome_index
        for path in sorted(paths, key=lambda p: int(anchors.tbegin[p[0]])):
            first, last = path[0], path[-1]
            qb = int(anchors.qbegin[first])
            tb = int(anchors.tbegin[first])
            qe = int(anchors.qbegin[last]) + int(anchors.length[last]) - 1
            te = int(anchors.tbegin[last]) + int(anchors.length[last]) - 1
            rc = (
                (bool(anchors.qrc[last]) != bool(anchors.trc[last]))
                if len(path) == 1
                else tb > int(anchors.tbegin[last])
            )
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
            wins.append((np.ascontiguousarray(tcodes), q_begin, q_end))
    return wins


def host_rows(cpr, tcodes, begin, end):
    """Host oracle: the exact chain rows of the native pseudo-align path."""
    from lexicmap_tpu.native import chain2_backtrack_native, compare_prepare_native

    copt = cpr.opt.chaining
    prepared = compare_prepare_native(
        cpr.qk, cpr.qv, tcodes, cpr.opt.min_prefix, cpr.k, begin, end,
        copt.band_base, copt.band_count, copt.max_gap,
        qtab=cpr.qtab, bbits=cpr.qtab_bits,
    )
    assert prepared is not None
    aq, at, al, arc, scores, prev = prepared
    n = aq.shape[0]
    if n == 0:
        return None
    if n == 1:
        slen = int(al[0])
        if slen >= copt.min_score and slen >= copt.min_align_len:
            return np.array(
                [[1, slen, slen, slen, aq[0], aq[0] + slen - 1, at[0], at[0] + slen - 1]],
                dtype=np.int64,
            )
        return None
    rows, pidents, totals = chain2_backtrack_native(
        aq, at, al, scores, prev, float(copt.min_score),
        copt.min_align_len, float(copt.heuristic_kmer_pident_threshold),
    )
    if rows.shape[0] == 0:
        return None
    return rows


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import __graft_entry__ as g

    g._enable_compile_cache()
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.ops.seqcompare import SeqComparator
    from lexicmap_tpu.parallel.pseudo_device import DevicePseudoAligner
    from lexicmap_tpu.utils.fasta import read_fastx
    from lexicmap_tpu.utils.kmers import seq_to_codes

    idx = IndexSearcher(DB, SearchOptions())
    queries = []
    windows = []
    wins = []
    cprs = []
    copt = None
    for rec in read_fastx(QUERY):
        qcodes = seq_to_codes(rec.seq.upper())
        cpr = SeqComparator(idx.opt.seqcompare_options())
        cpr.index(qcodes)
        copt = cpr.opt.chaining
        qi = len(queries)
        w = collect_windows(idx, qcodes)
        queries.append((cpr.qk, cpr.qv))
        cprs.append(cpr)
        windows.extend((qi, t, b, e) for (t, b, e) in w)
        wins.extend((cpr, t, b, e) for (t, b, e) in w)
    print(f"queries: {len(queries)}, windows: {len(wins)}")

    dev = DevicePseudoAligner(
        band_base=copt.band_base, band_count=copt.band_count,
        max_gap=int(copt.max_gap), min_score=int(copt.min_score),
        min_align_len=copt.min_align_len,
    )
    import time

    t0 = time.time()
    res = dev.run_batch(queries, windows)
    print(f"device batch: {time.time() - t0:.2f}s  stats={dev.stats}")

    n_host = n_match = n_mismatch = 0
    for i, ((cpr, tcodes, b, e), r) in enumerate(zip(wins, res)):
        kind, rows = r
        if kind == "host":
            n_host += 1
            continue
        want = host_rows(cpr, tcodes, b, e)
        got = None if kind == "none" else rows[:, :8]
        ok = (
            (want is None and got is None)
            or (
                want is not None
                and got is not None
                and want.shape == got.shape
                and (want == got).all()
            )
        )
        if ok:
            n_match += 1
        else:
            n_mismatch += 1
            if n_mismatch <= 3:
                print(f"--- window {i} MISMATCH (len={tcodes.shape[0]}, b={b}, e={e})")
                print("want:\n", want)
                print("got:\n", got)
    print(f"match={n_match} mismatch={n_mismatch} host_fallback={n_host}")
    sys.exit(1 if n_mismatch else 0)


if __name__ == "__main__":
    main()
