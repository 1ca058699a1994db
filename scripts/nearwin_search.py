"""Fit the near-winner capture rule against the doc's exact per-genome seed
counts (ref: docs/content/usage/utils/seed-pos.md, csvtk freq table).

Rule family: per mask, in addition to the XOR-argmin winner, keep positions of
the next R distinct k-mers (by XOR rank) among window k-mers sharing >= Lmin
bases with the mask.  Their positions join the winner's position list (the
lexichash Mask() return shape is fixed per-mask arrays, so extra positions can
only ride inside the winner's locs) and therefore also shift desert-fill grids.

Usage: python scripts/nearwin_search.py R Lmin [fill_flags]
"""
from __future__ import annotations

import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from lexicmap_tpu.index.build import BuildOptions
from lexicmap_tpu.masks import MaskSet
from lexicmap_tpu.native import fill_deserts_native_call
from lexicmap_tpu.utils.kmers import kmers_fwd_rc

DOC = {
    'GCF_000017205.1': 143165, 'GCF_000742135.1': 120758,
    'GCF_003697165.2': 110132, 'GCF_000006945.2': 108387,
    'GCF_002950215.1': 108272, 'GCF_002949675.1': 101098,
    'GCF_009759685.1': 88632, 'GCF_000392875.1': 65403,
    'GCF_001027105.1': 64176, 'GCF_001544255.1': 57167,
    'GCF_006742205.1': 57086, 'GCF_001096185.1': 49482,
    'GCF_900638025.1': 48959, 'GCF_001457655.1': 45771,
    'GCF_000148585.2': 44752,
}


def near_winner_positions(ms: MaskSet, fwd, rc, exclude, R: int, Lmin: int,
                          winner_kmers):
    """(mask_idx, loc(pos<<1|strand)) for ranks 1..R distinct kmers with
    lcp >= Lmin.  winner_kmers: captured winners (post low-complexity) --
    rank 0 is skipped by identity with the bucket minimum."""
    k = ms.k
    n = fwd.shape[0]
    locs_f = (np.arange(n, dtype=np.uint64) << np.uint64(1))
    locs_r = locs_f | np.uint64(1)
    if exclude is not None:
        keep = ~exclude
        ka = np.concatenate([fwd[keep], rc[keep]])
        va = np.concatenate([locs_f[keep], locs_r[keep]])
    else:
        ka = np.concatenate([fwd, rc])
        va = np.concatenate([locs_f, locs_r])
    order = np.argsort(ka, kind="stable")
    ka = ka[order]
    va = va[order]
    shift = np.uint64(2 * (k - Lmin))
    mask_prefs = (ms.masks >> shift).astype(np.uint64)
    lo = np.searchsorted(ka >> shift, mask_prefs, side="left")
    hi = np.searchsorted(ka >> shift, mask_prefs, side="right")
    out = []
    for mi in np.nonzero(hi - lo > 1)[0]:
        bucket = ka[lo[mi]: hi[mi]]
        bl = va[lo[mi]: hi[mi]]
        xors = bucket ^ ms.masks[mi]
        # distinct kmers sorted by xor
        ux, inv = np.unique(xors, return_inverse=True)
        if ux.shape[0] <= 1:
            continue
        for r in range(1, min(R + 1, ux.shape[0])):
            sel = np.nonzero(inv == r)[0]
            for j in sel:
                out.append((int(mi), int(bl[j])))
    return out


def eval_rule(R: int, Lmin: int, fill_flags: int = 0, verbose=True):
    opt = BuildOptions()
    ms = MaskSet(np.load('/tmp/fillcache/masks.npy'), opt.k)
    total_delta = 0
    nz = 0
    details = []
    for gid, docn in DOC.items():
        d = pickle.load(open(f'/tmp/fillcache/{gid}.pkl', 'rb'))
        fwd, rc = kmers_fwd_rc(d['codes'], ms.k)
        exclude = None
        ie = d['interval_excluded']
        if ie is not None:
            exclude = ie
        nw = near_winner_positions(ms, fwd, rc, exclude, R, Lmin, d['kmers'])
        # near-winner positions attach only to masks with a live winner
        # (low-complexity-zeroed winners keep nothing)
        km = d['kmers']
        nw = [(mi, l) for (mi, l) in nw if km[mi] != 0]
        extra_locs = np.array([l for (_, l) in nw], dtype=np.uint32)
        locs = np.sort(np.concatenate([d['locs'], extra_locs])) \
            if len(nw) else d['locs']
        extras = fill_deserts_native_call(
            fwd, rc, locs, ie, ms.masks, ms.k, ms.distinct_prefix_len,
            opt.seed_max_desert, opt.seed_in_desert_dist,
            opt.desert_seed_pos_range, flags=fill_flags)
        tot = len(locs) + len(extras)
        dl = tot - docn
        total_delta += abs(dl)
        nz += dl != 0
        details.append((gid, tot, docn, dl, len(nw)))
    if verbose:
        for gid, tot, docn, dl, nnw in details:
            print(f'  {gid}: ours={tot} doc={docn} delta={dl:+d} nearwin={nnw}')
    print(f'R={R} Lmin={Lmin} flags={fill_flags}: sum|delta|={total_delta} '
          f'genomes_off={nz}/15')
    return total_delta, nz


if __name__ == '__main__':
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    Lmin = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    flags = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    eval_rule(R, Lmin, flags)
