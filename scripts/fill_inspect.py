"""Inspect one desert around a target position: grid walk + capturability.

Usage: python scripts/fill_inspect.py <GID> <pos0> [flags]
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicmap_tpu.index.build import BuildOptions, _DesertWindow
from lexicmap_tpu.masks import MaskSet
from lexicmap_tpu.native import fill_deserts_native_call
from lexicmap_tpu.utils.kmers import decode_kmer, kmers_fwd_rc

CACHE = "/tmp/fillcache"


def main():
    gid = sys.argv[1]
    target = int(sys.argv[2])
    flags = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    opt = BuildOptions()
    masks = np.load(os.path.join(CACHE, "masks.npy"))
    ms = MaskSet(masks, opt.k)
    k = ms.k
    with open(os.path.join(CACHE, gid + ".pkl"), "rb") as fh:
        d = pickle.load(fh)
    fwd, rc = kmers_fwd_rc(d["codes"], k)
    locs = d["locs"]
    pos_arr = (locs >> np.uint32(1)).astype(np.int64)
    # find the desert containing target: consecutive (pre, pos) with gap >= D
    # replicate the scan: pre walks through sorted unique positions
    L = fwd.shape[0] + k - 1
    locs_aug = np.concatenate([pos_arr, [L - k]])
    pre = 0
    desert = None
    for p in locs_aug:
        p = int(p)
        dgap = p - pre
        if dgap >= opt.seed_max_desert and pre <= target <= p:
            desert = (pre, p)
            break
        if dgap < opt.seed_max_desert:
            pre = p
            continue
        pre = p
    if desert is None:
        print("target not inside a desert")
        return
    pre, pos = desert
    print(f"desert: pre={pre} pos={pos} gap={pos-pre}")
    start = max(pre - 1000, 0)
    pos_of_pre = 1000 + min(pre - 1000, 0)
    end = min(pos + 1000 + k, L)
    nw = end - start - k + 1
    pos_of_cur = pos_of_pre + (pos - pre)

    ie = d["interval_excluded"]
    wf = fwd[start: start + nw]
    wr = rc[start: start + nw]
    if flags & 1 and ie is not None:
        ex = ie[start: start + nw]
        if ex.shape[0] < wf.shape[0]:
            ex = np.concatenate([ex, np.zeros(wf.shape[0] - ex.shape[0], bool)])
        wf2, wr2 = wf[~ex], wr[~ex]
    else:
        wf2, wr2 = wf, wr
    win = _DesertWindow(ms, wf2, wr2)

    from lexicmap_tpu.index.build import _dust_scalar
    from lexicmap_tpu.utils.kmers import homopolymer_codes
    ccc, ggg, ttt = homopolymer_codes(k)[1:]

    def kmer_ok(x):
        return x not in (0, ccc, ggg, ttt) and not _dust_scalar(x, k)

    def pos_ok(gp):
        if gp >= fwd.shape[0]:
            return False
        if ie is not None and gp < ie.shape[0] and ie[gp]:
            return False
        return True

    # print capturability around target
    lo = max(target - 60, start)
    hi = min(target + 60, start + nw)
    print("capturability (pos, fwd_mask, rc_mask, fwd_ok, rc_ok, posok):")
    for gp in range(lo, hi):
        xf, xr = int(fwd[gp]), int(rc[gp])
        mf = win.capturing_mask(xf) if kmer_ok(xf) else -9
        mr = win.capturing_mask(xr) if kmer_ok(xr) else -9
        mark = " <<<" if gp == target else ""
        if mf >= 0 or mr >= 0 or gp == target:
            print(f"  {gp} fwd:{mf} rc:{mr} ok:{pos_ok(gp)}{mark}")
            if gp == target:
                print(f"    fwd kmer {decode_kmer(xf, k)}")
                print(f"    rc  kmer {decode_kmer(xr, k)}")

    # grid walk of this desert (replicating the native loop, verbose)
    print("grid walk:")
    extras = fill_deserts_native_call(
        fwd, rc, locs, ie, ms.masks, k, ms.distinct_prefix_len,
        opt.seed_max_desert, opt.seed_in_desert_dist,
        opt.desert_seed_pos_range, flags=flags)
    picked = [(m, x, l) for (m, x, l) in extras
              if start <= (l >> 1) < start + nw]
    for m, x, l in picked:
        gp = l >> 1
        if pre - 100 <= gp <= pos + 100:
            print(f"  pick mask={m} pos={gp} strand={'-' if l & 1 else '+'} "
                  f"{decode_kmer(x, k)}")


if __name__ == "__main__":
    main()
