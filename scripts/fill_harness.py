"""Desert-fill rule-variant harness.

Compares per-seed output against the reference's `utils kmers` doc dumps
(ref: docs/content/usage/utils/kmers.md) — the only seed-granularity ground
truth available without a Go toolchain.  Stage A caches per-genome parsing +
main capture (rule-independent); stage B re-runs only the desert fill under a
variant flag set and diffs the doc samples.

Usage:
  python scripts/fill_harness.py cache          # build /tmp/fillcache
  python scripts/fill_harness.py run [flags]    # fill + diff doc rows
"""

from __future__ import annotations

import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicmap_tpu.index.build import (  # noqa: E402
    BuildOptions,
    _parse_genome_file,
    _skip_regions_for,
    seed_genome,
)
from lexicmap_tpu.masks import MaskSet  # noqa: E402
from lexicmap_tpu.utils.kmers import (  # noqa: E402
    decode_kmer,
    kmers_fwd_rc,
    reverse_kmers,
)

CACHE = "/tmp/fillcache"
DEMO = "/root/reference/demo/refs"

# ---------------------------------------------------------------------------
# doc ground truth (kmers.md examples; head -20 each => complete up to the
# lexicographically-last row shown)

DOC_M1_ALL = """AAAAAAAAACGAAAAAGATTTTCCCTCATAC GCF_000392875.1 2088530 + yes
AAAAAAAAACGCTTCTACATCGAGCAGCGAG GCF_001457655.1 941619 + yes
AAAAAAAAACGTATCCCTCTTTATTACTTAT GCF_000006945.2 3392260 - yes
AAAAAAAAAGATTTGATTTTTTTCATTAATA GCF_000392875.1 766998 - yes
AAAAAAAAATCTATTTTAAAACCTAATCACG GCF_000392875.1 2201506 + yes
AAAAAAAAATGTCACAACAGCCCAACCTCCA GCF_000392875.1 860216 + yes
AAAAAAAACAAAAACTAGTTCGAGTGCCGAA GCF_000006945.2 1587885 - yes
AAAAAAAACCATATTATGTCCGATCCTCACA GCF_000392875.1 1060650 + yes
AAAAAAAACGAAAAACGGTAACACGGGAATT GCF_001544255.1 1605298 + yes
AAAAAAAACGACGCAGAAAACGACATTGCGA GCF_003697165.2 564733 + yes
AAAAAAAACGACTCCAGAGAGATCATCGTAT GCF_000392875.1 1279686 + yes
AAAAAAAACGAGCGATTGGTTGCATTAAGGA GCF_002949675.1 3914985 - yes
AAAAAAAACGAGCGCTCGGTTGCATTAAGGA GCF_002949675.1 2061956 - yes
AAAAAAAACGAGCGCTCGGTTGCATTAAGGA GCF_003697165.2 1514669 - yes
AAAAAAAACGCAACTTAAACAGTAAAACACG GCF_002950215.1 1938205 + yes
AAAAAAAACGGGACGCGTAGTGCTGTGGTCT GCF_000742135.1 2728620 - yes
AAAAAAAACGTAAATTTTTAAGATTGCGTCG GCF_001457655.1 1547239 - yes
AAAAAAAACGTTAGAGAAAGCATCTAACACA GCF_001027105.1 660296 + yes
AAAAAAAACGTTTTATCACTAATTTTCAGTT GCF_000392875.1 1590621 - yes"""

DOC_M1_FWD = """AAAAAAATAAAAACTTAGTTGTCCCATAACA GCF_000392875.1 1044207 - no
AAAAAAATAAATCTGCGATGGCTGTTGATGG GCF_002950215.1 462416 + no
AAAAAAATAACGTTGGCGATTACGATGCCAA GCF_000392875.1 1422018 + no
AAAAAAATAACTCAATGAGGTTATGGGCATG GCF_000742135.1 4160317 - no
AAAAAAATAACTGCTTTACTCTTTGCTCTTT GCF_009759685.1 2134145 + no
AAAAAAATAAGAACACAAAAAAGGTATCTAG GCF_001544255.1 1050935 + no
AAAAAAATAAGAAGGTAGCACCAATAACTTT GCF_900638025.1 137037 - no
AAAAAAATAAGCTGGGCCGTTTGGGGAACGA GCF_000742135.1 989338 - no
AAAAAAATAAGGGGAAATTATGGCAGGTAAT GCF_001457655.1 883695 - no
AAAAAAATAAGTGAAAATCTATTTTCTGAAA GCF_000392875.1 2823442 - no
AAAAAAATAATATTGTCCATTCTCCTAGCAA GCF_001544255.1 173045 - no
AAAAAAATAATCAAAGGCCGGGGATTATACG GCF_003697165.2 733341 - no
AAAAAAATACCCTGCGTGATGATGCGAGGTG GCF_002950215.1 1422485 - no
AAAAAAATACTTGCCTTCGGGCTTATCTCAG GCF_003697165.2 2823100 + no
AAAAAAATACTTGTTTGATTCTGTATTACGT GCF_000392875.1 493472 + no
AAAAAAATAGAAAATGAGTCAACACCACTAT GCF_006742205.1 1365300 + no
AAAAAAATAGAATTATATCGTGAACGTTTTG GCF_009759685.1 2234982 + no
AAAAAAATAGAGGATTAAATGCTAATTCATA GCF_001457655.1 671915 + no
AAAAAAATAGTATAAATCCGCCATATAAAAT GCF_001457655.1 1222761 - no"""

DOC_M12345 = """GCTGCACAAAGTACGATTACGATGCAAGCCC GCF_002949675.1 716651 + no
GCTGCACAACAAACGATTGTTGGTGAAATTT GCF_000392875.1 836578 - no
GCTGCACAACAACATGATAGTGTGAAATTAG GCF_001027105.1 1150856 + no
GCTGCACAACAGGCTGCGGCTGGTGTTGCGG GCF_000742135.1 4128289 - no
GCTGCACAACCAGGCAGAAAAAATAATGGGA GCF_002950215.1 3009005 - no
GCTGCACAACCTTTCCACAAGCCGTAAAACC GCF_000006945.2 4306623 - no
GCTGCACAACGATTAGAAAAAATGGGGTACG GCF_001544255.1 2041481 - no
GCTGCACAACTATCCCAATGCCGAGGTGGAA GCF_000017205.1 5101754 + no
GCTGCACAAGCACCCGGCCGTGGCCCTGGCG GCF_000017205.1 1257468 + no
GCTGCACAAGCGCTCGGTTTAGAGCAAACAC GCF_009759685.1 1232954 - no
GCTGCACAAGGGGCCACTTTCGTACATCGTC GCF_000742135.1 3888020 + yes
GCTGCACAAGTACCTGCTGGCCTACGCCTCG GCF_000017205.1 1166094 + no
GCTGCACAAGTTGCAAAACAGCTGATTAAGG GCF_000392875.1 908172 + no
GCTGCACAATATCGATTTGAACATTGCTCAG GCF_003697165.2 3212441 + no
GCTGCACAATATTTCATAATGACTTACGGCA GCF_002950215.1 3443237 + no
GCTGCACAATCCGCTGGGCTGGGTGCTCAAC GCF_000742135.1 1083211 - no
GCTGCACAATCGCCAGCCCCAGCCCTGTGCC GCF_000006945.2 3658390 + no
GCTGCACAATTACCACGTGAATTATTTGAAG GCF_900638025.1 304434 - no
GCTGCACAATTGCCAGCCCTAATCCCGTGCC GCF_002950215.1 2671971 + no"""


def doc_rows(txt):
    return [tuple(l.split()) for l in txt.strip().split("\n")]


def build_cache():
    os.makedirs(CACHE, exist_ok=True)
    opt = BuildOptions()
    ms = MaskSet.generate(opt.k, opt.n_masks, opt.rand_seed)
    np.save(os.path.join(CACHE, "masks.npy"), ms.masks)
    for path in sorted(glob.glob(os.path.join(DEMO, "*.fa.gz"))):
        gid = os.path.basename(path).replace(".fa.gz", "")
        skipped = []
        chunks = _parse_genome_file(path, 0, opt, skipped)
        assert len(chunks) == 1, (gid, len(chunks))
        g = chunks[0]
        # main capture via seed_genome with desert filling disabled
        o2 = BuildOptions(disable_desert_filling=True)
        res, _, locs, regions = seed_genome(ms, g, o2)
        _, interval_excluded = _skip_regions_for(g, ms.k, opt.contig_interval)
        with open(os.path.join(CACHE, gid + ".pkl"), "wb") as fh:
            pickle.dump(
                dict(
                    gid=gid,
                    codes=g.codes,
                    kmers=res.kmers,
                    pos_flat=res.pos_flat,
                    pos_offsets=res.pos_offsets,
                    locs=locs,
                    interval_excluded=interval_excluded,
                ),
                fh,
            )
        print("cached", gid, "locs:", len(locs))


def run_variant(flags: int, report_details: bool = True):
    from lexicmap_tpu.native import fill_deserts_native_call

    opt = BuildOptions()
    masks = np.load(os.path.join(CACHE, "masks.npy"))
    ms = MaskSet(masks, opt.k)
    k = ms.k

    # rows per target mask: {maskidx: [(kmerstr, gid, pos1, strand, rev)]}
    targets = {0: [], 12344: []}
    for path in sorted(glob.glob(os.path.join(CACHE, "GC*.pkl"))):
        with open(path, "rb") as fh:
            d = pickle.load(fh)
        gid = d["gid"]
        fwd, rc = kmers_fwd_rc(d["codes"], k)
        extras = fill_deserts_native_call(
            fwd, rc, d["locs"], d["interval_excluded"], ms.masks, k,
            ms.distinct_prefix_len, opt.seed_max_desert, opt.seed_in_desert_dist,
            opt.desert_seed_pos_range, flags=flags,
        )
        assert extras is not None

        kmers = d["kmers"]
        offsets = d["pos_offsets"]
        pos_flat = d["pos_flat"]
        # forward rows of target masks (main capture)
        for mi in targets:
            x = int(kmers[mi])
            if x:
                for v in pos_flat[offsets[mi]: offsets[mi + 1]]:
                    v = int(v)
                    targets[mi].append(
                        (decode_kmer(x, k), gid, str((v >> 1) + 1),
                         "-" if v & 1 else "+", "no")
                    )
        # forward extras of target masks
        for (mi, x, loc) in extras:
            if mi in targets:
                targets[mi].append(
                    (decode_kmer(x, k), gid, str((loc >> 1) + 1),
                     "-" if loc & 1 else "+", "no")
                )
        # reversed dispatch: all captured kmers (positions) + extras
        sel = np.nonzero((kmers != 0) & (np.diff(offsets) > 0))[0]
        cap_k = kmers[sel]
        cap_counts = np.diff(offsets)[sel]
        e_k = np.array([e[1] for e in extras], dtype=np.uint64)
        e_l = np.array([e[2] for e in extras], dtype=np.uint64)
        all_k = np.concatenate([cap_k, e_k])
        rk = reverse_kmers(all_k, k)
        new_masks = ms.nearest_mask(rk)
        rep_masks = np.repeat(new_masks, np.concatenate(
            [cap_counts, np.ones(len(e_k), dtype=np.int64)]))
        rep_rk = np.repeat(rk, np.concatenate(
            [cap_counts, np.ones(len(e_k), dtype=np.int64)]))
        rep_locs = np.concatenate([
            np.concatenate([pos_flat[offsets[i]: offsets[i + 1]] for i in sel])
            if len(sel) else np.empty(0, np.uint32),
            e_l.astype(np.uint32),
        ])
        for mi in targets:
            hitsel = np.nonzero(rep_masks == mi)[0]
            for j in hitsel:
                v = int(rep_locs[j])
                targets[mi].append(
                    (decode_kmer(int(rep_rk[j]), k), gid, str((v >> 1) + 1),
                     "-" if v & 1 else "+", "yes")
                )

    total_missing = total_extra = 0
    for name, doctxt, mi, fwd_only in (
        ("m1-all", DOC_M1_ALL, 0, False),
        ("m1-fwd", DOC_M1_FWD, 0, True),
        ("m12345", DOC_M12345, 12344, False),
    ):
        drows = doc_rows(doctxt)
        last = max(r[0] for r in drows)
        ours = set(
            r for r in targets[mi]
            if r[0] <= last and (not fwd_only or r[4] == "no")
        )
        docset = set(drows)
        missing = sorted(docset - ours)
        extra = sorted(ours - docset)
        total_missing += len(missing)
        total_extra += len(extra)
        print(f"[{name}] ours={len(ours)} doc={len(docset)} "
              f"missing={len(missing)} extra={len(extra)}")
        if report_details:
            for r in missing:
                print("   MISS", *r)
            for r in extra:
                print("   XTRA", *r)
    print(f"TOTAL flags={flags}: missing={total_missing} extra={total_extra}")
    return total_missing, total_extra


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "cache":
        build_cache()
    else:
        flags = int(sys.argv[2]) if len(sys.argv) > 2 else 0
        run_variant(flags)
