"""Cross-check the native C++ kernels against the pure-Python references."""

import os

import numpy as np
import pytest

from lexicmap_tpu.native import (
    chain1_forward_native,
    chain2_forward_native,
    chain3_native,
    clear_mark_native,
    get_lib,
    wfa_align_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native build unavailable")


def _mutate(rng, q, n_mut):
    t = q.copy()
    for _ in range(n_mut):
        kind = rng.integers(0, 3)
        p = int(rng.integers(0, max(len(t) - 1, 1)))
        if kind == 0:
            t[p] = (t[p] + 1) % 4
        elif kind == 1 and len(t) > 8:
            t = np.delete(t, p)
        else:
            t = np.insert(t, p, rng.integers(0, 4))
    return t


def test_wfa_native_matches_python():
    import lexicmap_tpu.ops.wfa as W

    rng = np.random.default_rng(2)
    for trial in range(20):
        n = int(rng.integers(20, 400))
        q = rng.integers(0, 4, size=n).astype(np.uint8)
        t = _mutate(rng, q, int(rng.integers(0, 10)))
        ops_n = wfa_align_native(q, t)
        # python path with the same calibrated preferences (native disabled)
        import lexicmap_tpu.native as N

        saved = N._lib
        N._lib = None
        os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
        try:
            res_p = W.wfa_align(q, t, pref="XDI", gap_pref_ext_first=False)
        finally:
            del os.environ["LEXICMAP_TPU_NO_NATIVE"]
            N._lib = saved
        assert ops_n == res_p.ops, f"trial {trial}"


def test_chain2_forward_native_matches_python():
    from lexicmap_tpu.ops.chaining import Anchors
    from lexicmap_tpu.ops.chaining2 import Chaining2Options, chain2

    rng = np.random.default_rng(3)
    for trial in range(10):
        n = int(rng.integers(2, 300))
        qb = np.sort(rng.integers(0, 2000, size=n)).astype(np.int64)
        tb = (qb + rng.integers(-30, 30, size=n)).clip(0).astype(np.int64)
        ln = rng.integers(11, 32, size=n).astype(np.int64)
        native = chain2_forward_native(qb, tb, ln, 100, 50, 20.0)
        assert native is not None
        s_n, p_n = native
        # python forward: run chain2 with native disabled and capture via env
        os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
        try:
            import lexicmap_tpu.native as N

            saved = N._lib
            N._lib = None
            a = Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool))
            opt = Chaining2Options(band_base=100, band_count=50, max_gap=20)
            res_py = chain2(a, opt)
            N._lib = saved
        finally:
            del os.environ["LEXICMAP_TPU_NO_NATIVE"]
        res_nat = chain2(
            Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool)), opt
        )
        # compare the final emitted chains (forward arrays drive everything)
        def sig(res):
            chains = res[0]
            if chains is None:
                return None
            return [
                (c.qbegin, c.qend, c.tbegin, c.tend, c.matched_bases, c.n_anchors)
                for c in chains
            ]

        assert sig(res_py) == sig(res_nat), f"trial {trial}"


def test_chain1_forward_native_matches_python():
    from lexicmap_tpu.ops.chaining import Anchors, ChainingOptions, chain, seed_weight

    rng = np.random.default_rng(4)
    for trial in range(10):
        n = int(rng.integers(2, 200))
        qb = np.sort(rng.integers(0, 3000, size=n)).astype(np.int32)
        tb = rng.integers(0, 10000, size=n).astype(np.int32)
        ln = rng.integers(15, 32, size=n).astype(np.int32)
        a = Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool)).sort_for_chaining()
        opt = ChainingOptions(
            max_gap=50, min_score=float(seed_weight(17)), max_distance=1000, top_chains=0
        )
        import lexicmap_tpu.native as N

        paths_nat, score_nat = chain(a, opt)
        saved = N._lib
        N._lib = None
        os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
        try:
            paths_py, score_py = chain(a, opt)
        finally:
            del os.environ["LEXICMAP_TPU_NO_NATIVE"]
            N._lib = saved
        assert score_nat == score_py, f"trial {trial}"
        assert [p.tolist() for p in paths_nat] == [p.tolist() for p in paths_py]


def test_clear_mark_native_matches_python():
    from lexicmap_tpu.ops.chaining import Anchors, clear_substr_pairs

    rng = np.random.default_rng(5)
    for trial in range(10):
        n = int(rng.integers(2, 400))
        qb = rng.integers(0, 500, size=n).astype(np.int32)
        tb = rng.integers(0, 600, size=n).astype(np.int32)
        ln = rng.integers(11, 32, size=n).astype(np.int32)
        a = Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool))
        import lexicmap_tpu.native as N

        out_nat = clear_substr_pairs(a, 31)
        saved = N._lib
        N._lib = None
        os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
        try:
            out_py = clear_substr_pairs(a, 31)
        finally:
            del os.environ["LEXICMAP_TPU_NO_NATIVE"]
            N._lib = saved
        assert out_nat.qbegin.tolist() == out_py.qbegin.tolist()
        assert out_nat.tbegin.tolist() == out_py.tbegin.tolist()


def test_chain3_native_matches_python():
    from lexicmap_tpu.ops.chaining import Anchors
    from lexicmap_tpu.ops.chaining2 import chain3

    rng = np.random.default_rng(6)
    for trial in range(20):
        n = int(rng.integers(1, 100))
        qb = np.sort(rng.integers(0, 120, size=n)).astype(np.int32)
        tb = (qb + rng.integers(-5, 5, size=n)).clip(0).astype(np.int32)
        ln = np.full(n, 2, dtype=np.int32)
        a = Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool)).sort_for_chaining()
        res_py = chain3(a)
        ok, qt = chain3_native(a.qbegin, a.tbegin, a.length)
        if res_py is None:
            assert not ok
        else:
            assert ok and qt == res_py, f"trial {trial}"


def test_pure_python_cli_matches_native(tmp_path):
    """Full-system equivalence: CLI search with LEXICMAP_TPU_NO_NATIVE=1
    must produce the identical TSV."""
    import subprocess
    import sys

    rng = np.random.default_rng(17)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=40000))
    ref = tmp_path / "g.fasta"
    with open(ref, "wb") as fh:
        fh.write(b">c0\n" + seq + b"\n")
    q = bytearray(seq[8000:9500])
    for _ in range(25):
        p = int(rng.integers(0, len(q)))
        q[p] = ord("ACGT"[int(rng.integers(0, 4))])
    qf = tmp_path / "q.fasta"
    with open(qf, "wb") as fh:
        fh.write(b">q\n" + bytes(q) + b"\n")
    db = str(tmp_path / "db.lmt")
    from lexicmap_tpu.index.build import BuildOptions, build_index

    build_index(db, [str(ref)], BuildOptions(k=31, n_masks=256, chunks=2))

    repo = os.path.dirname(os.path.dirname(__file__))

    def run(env_extra):
        env = dict(os.environ, **env_extra)
        res = subprocess.run(
            [sys.executable, "-m", "lexicmap_tpu.cli", "search", "-d", db,
             str(qf), "-o", "-"],
            capture_output=True, text=True, cwd=repo, env=env,
        )
        assert res.returncode == 0, res.stderr
        return res.stdout

    native = run({})
    python = run({"LEXICMAP_TPU_NO_NATIVE": "1"})
    assert native == python
    assert len(native.strip().split("\n")) >= 2


def test_range_match_native_matches_numpy():
    """Per-mask prefix-range matching: C pass vs the vectorized bisection."""
    import numpy as np

    from lexicmap_tpu.index.search import searchsorted_segments
    from lexicmap_tpu.native import range_match_native
    from lexicmap_tpu.utils.arrays import ranges_to_indices
    from lexicmap_tpu.utils.kmers import kmer_lcp

    rng = np.random.default_rng(21)
    k, p, nmasks = 31, 15, 128
    # synthetic per-mask sorted entry arrays with postings
    seg_sizes = rng.integers(0, 40, nmasks)
    entry_kmers = []
    seg_lo = np.zeros(nmasks, dtype=np.int64)
    seg_hi = np.zeros(nmasks, dtype=np.int64)
    off = 0
    for i, sz in enumerate(seg_sizes):
        seg_lo[i] = off
        arr = np.sort(rng.integers(0, 1 << (2 * k), int(sz), dtype=np.uint64))
        entry_kmers.append(arr)
        off += int(sz)
        seg_hi[i] = off
    entry_kmers = (
        np.concatenate(entry_kmers) if off else np.empty(0, dtype=np.uint64)
    )
    n_entries = entry_kmers.shape[0]
    entry_offsets = np.arange(n_entries + 1, dtype=np.int64)  # 1 posting each
    values = rng.integers(0, 1 << 40, max(n_entries, 1), dtype=np.uint64)

    # query k-mers: mostly copies of entries (hits guaranteed), some random
    qkmers = rng.integers(0, 1 << (2 * k), nmasks, dtype=np.uint64)
    for i in range(nmasks):
        if seg_sizes[i] and rng.random() < 0.7:
            qkmers[i] = entry_kmers[int(rng.integers(seg_lo[i], seg_hi[i]))]
    suf = np.uint64((1 << (2 * (k - p))) - 1)
    lb = qkmers & ~suf
    rb = qkmers | suf

    for want_rev in (False, True):
        got = range_match_native(
            entry_kmers, entry_offsets, values, seg_lo, seg_hi, lb, rb,
            qkmers, k, want_rev,
        )
        assert got is not None
        # numpy reference (same logic as the host fallback in _match_chunk)
        e0 = searchsorted_segments(entry_kmers, seg_lo, seg_hi, lb, side="left")
        e1 = searchsorted_segments(entry_kmers, seg_lo, seg_hi, rb, side="right")
        counts = e1 - e0
        nz = counts > 0
        idx = ranges_to_indices(e0[nz], e1[nz])
        qrow = np.repeat(np.nonzero(nz)[0], counts[nz])
        flag_ok = (values[entry_offsets[idx]] & np.uint64(1)) == np.uint64(
            1 if want_rev else 0
        )
        idx, qrow = idx[flag_ok], qrow[flag_ok]
        lcp = kmer_lcp(entry_kmers[idx], qkmers[qrow], k)
        assert got[0].tolist() == idx.tolist()
        assert got[1].tolist() == qrow.tolist()
        assert got[2].tolist() == lcp.tolist()


def test_capture_codescend_matches_per_mask_argmin():
    """All-masks XOR-argmin co-descent == per-mask trie descent."""
    import numpy as np

    from lexicmap_tpu.masks import MaskSet, xor_argmin_sorted
    from lexicmap_tpu.native import capture_native_call, xor_argmin_batch_native

    rng = np.random.default_rng(3)
    k = 31
    ms = MaskSet.generate(k, 2048, seed=5)
    n = 3000
    fwd = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    rc = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    kmers_out, counts, pos_flat = capture_native_call(
        fwd, rc, None, ms.masks, k, ms.prefix_len, True
    )
    cand = np.sort(np.concatenate([fwd, rc]))
    idx = xor_argmin_sorted(cand, ms.masks, k)
    assert np.array_equal(cand[idx], kmers_out)
    lo = np.searchsorted(cand, kmers_out, side="left")
    hi = np.searchsorted(cand, kmers_out, side="right")
    assert np.array_equal(hi - lo, counts)
    assert pos_flat.shape[0] == counts.sum()

    # batch nearest-mask: sorted-queries co-descent vs python trie descent
    q = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
    got = xor_argmin_batch_native(ms.masks, q, 2 * k)
    want = xor_argmin_sorted(ms.masks, q, k)
    assert np.array_equal(got, want)


def test_kmers_fwd_rc_native_matches_numpy():
    import numpy as np

    import lexicmap_tpu.native as N
    from lexicmap_tpu.utils.kmers import kmers_fwd_rc

    rng = np.random.default_rng(4)
    for L, k in ((100, 31), (5000, 31), (64, 15), (30, 31)):
        codes = rng.integers(0, 4, L).astype(np.uint8)
        f1, r1 = kmers_fwd_rc(codes, k)
        saved = N._lib
        import os

        os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
        N._lib = None
        try:
            f2, r2 = kmers_fwd_rc(codes, k)
        finally:
            N._lib = saved
            os.environ.pop("LEXICMAP_TPU_NO_NATIVE", None)
        assert np.array_equal(f1, f2) and np.array_equal(r1, r2), (L, k)
