"""DevicePseudoAligner differential tests against the host native oracle
(compare_prepare_native + chain2_backtrack_native) on adversarial windows:
tandem repeats, prefix-colliding queries, chain-heavy windows, plus the
flag/fallback paths (ADVICE round-2: promote scripts/pseudo_device_diff.py
into CI)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.index.search import SearchOptions
from lexicmap_tpu.native import chain2_backtrack_native, compare_prepare_native, get_lib
from lexicmap_tpu.ops.seqcompare import SeqComparator
from lexicmap_tpu.parallel.pseudo_device import C_CAP, DevicePseudoAligner
from lexicmap_tpu.utils.kmers import seq_to_codes

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mk_cpr(qseq: bytes):
    cpr = SeqComparator(SearchOptions().seqcompare_options())
    cpr.index(seq_to_codes(qseq))
    return cpr


def host_rows(cpr, tcodes, begin, end):
    """The exact host chain rows (same oracle as scripts/pseudo_device_diff)."""
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
                [[1, slen, slen, slen, aq[0], aq[0] + slen - 1,
                  at[0], at[0] + slen - 1]], dtype=np.int64)
        return None
    rows, pidents, totals = chain2_backtrack_native(
        aq, at, al, scores, prev, float(copt.min_score),
        copt.min_align_len, float(copt.heuristic_kmer_pident_threshold),
    )
    return rows if rows.shape[0] else None


def run_diff(cases):
    """cases: list of (qseq bytes, tcodes uint8 array).  Runs the device
    batch and compares every non-fallback window against the host oracle.
    Returns per-case result kinds."""
    copt = SearchOptions().seqcompare_options().chaining
    dev = DevicePseudoAligner(
        band_base=copt.band_base, band_count=copt.band_count,
        max_gap=int(copt.max_gap), min_score=int(copt.min_score),
        min_align_len=copt.min_align_len,
    )
    queries, windows, cprs = [], [], []
    for qseq, tcodes in cases:
        cpr = _mk_cpr(qseq)
        qi = len(queries)
        queries.append((cpr.qk, cpr.qv))
        cprs.append(cpr)
        windows.append((qi, np.ascontiguousarray(tcodes), 0, len(qseq) - 1))
    res = dev.run_batch(queries, windows)
    kinds = []
    for (qseq, tcodes), cpr, (kind, rows) in zip(cases, cprs, res):
        kinds.append(kind)
        if kind == "host":
            continue
        want = host_rows(cpr, tcodes, 0, len(qseq) - 1)
        got = None if kind == "none" else rows[:, :8]
        if want is None:
            assert got is None
        else:
            assert got is not None, want
            assert want.shape == got.shape and (want == got).all()
    return kinds


def _rand_seq(rng, n):
    return bytes(rng.choice(ALPHA, size=n))


def _mutate(rng, seq, n_mut):
    b = bytearray(seq)
    for p in rng.integers(0, len(b), size=n_mut):
        b[p] = ALPHA[rng.integers(0, 4)]
    return bytes(b)


def test_decode_chain_rows_truncation():
    """The compacted-row decode: in-cap windows decode in order; windows
    whose rows fell past R_CAP (or whose expected key is absent) fall
    back to host; flagged and empty windows behave as before."""
    dev = DevicePseudoAligner()
    C = C_CAP
    # windows: 0 -> 2 chains, 1 -> flagged, 2 -> 0 chains, 3 -> 2 chains
    # (second one past the cap), 4 -> 1 chain (fully past the cap)
    cnt = np.array([2, 1, 0, 2, 1], dtype=np.int32)
    flg = np.array([0, 4, 0, 0, 0], dtype=np.int32)
    R_CAP = 3
    rows = np.zeros((R_CAP, 9), dtype=np.int64)
    rows[0] = [0 * C + 0, *range(10, 18)]
    rows[1] = [0 * C + 1, *range(20, 28)]
    rows[2] = [3 * C + 0, *range(30, 38)]
    results = [("host", None)] * 5
    dev._decode_chain_rows([0, 1, 2, 3, 4], rows, cnt, flg, results)
    assert results[0][0] == "rows" and np.array_equal(
        results[0][1], np.array([list(range(10, 18)), list(range(20, 28))])
    )
    assert results[1] == ("host", None)  # flagged
    assert results[2] == ("none", None)
    assert results[3] == ("host", None)  # truncated (only 1 of 2 rows fit)
    assert results[4] == ("host", None)  # fully truncated
    assert dev.stats.get("compact_overflow", 0) == 2


def test_random_windows_match_host():
    rng = np.random.default_rng(21)
    cases = []
    for i in range(8):
        q = _rand_seq(rng, 1500)
        t = np.frombuffer(_mutate(rng, q, 30 + 10 * i), dtype=np.uint8)
        cases.append((q, seq_to_codes(bytes(t))))
    kinds = run_diff(cases)
    assert kinds.count("rows") >= 6, kinds  # normal path dominates


def test_tandem_repeat_window():
    """Tandem repeats produce dense, near-duplicate anchors (the dedup +
    trim + region-splitting paths)."""
    rng = np.random.default_rng(22)
    unit = _rand_seq(rng, 93)
    q = _rand_seq(rng, 300) + unit * 12 + _rand_seq(rng, 300)
    t = _mutate(rng, q, 15)
    kinds = run_diff([(q, seq_to_codes(t))])
    assert kinds[0] in ("rows", "host")  # exactness either way


def test_chain_heavy_window_flags_host():
    """> C_CAP scattered matched segments must either emit exact rows or
    flag host fallback — never wrong rows."""
    rng = np.random.default_rng(23)
    segs = [_rand_seq(rng, 80) for _ in range(C_CAP + 8)]
    q = b"".join(s + _rand_seq(rng, 20) for s in segs)
    # target: the same segments in REVERSED order, separated by junk --
    # each becomes its own chain
    t = b"".join(s + _rand_seq(rng, 35) for s in reversed(segs))
    run_diff([(q, seq_to_codes(t))])  # assertion inside for non-fallback


def test_prefix_colliding_query_routes_host():
    """A query whose 11-base minimum prefixes collide 3+ ways must be
    routed to the host (J<=2 device pairing; J>=3 flags)."""
    rng = np.random.default_rng(24)
    pref = _rand_seq(rng, 11)
    parts = [pref + _rand_seq(rng, 40) for _ in range(6)]
    q = b"".join(parts) + _rand_seq(rng, 600)
    t = _mutate(rng, q, 10)
    dev_kinds = run_diff([(q, seq_to_codes(t))])
    assert dev_kinds[0] in ("host", "rows")


def test_heuristic_pident_rational_encoding():
    """The device DP's integer gate 20*matched >= 3*max(naq, nat) encodes
    pident >= 15.0 exactly; it is only valid while the host constant is
    15.0 (ref: lib-chaining2.go chain gate)."""
    copt = SearchOptions().seqcompare_options().chaining
    assert copt.heuristic_kmer_pident_threshold == 15.0