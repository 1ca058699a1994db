"""Differential test: device (JAX) batched WFA == host wfa_align, op-for-op.

Runs on the CPU backend (tests/conftest.py forces JAX_PLATFORMS=cpu); the
same code path runs on the TPU in production (--engine device phase 4).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.ops.wfa import wfa_align
from lexicmap_tpu.parallel.wfa_device import DeviceWFA


def mutate_pair(rng, n, sub_rate, indel_rate, max_indel=8):
    q = rng.integers(0, 4, size=n).astype(np.uint8)
    t = []
    i = 0
    while i < n:
        r = rng.random()
        if r < indel_rate:
            ln = int(rng.integers(1, max_indel + 1))
            if rng.random() < 0.5:
                t.extend(rng.integers(0, 4, size=ln))  # insertion in t
            else:
                i += ln  # deletion from q
            continue
        if r < indel_rate + sub_rate:
            t.append((int(q[i]) + int(rng.integers(1, 4))) % 4)
        else:
            t.append(int(q[i]))
        i += 1
    return q, np.array(t, dtype=np.uint8)


CASES = [
    # (length, substitution rate, indel rate)
    (40, 0.0, 0.0),
    (64, 0.05, 0.0),
    (120, 0.02, 0.01),
    (300, 0.05, 0.01),
    (500, 0.10, 0.02),
    (1500, 0.02, 0.005),
    (1500, 0.08, 0.01),
]


def test_device_wfa_matches_host_ops():
    rng = np.random.default_rng(42)
    pairs = []
    for n, sub, ind in CASES:
        for _ in range(3):
            pairs.append(mutate_pair(rng, n, sub, ind))
    # plus pure-indel edges
    q = rng.integers(0, 4, size=100).astype(np.uint8)
    pairs.append((q, np.concatenate([q[:50], q[60:]])))  # deletion of 10
    pairs.append((q, np.concatenate([q[:50], rng.integers(0, 4, 12).astype(np.uint8), q[50:]])))

    dev = DeviceWFA()
    got = dev.align_batch(pairs)
    for i, (q, t) in enumerate(pairs):
        want = wfa_align(q, t)
        assert got[i] == want.ops, f"case {i}: n={q.shape[0]} m={t.shape[0]}"


def test_device_wfa_identical_sequences():
    rng = np.random.default_rng(7)
    q = rng.integers(0, 4, size=777).astype(np.uint8)
    dev = DeviceWFA()
    got = dev.align_batch([(q, q.copy())])
    assert got[0] == [("M", 777)]


def test_device_wfa_batch_mixed_buckets():
    rng = np.random.default_rng(3)
    pairs = [
        mutate_pair(rng, 100, 0.03, 0.01),
        mutate_pair(rng, 900, 0.03, 0.01),
        mutate_pair(rng, 3000, 0.02, 0.004),
    ]
    dev = DeviceWFA()
    got = dev.align_batch(pairs)
    for i, (q, t) in enumerate(pairs):
        want = wfa_align(q, t)
        assert got[i] == want.ops, f"case {i}"


def test_output_seq_with_device_wfa_byte_identical():
    """-a (24-col) output with --wfa device must be byte-identical to the
    host path: the group's WFA runs as one device batch and the op streams
    feed the cigar/qseq/sseq/align assembly (search.py _flush_hsp_group)."""
    import os

    DEMO_DB = os.environ.get("LEXICMAP_TPU_DEMO_DB", "/tmp/demo.lmt")
    if not os.path.exists(os.path.join(DEMO_DB, "info.json")):
        pytest.skip("demo index not built")
    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.utils.fasta import read_fastx

    rec = next(iter(read_fastx("/root/reference/demo/q.gene.fasta")))
    rows = {}
    calls = {"n": 0}
    orig = DeviceWFA.align_batch

    def counting(self, pairs):
        calls["n"] += 1
        return orig(self, pairs)

    DeviceWFA.align_batch = counting
    try:
        for eng in ("host", "device"):
            s = IndexSearcher(
                DEMO_DB, SearchOptions(output_seq=True, top_n=2, wfa_engine=eng)
            )
            hits = s.search_bytes(rec.seq)
            rows[eng] = list(
                format_hit_rows(rec.id.decode(), len(rec.seq), hits, all_columns=True)
            )
            assert rows[eng], eng
    finally:
        DeviceWFA.align_batch = orig
    assert calls["n"] > 0, "-a run never reached the device WFA"
    assert rows["device"] == rows["host"]
    if rows["device"]:
        assert rows["device"][0].count("\t") == 23  # 24 columns
