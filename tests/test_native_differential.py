"""Differential guard: the full native search pipeline must produce output
identical to the pure-Python/numpy fallback path on randomized data.

Every native kernel (capture, range_match, compare_prepare, chainers, WFA)
has a Python reference implementation; this test runs the whole search twice
— native on vs. forced off — and requires byte-identical TSV rows."""

import os

import numpy as np
import pytest

import lexicmap_tpu.native as N
from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions

pytestmark = pytest.mark.skipif(N.get_lib() is None, reason="native build unavailable")


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(99)
    d = tmp_path_factory.mktemp("nrefs")
    files = []
    seqs = {}
    for i in range(4):
        name = f"N{i}"
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=60000))
        seqs[name] = seq
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq[:40000] + b"\n>c1\n" + seq[40000:] + b"\n")
        files.append(str(p))
    out = str(tmp_path_factory.mktemp("ndb") / "n.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=512, chunks=2))
    return out, seqs


def _rows(idx, queries):
    from lexicmap_tpu.cli import format_hit_rows

    rows = []
    for qid, q in queries:
        rows.append((qid, [r for r in format_hit_rows(qid, len(q), idx.search_bytes(q))]))
    return rows


def test_search_native_vs_python_identical(db):
    out, seqs = db
    rng = np.random.default_rng(7)
    queries = []
    for i, name in enumerate(["N0", "N1", "N2", "N3"]):
        base = bytearray(seqs[name][7000 + i * 311 : 7000 + i * 311 + 1800])
        # point mutations + a small indel to exercise gapped alignment
        for _ in range(40):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        del base[900:905]
        queries.append((f"q{i}", bytes(base)))

    native_rows = _rows(IndexSearcher(out, SearchOptions(output_seq=True)), queries)

    saved = N._lib
    os.environ["LEXICMAP_TPU_NO_NATIVE"] = "1"
    N._lib = None
    try:
        python_rows = _rows(IndexSearcher(out, SearchOptions(output_seq=True)), queries)
    finally:
        N._lib = saved
        os.environ.pop("LEXICMAP_TPU_NO_NATIVE", None)

    assert native_rows == python_rows
    # sanity: each query actually matched its source genome
    for (qid, rows), name in zip(native_rows, ["N0", "N1", "N2", "N3"]):
        assert rows, qid
        assert name in rows[0]
