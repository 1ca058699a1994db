"""MANY-HIT regime: one query hitting hundreds of near-identical genomes —
the shape of the reference's headline workloads (1.3-kb gene: 41,718 genome
hits; 16S: 1,955,167 genome hits; ref: README.md:81-84).  The demo index
peaks at 15 genomes, so the batched native phase-3/phase-4 paths
(native/core.cpp chain1_batch / align_paths_batch) only engage here.

Differential contract: the batched paths must be byte-identical to the
per-genome loops (LEXICMAP_TPU_NO_BATCH=1)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
from lexicmap_tpu.utils.fasta import read_fastx

SRC = "/root/reference/demo/refs/GCF_003697165.2.fa.gz"
N_CLONES = 60


@pytest.fixture(scope="module")
def manyhit_db(tmp_path_factory):
    if not os.path.exists(SRC):
        pytest.skip("reference demo genome not mounted")
    from gen_manyhit import generate

    refs = tmp_path_factory.mktemp("manyhit_refs")
    files = generate(str(refs), n_clones=N_CLONES, window_kb=20)
    out = str(tmp_path_factory.mktemp("manyhit_db") / "db.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=2048, rand_seed=1, chunks=4))

    rec = next(read_fastx(SRC))
    q16s = rec.seq.upper()[458558:460100]  # golden 16S copy (1,542 bp)
    return out, q16s


def _rows(results):
    out = []
    for r in results:
        for sd in r.details:
            for c in sd.chains:
                out.append(
                    (
                        r.genome_id,
                        sd.seq_id,
                        c.qbegin,
                        c.qend,
                        c.tbegin,
                        c.tend,
                        c.pident,
                        c.bit_score,
                        c.evalue,
                        r.aligned_fraction,
                    )
                )
    return out


def test_manyhit_recall_and_batch_parity(manyhit_db):
    """Every clone must be found, and the many-hit batched native paths
    (chain1_batch + align_paths_batch) must reproduce the per-genome loops
    exactly."""
    out, q16s = manyhit_db
    idx = IndexSearcher(out, SearchOptions())
    results = idx.search_bytes(q16s)
    hit_ids = {r.genome_id for r in results}
    # every clone diverges <= 2% from the source window around its 16S copy:
    # all must be recalled (the reference recalls 0.2-2%-divergent targets)
    assert len(hit_ids) == N_CLONES, f"recall {len(hit_ids)}/{N_CLONES}"

    got = _rows(results)

    os.environ["LEXICMAP_TPU_NO_BATCH"] = "1"
    try:
        idx2 = IndexSearcher(out, SearchOptions())
        want = _rows(idx2.search_bytes(q16s))
    finally:
        del os.environ["LEXICMAP_TPU_NO_BATCH"]
    assert got == want


def test_manyhit_top_n(manyhit_db):
    """--top-n-genomes must cap the per-query genome list in the batched
    path exactly as in the per-genome path."""
    out, q16s = manyhit_db
    idx = IndexSearcher(out, SearchOptions(top_n=10))
    results = idx.search_bytes(q16s)
    assert len(results) <= 10
    got = _rows(results)

    os.environ["LEXICMAP_TPU_NO_BATCH"] = "1"
    try:
        idx2 = IndexSearcher(out, SearchOptions(top_n=10))
        want = _rows(idx2.search_bytes(q16s))
    finally:
        del os.environ["LEXICMAP_TPU_NO_BATCH"]
    assert got == want


def test_chain1_batch_native_differential():
    """chain1_batch (native, threaded) == clear_substr_pairs + chain +
    _chain_backtrack (Python reference semantics) on adversarial random
    anchor sets."""
    from lexicmap_tpu.native import chain1_batch_native
    from lexicmap_tpu.ops.chaining import (
        Anchors,
        ChainingOptions,
        chain,
        clear_substr_pairs,
    )

    rng = np.random.default_rng(3)
    copt = ChainingOptions(
        max_gap=50.0, min_score=28.9, max_distance=1000.0, top_chains=-1
    )
    genomes = []
    for _ in range(150):
        n = int(rng.integers(1, 300))
        qb = rng.integers(0, 1200, n).astype(np.int32)
        tb = (qb + rng.integers(-60, 60, n)).astype(np.int32)
        ln = rng.integers(15, 32, n).astype(np.int32)
        genomes.append(Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool)))
    res = chain1_batch_native(
        [(a.qbegin, a.tbegin, a.length) for a in genomes],
        31, copt.max_gap, copt.min_score, copt.max_distance,
        copt.top_chains, threads=3,
    )
    if res is None:
        pytest.skip("native lib unavailable")
    for a, (kept, paths, score) in zip(genomes, res):
        ac = clear_substr_pairs(a, 31) if len(a) > 1 else a
        p2, s2 = chain(ac, copt)
        ak = a.take(kept)
        assert np.array_equal(ak.qbegin, ac.qbegin)
        assert np.array_equal(ak.tbegin, ac.tbegin)
        assert np.array_equal(ak.length, ac.length)
        assert score == float(s2)
        assert len(paths) == len(p2)
        for x, y in zip(paths, p2):
            assert np.array_equal(x, y)


def test_chain1_batch_top_chains():
    """top_chains (the -N/--top-n-chains cap) must match the Python
    backtrack's n_checked semantics."""
    from lexicmap_tpu.native import chain1_batch_native
    from lexicmap_tpu.ops.chaining import (
        Anchors,
        ChainingOptions,
        chain,
        clear_substr_pairs,
    )

    rng = np.random.default_rng(11)
    copt = ChainingOptions(
        max_gap=50.0, min_score=22.5, max_distance=1000.0, top_chains=3
    )
    genomes = []
    for _ in range(60):
        n = int(rng.integers(2, 200))
        qb = rng.integers(0, 800, n).astype(np.int32)
        tb = rng.integers(0, 2000, n).astype(np.int32)
        ln = rng.integers(15, 32, n).astype(np.int32)
        genomes.append(Anchors(qb, tb, ln, np.zeros(n, bool), np.zeros(n, bool)))
    res = chain1_batch_native(
        [(a.qbegin, a.tbegin, a.length) for a in genomes],
        31, copt.max_gap, copt.min_score, copt.max_distance,
        copt.top_chains, threads=2,
    )
    if res is None:
        pytest.skip("native lib unavailable")
    for a, (kept, paths, score) in zip(genomes, res):
        ac = clear_substr_pairs(a, 31)
        p2, s2 = chain(ac, copt)
        assert score == float(s2)
        assert len(paths) == len(p2)
        for x, y in zip(paths, p2):
            assert np.array_equal(x, y)
