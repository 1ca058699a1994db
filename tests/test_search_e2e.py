"""End-to-end: build a small index and search known subsequences."""

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
from lexicmap_tpu.utils.kmers import revcomp_seq


def random_seq(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(99)
    d = tmp_path_factory.mktemp("refs2")
    genomes = {}
    for i in range(4):
        name = f"G{i:03d}"
        contigs = [random_seq(rng, 60000), random_seq(rng, 40000)]
        genomes[name] = contigs
        with open(d / f"{name}.fasta", "wb") as fh:
            for j, s in enumerate(contigs):
                fh.write(b">" + f"ctg{j}_{name}".encode() + b"\n" + s + b"\n")
    out = str(tmp_path_factory.mktemp("db2") / "db.lmt")
    opt = BuildOptions(k=31, n_masks=1024, rand_seed=1, chunks=4)
    build_index(out, [str(d / f"G{i:03d}.fasta") for i in range(4)], opt)
    return out, genomes


def test_exact_subsequence_hit(db):
    out, genomes = db
    idx = IndexSearcher(out, SearchOptions())
    # a 1000 bp window of genome G001, contig 0
    q = genomes["G001"][0][20000:21000]
    results = idx.search_bytes(q)
    assert results, "no hits for exact subsequence"
    top = results[0]
    assert top.genome_id == b"G001"
    assert top.aligned_fraction == pytest.approx(100.0)
    sd = top.details[0]
    assert sd.seq_id == b"ctg0_G001"
    c = sd.chains[0]
    assert c.pident == pytest.approx(100.0)
    assert c.qbegin == 0 and c.qend == 999
    assert c.tbegin == 20000 and c.tend == 20999
    assert not sd.rc
    assert c.gaps == 0
    assert c.aligned_length == 1000
    assert c.bit_score > 1500


def test_revcomp_hit(db):
    out, genomes = db
    idx = IndexSearcher(out, SearchOptions())
    q = revcomp_seq(genomes["G002"][1][5000:6200])
    results = idx.search_bytes(q)
    assert results
    top = results[0]
    assert top.genome_id == b"G002"
    sd = top.details[0]
    assert sd.seq_id == b"ctg1_G002"
    assert sd.rc
    c = sd.chains[0]
    assert c.pident == pytest.approx(100.0)
    assert c.tbegin == 5000 and c.tend == 6199


def test_mutated_query(db):
    out, genomes = db
    rng = np.random.default_rng(5)
    base = bytearray(genomes["G000"][0][10000:11500])
    # ~2% mismatches + one 3bp deletion
    for _ in range(30):
        p = int(rng.integers(0, len(base)))
        base[p] = ord("ACGT"[int(rng.integers(0, 4))])
    del base[700:703]
    idx = IndexSearcher(out, SearchOptions())
    results = idx.search_bytes(bytes(base))
    assert results
    top = results[0]
    assert top.genome_id == b"G000"
    c = top.details[0].chains[0]
    assert c.pident > 95.0
    assert top.aligned_fraction > 95.0
    assert c.gaps >= 3


def test_no_hit_for_foreign_sequence(db):
    out, genomes = db
    rng = np.random.default_rng(1234)
    q = random_seq(rng, 800)
    idx = IndexSearcher(out, SearchOptions())
    results = idx.search_bytes(q)
    # random 800bp should not align with >=70% identity over >=50bp... usually
    assert len(results) == 0


def test_query_shorter_than_k(db):
    out, _ = db
    idx = IndexSearcher(out, SearchOptions())
    assert idx.search_bytes(b"ACGT") == []
