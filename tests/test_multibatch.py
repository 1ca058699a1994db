"""Multi-batch build + merge must be equivalent to a single-batch build
(except for batch indexes in posting values), and search results identical."""

import os

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions


def random_contigs(rng, sizes):
    return [bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)) for n in sizes]


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    rng = np.random.default_rng(21)
    d = tmp_path_factory.mktemp("refs3")
    files = []
    genomes = {}
    for i in range(5):
        name = f"M{i:03d}"
        contigs = random_contigs(rng, [30000, 20000])
        genomes[name] = contigs
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            for j, s in enumerate(contigs):
                fh.write(b">" + f"c{j}".encode() + b"\n" + s + b"\n")
        files.append(str(p))
    base = tmp_path_factory.mktemp("db3")
    single = str(base / "single.lmt")
    multi = str(base / "multi.lmt")
    opt1 = BuildOptions(k=31, n_masks=512, rand_seed=1, chunks=2, batch_size=100)
    opt2 = BuildOptions(k=31, n_masks=512, rand_seed=1, chunks=2, batch_size=2)
    build_index(single, files, opt1)
    info2 = build_index(multi, files, opt2)
    assert info2.genome_batches == 3
    return single, multi, genomes


def test_multibatch_search_equivalent(dbs):
    single, multi, genomes = dbs
    idx1 = IndexSearcher(single, SearchOptions())
    idx2 = IndexSearcher(multi, SearchOptions())
    rng = np.random.default_rng(7)
    for name in ["M000", "M002", "M004"]:
        q = genomes[name][0][5000:6500]
        r1 = idx1.search_bytes(q)
        r2 = idx2.search_bytes(q)
        assert [h.genome_id for h in r1] == [h.genome_id for h in r2]
        for h1, h2 in zip(r1, r2):
            c1 = h1.details[0].chains[0]
            c2 = h2.details[0].chains[0]
            assert (c1.qbegin, c1.qend, c1.tbegin, c1.tend, c1.pident) == (
                c2.qbegin, c2.qend, c2.tbegin, c2.tend, c2.pident
            )


def test_multibatch_genome_map(dbs):
    single, multi, _ = dbs
    from lexicmap_tpu.index.store import read_genome_map

    m1 = read_genome_map(os.path.join(single, "genomes.map.tsv"))
    m2 = read_genome_map(os.path.join(multi, "genomes.map.tsv"))
    assert [e[0] for e in m1] == [e[0] for e in m2]
    # batch codes differ: multi spreads genomes across batches
    batches = {e[1] >> 17 for e in m2}
    assert batches == {0, 1, 2}


def test_remerge_resume(dbs, tmp_path):
    """Interrupt the merge (simulate by re-creating tmp) and remerge."""
    import shutil

    single, multi, genomes = dbs
    # rebuild multi with merge interrupted: build writes tmp then merges and
    # removes it; simulate by building fresh and snapshotting tmp mid-way is
    # complex — instead verify remerge() reproduces the same final seeds from
    # a reconstructed tmp.
    # Build a small 2-batch index keeping tmp via monkeypatched merge
    import lexicmap_tpu.index.build as B

    out = str(tmp_path / "resume.lmt")
    orig_merge = None
    import lexicmap_tpu.index.merge as MG

    calls = {}

    real_merge = MG.merge_batches

    def failing_merge(tmp_dir, outdir, n_chunks):
        calls["tmp"] = tmp_dir
        raise RuntimeError("simulated crash during merge")

    MG.merge_batches = failing_merge
    try:
        files = []
        d = tmp_path / "refs"
        d.mkdir()
        rng = np.random.default_rng(3)
        for i in range(4):
            p = d / f"R{i}.fasta"
            with open(p, "wb") as fh:
                fh.write(b">c0\n" + bytes(
                    rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)
                ) + b"\n")
            files.append(str(p))
        with pytest.raises(RuntimeError):
            build_index(out, files, BuildOptions(k=31, n_masks=256, chunks=2, batch_size=2))
    finally:
        MG.merge_batches = real_merge

    assert os.path.isdir(out + ".tmp")
    from lexicmap_tpu.index.merge import remerge

    remerge(out)
    assert not os.path.isdir(out + ".tmp")
    idx = IndexSearcher(out, SearchOptions())
    # search something
    q = open(files[1], "rb").read().split(b"\n")[1][2000:3200]
    res = idx.search_bytes(q)
    assert res and res[0].genome_id == b"R1"
