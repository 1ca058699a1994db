"""Feature coverage: soft-masking, degenerate bases, in-memory mode,
shared-k-mer threshold."""

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions


def test_min_shared_kmers_threshold():
    from lexicmap_tpu.index.gsearch import min_shared_kmers_threshold

    # mu = (1020-13+1)*0.95^13/4 = 252*0.513 ≈ 129; T = 129 - 1.645*11.4 ≈ 110
    t = min_shared_kmers_threshold(1020, 13, 4, 0.95)
    assert 100 < t < 125
    assert min_shared_kmers_threshold(50, 13, 1000, 0.5) == 1  # clamped


def test_degenerate_base_query(tmp_path):
    rng = np.random.default_rng(8)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=40000))
    p = tmp_path / "g.fasta"
    with open(p, "wb") as fh:
        fh.write(b">c0\n" + seq + b"\n")
    db = str(tmp_path / "g.lmt")
    build_index(db, [str(p)], BuildOptions(k=31, n_masks=256, chunks=2))
    idx = IndexSearcher(db, SearchOptions())
    # query with N's and degenerate codes still matches (N -> A like the ref)
    q = bytearray(seq[5000:6200])
    q[100] = ord("N")
    q[200] = ord("R")
    q[300] = ord("y")
    hits = idx.search_bytes(bytes(q))
    assert hits and hits[0].details[0].chains[0].aligned_fraction > 95


def test_soft_masking_build(tmp_path):
    rng = np.random.default_rng(9)
    seq = bytearray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=40000))
    # lowercase a 2kb region
    lower_rg = bytes(seq[10000:12000]).lower()
    seq[10000:12000] = lower_rg
    p = tmp_path / "s.fasta"
    with open(p, "wb") as fh:
        fh.write(b">c0\n" + bytes(seq) + b"\n")
    db_soft = str(tmp_path / "soft.lmt")
    build_index(
        db_soft, [str(p)], BuildOptions(k=31, n_masks=256, chunks=2, soft_masking=True)
    )
    idx = IndexSearcher(db_soft, SearchOptions())
    assert idx.info.soft_masking
    # the genome STORE keeps real bases: a query spanning the soft-masked
    # region still aligns.  The 2 kb unseeded region splits the seed chain
    # (> seed-max-dist), so coverage comes from multiple HSPs whose
    # pseudo-alignment extensions reach into the masked region.
    q = bytes(seq[9000:13000]).upper()
    hits = idx.search_bytes(q)
    assert hits
    assert hits[0].aligned_fraction > 90  # qcovGnm via the union of HSPs
    for sd in hits[0].details:
        for c in sd.chains:
            assert c.pident > 99.0


def test_in_memory_mode(tmp_path):
    rng = np.random.default_rng(10)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=30000))
    p = tmp_path / "m.fasta"
    with open(p, "wb") as fh:
        fh.write(b">c0\n" + seq + b"\n")
    db = str(tmp_path / "m.lmt")
    build_index(db, [str(p)], BuildOptions(k=31, n_masks=256, chunks=2))
    i1 = IndexSearcher(db, SearchOptions(in_memory=False))
    i2 = IndexSearcher(db, SearchOptions(in_memory=True))
    assert isinstance(i2.chunks[0].kmers, np.ndarray)
    q = seq[2000:3500]
    from lexicmap_tpu.cli import format_hit_rows

    r1 = list(format_hit_rows("q", len(q), i1.search_bytes(q)))
    r2 = list(format_hit_rows("q", len(q), i2.search_bytes(q)))
    assert r1 == r2 and r1


def test_cross_contig_query_splits_hsps(tmp_path):
    """A query stitched from the end of contig0 + start of contig1 must
    produce HSPs assigned to BOTH contigs with in-contig coordinates
    (exercises the iSeq-switch flush, ref: lib-index-search.go:2113-2158)."""
    rng = np.random.default_rng(12)
    c0 = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=30000))
    c1 = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=30000))
    p = tmp_path / "x.fasta"
    with open(p, "wb") as fh:
        fh.write(b">ctgA\n" + c0 + b"\n>ctgB\n" + c1 + b"\n")
    db = str(tmp_path / "x.lmt")
    build_index(db, [str(p)], BuildOptions(k=31, n_masks=256, chunks=2))
    idx = IndexSearcher(db, SearchOptions())
    q = c0[-1500:] + c1[:1500]
    hits = idx.search_bytes(q)
    assert hits
    seq_ids = {sd.seq_id for sd in hits[0].details}
    assert seq_ids == {b"ctgA", b"ctgB"}
    for sd in hits[0].details:
        for c in sd.chains:
            assert c.pident > 99.0
            # coordinates are IN-CONTIG (0-based < 30000)
            assert 0 <= c.tbegin <= c.tend < 30000
            if sd.seq_id == b"ctgA":
                assert c.tbegin >= 28000
            else:
                assert c.tend <= 2000
    # the union of the query regions covers nearly everything
    assert hits[0].aligned_fraction > 95


def test_cli_engine_auto_and_device_build(tmp_path):
    """CLI surface: `search --engine auto` resolves to host on CPU (subprocess
    platform probe) and `index --engine device` builds byte-identically to the
    host build (device capture on the interpret backend)."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(41)
    f = tmp_path / "g.fasta"
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=60000))
    with open(f, "wb") as fh:
        fh.write(b">c0\n" + seq + b"\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LEXICMAP_TPU_JAX_PLATFORM="cpu",
               LEXICMAP_TPU_CAPTURE_SLAB=str(1 << 16))
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*a):
        r = subprocess.run(
            [sys.executable, "-m", "lexicmap_tpu.cli", "--quiet", *a],
            capture_output=True, text=True, env=env, cwd=cwd,
        )
        assert r.returncode == 0, r.stderr
        return r

    db_h = str(tmp_path / "h.lmt")
    db_d = str(tmp_path / "d.lmt")
    run("index", "-O", db_h, "--force", "-m", "256", str(f))
    run("index", "-O", db_d, "--force", "-m", "256", "--engine", "device", str(f))
    r = subprocess.run(["diff", "-r", db_h, db_d], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout

    q = tmp_path / "q.fasta"
    with open(q, "wb") as fh:
        fh.write(b">q\n" + seq[10000:11500] + b"\n")
    out = str(tmp_path / "r.tsv")
    run("search", "-d", db_h, str(q), "-o", out, "--engine", "auto")
    with open(out) as fh:
        rows = fh.read().strip().splitlines()
    assert len(rows) >= 2 and "\tg\t" in rows[1]

    # auto is now the DEFAULT: a flagless search takes the same path (the
    # JAX_PLATFORMS=cpu pin short-circuits the probe -> host) and the
    # parameter echo reports the resolved engine
    out2 = str(tmp_path / "r2.tsv")
    r = subprocess.run(
        [sys.executable, "-m", "lexicmap_tpu.cli", "search",
         "-d", db_h, str(q), "-o", out2],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert r.returncode == 0, r.stderr
    assert "engine: host" in r.stderr
    assert open(out2).read() == open(out).read()
