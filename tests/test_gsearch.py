"""Genome search (ANI/AF), pair, and compare tests."""

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.gsearch import (
    GQuery,
    GSearchOptions,
    compare_two_genomes,
    genome_pairs,
    gsearch_align,
    gsearch_screen,
    sample_fragment_kmers,
    seqs2fragments,
)
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions


def mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    n = int(len(arr) * rate)
    pos = rng.choice(len(arr), size=n, replace=False)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for p in pos:
        arr[p] = bases[(np.nonzero(bases == arr[p])[0][0] + rng.integers(1, 4)) % 4]
    return arr.tobytes()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    base = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=120000))
    # A: identical to base; B: 2% diverged; C: unrelated
    genomes = {
        "GA": base,
        "GB": mutate(rng, base, 0.02),
        "GC": bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=120000)),
    }
    d = tmp_path_factory.mktemp("grefs")
    files = []
    for name, seq in genomes.items():
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq + b"\n")
        files.append(str(p))
    out = str(tmp_path_factory.mktemp("gdb") / "g.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=512, chunks=2))
    idx = IndexSearcher(out, SearchOptions(min_prefix=21))
    return idx, genomes, files, d


def test_seqs2fragments():
    seqs = [np.zeros(2500, dtype=np.uint8), np.zeros(90, dtype=np.uint8)]
    frags, total = seqs2fragments(seqs, 1020, 100)
    assert len(frags) == 3  # 1020 + 1020 + 460; the 90bp contig dropped
    assert total == 2500


def test_sample_fragment():
    rng = np.random.default_rng(1)
    frag = rng.integers(0, 4, size=1020).astype(np.uint8)
    kk, pp = sample_fragment_kmers(frag, 4)
    # ~1/4 of 1008 kmers
    assert 150 < kk.shape[0] < 400
    assert (pp[1:] > pp[:-1]).all()


def test_screen_ranks_similar_first(setup):
    idx, genomes, files, d = setup
    from lexicmap_tpu.index.gsearch import read_genome_query

    q = read_genome_query(str(d / "GA.fasta"), idx.k)
    groups = gsearch_screen(idx, q, GSearchOptions())
    assert groups
    ids = [idx.id_of_code[codes[0]].decode() for codes, _ in groups]
    assert ids[0] == "GA"
    assert "GB" in ids
    scores = {i: s for i, (_, s) in zip(ids, groups)}
    assert scores["GA"] > scores["GB"]


def test_gsearch_align_ani(setup):
    idx, genomes, files, d = setup
    from lexicmap_tpu.index.gsearch import read_genome_query

    q = read_genome_query(str(d / "GB.fasta"), idx.k)
    opt = GSearchOptions()
    groups = gsearch_screen(idx, q, opt)
    results = gsearch_align(idx, q, groups, opt)
    assert results
    by_id = {r.genome_id.decode(): r for r in results}
    # self-hit: ANI 100%
    assert "GB" in by_id
    assert by_id["GB"].ani == pytest.approx(1.0, abs=0.001)
    assert by_id["GB"].af_q > 0.95
    # 2%-diverged relative: ANI ~98%
    assert "GA" in by_id
    assert by_id["GA"].ani == pytest.approx(0.98, abs=0.01)
    assert by_id["GA"].af_q > 0.8
    # unrelated genome filtered out by min AF
    assert "GC" not in by_id


def test_compare_two_genomes(setup):
    idx, genomes, files, d = setup
    from lexicmap_tpu.index.gsearch import read_genome_query

    q1 = read_genome_query(str(d / "GA.fasta"), 13)
    q2 = read_genome_query(str(d / "GB.fasta"), 13)
    r = compare_two_genomes(q1, q2, GSearchOptions())
    assert r.ani == pytest.approx(0.98, abs=0.01)
    assert r.af_q > 0.8


def test_genome_pairs(setup):
    idx, genomes, files, d = setup
    pairs = genome_pairs(idx, min_prefix=21, min_mask_fraction=0.01, n_masks=0)
    assert pairs
    top = pairs[0]
    ids = {idx.id_of_code[top[0]].decode(), idx.id_of_code[top[1]].decode()}
    assert ids == {"GA", "GB"}


def test_ortho_ani(setup):
    idx, genomes, files, d = setup
    from lexicmap_tpu.index.gsearch import GSearchOptions, ortho_ani_compare, read_genome_query

    q1 = read_genome_query(str(d / "GA.fasta"), 13)
    q2 = read_genome_query(str(d / "GB.fasta"), 13)
    ani, af_q, af_s, n = ortho_ani_compare(q1, q2, GSearchOptions())
    assert n > 50
    assert ani == pytest.approx(0.98, abs=0.01)
    assert af_q > 0.5 and af_s > 0.5


def test_should_keep_pair_bounds():
    """Agievich-bound pruning (ref: pair.go:730-789)."""
    from lexicmap_tpu.index.gsearch import should_keep_pair

    # already reached the threshold
    assert should_keep_pair(100, 30, 0.25, 100, 0.001)
    # impossible even if all remaining masks match
    assert not should_keep_pair(90, 1, 0.25, 100, 0.001)
    # early on, a single match is still plausible
    assert should_keep_pair(1, 1, 0.25, 1024, 0.001)
    # far below the required rate late in the scan -> pruned
    assert not should_keep_pair(512, 10, 0.25, 1024, 0.001)
    # on-track pair survives
    assert should_keep_pair(512, 200, 0.25, 1024, 0.001)


def test_genome_pairs_mask_subset(setup):
    """-m subset (first mask per log4(m)-prefix) must agree with all-masks
    results on which pair ranks first."""
    idx, genomes, files, d = setup
    m = idx.mask_set.m
    # the test index has few masks; use the largest power of 4 <= m
    import math
    nm = 4 ** int(math.log(m, 4))
    pairs = genome_pairs(idx, min_prefix=21, min_mask_fraction=0.01, n_masks=nm)
    assert pairs
    ids = {idx.id_of_code[pairs[0][0]].decode(), idx.id_of_code[pairs[0][1]].decode()}
    assert ids == {"GA", "GB"}
    # matched-mask count cannot exceed the subset size
    assert all(p[2] <= nm for p in pairs)


def test_screen_device_matches_host(setup):
    """Candidate screening through the device seed matcher (one batched
    prefix match over the window captures, host lo-word refinement for the
    21-base gsearch prefix) must produce identical scores to the host
    range-search path."""
    jax = pytest.importorskip("jax")  # noqa: F841
    idx_h, genomes, files, d = setup
    from lexicmap_tpu.index.gsearch import read_genome_query

    out = idx_h.dir if hasattr(idx_h, "dir") else None
    idx_d = IndexSearcher(idx_h.path, SearchOptions(min_prefix=21, engine="device")) \
        if hasattr(idx_h, "path") else None
    if idx_d is None:
        pytest.skip("searcher path attribute unavailable")
    assert idx_d.device_matcher is not None
    for gname in ("GA", "GB"):
        q = read_genome_query(str(d / f"{gname}.fasta"), idx_h.k)
        host = gsearch_screen(idx_h, q, GSearchOptions())
        dev = gsearch_screen(idx_d, q, GSearchOptions())
        assert host == dev, gname
