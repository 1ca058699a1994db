"""Sharded search-step tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_seed_match_kernel_matches_numpy():
    from lexicmap_tpu.parallel.sharded import seed_match_shard

    rng = np.random.default_rng(0)
    k = 16  # uint32 k-mers: the production kernels never enable x64
    M, E, B = 64, 32, 4
    seeds = np.sort(
        rng.integers(1, 1 << (2 * k), size=(M, E), dtype=np.uint32), axis=1
    )
    queries = seeds[np.arange(M), rng.integers(0, E, size=M)][None, :].repeat(B, axis=0)
    p = 12
    n_hits, lcp = jax.jit(lambda s, q: seed_match_shard(s, q, k, p))(seeds, queries)
    n_hits = np.asarray(n_hits)
    lcp = np.asarray(lcp)
    # brute force
    suf = np.uint32((1 << (2 * (k - p))) - 1)
    for m in range(M):
        q = queries[0, m]
        lb, rb = q & ~suf, q | suf
        expect = int(((seeds[m] >= lb) & (seeds[m] <= rb)).sum())
        assert n_hits[0, m] == expect
        assert lcp[0, m] >= p  # the query itself is in the table


def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_jit_compiles():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry2", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (args[1].shape[0],)
    assert (np.asarray(out) > 0).all()


def test_sharded_screening_real_index(tmp_path):
    """Pack a real (tiny) index for device, shard over an 8-device mesh, and
    cross-check per-query scores against the host computation."""
    import numpy as np

    from lexicmap_tpu.index.build import BuildOptions, build_index
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.sharded import (
        make_mesh,
        make_sharded_search_step,
        shard_arrays,
    )
    from lexicmap_tpu.utils.kmers import seq_to_codes

    rng = np.random.default_rng(9)
    files = []
    seqs = {}
    for i in range(3):
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=30000))
        p = tmp_path / f"S{i}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq + b"\n")
        seqs[f"S{i}"] = seq
        files.append(str(p))
    db = str(tmp_path / "s.lmt")
    build_index(db, files, BuildOptions(k=31, n_masks=256, chunks=2))
    idx = IndexSearcher(db, SearchOptions())

    # pad per-mask entries into an [M, E] hi-word uint32 table (the
    # production layout: a p <= 16 prefix range lives in the top 16 bases)
    from lexicmap_tpu.parallel.pallas_kernels import split_kmers_hi_lo

    per_mask = []
    for rdr in idx.chunks:
        km = np.asarray(rdr.kmers)
        off = np.asarray(rdr.mask_offsets)
        for mi in range(rdr.mask_end - rdr.mask_begin):
            h, _ = split_kmers_hi_lo(km[off[mi] : off[mi + 1]], 31)
            per_mask.append(np.sort(h))
    E = max(((max(len(a) for a in per_mask) + 7) // 8) * 8, 8)
    table = np.full((256, E), np.uint32(0xFFFFFFFF), dtype=np.uint32)
    for i, a in enumerate(per_mask):
        table[i, : a.shape[0]] = a

    # query batch: masked k-mers of windows from two genomes (hi words)
    queries = []
    for name in ["S0", "S2"]:
        q = seqs[name][4000:6000]
        kmers, _ = idx._mask_query(seq_to_codes(q))
        h, _ = split_kmers_hi_lo(kmers, 31)
        h[kmers == 0] = 0
        queries.append(h)
    qarr = np.stack(queries * 4)  # batch of 8

    mesh = make_mesh(8)
    step = make_sharded_search_step(mesh, k=16, min_prefix=15)
    s_seeds, s_queries = shard_arrays(mesh, table, qarr)
    scores = np.asarray(step(s_seeds, s_queries))
    assert scores.shape == (8,)
    assert (scores > 0).all()
    # replicated queries must produce identical scores
    assert scores[0] == scores[2] == scores[4] == scores[6]
    assert scores[1] == scores[3] == scores[5] == scores[7]

    # cross-check one query against a host computation over the hi words
    suf = np.uint32((1 << (2 * (16 - 15))) - 1)
    expect = 0.0
    for mi in range(256):
        q = queries[0][mi]
        if q == 0:
            continue
        row = per_mask[mi]
        sel = (row >= (q & ~suf)) & (row <= (q | suf))
        n = int(sel.sum())
        if n:
            first = int(row[np.argmax(sel)])
            x = first ^ int(q)
            lcp0 = 16 - ((x.bit_length() + 1) // 2) if x else 16
            expect += n * lcp0
    assert scores[0] == pytest.approx(expect)


def test_sharded_full_pipeline_tsv_identical(tmp_path):
    """The REAL search pipeline with its seed index sharded over the
    8-device mesh must reproduce the single-device TSV byte-for-byte:
    phase 1 runs as one sharded dispatch (per-shard prefix locate + tiled
    all_gather over tp), phases 2b-4 are the identical host code."""
    import numpy as np

    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.build import BuildOptions, build_index
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.sharded import ShardedSeedMatcher, make_mesh
    from lexicmap_tpu.utils.kmers import seq_to_codes

    rng = np.random.default_rng(11)
    files = []
    seqs = {}
    for i in range(4):
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=40000))
        p = tmp_path / f"G{i}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq + b"\n")
        seqs[f"G{i}"] = seq
        files.append(str(p))
    db = str(tmp_path / "g.lmt")
    build_index(db, files, BuildOptions(k=31, n_masks=512, chunks=2))
    idx = IndexSearcher(db, SearchOptions())

    # queries: exact windows, a mutated window, and a cross-genome chimera
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    q1 = seqs["G0"][5000:7000]
    q2 = seqs["G2"][10000:11500]
    q3 = bytearray(seqs["G1"][2000:4000])
    for pos in rng.integers(0, len(q3), size=20):
        q3[pos] = alphabet[rng.integers(0, 4)]
    q3 = bytes(q3)
    q4 = seqs["G3"][1000:2200] + seqs["G0"][30000:31000]
    queries = [q1, q2, q3, q4]

    mesh = make_mesh(8)
    matcher = ShardedSeedMatcher(idx, mesh)

    codes = [seq_to_codes(q) for q in queries]
    masked = [idx._mask_query(c) for c in codes]
    batch = np.stack([m[0] for m in masked])
    dev = matcher.match_batch(batch, idx.opt.min_prefix)

    for qi, c in enumerate(codes):
        host_hits = idx.search(c)
        shard_hits = idx.search(c, premasked=masked[qi], dev_hits_pre=dev[qi])
        host_rows = list(format_hit_rows(f"q{qi}", len(queries[qi]), host_hits))
        shard_rows = list(format_hit_rows(f"q{qi}", len(queries[qi]), shard_hits))
        assert host_rows, f"query {qi} found nothing"
        assert shard_rows == host_rows


DEMO_DB = os.environ.get("LEXICMAP_TPU_DEMO_DB", "/tmp/demo.lmt")
DEMO_DIR = "/root/reference/demo"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DB, "info.json")),
    reason="demo index not built",
)
def test_sharded_demo_index_golden_tsv():
    """The REAL demo index (20,000 masks) sharded over the 8-device mesh
    reproduces the reference's committed golden q.gene TSV byte-for-byte
    (ref: demo/q.gene.fasta.lexicmap.tsv, 84 rows)."""
    import numpy as np

    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.sharded import ShardedSeedMatcher, make_mesh
    from lexicmap_tpu.utils.fasta import read_fastx
    from lexicmap_tpu.utils.kmers import seq_to_codes

    idx = IndexSearcher(DEMO_DB, SearchOptions())
    mesh = make_mesh(8)
    matcher = ShardedSeedMatcher(idx, mesh)
    # the bucketed hi-word layout must stay ~sum(counts)/2, far below the
    # dense m_pad * maxE * 8 layout (>2.5 GB for the demo index)
    assert matcher.hbm_bytes < 64 << 20, matcher.describe()

    rec = next(iter(read_fastx(os.path.join(DEMO_DIR, "q.gene.fasta"))))
    codes = seq_to_codes(rec.seq)
    masked = idx._mask_query(codes)
    dev = matcher.match_batch(masked[0][None, :], idx.opt.min_prefix)
    assert dev[0] is not None
    hits = idx.search(codes, premasked=masked, dev_hits_pre=dev[0])
    rows = list(format_hit_rows(rec.id.decode(), len(rec.seq), hits))
    with open(os.path.join(DEMO_DIR, "q.gene.fasta.lexicmap.tsv")) as fh:
        golden = [line.rstrip("\n") for line in fh][1:]
    assert rows == golden


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DB, "info.json")),
    reason="demo index not built",
)
def test_mesh_engine_multi_query_matches_host():
    """The full mesh engine (sharded phase 2a + dp-sharded phase 4) on a
    multi-query batch (16S + prophage + a synthetic mutant) must reproduce
    the host searcher's rows exactly."""
    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.engine import DeviceSearchEngine
    from lexicmap_tpu.parallel.sharded import make_mesh
    from lexicmap_tpu.utils.fasta import read_fastx

    idx = IndexSearcher(DEMO_DB, SearchOptions())
    gene = next(iter(read_fastx(os.path.join(DEMO_DIR, "q.gene.fasta")))).seq
    proph = next(iter(read_fastx(os.path.join(DEMO_DIR, "q.prophage.fasta")))).seq
    mut = bytearray(gene)
    rng = np.random.default_rng(3)
    for p in rng.integers(0, len(mut), size=30):
        mut[p] = ord("ACGT"[int(rng.integers(0, 4))])
    queries = [bytes(gene), bytes(proph)[:2000], bytes(mut)]

    eng = DeviceSearchEngine(idx, mesh=make_mesh(8))
    mesh_res = eng.search_batch(queries)
    for q, got in zip(queries, mesh_res):
        want = idx.search_bytes(q)
        rows_w = list(format_hit_rows("q", len(q), want))
        rows_g = list(format_hit_rows("q", len(q), got))
        assert rows_w == rows_g


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DB, "info.json")),
    reason="demo index not built (see tests/test_demo_parity.py header)",
)
def test_mesh_engine_device_wfa_matches_host():
    """Mesh engine with --wfa device: sharded phase 2a + dp-sharded phase 4
    + the batch-wide mesh-sharded device WFA (phase 5) reproduce the host
    searcher's rows exactly on the demo index."""
    from lexicmap_tpu.cli import format_hit_rows
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
    from lexicmap_tpu.parallel.engine import DeviceSearchEngine
    from lexicmap_tpu.parallel.sharded import make_mesh
    from lexicmap_tpu.utils.fasta import read_fastx

    host = IndexSearcher(DEMO_DB, SearchOptions())
    idx = IndexSearcher(DEMO_DB, SearchOptions(engine="device", wfa_engine="device"))
    assert idx.device_wfa is not None
    gene = next(iter(read_fastx(os.path.join(DEMO_DIR, "q.gene.fasta")))).seq
    mut = bytearray(gene)
    rng = np.random.default_rng(11)
    for p in rng.integers(0, len(mut), size=25):
        mut[p] = ord("ACGT"[int(rng.integers(0, 4))])
    queries = [bytes(gene), bytes(mut)]

    eng = DeviceSearchEngine(idx, mesh=make_mesh(8))
    assert idx.device_wfa.mesh is not None
    mesh_res = eng.search_batch(queries)
    for q, got in zip(queries, mesh_res):
        want = host.search_bytes(q)
        rows_w = list(format_hit_rows("q", len(q), want))
        rows_g = list(format_hit_rows("q", len(q), got))
        assert rows_w and rows_w == rows_g
