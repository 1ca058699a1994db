"""engine='device' (Pallas seed matching) must reproduce the host results."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(13)
    d = tmp_path_factory.mktemp("drefs")
    files = []
    seqs = {}
    for i in range(3):
        name = f"D{i}"
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=50000))
        seqs[name] = seq
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq + b"\n")
        files.append(str(p))
    out = str(tmp_path_factory.mktemp("ddb") / "d.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=512, chunks=2))
    return out, seqs


def rows_of(results):
    from lexicmap_tpu.cli import format_hit_rows

    return list(format_hit_rows("q", 0, results))


def test_device_engine_matches_host(db):
    out, seqs = db
    host = IndexSearcher(out, SearchOptions(engine="host"))
    dev = IndexSearcher(out, SearchOptions(engine="device"))
    assert dev.device_matcher is not None
    rng = np.random.default_rng(3)
    for name in ["D0", "D1", "D2"]:
        base = bytearray(seqs[name][10000:12000])
        for _ in range(20):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        q = bytes(base)
        r_host = host.search_bytes(q)
        r_dev = dev.search_bytes(q)
        assert rows_of(r_host) == rows_of(r_dev), name
        assert r_host and r_host[0].genome_id.decode() == name


def test_column_chunked_masks_match_host(db, monkeypatch):
    """With E_CAP forced tiny, every mask splits into many column-chunk
    rows; range hits spanning chunk boundaries must come back merged
    (one contiguous (e0, n) per mask) and search output must be
    identical to the host path."""
    from lexicmap_tpu.parallel import device_search as ds

    out, seqs = db
    monkeypatch.setattr(ds, "E_CAP", 4)
    host = IndexSearcher(out, SearchOptions(engine="host"))
    dev = IndexSearcher(out, SearchOptions(engine="device"))
    m = dev.device_matcher
    assert m is not None
    n_rows = sum(b[2].shape[0] for b in m.buckets)
    assert n_rows > m.m, "no mask was column-chunked"
    rng = np.random.default_rng(9)
    for name in ["D0", "D1"]:
        base = bytearray(seqs[name][30000:32000])
        for _ in range(20):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        q = bytes(base)
        assert rows_of(host.search_bytes(q)) == rows_of(dev.search_bytes(q))
        # merged triples: per mask at most one (contiguous) range
        from lexicmap_tpu.utils.kmers import seq_to_codes

        kmers, _ = dev._mask_query(seq_to_codes(q.upper()))
        hits = m.match(kmers, dev.opt.min_prefix)
        assert hits is not None
        hm, e0, nh = hits
        # same-mask duplicates may only remain when ranges are
        # NON-contiguous (cannot happen for a single prefix range)
        assert len(np.unique(hm)) == hm.shape[0], "unmerged chunk triples"


def test_hbm_budget_tier_matches_host(db, monkeypatch):
    """With a tiny HBM budget most mask buckets spill to the host tier;
    results must stay identical (routing + accounting, never content)."""
    out, seqs = db
    monkeypatch.setenv("LEXICMAP_TPU_HBM_BUDGET", "200000")  # ~0.2 MB
    host = IndexSearcher(out, SearchOptions(engine="host"))
    dev = IndexSearcher(out, SearchOptions(engine="device"))
    m = dev.device_matcher
    assert m is not None
    assert m.budget_spill > 0, "budget did not spill any bucket"
    assert m.hbm_bytes <= 200000
    assert m.host_entries > 0 and "host" in m.describe()
    rng = np.random.default_rng(5)
    for name in ["D0", "D2"]:
        base = bytearray(seqs[name][20000:22000])
        for _ in range(20):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        q = bytes(base)
        assert rows_of(host.search_bytes(q)) == rows_of(dev.search_bytes(q))


def test_device_wfa_engine_matches_host(db):
    """--engine device --wfa device: the two-phase WFA offload (span collect
    -> batched device WFA -> op injection) reproduces the host rows exactly
    (the device wavefronts are bit-exact, so stats/scores are identical)."""
    out, seqs = db
    host = IndexSearcher(out, SearchOptions(engine="host"))
    dev = IndexSearcher(out, SearchOptions(engine="device", wfa_engine="device"))
    assert dev.device_wfa is not None
    rng = np.random.default_rng(7)
    queries = []
    for name in ["D0", "D1", "D2"]:
        base = bytearray(seqs[name][20000:22500])
        for _ in range(40):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        queries.append(bytes(base))
    # chimera with an indel: two WFA windows with gaps
    queries.append(seqs["D0"][1000:2200] + b"ACGT" * 3 + seqs["D2"][30000:31200])
    r_host = [host.search_bytes(q) for q in queries]
    r_dev = dev.search_many(queries)
    for i, (a, b) in enumerate(zip(r_host, r_dev)):
        assert rows_of(a) == rows_of(b), i


def test_match_batch_equals_match(db):
    out, seqs = db
    import numpy as np

    dev = IndexSearcher(out, SearchOptions(engine="device"))
    from lexicmap_tpu.utils.kmers import seq_to_codes

    kk = []
    for name in ["D0", "D1"]:
        kmers, _ = dev._mask_query(seq_to_codes(seqs[name][5000:6500]))
        kk.append(kmers)
    batch = np.stack(kk)
    batched = dev.device_matcher.match_batch(batch, 15)
    for b, kmers in enumerate(kk):
        hm, he0, hnh = dev.device_matcher.match(kmers, 15)
        bm, be0, bnh = batched[b]
        assert hm.tolist() == bm.tolist()
        assert he0.tolist() == be0.tolist()
        assert hnh.tolist() == bnh.tolist()


def test_search_many_matches_per_query(db):
    """search_many (batched device dispatch) equals per-query search."""
    out, seqs = db
    dev = IndexSearcher(out, SearchOptions(engine="device"))
    rng = np.random.default_rng(11)
    queries = []
    for name in ["D0", "D1", "D2"]:
        base = bytearray(seqs[name][5000:6500])
        for _ in range(15):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        queries.append(bytes(base))
    queries.append(b"ACGT")  # shorter than k -> empty result slot
    many = dev.search_many(queries)
    assert len(many) == 4
    assert many[3] == []
    for q, got in zip(queries[:3], many[:3]):
        assert rows_of(got) == rows_of(dev.search_bytes(q))


def test_device_chain_engine_matches_host(db):
    """--engine device --chain device: the batched chain1 forward DP on the
    device (+ host backtrack) reproduces the host rows exactly — the DP is
    float32 bit-compatible (integer-exact gaps + host-precomputed gap-score
    table for the float64 log2)."""
    out, seqs = db
    host = IndexSearcher(out, SearchOptions(engine="host"))
    dev = IndexSearcher(out, SearchOptions(engine="device", chain_engine="device"))
    assert dev.device_chainer is not None
    rng = np.random.default_rng(23)
    queries = []
    for name in ["D0", "D1", "D2"]:
        base = bytearray(seqs[name][15000:17500])
        for _ in range(40):
            p = int(rng.integers(0, len(base)))
            base[p] = ord("ACGT"[int(rng.integers(0, 4))])
        queries.append(bytes(base))
    # chimera: two genomes + an indel, multi-genome chaining
    queries.append(seqs["D1"][2000:3200] + b"TTAC" * 2 + seqs["D0"][40000:41200])
    r_host = [host.search_bytes(q) for q in queries]
    r_dev = dev.search_many(queries)
    from lexicmap_tpu.index.search import IndexSearcher as _IS  # noqa: F401

    for i, (a, b) in enumerate(zip(r_host, r_dev)):
        assert rows_of(a) == rows_of(b), i
    st = dev.device_chainer.stats
    assert st["genomes"] > 0
    assert st["genomes"] > st["host_genomes"]


def test_device_chainer_dp_matches_host_forward():
    """Direct differential: device chain1 forward DP vs the host/native DP
    on random anchor sets (including window-truncation detection)."""
    from lexicmap_tpu.ops.chaining import Anchors, ChainingOptions, chain
    from lexicmap_tpu.parallel.chain_device import DeviceChainer

    copt = ChainingOptions(max_gap=50.0, min_score=40.0, max_distance=1000.0)
    rng = np.random.default_rng(5)
    sets = []
    for n in (2, 7, 40, 127, 128, 300, 700):
        qb = np.sort(rng.integers(0, 2500, n)).astype(np.int32)
        tb = (qb + rng.integers(-40, 40, n)).astype(np.int32)
        ln = rng.integers(15, 32, n).astype(np.int32)
        sets.append((qb, tb, ln))
    # dense repeat-like set: many anchors within max_distance (truncation
    # candidate for the 512-window buckets)
    n = 1500
    qb = np.sort(rng.integers(0, 900, n)).astype(np.int32)
    tb = (qb + rng.integers(-30, 30, n)).astype(np.int32)
    ln = rng.integers(15, 32, n).astype(np.int32)
    sets.append((qb, tb, ln))

    dc = DeviceChainer(copt.max_gap, copt.min_score, int(copt.max_distance))
    res = dc.chain_batch(sets)
    from lexicmap_tpu.native import chain1_forward_native

    n_ok = 0
    for (qb, tb, ln), (kind, fwd) in zip(sets, res):
        if kind != "ok":
            continue
        n_ok += 1
        want = chain1_forward_native(
            qb, tb, ln, copt.max_gap, copt.min_score, int(copt.max_distance)
        )
        if want is None:
            anchors = Anchors(qb, tb, ln, np.zeros(len(qb), bool), np.zeros(len(qb), bool))
            continue  # native lib unavailable: engine test covers parity
        ms, prev, dirs = fwd
        w_ms, w_prev, w_dirs = want
        assert np.array_equal(ms.view(np.uint32), w_ms.astype(np.float32).view(np.uint32))
        assert np.array_equal(prev, w_prev)
        assert np.array_equal(dirs, w_dirs)
    assert n_ok >= 6
