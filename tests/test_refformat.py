"""Reference (.lmi) format: codec round trips and full index round trip."""

import os

import numpy as np
import pytest

from lexicmap_tpu.index import refformat as rf
from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.convert import export_reference_index, import_reference_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions


def test_varint_gb_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        v1 = int(rng.integers(0, 1 << 62))
        v2 = int(rng.integers(0, 1 << 62))
        ctrl, data = rf.put_uint64s(v1, v2)
        r1, r2, n = rf.get_uint64s(ctrl, data, 0)
        assert (r1, r2, n) == (v1, v2, len(data))


def test_kv_chunk_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    per_mask = []
    for mi in range(8):
        nk = int(rng.integers(0, 30))
        kmers = np.sort(
            rng.choice(1 << 62, size=nk, replace=False).astype(np.uint64)
        ) if nk else np.empty(0, dtype=np.uint64)
        values = [
            rng.integers(0, 1 << 47, size=int(rng.integers(1, 5))).astype(np.uint64)
            for _ in range(nk)
        ]
        per_mask.append((kmers, values))
    path = str(tmp_path / "chunk_000.bin")
    rf.write_kv_chunk(path, 16, per_mask, k=31, mask_prefix=2, anchor_prefix=2)
    mask_offset, got = rf.read_kv_chunk(path)
    assert mask_offset == 16
    assert len(got) == 8
    for (k1, v1), (k2, v2) in zip(per_mask, got):
        assert k1.tolist() == k2.tolist()
        assert [a.tolist() for a in v1] == [a.tolist() for a in v2]


def test_kv_chunk_roundtrip_7byte(tmp_path):
    rng = np.random.default_rng(2)
    kmers = np.sort(rng.choice(1 << 62, size=11, replace=False).astype(np.uint64))
    values = [rng.integers(0, 1 << 47, size=2).astype(np.uint64) for _ in range(11)]
    path = str(tmp_path / "c.bin")
    rf.write_kv_chunk(path, 0, [(kmers, values)], k=31, mask_prefix=2,
                      anchor_prefix=2, use3=True)
    _, got = rf.read_kv_chunk(path)
    assert got[0][0].tolist() == kmers.tolist()
    assert [a.tolist() for a in got[0][1]] == [a.tolist() for a in values]


def test_genome_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    from lexicmap_tpu.index.store import pack_2bit

    recs = []
    for i in range(3):
        nb = int(rng.integers(50, 5000))
        codes = rng.integers(0, 4, size=nb).astype(np.uint8)
        recs.append(
            (f"G{i}".encode(), pack_2bit(codes).tobytes(), nb, nb - 10,
             [nb], [f"s{i}".encode()])
        )
    path = str(tmp_path / "genomes.bin")
    rf.write_genome_file(path, 7, recs)
    batch, got = rf.read_genome_file(path)
    assert batch == 7
    for a, b in zip(recs, got):
        assert a == (b[0], b[1], b[2], b[3], b[4], b[5])


def test_full_index_roundtrip(tmp_path):
    """native -> export(.lmi) -> import -> identical search results."""
    rng = np.random.default_rng(4)
    files = []
    seqs = {}
    d = tmp_path / "refs"
    d.mkdir()
    for i in range(3):
        name = f"R{i}"
        contigs = [
            bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=25000)),
            bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=15000)),
        ]
        seqs[name] = contigs
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            for j, s in enumerate(contigs):
                fh.write(b">" + f"c{j}".encode() + b"\n" + s + b"\n")
        files.append(str(p))
    native1 = str(tmp_path / "n1.lmt")
    build_index(native1, files, BuildOptions(k=31, n_masks=512, chunks=3))

    ref = str(tmp_path / "ref.lmi")
    export_reference_index(native1, ref)
    # the exported layout has the reference's files
    assert os.path.exists(os.path.join(ref, "info.toml"))
    assert os.path.exists(os.path.join(ref, "seeds", "chunk_000.bin"))
    assert os.path.exists(os.path.join(ref, "seeds", "chunk_000.bin.idx"))
    assert os.path.exists(os.path.join(ref, "genomes", "batch_0000", "genomes.bin.idx"))
    assert os.path.exists(os.path.join(ref, "genomes.map.bin"))

    native2 = str(tmp_path / "n2.lmt")
    import_reference_index(ref, native2)

    i1 = IndexSearcher(native1, SearchOptions())
    i2 = IndexSearcher(native2, SearchOptions())
    from lexicmap_tpu.cli import format_hit_rows

    for name in seqs:
        q = bytearray(seqs[name][0][3000:4500])
        for _ in range(15):
            p = int(rng.integers(0, len(q)))
            q[p] = ord("ACGT"[int(rng.integers(0, 4))])
        r1 = list(format_hit_rows("q", len(q), i1.search_bytes(bytes(q))))
        r2 = list(format_hit_rows("q", len(q), i2.search_bytes(bytes(q))))
        assert r1 == r2 and r1, name
