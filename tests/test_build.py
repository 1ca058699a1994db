import os

import numpy as np
import pytest

from lexicmap_tpu.constants import BITS_IDX, BITS_IDX_FLAGS, BITS_NONE_IDX
from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.store import (
    DIR_GENOMES,
    DIR_SEEDS,
    GenomeStoreReader,
    IndexInfo,
    SeedChunkReader,
    batch_dir,
    chunk_dir,
    pack_2bit,
    read_genome_map,
    unpack_2bit,
)
from lexicmap_tpu.masks import MaskSet
from lexicmap_tpu.utils.kmers import (
    codes_to_seq,
    decode_kmer,
    revcomp_kmers,
    reverse_kmers,
    seq_to_codes,
)


def random_seq(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))


@pytest.fixture(scope="module")
def tiny_db(tmp_path_factory):
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("refs")
    seqs = {}
    for i in range(3):
        name = f"G{i:03d}"
        path = d / f"{name}.fasta"
        contigs = [random_seq(rng, 5000), random_seq(rng, 3000)]
        seqs[name] = contigs
        with open(path, "wb") as fh:
            for j, s in enumerate(contigs):
                fh.write(b">" + f"ctg{j}".encode() + b"\n" + s + b"\n")
    out = str(tmp_path_factory.mktemp("db") / "tiny.lmt")
    opt = BuildOptions(k=31, n_masks=256, rand_seed=1, chunks=4, contig_interval=100)
    info = build_index(out, [str(d / f"G{i:03d}.fasta") for i in range(3)], opt)
    return out, seqs, info, opt


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=1001).astype(np.uint8)
    packed = pack_2bit(codes)
    assert (unpack_2bit(packed, 0, 1001) == codes).all()
    assert (unpack_2bit(packed, 17, 903) == codes[17:903]).all()


def test_build_info(tiny_db):
    out, seqs, info, opt = tiny_db
    assert info.genomes == 3
    assert info.input_bases == 3 * 8000
    info2 = IndexInfo.load(os.path.join(out, "info.json"))
    assert info2.k == 31 and info2.masks == 256


def test_genome_store_roundtrip(tiny_db):
    out, seqs, info, opt = tiny_db
    rdr = GenomeStoreReader(os.path.join(out, DIR_GENOMES, batch_dir(0)))
    assert len(rdr) == 3
    for i in range(3):
        name = f"G{i:03d}"
        assert rdr.ids[i] == name.encode()
        contigs = seqs[name]
        concat = (b"A" * 100).join(contigs)
        codes = rdr.subseq_codes(i, 0, len(concat) - 1)
        assert codes_to_seq(codes) == concat
        # window
        w = rdr.subseq_codes(i, 100, 200)
        assert codes_to_seq(w) == concat[100:201]
        assert rdr.seq_sizes(i) == [5000, 3000]
        assert rdr.seq_ids[i] == [b"ctg0", b"ctg1"]
        # clipping beyond the end
        tail = rdr.subseq_codes(i, len(concat) - 10, len(concat) + 50)
        assert codes_to_seq(tail) == concat[-10:]


def test_genome_map(tiny_db):
    out, seqs, info, opt = tiny_db
    entries = read_genome_map(os.path.join(out, "genomes.map.tsv"))
    assert [e[0] for e in entries] == [b"G000", b"G001", b"G002"]
    assert [e[1] for e in entries] == [0, 1, 2]


def test_seed_postings_consistent(tiny_db):
    """Every posting must point at a position whose k-mer matches the entry."""
    out, seqs, info, opt = tiny_db
    k = info.k
    ms = MaskSet.load(os.path.join(out, "masks.bin"))
    rdr = GenomeStoreReader(os.path.join(out, DIR_GENOMES, batch_dir(0)))

    n_checked = 0
    for c in range(info.chunks):
        scr = SeedChunkReader(os.path.join(out, DIR_SEEDS, chunk_dir(c)))
        nmask = scr.mask_end - scr.mask_begin
        for mi in range(nmask):
            e0, e1 = scr.mask_offsets[mi], scr.mask_offsets[mi + 1]
            kmers = scr.kmers[e0:e1]
            # entries sorted ascending per mask
            assert (np.diff(kmers.astype(np.int64)) > 0).all() if len(kmers) > 1 else True
            for e in range(e0, e1):
                kmer = int(scr.kmers[e])
                for v in scr.values[scr.entry_offsets[e] : scr.entry_offsets[e + 1]]:
                    v = int(v)
                    gidx = (v >> BITS_NONE_IDX) & ((1 << 17) - 1)
                    pos = (v << BITS_IDX) % (1 << 64) >> BITS_IDX_FLAGS
                    rev = v & 1
                    strand = (v >> 1) & 1
                    codes = rdr.subseq_codes(gidx, pos, pos + k - 1)
                    fwd = 0
                    for cc in codes:
                        fwd = (fwd << 2) | int(cc)
                    fwdarr = np.array([fwd], dtype=np.uint64)
                    if strand:
                        fwdarr = revcomp_kmers(fwdarr, k)
                    if rev:
                        fwdarr = reverse_kmers(fwdarr, k)
                    assert int(fwdarr[0]) == kmer, (
                        f"chunk {c} mask {mi} entry {decode_kmer(kmer, k)} "
                        f"!= genome kmer {decode_kmer(int(fwdarr[0]), k)} "
                        f"(g{gidx} pos {pos} strand {strand} rev {rev})"
                    )
                    n_checked += 1
    assert n_checked > 1000


def test_desert_filling_bounds_gaps(tiny_db):
    """After desert filling, forward seed distances should be mostly small."""
    out, seqs, info, opt = tiny_db
    k = info.k
    rdr = GenomeStoreReader(os.path.join(out, DIR_GENOMES, batch_dir(0)))
    # collect all forward (non-reversed) seed positions of genome 0
    pos_all = []
    for c in range(info.chunks):
        scr = SeedChunkReader(os.path.join(out, DIR_SEEDS, chunk_dir(c)))
        vals = np.asarray(scr.values)
        gidx = (vals >> np.uint64(BITS_NONE_IDX)) & np.uint64((1 << 17) - 1)
        rev = vals & np.uint64(1)
        sel = (gidx == 0) & (rev == 0)
        pos = (vals[sel] << np.uint64(BITS_IDX)) >> np.uint64(BITS_IDX_FLAGS)
        pos_all.append(pos)
    pos = np.sort(np.concatenate(pos_all).astype(np.int64))
    gaps = np.diff(np.unique(pos))
    # the reference guarantees gaps <= seed_max_desert after filling except in
    # repetitive/filtered regions; allow a little slack
    frac_ok = float((gaps <= opt.seed_max_desert).mean())
    assert frac_ok > 0.95, f"only {frac_ok:.2%} of gaps <= {opt.seed_max_desert}"


def test_filter_kmer_freq_matches_bruteforce():
    """Vectorized first-max_freq-per-(mask,kmer) filter equals the dict loop
    (ref: lib-index-build.go:737-750)."""
    from lexicmap_tpu.index.build import _filter_kmer_freq

    rng = np.random.default_rng(7)
    n = 5000
    masks = rng.integers(0, 37, n).astype(np.int64)
    kmers = rng.integers(0, 11, n).astype(np.uint64)
    for max_freq in (1, 2, 5):
        got = _filter_kmer_freq(masks, kmers, max_freq)
        seen: dict = {}
        want = np.ones(n, dtype=bool)
        for i, (m, km) in enumerate(zip(masks, kmers)):
            c = seen.get((int(m), int(km)), 0) + 1
            seen[(int(m), int(km))] = c
            if c > max_freq:
                want[i] = False
        assert np.array_equal(got, want)
    assert _filter_kmer_freq(np.empty(0, np.int64), np.empty(0, np.uint64), 1).shape == (0,)


@pytest.mark.parametrize("mode", ["p8", "distinct", "group"])
def test_fill_deserts_native_matches_python(mode):
    """Native fill_deserts == Python fill_deserts under all capture modes
    (p8 / distinct-prefix / group-prefix candidacy; ref: lexichash
    MaskKnownDistinctPrefixes, lib-index-build.go:1196)."""
    from lexicmap_tpu.index.build import fill_deserts
    from lexicmap_tpu.native import fill_deserts_native_call
    from lexicmap_tpu.utils.kmers import kmers_fwd_rc

    rng = np.random.default_rng(11)
    k = 31
    ms = MaskSet.generate(k, 512, seed=1)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    fwd, rc = kmers_fwd_rc(codes, k)
    opt = BuildOptions(
        desert_capture_distinct=(mode == "distinct"),
        desert_capture_group=(mode == "group"),
    )
    # sparse main seeds so there are plenty of deserts
    locs = np.sort(rng.choice(len(fwd), 60, replace=False)).astype(np.uint32) << np.uint32(1)
    py = fill_deserts(ms, fwd, rc, locs, None, opt)
    nat = fill_deserts_native_call(
        fwd, rc, locs, None, ms.masks, k, ms.distinct_prefix_len,
        opt.seed_max_desert, opt.seed_in_desert_dist, opt.desert_seed_pos_range,
        flags=(2 if mode == "distinct" else 0) | (4 if mode == "group" else 0),
    )
    if nat is None:
        pytest.skip("native lib unavailable")
    assert len(py) > 50
    assert [tuple(t) for t in nat] == [tuple(t) for t in py]
