"""On-disk index: columnar seed store + 2-bit genome store.

Replaces the reference's formats with fixed-width, memory-mappable arrays:

- The reference kv format (ref: cmd/kv/kv-data.go:70-137) stores per-mask
  sorted k-mers as delta-encoded VARINT-GB pairs plus an anchor ``.idx`` file
  for O(1) range entry.  Here every seed chunk is a directory of plain .npy
  arrays, sorted by (mask, k-mer): binary search IS the anchor index, the
  arrays mmap straight into host RAM, and a shard (a contiguous mask range)
  uploads to TPU HBM without any decoding step.

- The reference genome store (ref: cmd/genome/genome.go:216-355) interleaves
  per-genome records with an offset index; here the 2-bit data is one flat
  blob plus offset arrays.

Directory layout (<db>/):
    info.json
    masks.bin
    seeds/chunk_000/{kmers,entry_offsets,values,mask_offsets,meta}.npy
    genomes/batch_0000/{seq2bit.npy,offsets.npy,...,ids.tsv}
    genomes.map.tsv
    genomes.chunks.json
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from .. import FORMAT_MAIN_VERSION, FORMAT_MINOR_VERSION

FILE_INFO = "info.json"
FILE_MASKS = "masks.bin"
DIR_SEEDS = "seeds"
DIR_GENOMES = "genomes"
FILE_GENOME_MAP = "genomes.map.tsv"
FILE_GENOME_CHUNKS = "genomes.chunks.json"


def batch_dir(batch: int) -> str:
    return f"batch_{batch:04d}"


def chunk_dir(chunk: int) -> str:
    return f"chunk_{chunk:03d}"


# --------------------------------------------------------------------------
# info file (ref: IndexInfo / info.toml, lib-index-build.go:1912-1930)


@dataclass
class IndexInfo:
    main_version: int = FORMAT_MAIN_VERSION
    minor_version: int = FORMAT_MINOR_VERSION
    k: int = 31
    masks: int = 20000
    rand_seed: int = 1
    max_desert: int = 100
    seed_dist_in_desert: int = 50
    chunks: int = 1
    partitions: int = 4096
    input_genomes: int = 0
    input_bases: int = 0
    genomes: int = 0
    genome_batch_size: int = 0
    genome_batches: int = 1
    contig_interval: int = 1000
    soft_masking: bool = False
    max_kmer_freq: int = 0

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.__dict__, fh, indent=2)

    @classmethod
    def load(cls, path: str) -> "IndexInfo":
        with open(path) as fh:
            d = json.load(fh)
        info = cls()
        for k, v in d.items():
            setattr(info, k, v)
        return info


# --------------------------------------------------------------------------
# 2-bit packing


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack 2-bit codes (uint8 0..3) into bytes, 4 bases/byte, first base in
    the high bits."""
    n = codes.shape[0]
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    c = codes.reshape(-1, 4)
    return (c[:, 0] << 6) | (c[:, 1] << 4) | (c[:, 2] << 2) | c[:, 3]


def unpack_2bit(packed: np.ndarray, start: int, end: int) -> np.ndarray:
    """Decode codes for positions [start, end) from packed bytes."""
    b0 = start // 4
    b1 = (end + 3) // 4
    window = packed[b0:b1]
    out = np.empty(window.shape[0] * 4, dtype=np.uint8)
    try:
        from ..native import unpack_2bit_native

        native = unpack_2bit_native(window, out)
    except ImportError:  # pragma: no cover
        native = False
    if not native:
        out[0::4] = (window >> 6) & 3
        out[1::4] = (window >> 4) & 3
        out[2::4] = (window >> 2) & 3
        out[3::4] = window & 3
    off = start - b0 * 4
    return out[off : off + (end - start)]


# --------------------------------------------------------------------------
# genome store


class GenomeStoreWriter:
    """Accumulates genomes of one batch and writes the columnar store."""

    def __init__(self, dir_path: str, batch: int):
        self.dir = dir_path
        self.batch = batch
        os.makedirs(dir_path, exist_ok=True)
        self._packed: list[np.ndarray] = []
        self._lens: list[int] = []  # concatenated length (with intervals)
        self._gsizes: list[int] = []  # sum of contig lengths
        self._ids: list[bytes] = []
        self._seq_sizes: list[list[int]] = []
        self._seq_ids: list[list[bytes]] = []

    def write(self, gid: bytes, codes: np.ndarray, seq_sizes: list[int], seq_ids: list[bytes]) -> int:
        idx = len(self._lens)
        self._packed.append(pack_2bit(codes))
        self._lens.append(int(codes.shape[0]))
        self._gsizes.append(int(sum(seq_sizes)))
        self._ids.append(gid)
        self._seq_sizes.append(list(seq_sizes))
        self._seq_ids.append(list(seq_ids))
        return idx

    def close(self) -> None:
        n = len(self._lens)
        seq2bit = np.concatenate(self._packed) if self._packed else np.empty(0, dtype=np.uint8)
        byte_lens = np.array([p.shape[0] for p in self._packed], dtype=np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(byte_lens, out=offsets[1:])
        ss_lens = np.array([len(s) for s in self._seq_sizes], dtype=np.int64)
        ss_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ss_lens, out=ss_off[1:])
        ss_flat = np.array(
            [x for s in self._seq_sizes for x in s], dtype=np.int64
        ) if n else np.empty(0, dtype=np.int64)

        np.save(os.path.join(self.dir, "seq2bit.npy"), seq2bit)
        np.save(os.path.join(self.dir, "byte_offsets.npy"), offsets)
        np.save(os.path.join(self.dir, "lens.npy"), np.array(self._lens, dtype=np.int64))
        np.save(os.path.join(self.dir, "gsizes.npy"), np.array(self._gsizes, dtype=np.int64))
        np.save(os.path.join(self.dir, "seq_sizes_flat.npy"), ss_flat)
        np.save(os.path.join(self.dir, "seq_sizes_offsets.npy"), ss_off)
        with open(os.path.join(self.dir, "ids.tsv"), "wb") as fh:
            for i in range(n):
                seqids = b"\x01".join(self._seq_ids[i])
                fh.write(self._ids[i] + b"\t" + seqids + b"\n")


@dataclass
class GenomeRecord:
    """Equivalent of genome.Genome as returned by Reader.SubSeq3
    (ref: cmd/genome/genome.go:73-102,930)."""

    id: bytes
    seq: bytes  # requested subsequence (decoded, ACGT)
    genome_size: int  # sum of contig sizes
    len: int  # concatenated length (with intervals)
    num_seqs: int
    seq_sizes: list[int]
    seq_ids: list[bytes]


class GenomeStoreReader:
    def __init__(self, dir_path: str):
        self.dir = dir_path
        self.seq2bit = np.load(os.path.join(dir_path, "seq2bit.npy"), mmap_mode="r")
        self.byte_offsets = np.load(os.path.join(dir_path, "byte_offsets.npy"))
        self.lens = np.load(os.path.join(dir_path, "lens.npy"))
        self.gsizes = np.load(os.path.join(dir_path, "gsizes.npy"))
        self.ss_flat = np.load(os.path.join(dir_path, "seq_sizes_flat.npy"))
        self.ss_off = np.load(os.path.join(dir_path, "seq_sizes_offsets.npy"))
        self.ids: list[bytes] = []
        self.seq_ids: list[list[bytes]] = []
        with open(os.path.join(dir_path, "ids.tsv"), "rb") as fh:
            for line in fh:
                gid, _, seqids = line.rstrip(b"\n").partition(b"\t")
                self.ids.append(gid)
                self.seq_ids.append(seqids.split(b"\x01") if seqids else [])

    def __len__(self) -> int:
        return int(self.lens.shape[0])

    def seq_sizes(self, idx: int) -> list[int]:
        return self.ss_flat[self.ss_off[idx] : self.ss_off[idx + 1]].tolist()

    def subseq_codes(self, idx: int, start: int, end: int) -> np.ndarray:
        """2-bit codes of concatenated-genome positions [start, end]
        (inclusive, clipped; ref: Reader.SubSeq3 semantics)."""
        glen = int(self.lens[idx])
        start = max(0, start)
        end = min(end, glen - 1)
        if end < start:
            return np.empty(0, dtype=np.uint8)
        packed = self.seq2bit[self.byte_offsets[idx] : self.byte_offsets[idx + 1]]
        return unpack_2bit(packed, start, end + 1)

    def subseq(self, idx: int, start: int, end: int) -> GenomeRecord:
        codes = self.subseq_codes(idx, start, end)
        seq = codes  # codes kept; decode to bytes at the caller if needed
        return GenomeRecord(
            id=self.ids[idx],
            seq=bytes(seq),  # NOTE: raw codes; use codes_to_seq for ASCII
            genome_size=int(self.gsizes[idx]),
            len=int(self.lens[idx]),
            num_seqs=int(self.ss_off[idx + 1] - self.ss_off[idx]),
            seq_sizes=self.seq_sizes(idx),
            seq_ids=self.seq_ids[idx],
        )


# --------------------------------------------------------------------------
# seed store


class SeedChunkWriter:
    """Writes one seed chunk: postings of masks [mask_begin, mask_end)."""

    def __init__(self, dir_path: str, mask_begin: int, mask_end: int):
        self.dir = dir_path
        self.mask_begin = mask_begin
        self.mask_end = mask_end
        os.makedirs(dir_path, exist_ok=True)

    def write(self, mask_ids: np.ndarray, kmers: np.ndarray, values: np.ndarray, order: np.ndarray) -> None:
        """Build sorted entry arrays from flat postings.

        mask_ids: absolute mask index per posting
        kmers:    packed k-mer per posting
        values:   64-bit posting payloads
        order:    emission sequence numbers for deterministic value order
                  (genome asc, fwd-captured < fwd-extra < rev < rev-extra;
                  mirrors the map-insertion order of ref lib-index-build.go
                  :696-890)
        """
        n = kmers.shape[0]
        if n:
            sort_idx = np.lexsort((order, kmers, mask_ids))
            mask_ids = mask_ids[sort_idx]
            kmers = kmers[sort_idx]
            values = values[sort_idx]
            # entry boundaries: where (mask, kmer) changes
            newe = np.empty(n, dtype=bool)
            newe[0] = True
            newe[1:] = (mask_ids[1:] != mask_ids[:-1]) | (kmers[1:] != kmers[:-1])
            entry_starts = np.nonzero(newe)[0]
            entry_kmers = kmers[entry_starts]
            entry_masks = mask_ids[entry_starts]
            entry_offsets = np.concatenate([entry_starts, [n]]).astype(np.int64)
        else:
            entry_kmers = np.empty(0, dtype=np.uint64)
            entry_masks = np.empty(0, dtype=np.int64)
            entry_offsets = np.zeros(1, dtype=np.int64)
            values = np.empty(0, dtype=np.uint64)

        nmask = self.mask_end - self.mask_begin
        mask_offsets = np.searchsorted(
            entry_masks, np.arange(self.mask_begin, self.mask_end + 1)
        ).astype(np.int64)

        np.save(os.path.join(self.dir, "kmers.npy"), entry_kmers.astype(np.uint64))
        np.save(os.path.join(self.dir, "entry_offsets.npy"), entry_offsets)
        np.save(os.path.join(self.dir, "values.npy"), values.astype(np.uint64))
        np.save(os.path.join(self.dir, "mask_offsets.npy"), mask_offsets)
        np.save(
            os.path.join(self.dir, "meta.npy"),
            np.array([self.mask_begin, self.mask_end], dtype=np.int64),
        )


class SeedChunkReader:
    """mmap-backed reader of one seed chunk; prefix/suffix range search lives
    in index/search.py."""

    def __init__(self, dir_path: str, mmap: bool = True):
        mode = "r" if mmap else None
        self.kmers = np.load(os.path.join(dir_path, "kmers.npy"), mmap_mode=mode)
        self.entry_offsets = np.load(os.path.join(dir_path, "entry_offsets.npy"), mmap_mode=mode)
        self.values = np.load(os.path.join(dir_path, "values.npy"), mmap_mode=mode)
        self.mask_offsets = np.load(os.path.join(dir_path, "mask_offsets.npy"), mmap_mode=mode)
        meta = np.load(os.path.join(dir_path, "meta.npy"))
        self.mask_begin = int(meta[0])
        self.mask_end = int(meta[1])

    def load_in_memory(self) -> None:
        """-w/--load-whole-seeds equivalent."""
        self.kmers = np.asarray(self.kmers)
        self.entry_offsets = np.asarray(self.entry_offsets)
        self.values = np.asarray(self.values)
        self.mask_offsets = np.asarray(self.mask_offsets)

    def n_entries(self) -> int:
        return int(self.kmers.shape[0])

    def n_values(self) -> int:
        return int(self.values.shape[0])


# --------------------------------------------------------------------------
# genome map + chunk lists


def write_genome_map(path: str, entries: list[tuple[bytes, int]]) -> None:
    """entries: (genome_id, batch<<BITS_GENOME_IDX | genome_idx)."""
    with open(path, "wb") as fh:
        for gid, code in entries:
            fh.write(gid + b"\t" + str(code).encode() + b"\n")


def read_genome_map(path: str) -> list[tuple[bytes, int]]:
    out = []
    with open(path, "rb") as fh:
        for line in fh:
            gid, _, code = line.rstrip(b"\n").partition(b"\t")
            out.append((gid, int(code)))
    return out


def write_genome_chunks(path: str, chunk_lists: list[list[int]]) -> None:
    with open(path, "w") as fh:
        json.dump(chunk_lists, fh)


def read_genome_chunks(path: str) -> list[list[int]]:
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)
