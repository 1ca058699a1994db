"""FASTA/FASTQ reading (plain, gzip, bzip2, xz) — host-side input pipeline.

Replaces the reference's shenwei356/bio/seqio/fastx + xopen usage
(ref: lib-index-build.go:1516, search.go:557).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import os
from dataclasses import dataclass
from typing import Iterator


@dataclass
class Record:
    id: bytes  # first word of the header
    desc: bytes  # full header line (without '>')
    seq: bytes


def _open_maybe_compressed(path: str):
    with open(path, "rb") as fh:
        magic = fh.read(6)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb")
    if magic[:3] == b"BZh":
        return bz2.open(path, "rb")
    if magic[:6] == b"\xfd7zXZ\x00":
        return lzma.open(path, "rb")
    return open(path, "rb")


def read_fastx(path_or_fh) -> Iterator[Record]:
    """Iterate records of a FASTA or FASTQ file (autodetected)."""
    if isinstance(path_or_fh, (str, os.PathLike)):
        fh = _open_maybe_compressed(str(path_or_fh))
        own = True
    else:
        fh = path_or_fh
        own = False
    try:
        buf = io.BufferedReader(fh) if not isinstance(fh, io.BufferedReader) else fh
        first = buf.peek(1)[:1]
        if first == b"@":
            yield from _read_fastq(buf)
        else:
            yield from _read_fasta(buf)
    finally:
        if own:
            fh.close()


def _read_fasta(fh) -> Iterator[Record]:
    header = None
    chunks: list[bytes] = []
    for line in fh:
        line = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            if header is not None:
                yield _make_record(header, chunks)
            header = line[1:]
            chunks = []
        elif line:
            chunks.append(line)
    if header is not None:
        yield _make_record(header, chunks)


def _read_fastq(fh) -> Iterator[Record]:
    while True:
        h = fh.readline()
        if not h:
            return
        h = h.rstrip(b"\r\n")
        if not h:
            continue
        seq = fh.readline().rstrip(b"\r\n")
        fh.readline()  # +
        fh.readline()  # qual
        yield _make_record(h[1:], [seq])


def _make_record(header: bytes, chunks: list[bytes]) -> Record:
    seq = b"".join(chunks)
    rid = header.split(None, 1)[0] if header else b""
    return Record(id=rid, desc=header, seq=seq)


def write_fasta(fh, rid: bytes, seq: bytes, width: int = 70) -> None:
    fh.write(b">" + rid + b"\n")
    for i in range(0, len(seq), width):
        fh.write(seq[i : i + width] + b"\n")


# file discovery (ref: lexicmap/cmd/index.go:390-401, util.go helpers)

_FASTX_EXTS = (
    ".fa", ".fasta", ".fna", ".fq", ".fastq",
    ".fa.gz", ".fasta.gz", ".fna.gz", ".fq.gz", ".fastq.gz",
    ".fa.xz", ".fasta.xz", ".fna.xz", ".fa.bz2", ".fasta.bz2", ".fna.bz2",
    ".fa.zst", ".fasta.zst", ".fna.zst",
)


def genome_id_from_filename(path: str) -> str:
    """Genome ID = file basename with common FASTA/Q extensions removed
    (ref: index.go -N/--ref-name-regexp default)."""
    base = os.path.basename(path)
    low = base.lower()
    for ext in sorted(_FASTX_EXTS, key=len, reverse=True):
        if low.endswith(ext):
            return base[: -len(ext)]
    return os.path.splitext(base)[0]


def find_fastx_files(in_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(in_dir):
        for f in sorted(files):
            low = f.lower()
            if any(low.endswith(e) for e in _FASTX_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)
