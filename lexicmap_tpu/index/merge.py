"""Merging per-batch sub-indexes (ref: lib-index-merge.go:40-348).

The reference stream-merges per-mask varint maps from all batch kv files.
With the columnar format, merging a seed chunk is: concatenate the per-batch
sorted posting arrays and stable-sort by (mask, k-mer) — batch order (and the
in-batch emission order) is preserved within equal keys, reproducing the
reference's append-to-map semantics.

The per-batch directories under `<outdir>.tmp/` double as the build's
checkpoint: `utils remerge` resumes an interrupted merge from them
(ref: re-merge.go:40, docs/content/faqs/_index.md:48-78).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from .store import (
    DIR_SEEDS,
    FILE_GENOME_CHUNKS,
    FILE_GENOME_MAP,
    SeedChunkReader,
    SeedChunkWriter,
    chunk_dir,
    read_genome_chunks,
    read_genome_map,
    write_genome_chunks,
    write_genome_map,
)


def merge_batches(tmp_dir: str, outdir: str, n_chunks: int) -> None:
    """Merge all batch sub-indexes in tmp_dir into outdir's seeds/ + maps."""
    batch_dirs = sorted(
        os.path.join(tmp_dir, d) for d in os.listdir(tmp_dir) if d.startswith("batch_")
    )
    if not batch_dirs:
        raise FileNotFoundError(f"no batch dirs in {tmp_dir}")

    os.makedirs(os.path.join(outdir, DIR_SEEDS), exist_ok=True)
    for c in range(n_chunks):
        mask_begin = mask_end = None
        entries_parts = []
        for b, bdir in enumerate(batch_dirs):
            rdr = SeedChunkReader(os.path.join(bdir, DIR_SEEDS, chunk_dir(c)), mmap=True)
            mask_begin, mask_end = rdr.mask_begin, rdr.mask_end
            ne = rdr.n_entries()
            # expand entries back to flat postings
            per = np.asarray(rdr.entry_offsets[1:]) - np.asarray(rdr.entry_offsets[:-1])
            mask_of_entry = np.repeat(
                np.arange(mask_begin, mask_end),
                np.asarray(rdr.mask_offsets[1:]) - np.asarray(rdr.mask_offsets[:-1]),
            )
            flat_masks = np.repeat(mask_of_entry, per)
            flat_kmers = np.repeat(np.asarray(rdr.kmers), per)
            flat_values = np.asarray(rdr.values)
            order = np.arange(flat_values.shape[0], dtype=np.int64) + (
                np.int64(b) << np.int64(48)
            )
            entries_parts.append((flat_masks, flat_kmers, flat_values, order))
        w = SeedChunkWriter(
            os.path.join(outdir, DIR_SEEDS, chunk_dir(c)), mask_begin, mask_end
        )
        w.write(
            np.concatenate([p[0] for p in entries_parts]),
            np.concatenate([p[1] for p in entries_parts]),
            np.concatenate([p[2] for p in entries_parts]),
            np.concatenate([p[3] for p in entries_parts]),
        )

    # concatenate genome maps and chunk lists
    map_entries = []
    chunk_lists = []
    for bdir in batch_dirs:
        map_entries.extend(read_genome_map(os.path.join(bdir, FILE_GENOME_MAP)))
        chunk_lists.extend(read_genome_chunks(os.path.join(bdir, FILE_GENOME_CHUNKS)))
    write_genome_map(os.path.join(outdir, FILE_GENOME_MAP), map_entries)
    write_genome_chunks(os.path.join(outdir, FILE_GENOME_CHUNKS), chunk_lists)


def remerge(outdir: str) -> None:
    """Resume/redo the merge step from `<outdir>.tmp` (ref: re-merge.go:40)."""
    tmp_dir = outdir.rstrip("/") + ".tmp"
    if not os.path.isdir(tmp_dir):
        raise FileNotFoundError(f"tmp dir not found: {tmp_dir}")
    # read batch metadata
    batch_dirs = sorted(
        os.path.join(tmp_dir, d) for d in os.listdir(tmp_dir) if d.startswith("batch_")
    )
    meta_path = os.path.join(tmp_dir, "merge_meta.json")
    if not os.path.exists(meta_path):
        # the build died during batch seeding, before the merge step started;
        # per-batch tmp dirs are incomplete and cannot be merged
        # (ref: docs/content/faqs/_index.md:48-78 — remerge resumes merging only)
        raise RuntimeError(
            f"{meta_path} not found: the build was interrupted BEFORE the "
            f"merge step (only {len(batch_dirs)} batch dirs present, possibly "
            "incomplete). remerge can only resume an interrupted MERGE; "
            "rerun the full `index` command instead."
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    merge_batches(tmp_dir, outdir, meta["chunks"])
    # rebuild info.json totals
    info_path = os.path.join(outdir, "info.json")
    with open(info_path) as fh:
        info = json.load(fh)
    info.update(meta.get("info_updates", {}))
    with open(info_path, "w") as fh:
        json.dump(info, fh, indent=2)
    shutil.rmtree(tmp_dir)
