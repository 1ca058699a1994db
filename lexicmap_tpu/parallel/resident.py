"""HBM-resident genome store: device-side window/span extraction.

The round-4 transport audit showed the device engine losing the many-hit
regime 4x because every pseudo-align window and every WFA span is packed on
the host and re-uploaded through the ~40 MB/s tunnel (MB-scale payloads,
3-4 times per batch).  But every one of those payloads is a subsequence of
the 2-bit genome store the index already owns — so the device can hold the
packed genome blobs in HBM ONCE and extract windows/spans from geometry
(a few ints per window) instead of receiving their bytes.

Layout:
  - each genome-store batch's `seq2bit` byte blob (4 codes/byte, MSB-first
    per byte; index/store.py:pack_2bit) is NORMALIZED on the host to
    LSB-first u32 words (code i of a word at bits 2i — the exact layout of
    pseudo_device.pack_codes_2bit) via a 256-entry byte LUT, padded to a
    word boundary, and concatenated into one device u32 array.
  - a window is addressed by its GLOBAL CODE INDEX
    base = (store_byte_base[batch] + byte_offsets[gidx]) * 4 + position.
    The host hands the device (word_base = base >> 4, phase = base & 15,
    length, rc) — 16 bytes per window instead of the window itself.

Extraction (`extract_packed`, pure jnp, inlined into consumer jits):
  gather words word_base+j (contiguous runs — an embedding-style gather),
  funnel-shift by the per-window phase, optionally reverse-complement
  (16x2-bit in-word reversal by shift/mask + word flip + NOT), then mask
  codes >= length to 0.  Output is bit-identical to
  pack_codes_2bit(host_window, 16*words_out).

Reverse-complement windows are addressed from their END:
  base = global_end - (16*words_out - 1), so the span occupies codes
  [0, length) after the in-block reversal — matching the host's
  `(3 - codes)[::-1]` window construction (index/search.py:_path_windows).

ref: lib-index-search.go:1997 (SubSeq3 target extraction feeding both the
pseudo-alignment and the WFA windows); genome.go:1472 (2-bit packing).
"""

from __future__ import annotations

import numpy as np

# byte LUT: reverse the four 2-bit groups of a byte (MSB-first per byte ->
# LSB-first), so a little-endian u32 view has code i at bits 2i
_LUT = np.array(
    [
        ((b >> 6) & 3) | (((b >> 4) & 3) << 2) | (((b >> 2) & 3) << 4) | ((b & 3) << 6)
        for b in range(256)
    ],
    dtype=np.uint8,
)


def normalize_blob(seq2bit: np.ndarray) -> np.ndarray:
    """MSB-first-per-byte 2-bit blob -> LSB-first u32 words (host, once)."""
    nb = _LUT[np.asarray(seq2bit, dtype=np.uint8)]
    pad = (-nb.shape[0]) % 4
    if pad:
        nb = np.concatenate([nb, np.zeros(pad, dtype=np.uint8)])
    return nb.view("<u4")


def extract_packed(blob, word_base, phase, length, rc, words_out: int):
    """[B] geometry -> [B, words_out] u32 LSB-first packed codes.

    blob [NW] u32 (normalized); word_base/phase/length [B] i32; rc [B] bool.
    Codes at positions >= length are 0 (the pack_codes_2bit pad value)."""
    import jax.numpy as jnp

    j = jnp.arange(words_out + 1, dtype=jnp.int32)[None, :]
    wi = jnp.clip(word_base[:, None] + j, 0, blob.shape[0] - 1)
    raw = blob[wi]  # [B, words_out+1] contiguous-run gather

    sh = (2 * phase[:, None]).astype(jnp.uint32)
    hi = jnp.where(sh > 0, raw[:, 1:] << ((jnp.uint32(32) - sh) & jnp.uint32(31)),
                   jnp.uint32(0))
    a = (raw[:, :-1] >> sh) | hi  # [B, words_out], phase-aligned

    # reverse-complement: reverse the 16 2-bit groups in each word
    # (pair/nibble/byte/halfword swaps), flip word order, complement
    x = a
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    a_rc = (~x)[:, ::-1]
    a = jnp.where(rc[:, None], a_rc, a)

    # zero codes past length
    jj = jnp.arange(words_out, dtype=jnp.int32)[None, :]
    lw = (length >> 4)[:, None]
    lr = (length & 15)[:, None].astype(jnp.uint32)
    pmask = (jnp.uint32(1) << (2 * lr)) - jnp.uint32(1)
    wmask = jnp.where(
        jj < lw, jnp.uint32(0xFFFFFFFF), jnp.where(jj == lw, pmask, jnp.uint32(0))
    )
    return a & wmask


def unpack_codes(packed):
    """[B, W] u32 LSB-first packed -> [B, 16*W] int32 codes 0..3."""
    import jax.numpy as jnp

    B, W = packed.shape
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    return (
        ((packed[:, :, None] >> shifts) & jnp.uint32(3))
        .astype(jnp.int32)
        .reshape(B, 16 * W)
    )


class DeviceGenomeBlob:
    """All genome-store batches of an index, resident in HBM as one
    normalized u32 array, plus the host-side geometry arithmetic."""

    def __init__(self, genome_stores, mesh=None):
        from . import count_h2d, ensure_jax

        ensure_jax()
        import jax
        import jax.numpy as jnp

        parts = []
        self.store_code_base = []  # per batch: global code index of byte 0
        code_base = 0
        for store in genome_stores:
            self.store_code_base.append(code_base)
            norm = normalize_blob(np.asarray(store.seq2bit))
            parts.append(norm)
            code_base += norm.shape[0] * 16  # padded to a word boundary
        blob = (
            np.concatenate(parts) if parts else np.zeros(1, dtype=np.uint32)
        )
        self.n_words = int(blob.shape[0])
        self.hbm_bytes = self.n_words * 4
        count_h2d("resident genome blob", blob)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.d_blob = jax.device_put(blob, NamedSharding(mesh, P()))
        else:
            self.d_blob = jnp.asarray(blob)
        # per-batch byte offsets for code_base()
        self._byte_offsets = [np.asarray(s.byte_offsets) for s in genome_stores]

    def code_base(self, batch: int, gidx: int) -> int:
        """Global code index of position 0 of a genome (host arithmetic)."""
        return self.store_code_base[batch] + int(self._byte_offsets[batch][gidx]) * 4

    def geometry(self, batch: int, gidx: int, t_begin: int, t_end: int,
                 rc: bool, words_out: int):
        """(word_base, phase, length) for extract_packed; t_begin/t_end are
        inclusive concatenated-genome positions (already clipped)."""
        gb = self.code_base(batch, gidx)
        length = t_end - t_begin + 1
        base = gb + t_end - (16 * words_out - 1) if rc else gb + t_begin
        return base >> 4, base & 15, length
