"""Device (TPU) LexicHash capture for the index BUILD side.

The host build capture is a C++ trie co-descent (native capture_native,
mirroring lexichash MaskKnownDistinctPrefixes at lib-index-build.go:1026).
This module re-derives it TPU-first as sort + segmented scans over the
whole genome:

  1. 2-bit packed genome codes -> per-position fwd/rc k-mers as (hi, lo)
     uint32 pairs via shift-compose (no per-position loops).
  2. Union records = mask records (tagged 0) + k-mer records (tagged 1),
     sorted by the DISTINCT-PREFIX bucket id.  Masks have unique distinct
     prefixes, so a segmented forward fill carries each bucket's mask
     (hi, lo, idx) onto its k-mer lanes — the gather-free sort-join used
     by the search-side probe (pseudo_device.py).
  3. Second sort by (bucket, kmer XOR mask): each bucket's head is the
     capture winner; the run of equal-XOR lanes at the head holds ALL
     winner positions (equal XOR <=> equal k-mer).
  4. A second segmented fill marks winner-position lanes, and a final sort
     compacts them to a fixed-size output block.

Genomes longer than one slab are processed in overlapping slabs (k-1
base overlap) and combined exactly on the host: winners compare by
(kmer XOR mask), equal winners concatenate positions.  Desert filling and
the reversed-k-mer (suffix) dispatch stay host-side for bit-exact parity
(VERDICT round-2 item 6; ref: lib-index-build.go:1084-1405, 804-888).

Exactness: results are combined/validated against the host capture by
tests/test_build_device.py; any slab overflowing the output cap falls back
to the host path for that genome.
"""

from __future__ import annotations

import numpy as np

import os as _os

# k-mer positions per device slab (4.19 Mb); env-overridable so CPU-backend
# tests can use small shapes (the CPU XLA compile of full-slab sorts is slow)
SLAB = int(_os.environ.get("LEXICMAP_TPU_CAPTURE_SLAB", 1 << 22))
C_TOTAL = 1 << 16  # compacted winner-position lanes per slab
INV32 = np.uint32(0xFFFFFFFF)
# left margin per slab: the rc shift-compose chains read acc values up to 15
# lanes BELOW the position (and rlo another 16 via rhi[i-16]), so positions
# in the first 31 lanes of a slab would read A-padding; every slab therefore
# carries 32 lead bases and validity starts at lane EDGE
EDGE = 32


def _get_jnp():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def build_capture_fn(k: int, prefix_len: int, m_pad: int):
    """Jitted slab capture.

    Inputs:
      packed   [SLAB//16 + 2] u32  (2-bit codes, 16/lane, slab + k-1 overlap)
      nk       i32                 (# valid k-mer positions in this slab)
      excl     [SLAB//32] u32      (1 bit per position: excluded)
      mask_hi, mask_lo [m_pad] u32 (PAD = INV32)
      mask_valid [m_pad] bool
    Outputs (compacted, winner-position lanes first):
      midx [C_TOTAL] u32 (INV32 pad), kh/kl [C_TOTAL] u32,
      aux [C_TOTAL] u32 (pos<<1|strand), n_out i32 (total winner lanes;
      > C_TOTAL means overflow -> host fallback)
    """
    jax, jnp = _get_jnp()
    lax = jax.lax

    P_SHIFT = np.uint32(32 - 2 * prefix_len)  # bucket id from the hi word

    def fn(packed, nk, excl, mask_hi, mask_lo, mask_valid):
        # ---- codes -> kmers (hi/lo u32), both strands ----
        shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, :]
        codes = ((packed[:, None] >> shifts) & jnp.uint32(3)).reshape(-1)
        L = codes.shape[0]

        # fwd kmer hi = bases[i..i+16) MSB-first, by shift-compose
        # (log-doubling): value[i] = sum codes[i+j] << (2*(width-1-j))
        def compose2(width):
            acc = codes
            w = 1
            while w < width:
                t = min(w, width - w)
                # acc2[i] = acc[i] << (2t) | acc_t[i + w] (t-wide prefix of the
                # suffix starting at i+w)
                shifted = jnp.concatenate([acc[w:], jnp.zeros(w, jnp.uint32)])
                if t < w:
                    shifted = shifted >> jnp.uint32(2 * (w - t))
                acc = (acc << jnp.uint32(2 * t)) | shifted
                w += t
            return acc

        hi16 = compose2(16)  # first 16 bases at each position
        # lo: bases i+16 .. i+k-1 (k-16 bases), left-aligned in 32 bits
        lo_w = k - 16
        lo_raw = jnp.concatenate([hi16[16:], jnp.zeros(16, jnp.uint32)])
        # hi16[i+16] holds bases i+16..i+31 (16 bases); keep top lo_w, left-al.
        flo = (lo_raw >> jnp.uint32(2 * (16 - lo_w))) << jnp.uint32(2 * (16 - lo_w))
        fhi = hi16

        # rc kmers: complement = 3 - c; rc kmer at pos i = reverse complement
        # of codes[i..i+k); compute via composing complemented-reversed codes:
        # rc_hi16[i] = first 16 bases of rc = complement of codes[i+k-1 .. i+k-16]
        ccodes = jnp.uint32(3) - codes

        def compose_rev(width):
            # value[i] = sum ccodes[i + k - 1 - j] << (2*(width-1-j)), j=0..w-1
            acc = jnp.concatenate(
                [ccodes[k - 1 :], jnp.zeros(k - 1, jnp.uint32)]
            )
            w = 1
            while w < width:
                t = min(w, width - w)
                # next element is at i + k - 1 - w -> index shift NEGATIVE
                shifted = jnp.concatenate([jnp.zeros(w, jnp.uint32), acc])[:L]
                # acc currently holds w bases starting (descending) at k-1-0;
                # the continuation starts at offset -w in i
                if t < w:
                    shifted = shifted >> jnp.uint32(2 * (w - t))
                acc = (acc << jnp.uint32(2 * t)) | shifted
                w += t
            return acc

        rhi = compose_rev(16)
        rlo_raw = jnp.concatenate([jnp.zeros(16, jnp.uint32), rhi])[:L]
        rlo = (rlo_raw >> jnp.uint32(2 * (16 - lo_w))) << jnp.uint32(2 * (16 - lo_w))

        pos = jnp.arange(L, dtype=jnp.uint32)
        # unpack exclusion bits elementwise (no gather: TPUs hate gathers);
        # bit j of word w = slab position 32w + j = lane EDGE + 32w + j
        bitpos = jnp.arange(32, dtype=jnp.uint32)[None, :]
        exbits = ((excl[:, None] >> bitpos) & jnp.uint32(1)).reshape(-1)
        exbits = jnp.concatenate(
            [jnp.zeros(EDGE, jnp.uint32), exbits]
        )
        exbits = jnp.concatenate(
            [exbits, jnp.zeros(L - exbits.shape[0], jnp.uint32)]
        ) if exbits.shape[0] < L else exbits[:L]
        valid = (
            (pos >= jnp.uint32(EDGE))
            & (pos < jnp.uint32(EDGE) + nk.astype(jnp.uint32))
            & (exbits == 0)
        )

        # ---- union records ----
        mk = jnp.where(mask_valid, mask_hi >> P_SHIFT, INV32)
        m_key = jnp.where(mask_valid, (mk << jnp.uint32(1)), INV32)
        f_key = jnp.where(valid, ((fhi >> P_SHIFT) << jnp.uint32(1)) | jnp.uint32(1), INV32)
        r_key = jnp.where(valid, ((rhi >> P_SHIFT) << jnp.uint32(1)) | jnp.uint32(1), INV32)

        key = jnp.concatenate([m_key, f_key, r_key])
        kh = jnp.concatenate([mask_hi, fhi, rhi])
        kl = jnp.concatenate([mask_lo, flo, rlo])
        aux = jnp.concatenate(
            [jnp.arange(m_pad, dtype=jnp.uint32),  # mask lanes: mask idx
             (pos << jnp.uint32(1)),
             (pos << jnp.uint32(1)) | jnp.uint32(1)]
        )
        key, kh, kl, aux = lax.sort((key, kh, kl, aux), dimension=0,
                                    num_keys=1, is_stable=True)

        n_rec = key.shape[0]

        def shr(x, d, fill):
            return jnp.concatenate([jnp.full((d,), fill, x.dtype), x[:-d]])

        # segmented fill: carry the bucket's mask (hi, lo, idx) forward
        bucket = key >> jnp.uint32(1)
        is_m = ((key & jnp.uint32(1)) == 0) & (key != INV32)
        have = is_m
        mh, ml, mi = kh, kl, aux
        d = 1
        while d < n_rec:
            same = shr(bucket, d, INV32) == bucket
            sh = same & shr(have, d, False)
            take = sh & (~have)
            mh = jnp.where(take, shr(mh, d, INV32), mh)
            ml = jnp.where(take, shr(ml, d, INV32), ml)
            mi = jnp.where(take, shr(mi, d, INV32), mi)
            have = have | sh
            d *= 2

        is_k = ((key & jnp.uint32(1)) == 1) & (key != INV32)
        live = is_k & have
        xh = jnp.where(live, kh ^ mh, INV32)
        xl = jnp.where(live, kl ^ ml, INV32)
        b2 = jnp.where(live, bucket, INV32)

        # ---- second sort by (bucket, xor); winners head each bucket ----
        b2, xh, xl, aux2, mi2, kh2, kl2 = lax.sort(
            (b2, xh, xl, aux, mi, kh, kl), dimension=0, num_keys=3,
            is_stable=True,
        )
        first = jnp.concatenate(
            [jnp.array([True]), b2[1:] != b2[:-1]]
        ) & (b2 != INV32)
        # carry the bucket head's xor down the bucket; winner lanes match it
        wxh, wxl = xh, xl
        have2 = first
        d = 1
        while d < n_rec:
            same = shr(b2, d, INV32) == b2
            sh2 = same & shr(have2, d, False)
            take = sh2 & (~have2)
            wxh = jnp.where(take, shr(wxh, d, INV32), wxh)
            wxl = jnp.where(take, shr(wxl, d, INV32), wxl)
            have2 = have2 | sh2
            d *= 2
        winner = (b2 != INV32) & (xh == wxh) & (xl == wxl)

        n_out = jnp.sum(winner.astype(jnp.int32))
        # ---- compact: winner lanes first, ordered (mask, pos) ----
        ck = jnp.where(winner, mi2, INV32)
        ck, c_aux, c_kh, c_kl = lax.sort(
            (ck, aux2, kh2, kl2), dimension=0, num_keys=2, is_stable=False
        )
        return (ck[:C_TOTAL], c_kh[:C_TOTAL], c_kl[:C_TOTAL],
                c_aux[:C_TOTAL], n_out)

    return fn


class DeviceCaptureEngine:
    """Per-genome LexicHash capture on the device, bit-exact with the host
    trie co-descent (combined across slabs on the host)."""

    def __init__(self, mask_set, interpret: bool | None = None):
        from . import ensure_jax

        ensure_jax()
        import jax

        self.ms = mask_set
        self.k = mask_set.k
        # the union sort key is (bucket << 1) | tag in uint32, so the bucket
        # id needs 2*p + 1 <= 32 bits (p == 16 would overflow and collide
        # with the INV32 sentinel)
        if 2 * mask_set.distinct_prefix_len >= 32:
            raise ValueError("distinct prefix beyond the device key width")
        self.m = mask_set.m
        self.m_pad = ((self.m + 1023) // 1024) * 1024
        from .pallas_kernels import split_kmers_hi_lo

        hi, lo = split_kmers_hi_lo(mask_set.masks, self.k)
        mh = np.full(self.m_pad, INV32, dtype=np.uint32)
        ml = np.full(self.m_pad, INV32, dtype=np.uint32)
        mv = np.zeros(self.m_pad, dtype=bool)
        mh[: self.m] = hi
        ml[: self.m] = lo
        mv[: self.m] = True
        self._margs = (jax.device_put(mh), jax.device_put(ml), jax.device_put(mv))
        self._fn = jax.jit(
            build_capture_fn(self.k, mask_set.distinct_prefix_len, self.m_pad)
        )

    def capture(self, codes: np.ndarray, exclude: np.ndarray | None):
        """codes uint8 [L]; exclude bool [L-k+1] or None.
        Returns (kmers [m] u64, counts [m] i64, pos_flat u32 sorted per mask)
        exactly like native capture_native, or None on overflow."""
        import jax

        k = self.k
        L = codes.shape[0]
        nk_total = L - k + 1
        if nk_total <= 0:
            return None
        per_mask: dict[int, tuple[int, list]] = {}

        for s0 in range(0, nk_total, SLAB):
            ns = min(SLAB, nk_total - s0)
            # slab codes: EDGE lead bases + SLAB + k - 1 bases, A-padded
            span = np.zeros(EDGE + SLAB + 32, dtype=np.uint8)
            lead = min(EDGE, s0)
            avail = min(SLAB + k - 1, L - s0)
            span[EDGE - lead : EDGE + avail] = codes[s0 - lead : s0 + avail]
            packed = np.zeros((EDGE + SLAB + 32) // 16, dtype=np.uint32)
            for j in range(16):
                packed |= span[j::16].astype(np.uint32) << np.uint32(2 * j)
            exw = np.zeros(SLAB // 32, dtype=np.uint32)
            if exclude is not None:
                ex = np.zeros(SLAB, dtype=bool)
                hi_ = min(ns, exclude.shape[0] - s0)
                if hi_ > 0:
                    ex[:hi_] = exclude[s0 : s0 + hi_]
                for j in range(32):  # bit j of word w = slab position 32w + j
                    exw |= ex[j::32].astype(np.uint32) << np.uint32(j)
            ck, c_kh, c_kl, c_aux, n_out = jax.device_get(
                self._fn(packed, np.int32(ns), exw, *self._margs)
            )
            if int(n_out) > C_TOTAL:
                return None  # overflow: caller uses the host capture
            n = int(n_out)
            for i in range(n):
                mi = int(ck[i])
                if mi >= self.m:
                    break
                kmer = (np.uint64(c_kh[i]) << np.uint64(2 * k - 32)) | (
                    np.uint64(c_kl[i]) >> np.uint64(32 - 2 * (k - 16))
                )
                gpos = s0 + (int(c_aux[i]) >> 1) - EDGE
                loc = (gpos << 1) | (int(c_aux[i]) & 1)
                cur = per_mask.get(mi)
                if cur is None:
                    per_mask[mi] = (int(kmer), [loc])
                else:
                    ck_old, locs = cur
                    xo = ck_old ^ int(self.ms.masks[mi])
                    xn = int(kmer) ^ int(self.ms.masks[mi])
                    if xn < xo:
                        per_mask[mi] = (int(kmer), [loc])
                    elif xn == xo:
                        locs.append(loc)

        kmers = np.zeros(self.m, dtype=np.uint64)
        counts = np.zeros(self.m, dtype=np.int64)
        blocks = []
        for mi in range(self.m):
            cur = per_mask.get(mi)
            if cur is None:
                continue
            kmer, locs = cur
            kmers[mi] = kmer
            counts[mi] = len(locs)
            blocks.append(np.sort(np.array(locs, dtype=np.uint32)))
        pos_flat = (
            np.concatenate(blocks) if blocks else np.empty(0, dtype=np.uint32)
        )
        return kmers, counts, pos_flat
