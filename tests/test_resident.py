"""Device-side genome window extraction (parallel/resident.py) must be
bit-identical to the host path: pack_codes_2bit over GenomeStoreReader
subseq windows, both strands, including clipping and padding edges."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.index.store import GenomeStoreReader, GenomeStoreWriter
from lexicmap_tpu.parallel.pseudo_device import pack_codes_2bit
from lexicmap_tpu.parallel.resident import (
    DeviceGenomeBlob,
    extract_packed,
    normalize_blob,
    unpack_codes,
)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("gstore")
    w = GenomeStoreWriter(str(d), 0)
    rng = np.random.default_rng(7)
    lens = [1000, 37, 4096, 517]
    for i, L in enumerate(lens):
        codes = rng.integers(0, 4, L).astype(np.uint8)
        w.write(b"g%d" % i, codes, [L], [b"s%d" % i])
    w.close()
    return GenomeStoreReader(str(d))


def test_normalize_blob_roundtrip():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 64).astype(np.uint8)
    from lexicmap_tpu.index.store import pack_2bit

    norm = normalize_blob(pack_2bit(codes))
    # code i of word w at bits 2*(i%16)
    got = [(int(norm[i // 16]) >> (2 * (i % 16))) & 3 for i in range(64)]
    assert got == codes.tolist()


def _host_window(store, g, t0, t1, rc):
    codes = store.subseq_codes(g, t0, t1)
    if rc:
        codes = (np.uint8(3) - codes)[::-1]
    return codes


@pytest.mark.parametrize("words_out", [8, 256])
def test_extract_matches_host(store, words_out):
    blob = DeviceGenomeBlob([store])
    rng = np.random.default_rng(3)
    cases = []
    for g in range(len(store)):
        glen = int(store.lens[g])
        for _ in range(6):
            t0 = int(rng.integers(0, glen))
            t1 = min(int(t0 + rng.integers(1, 16 * words_out)), glen - 1)
            for rc in (False, True):
                cases.append((g, t0, t1, rc))
    # plus exact-boundary cases
    cases += [(0, 0, 15, False), (0, 0, 15, True), (2, 0, 16 * words_out - 1, False),
              (2, 4080, 4095, True), (1, 0, 36, True), (1, 0, 36, False)]
    cases = [c for c in cases if c[2] - c[1] + 1 <= 16 * words_out]

    wb = np.array([blob.geometry(0, g, t0, t1, rc, words_out)[0]
                   for g, t0, t1, rc in cases], dtype=np.int32)
    ph = np.array([blob.geometry(0, g, t0, t1, rc, words_out)[1]
                   for g, t0, t1, rc in cases], dtype=np.int32)
    ln = np.array([t1 - t0 + 1 for _, t0, t1, _ in cases], dtype=np.int32)
    rcs = np.array([rc for *_, rc in cases], dtype=bool)

    got = np.asarray(
        jax.jit(extract_packed, static_argnums=5)(
            blob.d_blob, wb, ph, ln, rcs, words_out
        )
    )
    for i, (g, t0, t1, rc) in enumerate(cases):
        want = pack_codes_2bit(_host_window(store, g, t0, t1, rc), 16 * words_out)
        assert np.array_equal(got[i], want), (i, cases[i])


def test_unpack_codes(store):
    blob = DeviceGenomeBlob([store])
    g, t0, t1 = 2, 100, 1000
    wb, ph, ln = blob.geometry(0, g, t0, t1, False, 64)
    packed = jax.jit(extract_packed, static_argnums=5)(
        blob.d_blob,
        np.array([wb], np.int32), np.array([ph], np.int32),
        np.array([ln], np.int32), np.array([False]), 64,
    )
    codes = np.asarray(unpack_codes(packed))[0]
    want = store.subseq_codes(g, t0, t1)
    assert np.array_equal(codes[: want.shape[0]], want)
    assert (codes[want.shape[0]:] == 0).all()


def test_multi_store_code_base(tmp_path):
    """Second batch store's windows resolve through store_code_base."""
    rng = np.random.default_rng(11)
    stores = []
    for b in range(2):
        d = tmp_path / f"b{b}"
        w = GenomeStoreWriter(str(d), b)
        for i in range(2):
            L = int(rng.integers(50, 300))
            w.write(b"g", rng.integers(0, 4, L).astype(np.uint8), [L], [b"s"])
        w.close()
        stores.append(GenomeStoreReader(str(d)))
    blob = DeviceGenomeBlob(stores)
    for b in range(2):
        for g in range(2):
            glen = int(stores[b].lens[g])
            t0, t1 = 3, glen - 2
            for rc in (False, True):
                wb, ph, ln = blob.geometry(b, g, t0, t1, rc, 32)
                got = np.asarray(
                    jax.jit(extract_packed, static_argnums=5)(
                        blob.d_blob,
                        np.array([wb], np.int32), np.array([ph], np.int32),
                        np.array([ln], np.int32), np.array([rc]), 32,
                    )
                )[0]
                want = pack_codes_2bit(_host_window(stores[b], g, t0, t1, rc), 512)
                assert np.array_equal(got, want)
