"""Device build capture must equal the host trie co-descent exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lexicmap_tpu.index.build import BuildOptions
from lexicmap_tpu.masks import MaskSet
from lexicmap_tpu.native import capture_native_call, get_lib
from lexicmap_tpu.parallel.build_device import DeviceCaptureEngine
from lexicmap_tpu.utils.kmers import kmers_fwd_rc

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@pytest.fixture(scope="module")
def ms():
    return MaskSet.generate(31, 512, 1)


def _host_capture(ms, codes, exclude):
    fwd, rc = kmers_fwd_rc(codes, ms.k)
    kmers, counts, pos_flat = capture_native_call(
        fwd, rc, exclude, ms.masks, ms.k, ms.distinct_prefix_len, False
    )
    return kmers, counts, pos_flat


def _check(ms, codes, exclude=None):
    dev = DeviceCaptureEngine(ms)
    got = dev.capture(codes, exclude)
    assert got is not None
    k_d, c_d, p_d = got
    k_h, c_h, p_h = _host_capture(ms, codes, exclude)
    assert (c_d == c_h).all(), np.nonzero(c_d != c_h)[0][:5]
    # kmers compare only where captured
    sel = c_h > 0
    assert (k_d[sel] == k_h[sel]).all()
    assert p_d.shape == p_h.shape
    assert (p_d == p_h).all()


def test_random_genome(ms):
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, size=80_000, dtype=np.uint8)
    _check(ms, codes)


def test_slab_edge_positions():
    """rc shift-compose reads lanes below the position; the EDGE margin must
    make every slab-relative position exact — including genome position 0
    and the first positions of later slabs (the round-3 demo-build bug was
    an A-padded rc tail at slab position 19)."""
    from lexicmap_tpu.parallel import build_device

    old = build_device.SLAB
    build_device.SLAB = 1 << 14
    try:
        ms2 = MaskSet.generate(31, 64, 1)
        rng = np.random.default_rng(35)
        codes = rng.integers(0, 4, size=3 * (1 << 14) + 777, dtype=np.uint8)
        # plant strong winners ON the slab boundaries (both strands read
        # across them)
        for s in (1 << 14, 2 << 14):
            codes[s - 15 : s + 16] = rng.integers(0, 4, size=31)
        _check(ms2, codes)
    finally:
        build_device.SLAB = old


def test_with_exclusions_and_repeats(ms):
    rng = np.random.default_rng(32)
    codes = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    # repeated block: winner kmers with multiple positions
    codes[30_000:31_000] = codes[10_000:11_000]
    codes[45_000:45_500] = codes[10_000:10_500]
    exclude = np.zeros(codes.shape[0] - ms.k + 1, dtype=bool)
    exclude[20_000:21_500] = True
    exclude[:50] = True
    _check(ms, codes, exclude)


def test_multi_slab():
    """Genome longer than one device slab: host combine across slabs."""
    from lexicmap_tpu.parallel import build_device

    old = build_device.SLAB
    build_device.SLAB = 1 << 15  # force multiple slabs
    try:
        ms2 = MaskSet.generate(31, 256, 1)
        rng = np.random.default_rng(33)
        codes = rng.integers(0, 4, size=150_000, dtype=np.uint8)
        codes[100_000:101_000] = codes[20_000:21_000]  # cross-slab repeat
        _check(ms2, codes)
    finally:
        build_device.SLAB = old
