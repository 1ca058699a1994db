"""Device-dispatch watchdog: a hung fetch must trip the process-wide
breaker, the caller must receive None (host fallback), and subsequent
fetches must skip the device without waiting."""

import time

import pytest

jax = pytest.importorskip("jax")

import lexicmap_tpu.parallel as par


@pytest.fixture
def breaker_reset():
    """Save/restore the module-global breaker state around each test."""
    saved = (par._tripped, list(par._abandoned), set(par._warm_whats),
             par.fetch_count, dict(par.transport))
    yield
    par._tripped = saved[0]
    par._warm_whats.clear()
    par._warm_whats.update(saved[2])
    par._abandoned.clear()
    par._abandoned.extend(saved[1])
    par.fetch_count = saved[3]
    par.transport.clear()
    par.transport.update(saved[4])


def test_fetch_guarded_passthrough(breaker_reset):
    import numpy as np

    x = jax.numpy.asarray(np.arange(8))
    got = par.fetch_guarded(x, "test", timeout=30)
    assert np.array_equal(got, np.arange(8))
    assert not par.device_tripped()


def test_fetch_guarded_trips_on_hang(breaker_reset, monkeypatch):
    def hang(tree):
        time.sleep(60)

    monkeypatch.setattr(jax, "device_get", hang)
    t0 = time.time()
    got = par.fetch_guarded(object(), "simulated hang", timeout=0.3)
    assert got is None
    assert time.time() - t0 < 5
    assert par.device_tripped()
    assert par.abandoned_fetch()

    # breaker is latched: the next fetch returns None immediately,
    # without invoking device_get at all
    calls = []
    monkeypatch.setattr(jax, "device_get", lambda t: calls.append(t))
    t0 = time.time()
    assert par.fetch_guarded(object(), "after trip", timeout=30) is None
    assert time.time() - t0 < 0.1
    assert calls == []


def test_warm_set_is_per_compile_key(breaker_reset):
    """A completed fetch warms only its (label, compile_key) pair: a new
    shape bucket under the same label must still get the cold timeout
    (device stages compile per shape bucket; a fresh bucket pays a fresh
    multi-minute tunnel compile)."""
    import numpy as np

    x = jax.numpy.asarray(np.arange(4))
    par._warm_whats.clear()
    assert par.fetch_guarded(x, "stage", timeout=30, compile_key=128) is not None
    assert ("stage", 128) in par._warm_whats
    assert ("stage", 256) not in par._warm_whats
    assert ("stage", None) not in par._warm_whats


def test_transport_accounting(breaker_reset):
    """fetch_guarded counts fetches + d2h bytes per label; count_h2d counts
    upload bytes.  The per-regime transport budget tables are built from
    these counters, so they must be exact."""
    import numpy as np

    par.transport.pop("acct-test", None)
    x = jax.numpy.asarray(np.zeros(1024, np.int32))
    par.fetch_guarded(x, "acct-test", timeout=30)
    s = par.transport_summary()
    assert s["acct-test"]["fetches"] == 1
    assert s["acct-test"]["d2h_bytes"] == 4096
    par.count_h2d("acct-test", np.zeros((2, 8), np.int32),
                  [np.zeros(4, np.int8), None])
    s = par.transport_summary()
    assert s["acct-test"]["h2d_bytes"] == 64 + 4
    assert s["TOTAL"]["d2h_bytes"] >= 4096


def test_fetch_guarded_propagates_errors(breaker_reset, monkeypatch):
    def boom(tree):
        raise RuntimeError("xla said no")

    monkeypatch.setattr(jax, "device_get", boom)
    with pytest.raises(RuntimeError, match="xla said no"):
        par.fetch_guarded(object(), "error case", timeout=30)
    assert not par.device_tripped()


def test_tripped_breaker_routes_match_batch_to_host(breaker_reset, monkeypatch):
    """DeviceSeedMatcher.match_batch must return all-None (host matching)
    without touching the device once the breaker is tripped."""
    import numpy as np

    from lexicmap_tpu.parallel.device_search import DeviceSeedMatcher

    par._tripped = True
    m = DeviceSeedMatcher.__new__(DeviceSeedMatcher)  # no device state needed
    out = DeviceSeedMatcher.match_batch(
        m, np.zeros((3, 4), dtype=np.uint64), min_prefix=15
    )
    assert out == [None, None, None]
