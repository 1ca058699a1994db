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
    saved = (par._tripped, list(par._abandoned), set(par._warm_whats))
    yield
    par._tripped = saved[0]
    par._warm_whats.clear()
    par._warm_whats.update(saved[2])
    par._abandoned.clear()
    par._abandoned.extend(saved[1])


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
