"""Exported-program cache (utils.progcache) tests."""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gnss.utils import progcache


@functools.partial(jax.jit, static_argnames=("k",))
def _f(x, y, *, k, bias=0.0):
    return k * x + y + bias


def _wait_for(path, timeout=20.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            return True
        time.sleep(0.05)
    return False


def test_progcache_roundtrip(tmp_path):
    x = jnp.arange(8, dtype=jnp.float32)
    y = jnp.ones(8, dtype=jnp.float32)
    want = np.asarray(_f(x, y, k=3, bias=0.5))
    try:
        progcache.enable(str(tmp_path))
        # miss: original function runs, export lands asynchronously
        got = progcache.call("f", _f, args=(x, y),
                             dyn_kwargs=dict(bias=0.5),
                             static_kwargs=dict(k=3))
        np.testing.assert_allclose(np.asarray(got), want)
        blobs = lambda: [p for p in os.listdir(tmp_path)
                         if p.endswith(".jaxexp")]
        t0 = time.time()
        while not blobs() and time.time() - t0 < 20:
            time.sleep(0.05)
        assert blobs(), "export never landed"

        # simulate a fresh process: clear the memo, call again -> the
        # exported program must load and give identical results (any
        # dynamic value, same shapes/statics)
        progcache._memo.clear()
        got2 = progcache.call("f", _f, args=(x, y),
                              dyn_kwargs=dict(bias=1.5),
                              static_kwargs=dict(k=3))
        np.testing.assert_allclose(np.asarray(got2),
                                   np.asarray(_f(x, y, k=3, bias=1.5)))
        key = progcache._key("f", (x, y), dict(bias=1.5), dict(k=3))
        assert progcache._memo[key] is not False, \
            "second call did not route through the exported program"

        # a different STATIC is a different program
        k2 = progcache._key("f", (x, y), dict(bias=1.5), dict(k=4))
        assert k2 != key
        # a different dynamic VALUE of the same shape is the same key
        assert progcache._key("f", (x, y), dict(bias=9.9),
                              dict(k=3)) == key
    finally:
        progcache.disable()
        progcache._memo.clear()


def test_progcache_disabled_is_passthrough():
    assert not progcache.enabled()
    x = jnp.arange(4, dtype=jnp.float32)
    got = progcache.call("f", _f, args=(x, x), static_kwargs=dict(k=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(_f(x, x, k=2)))


def test_progcache_source_edit_invalidates(tmp_path, monkeypatch):
    """Key changes when the package source digest changes — stale math
    can never load after a code edit."""
    x = jnp.arange(4, dtype=jnp.float32)
    try:
        progcache.enable(str(tmp_path))
        k1 = progcache._key("f", (x,), {}, {})
        monkeypatch.setattr(progcache, "_SRC_DIGEST", "deadbeef")
        k2 = progcache._key("f", (x,), {}, {})
        assert k1 != k2
    finally:
        progcache.disable()
        progcache._memo.clear()
