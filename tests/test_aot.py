"""AOT executable cache (tpufem.utils.aot).

The reference pays an NVRTC compile every run (--define-macro
parameterization, /root/reference/fea_symbolic_nvrtc.cpp:511-525); the TPU
framework instead persists compiled XLA executables across processes.
These tests exercise the cache on the CPU backend: miss -> save -> hit,
result equality, and corrupt-file fallback.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpufem.utils.aot import CompiledCache


def _fn(x, y):
    return jnp.tanh(x @ y) + 1.0, (x * 2.0).sum()


@pytest.fixture
def cache(tmp_path):
    return CompiledCache(directory=str(tmp_path))


def test_miss_then_hit(cache):
    x = jnp.ones((8, 8), jnp.float32)
    y = jnp.full((8, 8), 0.5, jnp.float32)
    c1 = cache.get(_fn, (x, y), tag="t")
    assert cache.stats["t"]["event"] in ("miss", "disabled")
    out1 = c1(x, y)

    c2 = cache.get(_fn, (x, y), tag="t")
    if cache.stats["t"]["event"] == "hit":       # serialize supported here
        out2 = c2(x, y)
        np.testing.assert_array_equal(np.asarray(out1[0]),
                                      np.asarray(out2[0]))
        np.testing.assert_array_equal(np.asarray(out1[1]),
                                      np.asarray(out2[1]))


def test_distinct_shapes_distinct_entries(cache):
    x8 = jnp.ones((8, 8), jnp.float32)
    x4 = jnp.ones((4, 4), jnp.float32)
    cache.get(_fn, (x8, x8), tag="a")
    cache.get(_fn, (x4, x4), tag="a")
    assert cache.stats["a"]["event"] in ("miss", "disabled")  # second is new


def test_corrupt_file_falls_back(cache):
    x = jnp.ones((8, 8), jnp.float32)
    cache.get(_fn, (x, x), tag="c")
    files = [f for f in os.listdir(cache.directory) if f.startswith("c-")]
    if not files:                                # serialize unsupported here
        pytest.skip("backend cannot serialize executables")
    path = os.path.join(cache.directory, files[0])
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    c = cache.get(_fn, (x, x), tag="c")          # must not raise
    out = c(x, x)
    assert np.isfinite(np.asarray(out[0])).all()
    assert "load_failed" in cache.stats["c"]["event"]


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUFEM_AOT_CACHE", "0")
    cache = CompiledCache(directory=str(tmp_path))
    x = jnp.ones((4, 4), jnp.float32)
    c = cache.get(_fn, (x, x), tag="d")
    c(x, x)
    assert cache.stats["d"]["event"] == "disabled"
    assert not os.listdir(tmp_path)


def test_captured_constant_values_distinguish_entries(cache):
    """Two closures differing ONLY in a captured array's values print
    identical jaxprs (constants are baked into the lowered HLO, not the
    jaxpr string) — the cache key must hash the constant VALUES too, or a
    warm cache silently returns stale-constant executables (ADVICE r3)."""
    x = jnp.ones((8,), jnp.float32)
    c_a = np.full((8,), 2.0, np.float32)
    c_b = np.full((8,), 5.0, np.float32)

    def make(c):
        arr = jnp.asarray(c)
        return lambda v: v * arr

    r1 = cache.get(make(c_a), (x,), tag="k")
    out1 = np.asarray(r1(x))
    r2 = cache.get(make(c_b), (x,), tag="k")
    out2 = np.asarray(r2(x))
    np.testing.assert_allclose(out1, 2.0)
    np.testing.assert_allclose(out2, 5.0)     # NOT a stale 2.0 executable


def test_donated_args_roundtrip(cache):
    def donating(b, a):
        return b * 2.0 + a

    b = jnp.ones((16,), jnp.float32)
    a = jnp.full((16,), 3.0, jnp.float32)
    c1 = cache.get(donating, (b, a), tag="don", donate_argnums=(0,))
    out1 = np.asarray(c1(jnp.ones((16,), jnp.float32), a))
    c2 = cache.get(donating, (jnp.ones((16,), jnp.float32), a), tag="don",
                   donate_argnums=(0,))
    out2 = np.asarray(c2(jnp.ones((16,), jnp.float32), a))
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_allclose(out1, 5.0)


def test_first_exec_recorded(tmp_path):
    """The returned executable records its FIRST execution wall into the
    stats record — the axon server defers load/compile work to first use,
    which load_s cannot see (BENCH_r04: 458.9 s wall on a 0.1 s hit)."""
    import jax.numpy as jnp

    from tpufem.utils.aot import CompiledCache

    cache = CompiledCache(directory=str(tmp_path))
    fn = lambda x: x * 2.0 + 1.0
    x = jnp.arange(8, dtype=jnp.float32)
    run = cache.get(fn, (x,), tag="t")
    assert "first_exec_s" not in cache.stats["t"]
    run(x)
    assert cache.stats["t"]["first_exec_s"] >= 0.0
    run(x)   # second call: record unchanged (only first is timed)
    first = cache.stats["t"]["first_exec_s"]
    run(x)
    assert cache.stats["t"]["first_exec_s"] == first
    # hit path records too
    cache2 = CompiledCache(directory=str(tmp_path))
    run2 = cache2.get(fn, (x,), tag="t")
    assert cache2.stats["t"]["event"] == "hit"
    run2(x)
    assert "first_exec_s" in cache2.stats["t"]
