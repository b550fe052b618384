"""Serialized-executable cache (utils/execcache.py).

The hit path is TPU-only (XLA:CPU AOT deserialization is broken on this
image -- see _cache_dir's gate) and is validated on hardware: a cache-hit
run of the full sampler was measured bit-identical to a fresh-compile run
(BENCH_RESULTS.md).  The suite covers the platform gate, the miss/save
path, the corrupt-entry fallback, and key sensitivity.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from spamtree_tpu.utils import execcache


@pytest.fixture
def cachedir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPAMTREE_COMPILE_CACHE", str(tmp_path))
    monkeypatch.setenv("SPAMTREE_EXEC_CACHE_FORCE", "1")
    monkeypatch.delenv("SPAMTREE_NO_EXEC_CACHE", raising=False)
    return tmp_path / "exec"


def _lowered(scale=2.0):
    def f(x):
        return (x * scale).sum()

    return jax.jit(f).lower(jnp.arange(8.0))


def test_cpu_platform_gated_off(monkeypatch):
    monkeypatch.delenv("SPAMTREE_EXEC_CACHE_FORCE", raising=False)
    assert jax.devices()[0].platform == "cpu"  # the suite's backend
    assert execcache._cache_dir() is None
    phases = {}
    ex = execcache.cached_compile(_lowered(), phases)
    assert phases["exec_cache"] == "off"
    assert float(ex(jnp.arange(8.0))) == 2.0 * 28.0


def test_miss_saves_entry_and_result_runs(cachedir):
    phases = {}
    ex = execcache.cached_compile(_lowered(), phases)
    assert phases["exec_cache"] == "miss"
    assert float(ex(jnp.arange(8.0))) == 2.0 * 28.0
    entries = list(cachedir.glob("*.pkl"))
    assert len(entries) == 1 and entries[0].stat().st_size > 0


def test_corrupt_entry_falls_back_to_compile(cachedir):
    lo = _lowered()
    path = os.path.join(str(cachedir), execcache._key(lo) + ".pkl")
    os.makedirs(str(cachedir), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    phases = {}
    ex = execcache.cached_compile(lo, phases)
    assert phases["exec_cache"] == "err:load"
    assert float(ex(jnp.arange(8.0))) == 2.0 * 28.0


def test_key_sensitivity(cachedir):
    # different literal constants -> different modules -> different keys
    assert execcache._key(_lowered(2.0)) != execcache._key(_lowered(3.0))
    assert execcache._key(_lowered(2.0)) == execcache._key(_lowered(2.0))


def test_lru_prune_evicts_oldest(cachedir, monkeypatch):
    # entries embed program constants (~600 MB at n=1e5) and key rotation
    # on source changes orphans them; the budget must evict oldest-mtime
    # first and never the entry just written
    import time

    monkeypatch.setenv("SPAMTREE_EXEC_CACHE_GB", "0")  # evict all but newest
    old = execcache.cached_compile(_lowered(2.0))
    first = list(cachedir.glob("*.pkl"))
    assert len(first) == 1
    time.sleep(0.02)  # mtime resolution
    execcache.cached_compile(_lowered(3.0))
    left = list(cachedir.glob("*.pkl"))
    assert len(left) == 1 and left[0] != first[0]
    assert float(old(jnp.arange(8.0))) == 2.0 * 28.0  # loaded exec unaffected


def test_size_gate_skips_save(cachedir, monkeypatch):
    # beyond the threshold the hit-path relay transfer loses to the
    # persistent-cache compile path, so big payloads are never written
    monkeypatch.setenv("SPAMTREE_EXEC_CACHE_MAX_MB", "0.000001")
    phases = {}
    ex = execcache.cached_compile(_lowered(), phases)
    assert phases["exec_cache"] == "skip:big"
    assert list(cachedir.glob("*.pkl")) == []
    assert float(ex(jnp.arange(8.0))) == 2.0 * 28.0


def test_size_gate_drops_oversized_entry(cachedir, monkeypatch):
    # an entry written under a larger threshold is removed, not loaded
    execcache.cached_compile(_lowered())
    (entry,) = cachedir.glob("*.pkl")
    monkeypatch.setenv("SPAMTREE_EXEC_CACHE_MAX_MB", "0.000001")
    phases = {}
    ex = execcache.cached_compile(_lowered(), phases)
    assert phases["exec_cache"] == "skip:big"  # miss + save also gated
    assert not entry.exists()
    assert float(ex(jnp.arange(8.0))) == 2.0 * 28.0


def test_hit_touches_mtime(cachedir):
    import os, time

    execcache.cached_compile(_lowered(2.0))
    (entry,) = cachedir.glob("*.pkl")
    past = time.time() - 3600
    os.utime(entry, (past, past))
    phases = {}
    execcache.cached_compile(_lowered(2.0), phases)
    assert phases["exec_cache"] == "hit"
    assert entry.stat().st_mtime > past + 1800  # refreshed by the hit
