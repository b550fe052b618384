"""Local on-disk cache of compiled XLA executables.

The persistent XLA compilation cache (spamtree_tpu/__init__.py) already
avoids recompiles, but on the remote-compile backend a warm "hit" still
pays the relay round trip: the `.compile()` call ships the module out and
loads the cache entry back through the same transport as a cold compile's
binary, measured 12-36 s for the keep-scan program at n=1e5
(BENCH_RESULTS.md).  This layer serializes the *loaded executable* itself
(`jax.experimental.serialize_executable`) to local disk, keyed by a hash
of the lowered StableHLO bytecode plus the backend identity; a hit
deserializes locally and skips the backend compile / remote cache load
entirely.

Keying on the module bytecode makes the key exact: any change to shapes,
static config, donation/aliasing, literal constants (const-model runs
embed the model arrays), jax lowering, or flag-visible semantics changes
the bytecode.  The backend identity (platform, device kind, device count,
jax version, XLA_FLAGS) is appended because the same module compiles to
different binaries on different targets.

Opt-out with SPAMTREE_NO_EXEC_CACHE=1 (the cache directory defaults to
`exec/` under the compilation-cache dir).  Entries are pickles of
``(payload, in_tree, out_tree, cost)``; any failure to read, deserialize,
or load falls back to a normal compile and (best-effort) rewrites the
entry.

Entries embed the program's literal constants, so const-model sampling
programs weigh ~0.5 MB/1k locations (measured ~50 MB at n=4000, ~600 MB
at n=1e5) and every source change that perturbs the lowered module
orphans the old entry under a dead key.  Two guards follow:

* **Size gate** (SPAMTREE_EXEC_CACHE_MAX_MB, default 3072): a hit must
  ship the serialized binary back through the ~20 MB/s relay (the n=1e5
  const-model scan is a 599 MB entry, 44 s hit; the same entry measured
  12 s in round 5).  That loses to the remote compile service's cache
  WHEN that cache holds the entry (12-36 s load) -- but the remote cache
  proved unreliable (same-day re-runs of an unchanged program paid
  116-157 s full recompiles), so the local hit's predictable load wins
  in expectation.  Round 5 raised the default 1024 -> 3072 MB: the
  n=1e6 argument-mode keep program and the n=1e5 two-chain program both
  serialize above 1 GB and were skipping the cache, leaving their warm
  runs paying 84-137 s backend recompiles that a local hit does in tens
  of seconds.  Payloads beyond the gate are not written, and oversized
  on-disk entries are removed and treated as misses.
* **LRU budget** (SPAMTREE_EXEC_CACHE_GB, default 20): hits touch the
  entry's mtime and each save evicts oldest-mtime entries over budget.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

import jax

__all__ = ["cached_compile"]


def _cache_dir() -> str | None:
    if os.environ.get("SPAMTREE_NO_EXEC_CACHE"):
        return None
    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "SPAMTREE_EXEC_CACHE_FORCE"
    ):
        # XLA:CPU AOT deserialization is host-feature-keyed and UNSAFE on
        # this image: a deserialized executable dispatch-fails with
        # "Function iota_convert_fusion not found" (and XLA warns about
        # SIGILL-class machine-feature mismatches) even on the same host.
        # The remote-TPU backend -- where the cache actually pays -- is
        # unaffected.
        return None
    base = os.environ.get(
        "SPAMTREE_COMPILE_CACHE", os.path.expanduser("~/.cache/spamtree_tpu_xla")
    )
    return os.path.join(base, "exec")


def _backend_tag() -> bytes:
    dev = jax.devices()[0]
    # deserialized AOT executables are ABI-tied to the RUNTIME, not just to
    # jax: a jaxlib/libtpu upgrade under an unchanged jax version must not
    # load stale binaries, so the jaxlib version and the backend's own
    # platform_version (the libtpu/runtime build string) key the entry too
    try:
        import jaxlib

        jl = getattr(jaxlib, "__version__", "?")
    except Exception:
        jl = "?"
    try:
        from jax.extend import backend as _jex_backend

        pv = _jex_backend.get_backend().platform_version
    except Exception:
        pv = "?"
    return "|".join(
        [
            jax.__version__,
            jl,
            pv,
            dev.platform,
            getattr(dev, "device_kind", "?"),
            str(jax.device_count()),
            os.environ.get("XLA_FLAGS", ""),
        ]
    ).encode()


def _key(lowered) -> str:
    # hash the module TEXT: the MLIR bytecode serialization is not
    # deterministic across repeated lowerings (measured: same-length,
    # differing bytes for identical programs), while as_text() is stable
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(_backend_tag())
    return h.hexdigest()


def cached_compile(lowered, phases: dict | None = None):
    """``lowered.compile()`` with a local serialized-executable cache.

    Returns the loaded executable; ``phases`` (optional dict) receives
    ``exec_cache`` ("hit" / "miss" / "off" / "err:<stage>") and, on a hit,
    skips the backend compile entirely.
    """
    d = _cache_dir()
    if d is None:
        if phases is not None:
            phases["exec_cache"] = "off"
        return lowered.compile()

    from jax.experimental import serialize_executable as se

    tag = "miss"
    try:
        path = os.path.join(d, _key(lowered) + ".pkl")
    except Exception:
        if phases is not None:
            phases["exec_cache"] = "err:key"
        return lowered.compile()

    max_bytes = float(os.environ.get("SPAMTREE_EXEC_CACHE_MAX_MB", "3072")) * 1e6
    if os.path.exists(path):
        try:
            if os.path.getsize(path) > max_bytes:
                # oversized under the CURRENT threshold (written by a run
                # with a larger one): the user lowered the gate, honor it
                # (see the module docstring for the hit-vs-recompile
                # economics) -- drop the entry and treat as a miss
                os.remove(path)
                raise FileNotFoundError(path)
            with open(path, "rb") as f:
                payload, in_tree, out_tree, cost = pickle.load(f)
            ex = se.deserialize_and_load(payload, in_tree, out_tree)
            ex._spamtree_cached_cost = cost
            try:
                os.utime(path)  # LRU: a hit refreshes the entry's mtime
            except OSError:
                pass
            if phases is not None:
                phases["exec_cache"] = "hit"
            return ex
        except FileNotFoundError:
            pass  # stays "miss"; the size gate below skips the rewrite
        except Exception:
            tag = "err:load"  # corrupt/stale entry: recompile and rewrite

    ex = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(ex)
        if len(payload) > max_bytes:
            if phases is not None:
                phases["exec_cache"] = "skip:big"
            return ex
        # cost_analysis is computed at save time: it blocks on the remote
        # delivery anyway here, and a deserialized executable on some
        # backends cannot re-derive it
        try:
            ca = ex.cost_analysis()
            ca = dict(ca[0]) if isinstance(ca, (list, tuple)) else dict(ca)
        except Exception:
            ca = {}
        # entries are pickles and pickle.load executes arbitrary code: keep
        # the cache dir private so another principal cannot plant entries
        # (mode applies only at creation; a pre-existing dir is tightened)
        os.makedirs(d, mode=0o700, exist_ok=True)
        try:
            os.chmod(d, 0o700)
        except OSError:
            pass
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, ca), f)
        os.replace(tmp, path)  # atomic: concurrent writers race benignly
        _prune(d, keep=path)
    except Exception:
        tag = "err:save" if tag == "miss" else tag
    if phases is not None:
        phases["exec_cache"] = tag
    return ex


def _prune(d: str, keep: str) -> None:
    """Evict oldest-mtime entries beyond the size budget (never the entry
    just written).  Best-effort: a concurrently-deleted file is skipped."""
    budget = float(os.environ.get("SPAMTREE_EXEC_CACHE_GB", "20")) * 1e9
    entries = []
    for name in os.listdir(d):
        if not name.endswith(".pkl"):
            continue
        p = os.path.join(d, name)
        try:
            st = os.stat(p)
        except OSError:
            continue
        entries.append((st.st_mtime, st.st_size, p))
    total = sum(e[1] for e in entries)
    for mtime, size, p in sorted(entries):
        if total <= budget:
            break
        if p == keep:
            continue
        try:
            os.remove(p)
            total -= size
        except OSError:
            pass
