"""ctypes bindings for the native host runtime (native/spamtree_host.cpp).

Builds the shared library on first use if a C++ toolchain is present;
otherwise every entry point falls back to a NumPy implementation, so the
package works without the native layer (it is a performance/runtime feature,
not a correctness one).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libspamtree_host.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "spamtree_host.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            if os.path.exists(_LIB_PATH):
                os.remove(_LIB_PATH)  # make only rebuilds a missing target
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    dp = np.ctypeslib.ndpointer(np.float64, flags="C")
    ip = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.st_kthresholds.argtypes = [dp, i64, i64, dp]
    lib.st_column_threshold.argtypes = [dp, i64, dp, i64, ip]
    lib.st_group_by_key.restype = i64
    lib.st_group_by_key.argtypes = [ip, i64, ip, ip]
    lib.st_sink_open.restype = ctypes.c_void_p
    lib.st_sink_open.argtypes = [ctypes.c_char_p, i64, i64]
    lib.st_sink_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, i64]
    lib.st_sink_close.restype = i64
    lib.st_sink_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def kthresholds(x: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    if k <= 1:
        return np.zeros(0)
    if len(x) == 0:  # empty pool: no order statistics exist
        return np.zeros(k - 1)
    if lib is None:
        # multi-kth introselect: same order statistics as the native
        # nth_element kernel without a full sort
        pos = (np.arange(1, k) * len(x)) // k
        return np.partition(x, pos)[pos]
    out = np.empty(k - 1, dtype=np.float64)
    lib.st_kthresholds(x, len(x), k, out)
    return out


def column_threshold(col: np.ndarray, thr: np.ndarray) -> np.ndarray:
    lib = _load()
    col = np.ascontiguousarray(col, dtype=np.float64)
    thr = np.ascontiguousarray(thr, dtype=np.float64)
    if lib is None:
        return np.searchsorted(thr, col, side="right") + 1
    out = np.empty(len(col), dtype=np.int64)
    lib.st_column_threshold(col, len(col), thr, len(thr), out)
    return out


def group_by_key(keys: np.ndarray):
    """Returns (order, starts): row groups sorted by key; group g is
    order[starts[g]:starts[g+1]]."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = len(keys)
    if lib is None:
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        bounds = np.flatnonzero(np.diff(ks)) + 1
        starts = np.concatenate([[0], bounds, [n]])
        return order, starts
    order = np.empty(n, dtype=np.int64)
    starts = np.empty(n + 1, dtype=np.int64)
    g = lib.st_group_by_key(keys, n, order, starts)
    return order, starts[: g + 1]


def read_sink(path: str, n: int, n_chains: int = 1) -> np.ndarray:
    """Memory-map a sink file written by a ``sink_dir=`` run back into a
    draws array WITHOUT loading it into RAM (the point of sinks is
    n ~ 1e6 where keep*n draws exceed memory).

    ``path`` is ``<sink_dir>/w_mcmc.f32`` or ``yhat_mcmc.f32``; ``n`` the
    number of rows the model was fit on (``len(result["order"])``); rows
    are in sorted-row order like every other output.  Returns a read-only
    float32 memmap of shape (kept, n) or (kept, n_chains, n)."""
    itemsize = np.dtype(np.float32).itemsize
    if n <= 0:
        raise ValueError(f"read_sink: n must be positive, got {n}")
    row = n * max(n_chains, 1) * itemsize
    size = os.path.getsize(path)
    shape0 = ((0, n) if n_chains <= 1 else (0, n_chains, n))
    if size == 0:
        # np.memmap refuses empty files; an interrupted run can leave a
        # sink with no drained chunks -- that is 0 kept draws, not an error
        return np.empty(shape0, dtype=np.float32)
    if size % row:
        raise ValueError(
            f"{path}: size {size} is not a whole number of draws for "
            f"n={n}, n_chains={n_chains}"
        )
    shape = ((size // row, n) if n_chains <= 1
             else (size // row, n_chains, n))
    return np.memmap(path, dtype=np.float32, mode="r", shape=shape)


class SampleSink:
    """Async binary writer for streaming kept samples to disk (native thread
    when available; synchronous fallback otherwise)."""

    def __init__(self, path: str, max_queue: int = 16,
                 append: bool = False):
        """``append=True`` continues an existing sink file instead of
        truncating it (used by resumed runs; mcmc.run_mcmc sink_append)."""
        self.path = path
        self._lib = _load()
        self._n = 0
        if self._lib is not None:
            self._h = self._lib.st_sink_open(path.encode(), max_queue,
                                             1 if append else 0)
            if not self._h:
                raise OSError(f"cannot open {path}")
            self._f = None
        else:
            self._h = None
            self._f = open(path, "ab" if append else "wb")

    def push(self, arr: np.ndarray):
        data = np.ascontiguousarray(arr).tobytes()
        if self._h is not None:
            self._lib.st_sink_push(self._h, data, len(data))
        else:
            self._f.write(data)
        self._n += 1

    def close(self) -> int:
        if self._h is not None:
            n = int(self._lib.st_sink_close(self._h))
            self._h = None
            return n
        if self._f is not None:
            self._f.close()
            self._f = None
        return self._n
