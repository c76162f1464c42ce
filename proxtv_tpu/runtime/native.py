"""ctypes binding for the native host runtime (native/tv1d_host.cpp).

The shared library is built on first use with the repo Makefile (g++,
-O3 -fopenmp) and cached next to the sources.  All entry points degrade
gracefully: :func:`available` is False when no compiler / build fails, and
callers fall back to the JAX path.

Role: single short signals pay ~tens of ms of TPU dispatch latency for
microseconds of compute; the host engine serves that latency tail (see
``proxtv_tpu.api.tv1_1d`` backend='auto').  It is also an independent f64
oracle used by the tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libproxtv_host.so")


def _build():
    try:
        subprocess.run(["make", "-s", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception:  # noqa: BLE001 — any failure means "not available"
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        pd = ctypes.POINTER(ctypes.c_double)
        lib.ptv_tv1_host.restype = None
        lib.ptv_tv1_host.argtypes = [pd, ctypes.c_int, ctypes.c_double, pd]
        lib.ptv_tv1w_host.restype = None
        lib.ptv_tv1w_host.argtypes = [pd, ctypes.c_int, pd, pd]
        lib.ptv_tv1_batch_host.restype = None
        lib.ptv_tv1_batch_host.argtypes = [pd, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_double, pd, ctypes.c_int]
        lib.ptv_ws_new.restype = ctypes.c_void_p
        lib.ptv_ws_new.argtypes = [ctypes.c_int]
        lib.ptv_ws_free.restype = None
        lib.ptv_ws_free.argtypes = [ctypes.c_void_p]
        lib.ptv_ws_double.restype = pd
        lib.ptv_ws_double.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


class HostWorkspace:
    """Reusable host-side buffer pool — the reference ``Workspace`` analog
    (src/utils.h:20-34): a caller issuing many latency-tail solves reuses
    pool-owned output memory instead of allocating a fresh array per call.

    Use as a context manager or call :meth:`close`; the returned arrays are
    VIEWS into pool memory, valid until the next pool call / close."""

    def __init__(self, capacity: int = 0):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._ptr = lib.ptv_ws_new(int(capacity))

    def out_buffer(self, size: int):
        ptr = self._lib.ptv_ws_double(self._ptr, int(size))
        return np.ctypeslib.as_array(ptr, shape=(int(size),))

    def close(self):
        if self._ptr is not None:
            self._lib.ptv_ws_free(self._ptr)
            self._ptr = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def tv1_host(y, lam: float, ws: "HostWorkspace" = None):
    """Scalar-weight 1D TV-L1 prox on the host (f64, microsecond latency).

    ``ws``: optional :class:`HostWorkspace` — the result is written into
    pool-owned memory (a view is returned) instead of a fresh allocation."""
    lib = _load()
    assert lib is not None
    y = np.ascontiguousarray(y, dtype=np.float64)
    x = ws.out_buffer(y.size) if ws is not None else np.empty_like(y)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.ptv_tv1_host(y.ctypes.data_as(pd), y.size, float(lam),
                     x.ctypes.data_as(pd))
    return x


def tv1w_host(y, lam):
    """Per-edge-weight 1D TV-L1 prox on the host."""
    lib = _load()
    assert lib is not None
    y = np.ascontiguousarray(y, dtype=np.float64)
    lam = np.ascontiguousarray(lam, dtype=np.float64)
    assert lam.size == y.size - 1
    x = np.empty_like(y)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.ptv_tv1w_host(y.ctypes.data_as(pd), y.size, lam.ctypes.data_as(pd),
                      x.ctypes.data_as(pd))
    return x


def tv1_batch_host(Y, lam: float, n_threads: int = 0):
    """OpenMP batched host solve (fallback / comparison path)."""
    lib = _load()
    assert lib is not None
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    B, n = Y.shape
    X = np.empty_like(Y)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.ptv_tv1_batch_host(Y.ctypes.data_as(pd), B, n, float(lam),
                           X.ctypes.data_as(pd), int(n_threads))
    return X
