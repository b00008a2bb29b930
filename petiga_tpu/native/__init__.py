"""ctypes bindings for the native setup kernels (see core.cpp).

The library is built on first import (``make`` in this directory) and
used transparently by the setup paths; everything falls back to the
vectorized numpy implementations if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libpetiga_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    """Load (building if needed); returns the ctypes lib or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bspline_ders.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    lib.build_mapping.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.byteswap_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def bspline_ders(U, p, spans, u, nder):
    """Native Cox-de Boor; same contract as
    :func:`petiga_tpu.core.bspline.bspline_ders`."""
    lib = load()
    U = np.ascontiguousarray(U, dtype=np.float64)
    spans = np.ascontiguousarray(spans, dtype=np.int64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    npts = len(u)
    out = np.zeros((npts, nder + 1, p + 1), dtype=np.float64)
    lib.bspline_ders(
        _dp(U), p, _ip64(spans), _dp(u), npts, nder, _dp(out)
    )
    return out


def build_mapping(dim, nel, nen, nnp, offsets):
    """Native closure-map builder; returns (prod nel, prod nen) int32."""
    lib = load()
    nel3 = np.asarray(list(nel) + [1] * (3 - dim), dtype=np.int64)
    nen3 = np.asarray(list(nen) + [1] * (3 - dim), dtype=np.int64)
    nnp3 = np.asarray(list(nnp) + [1] * (3 - dim), dtype=np.int64)
    offs = [np.ascontiguousarray(o, dtype=np.int64) for o in offsets]
    offs += [np.zeros(1, dtype=np.int64)] * (3 - dim)
    arr = (ctypes.POINTER(ctypes.c_int64) * 3)(*[_ip64(o) for o in offs])
    out = np.zeros((int(np.prod(nel)), int(np.prod(nen))), dtype=np.int32)
    lib.build_mapping(
        dim, _ip64(nel3), _ip64(nen3), _ip64(nnp3), arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def byteswap_f64(a):
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.float64)
    out = np.empty_like(a)
    lib.byteswap_f64(_dp(a), a.size, _dp(out.reshape(-1)))
    return out
