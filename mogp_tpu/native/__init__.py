"""Native (C++/OpenMP) host library with ctypes bindings.

Counterpart of the reference's native build layer (``setup.py:117-183``
nvcc extension + ``LibGPGPU.py`` soft import): the shared library is
compiled on first import with the system toolchain and soft-loaded --
everything in the framework works without it (``native_usable()`` is the
analogue of the reference's ``gpu_usable()``), but when present it
provides OpenMP-parallel host kernels:

* ``potrf_batched``  -- batched lower Cholesky (independent oracle for
  the device factorizations; LAPACK ``dpotrf`` info contract)
* ``trsm_batched``   -- batched triangular solves
* ``maximin_score``  -- MaxiMin design scoring (host fallback for the
  device scorer in ``uq.experimental_design``)
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "native_usable",
    "potrf_batched",
    "trsm_batched",
    "maximin_score",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "batched_linalg.cpp")
_LIB_PATH = os.path.join(_HERE, "build", "libmogp_native.so")

_lib = None
_load_error = None


def _build():
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.potrf_batched.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.trsm_batched.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.maximin_score.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        _load_error = exc
    return _lib


def native_usable():
    """Whether the native library could be built and loaded
    (the analogue of the reference's ``gpu_usable``, ``LibGPGPU.py:13``)."""
    return _load() is not None


def _dptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def potrf_batched(A):
    """Batched in-place-style lower Cholesky on the host.

    :param A: ``(B, n, n)`` SPD matrices (any float dtype; copied to
              contiguous float64).
    :returns: ``(L, info)`` -- factors with zeroed upper triangles and the
              per-matrix LAPACK-style info codes (0 = success).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable: {}".format(_load_error))
    A = np.ascontiguousarray(np.asarray(A, dtype=np.float64))
    assert A.ndim == 3 and A.shape[1] == A.shape[2]
    B, n, _ = A.shape
    out = A.copy()
    info = np.zeros(B, dtype=np.int32)
    lib.potrf_batched(
        _dptr(out), B, n, info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out, info


def trsm_batched(L, b, transpose=False):
    """Batched triangular solve ``L x = b`` (or ``L^T x = b``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable: {}".format(_load_error))
    L = np.ascontiguousarray(np.asarray(L, dtype=np.float64))
    b = np.asarray(b, dtype=np.float64)
    squeeze = b.ndim == 2
    if squeeze:
        b = b[:, :, None]
    X = np.ascontiguousarray(b.copy())
    B, n, m = X.shape
    lib.trsm_batched(_dptr(L), _dptr(X), B, n, m, 1 if transpose else 0)
    return X[:, :, 0] if squeeze else X


def maximin_score(designs):
    """Minimum pairwise distance per candidate design, ``(T, n, d) -> (T,)``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable: {}".format(_load_error))
    designs = np.ascontiguousarray(np.asarray(designs, dtype=np.float64))
    T, n, d = designs.shape
    out = np.empty(T, dtype=np.float64)
    lib.maximin_score(_dptr(designs), T, n, d, _dptr(out))
    return np.sqrt(out)
