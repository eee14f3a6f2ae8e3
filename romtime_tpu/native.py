"""ctypes loader for the native host kernels (csrc/romtime_native.cpp).

The library is built on first use with the system toolchain and cached next
to the sources; every consumer keeps a pure-numpy fallback, so the framework
works without a compiler.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_SOURCE = os.path.join(_CSRC, "romtime_native.cpp")
_SOLIB = os.path.join(_CSRC, "libromtime_native.so")


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SOURCE, "-o", _SOLIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SOLIB) or (
                os.path.getmtime(_SOLIB) < os.path.getmtime(_SOURCE)
            ):
                _build()
            lib = ctypes.CDLL(_SOLIB)

            lib.deim_greedy.restype = ctypes.c_int
            lib.deim_greedy.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]

            lib.thomas_solve.restype = ctypes.c_int
            lib.thomas_solve.argtypes = [
                ctypes.POINTER(ctypes.c_double)] * 4 + [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]

            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def deim_greedy(Vf, forbidden=()):
    """Native greedy DEIM selection; returns dof list or None if the native
    path is unavailable/failed."""
    lib = load()
    if lib is None:
        return None

    Vf = np.ascontiguousarray(np.asarray(Vf, dtype=np.float64))
    nh, ns = Vf.shape
    forbidden = np.ascontiguousarray(np.asarray(list(forbidden),
                                                dtype=np.int64))
    out = np.zeros(ns, dtype=np.int64)

    status = lib.deim_greedy(
        Vf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(nh),
        ctypes.c_int64(ns),
        forbidden.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(forbidden)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if status != 0:
        return None
    return [int(d) for d in out]


def thomas_solve(lower, diag, upper, rhs):
    """Native single-system tridiagonal solve (host verification), or None."""
    lib = load()
    if lib is None:
        return None

    arrays = [np.ascontiguousarray(np.asarray(a, dtype=np.float64))
              for a in (lower, diag, upper, rhs)]
    n = arrays[0].shape[0]
    x = np.zeros(n, dtype=np.float64)

    ptrs = [a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrays]
    status = lib.thomas_solve(
        *ptrs, ctypes.c_int64(n),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if status != 0:
        return None
    return x
