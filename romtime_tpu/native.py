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
_SOURCES = [
    os.path.join(_CSRC, "romtime_native.cpp"),
    os.path.join(_CSRC, "fom_piston.cpp"),
]
_SOLIB = os.path.join(_CSRC, "libromtime_native.so")


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *_SOURCES, "-o", _SOLIB,
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
            if not os.path.exists(_SOLIB) or any(
                os.path.getmtime(_SOLIB) < os.path.getmtime(src)
                for src in _SOURCES
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

            lib.piston_fom_solve.restype = ctypes.c_int
            lib.piston_fom_solve.argtypes = [
                ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double,                     # L0, nx, nt, dt
                ctypes.c_double, ctypes.c_double,
                ctypes.c_double,                     # a0, alpha, b0
                ctypes.POINTER(ctypes.c_double),     # s_arr
                ctypes.POINTER(ctypes.c_double),     # r_arr
                ctypes.POINTER(ctypes.c_double),     # bL_arr
                ctypes.POINTER(ctypes.c_double),     # dbL_arr
                ctypes.POINTER(ctypes.c_double),     # u0
                ctypes.POINTER(ctypes.c_int64),      # nl_rows
                ctypes.POINTER(ctypes.c_int64),      # nl_cols
                ctypes.c_int64,                      # n_nl
                ctypes.POINTER(ctypes.c_double),     # uh_out
                ctypes.POINTER(ctypes.c_double),     # nl_out
            ]

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


def piston_fom_solve(L0, nx, nt, dt, a0, alpha, b0, s, r, bL, dbL, u0,
                     nl_rows, nl_cols):
    """Native piston FOM time loop (csrc/fom_piston.cpp), or None.

    Returns (uh, nl_data): uh (nt, nh) homogeneous trajectory, nl_data
    (nt, n_nl) gathered trilinear snapshot rows. Per-step scalar arrays
    s/r/bL/dbL are evaluated by the caller from the problem callables.
    """
    lib = load()
    if lib is None:
        return None

    def c_arr(a):
        return np.ascontiguousarray(np.asarray(a, dtype=np.float64))

    s, r, bL, dbL, u0 = map(c_arr, (s, r, bL, dbL, u0))
    nl_rows = np.ascontiguousarray(np.asarray(nl_rows, dtype=np.int64))
    nl_cols = np.ascontiguousarray(np.asarray(nl_cols, dtype=np.int64))
    nh = int(nx) + 1
    n_nl = len(nl_rows)
    uh = np.zeros((int(nt), nh), dtype=np.float64)
    nl = np.zeros((int(nt), max(n_nl, 1)), dtype=np.float64)

    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int64)
    status = lib.piston_fom_solve(
        ctypes.c_double(L0), ctypes.c_int64(nx), ctypes.c_int64(nt),
        ctypes.c_double(dt), ctypes.c_double(a0), ctypes.c_double(alpha),
        ctypes.c_double(b0),
        s.ctypes.data_as(dptr), r.ctypes.data_as(dptr),
        bL.ctypes.data_as(dptr), dbL.ctypes.data_as(dptr),
        u0.ctypes.data_as(dptr),
        nl_rows.ctypes.data_as(iptr), nl_cols.ctypes.data_as(iptr),
        ctypes.c_int64(n_nl),
        uh.ctypes.data_as(dptr), nl.ctypes.data_as(dptr),
    )
    if status != 0:
        return None
    return uh, nl[:, :n_nl]


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
