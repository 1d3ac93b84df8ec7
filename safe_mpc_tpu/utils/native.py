"""ctypes bindings for the native C++ components in ``native/``.

The shared library is built on demand with g++ (cached next to the
sources). Currently exposes the dense Riccati LQR reference solver used
as an implementation-independent oracle for the JAX Riccati sweep."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB = None


def _build() -> str:
    src = os.path.join(NATIVE_DIR, "riccati.cc")
    lib = os.path.join(NATIVE_DIR, "libriccati.so")
    if (not os.path.isfile(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src, "-lm"],
            check=True)
    return lib


def get_lib():
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(_build())
        d = ctypes.POINTER(ctypes.c_double)
        _LIB.riccati_lqr.restype = ctypes.c_int
        _LIB.riccati_lqr.argtypes = [ctypes.c_int] * 3 + [d] * 9 + [d] * 2
    return _LIB


def riccati_lqr(A, B, c, x0, Q, q, R, r, S):
    """Native dense Riccati solve; returns (xs (N+1,nx), us (N,nu)).

    Mirrors `safe_mpc_tpu.ops.qp._riccati_solve` exactly (same problem
    convention incl. cross terms S)."""
    lib = get_lib()
    A, B, c, x0, Q, q, R, r, S = [
        np.ascontiguousarray(np.asarray(a, dtype=np.float64))
        for a in (A, B, c, x0, Q, q, R, r, S)]
    N, nx = c.shape
    nu = B.shape[1]
    xs = np.zeros((N + 1, nx))
    us = np.zeros((N, nu))

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    status = lib.riccati_lqr(N, nx, nu, p(A), p(B), p(c), p(x0), p(Q), p(q),
                             p(R), p(r), p(S), p(xs), p(us))
    if status != 0:
        raise RuntimeError("native riccati_lqr: non-SPD Huu block")
    return xs, us
