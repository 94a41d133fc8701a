"""Native (C++) components: exact statevector oracle.

Compiled on demand with g++ (ctypes binding -- no pybind11 in the image);
falls back gracefully when no compiler is available (callers use the NumPy
oracle instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "statevector.cpp")
_LIB = os.path.join(_DIR, "libstatevector.so")
_lib = None
_build_failed = False


def _ensure_built():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True, text=True)
        lib = ctypes.CDLL(_LIB)
        lib.ki_evolve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_double, ctypes.c_int]
        lib.ki_sz_sites.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def ki_evolve_exact(psi: np.ndarray, L: int, J: float, h_fields, tau: float,
                    theta: float, n_periods: int) -> np.ndarray:
    """Evolve a complex128 statevector [2^L] in place-copy by n_periods of
    the reference Floquet unitary; returns the evolved vector."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native statevector library unavailable")
    state = np.ascontiguousarray(psi, dtype=np.complex128).copy()
    h = np.ascontiguousarray(h_fields, dtype=np.float64)
    lib.ki_evolve(state.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                  L, float(J),
                  h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                  float(tau), float(theta), int(n_periods))
    return state


def ki_sz_sites(psi: np.ndarray, L: int) -> np.ndarray:
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native statevector library unavailable")
    state = np.ascontiguousarray(psi, dtype=np.complex128)
    out = np.zeros(L, dtype=np.float64)
    lib.ki_sz_sites(state.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    L, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
