"""Build-on-first-use compilation of the native kernels.

Compiles topology.cpp into a cached shared library (g++ -O3 -fPIC) under
the package directory; loads via ctypes. All failures degrade to
`native_available() == False` and the NumPy fallbacks take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRCS = [
    os.path.join(os.path.dirname(__file__), "topology.cpp"),
    os.path.join(os.path.dirname(__file__), "fspai.cpp"),
    os.path.join(os.path.dirname(__file__), "rcm.cpp"),
]
_OUT = os.path.join(os.path.dirname(__file__), "_native.so")


def _compile() -> str | None:
    newest_src = max(os.path.getmtime(s) for s in _SRCS)
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= newest_src:
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", *_SRCS, "-o", _OUT],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return _OUT
    except Exception:
        return None


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.first_encounter_unique.restype = ctypes.c_int64
            lib.first_encounter_unique.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.sort_rows.restype = None
            lib.sort_rows.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.fspai_csr.restype = ctypes.c_int64
            lib.fspai_csr.argtypes = [
                ctypes.c_void_p,  # indptr
                ctypes.c_void_p,  # indices
                ctypes.c_void_p,  # values
                ctypes.c_int64,   # n
                ctypes.c_int32,   # alpha
                ctypes.c_int32,   # beta
                ctypes.c_double,  # epsilon
                ctypes.c_void_p,  # rows_out
                ctypes.c_void_p,  # cols_out
                ctypes.c_void_p,  # vals_out
            ]
            lib.rcm_order.restype = ctypes.c_int64
            lib.rcm_order.argtypes = [
                ctypes.c_void_p,  # indptr (int64)
                ctypes.c_void_p,  # indices (int64)
                ctypes.c_int64,   # n
                ctypes.c_void_p,  # perm_out (int64)
            ]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
