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

_SRC = os.path.join(os.path.dirname(__file__), "topology.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_native.so")


def _compile() -> str | None:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _OUT],
            check=True,
            capture_output=True,
            timeout=120,
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
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
