"""Python bindings for the native topology kernels (NumPy in/out)."""

from __future__ import annotations

import numpy as np

from .build import get_lib

__all__ = ["first_encounter_unique_native"]


def first_encounter_unique_native(keys: np.ndarray):
    """Native first-encounter unique over int32 rows; None if unavailable.

    keys must be C-contiguous (n, k) int32 with rows already normalized.
    Returns (unique_rows, ids) like geometry.triangulation.first_encounter_unique.
    """
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    n, k = keys.shape
    ids = np.empty(n, dtype=np.int32)
    uniq = np.empty((n, k), dtype=np.int32)
    n_uniq = lib.first_encounter_unique(
        keys.ctypes.data, n, k, ids.ctypes.data, uniq.ctypes.data
    )
    if n_uniq < 0:
        return None
    return uniq[:n_uniq].copy(), ids
