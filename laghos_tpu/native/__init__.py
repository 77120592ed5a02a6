"""ctypes bindings for the native setup kernels (NumPy fallback built in).

The shared library is built on demand:  make -C laghos_tpu/native
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, "libsetup.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", here], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.unify_rows.restype = ctypes.c_int64
        lib.unify_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def unify_rows(keys: np.ndarray):
    """Deduplicate rows of an int64 matrix.

    Returns (ndof, inverse int32 (nrows,), first int64 (ndof,)) where
    `first` maps each unique row id to an example original row index.
    Unique ids are assigned in lexicographic row order (matching
    np.unique(axis=0)).
    """
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    nrows, ncols = keys.shape
    lib = _load()
    if lib is not None and nrows > 0:
        inverse = np.empty(nrows, dtype=np.int32)
        first = np.empty(nrows, dtype=np.int64)
        n = lib.unify_rows(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nrows, ncols,
            inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return int(n), inverse, first[:n].copy()
    # NumPy fallback
    uniq, first, inverse = np.unique(keys, axis=0, return_index=True,
                                     return_inverse=True)
    return uniq.shape[0], inverse.astype(np.int32), first.astype(np.int64)
