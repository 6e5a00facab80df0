"""Native (C++) fast paths, loaded via ctypes with transparent build-on-first-use.

Currently: ``edt`` — exact Euclidean distance transform (scipy-compatible) used by
the HD95/ASSD surface metrics. Falls back to scipy upstream if the toolchain is
unavailable (see ``cenet_tpu/evaluate/metrics.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "edt.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libcenet_edt.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    lib.cenet_edt.restype = ctypes.c_int
    lib.cenet_edt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def edt(mask: np.ndarray, sampling=None) -> np.ndarray:
    """scipy.ndimage.distance_transform_edt equivalent (C++ fast path).

    For non-zero elements of ``mask``: distance to the nearest zero element.
    """
    lib = _load()
    m = np.ascontiguousarray(mask.astype(np.uint8))
    if m.ndim > 3:
        raise ValueError("edt supports ndim<=3")
    out = np.empty(m.shape, np.float64)
    shape = (ctypes.c_int64 * m.ndim)(*m.shape)
    if sampling is not None:
        samp_arr = np.asarray(sampling, np.float64)
        if samp_arr.ndim == 0:
            samp_arr = np.full((m.ndim,), float(samp_arr))
        samp = (ctypes.c_double * m.ndim)(*samp_arr)
    else:
        samp = None
    rc = lib.cenet_edt(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ndim,
        shape,
        samp,
    )
    if rc != 0:
        raise RuntimeError(f"cenet_edt failed with code {rc}")
    return out
