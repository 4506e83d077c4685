"""Native (C++) host runtime pieces, loaded via ctypes.

The shared library is compiled on demand from the sources in this directory
(g++ is baked into the image; no pip/pybind dependencies). Python
implementations remain the behavioral spec and fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libppg_graph.so")
_SRC = os.path.join(_DIR, "graph_builder.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native graph-builder library, building it on first use."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    def _load():
        lib = ctypes.CDLL(_SO)
        lib.ppg_suppress_candidates.restype = ctypes.c_int
        lib.ppg_extract_colines.restype = ctypes.c_int
        lib.ppg_build_graph.restype = ctypes.c_int
        lib.ppg_remap.restype = None
        lib.ppg_pair_geometry.restype = None
        lib.ppg_finalize_graph.restype = ctypes.c_int
        return lib

    try:
        _lib = _load()
    except (OSError, AttributeError):
        # missing symbol = stale .so that predates the current API: rebuild
        if not _build():
            _lib = None
            return _lib
        try:
            _lib = _load()
        except (OSError, AttributeError):
            _lib = None
    return _lib


def pair_geometry_native(kp_un):
    """dist/ang matrices via the native lib (std::atan2 float — bit-identical
    to the reference); None when the lib is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    kp = np.ascontiguousarray(kp_un, np.float32)
    k = len(kp)
    dist = np.zeros((k, k), np.float32)
    ang = np.zeros((k, k), np.float32)
    lib.ppg_pair_geometry(
        kp.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(k),
        dist.ctypes.data_as(ctypes.c_void_p),
        ang.ctypes.data_as(ctypes.c_void_p))
    return dist, ang
