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
    try:
        lib = ctypes.CDLL(_SO)
        lib.ppg_suppress_candidates.restype = ctypes.c_int
        lib.ppg_extract_colines.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib
