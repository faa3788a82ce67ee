"""Native (C++) components, loaded via ctypes.

Builds on first use into ``libpacker.so`` next to the sources (g++ is in
the image); every consumer falls back to the numpy implementation when the
toolchain or the .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpacker.so")
_SRC = os.path.join(_DIR, "packer.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The packer library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.pack_batch.restype = ctypes.c_int
        lib.pack_batch_blocked.restype = ctypes.c_int
        lib.plan_epoch.restype = ctypes.c_int64
        lib.sample_negatives.restype = ctypes.c_int64
        lib.sample_negatives_blocked.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib
