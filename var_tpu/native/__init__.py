"""ctypes loader for the native simcore library (optional, auto-built).

Compiles native/simcore.cpp with g++ on first import (cached beside the
source). All users must handle `simcore() is None` and fall back to the
numpy path — the framework never hard-requires the native library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "simcore.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libsimcore.so"))


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def simcore():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("VAR_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.raycast_render.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            u8p, u8p, u8p, u8p,
        ]
        lib.raycast_render.restype = None
        lib.rotate_crop.argtypes = [u8p, ctypes.c_int, ctypes.c_float, u8p]
        lib.rotate_crop.restype = None
        _lib = lib
        return _lib
