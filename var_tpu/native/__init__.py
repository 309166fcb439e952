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


# ---------------------------------------------------------------------------
# shmbuf: POSIX shared-memory obs transport (native/shmbuf.cpp)

_shm_lock = threading.Lock()
_shm_lib = None
_shm_tried = False

_SHM_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "shmbuf.cpp"))
_SHM_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libshmbuf.so"))


def _build_shmbuf() -> bool:
    if not os.path.exists(_SHM_SRC):
        return False
    if os.path.exists(_SHM_SO) and os.path.getmtime(_SHM_SO) >= os.path.getmtime(_SHM_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SHM_SRC, "-o", _SHM_SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def shmbuf():
    """The loaded shmbuf ctypes library, or None if unavailable."""
    global _shm_lib, _shm_tried
    with _shm_lock:
        if _shm_tried:
            return _shm_lib
        _shm_tried = True
        if os.environ.get("VAR_TPU_NO_NATIVE"):
            return None
        if not _build_shmbuf():
            return None
        try:
            lib = ctypes.CDLL(_SHM_SO)
        except OSError:
            return None
        lib.shmbuf_create.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.shmbuf_create.restype = ctypes.c_int
        lib.shmbuf_open.argtypes = [ctypes.c_char_p]
        lib.shmbuf_open.restype = ctypes.c_int
        lib.shmbuf_map.argtypes = [ctypes.c_int, ctypes.c_long]
        lib.shmbuf_map.restype = ctypes.c_void_p
        lib.shmbuf_unmap.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.shmbuf_unmap.restype = ctypes.c_int
        lib.shmbuf_close_fd.argtypes = [ctypes.c_int]
        lib.shmbuf_close_fd.restype = ctypes.c_int
        lib.shmbuf_unlink.argtypes = [ctypes.c_char_p]
        lib.shmbuf_unlink.restype = ctypes.c_int
        _shm_lib = lib
        return _shm_lib
