"""Build/load the native shared library (g++ -O3, cached)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dtc_native.cpp")
_LIB = os.path.join(_HERE, "libdtc_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
           "-fPIC", _SRC, "-o", _LIB + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        need_build = (not os.path.exists(_LIB) or
                      os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if need_build and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        lib.dtc_decode.restype = ctypes.c_longlong
        lib.dtc_decode.argtypes = [c_u8p, ctypes.c_longlong,
                                   ctypes.c_longlong, ctypes.c_int, c_u8p]
        lib.dtc_parse.restype = ctypes.c_longlong
        lib.dtc_parse.argtypes = [c_u8p, ctypes.c_longlong,
                                  ctypes.c_longlong, ctypes.c_int, c_u8p,
                                  c_u8p, c_i64p, c_u8p]
        lib.dfs_layout.restype = ctypes.c_longlong
        lib.dfs_layout.argtypes = [ctypes.c_longlong, c_u32p, c_i64p,
                                   ctypes.c_uint32, c_u32p, c_i32p, c_u8p,
                                   c_i64p]
        lib.scan_query.restype = ctypes.c_longlong
        lib.scan_query.argtypes = [c_u8p, ctypes.c_longlong, ctypes.c_int,
                                   ctypes.c_int, c_f32p, ctypes.c_int,
                                   c_f32p, c_i64p]
        lib.diff_index_decode.restype = ctypes.c_longlong
        lib.diff_index_decode.argtypes = [c_u8p, ctypes.c_longlong,
                                          ctypes.c_longlong, ctypes.c_int,
                                          c_u8p]
        _lib = lib
        return _lib


def have_native() -> bool:
    return get_lib() is not None
