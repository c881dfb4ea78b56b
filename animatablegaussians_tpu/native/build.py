"""Build + load the native data-loader library (ctypes).

Compiled on first use with g++ (no pybind11 in this image; plain C ABI +
ctypes). The .so is cached next to the source and rebuilt when the source
is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cpp")
_SO = os.path.join(_HERE, "libagt_dataloader.so")
_lock = threading.Lock()
_lib = None


def _compile() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO, "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> ctypes.CDLL | None:
    """Returns the loaded library or None if the toolchain is unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None

        lib.agt_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.agt_jpeg_info.restype = ctypes.c_int
        lib.agt_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.agt_decode_jpeg.restype = ctypes.c_int
        lib.agt_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int]
        lib.agt_decode_jpeg_batch.restype = ctypes.c_int
        lib.agt_boundary_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.agt_boundary_mask.restype = None
        _lib = lib
        return _lib
