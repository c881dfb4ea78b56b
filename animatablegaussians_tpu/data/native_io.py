"""Numpy-facing wrappers over the native data-loader core, with cv2/scipy
fallbacks so the package works without a compiler."""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from animatablegaussians_tpu.native import load_native


def jpeg_info(path: str):
    lib = load_native()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.agt_jpeg_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(c))
    if rc != 0:
        raise FileNotFoundError(path)
    return w.value, h.value, c.value


def decode_jpeg(path: str, grayscale: bool = False) -> np.ndarray:
    """Single JPEG -> (H, W, 3) BGR uint8 or (H, W) uint8."""
    lib = load_native()
    if lib is None:
        import cv2 as cv
        img = cv.imread(path, cv.IMREAD_GRAYSCALE if grayscale
                        else cv.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    w, h, _ = jpeg_info(path)
    ch = 1 if grayscale else 3
    out = np.empty((h, w, ch) if ch == 3 else (h, w), np.uint8)
    rc = lib.agt_decode_jpeg(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ch)
    if rc != 0:
        raise IOError(f"jpeg decode failed: {path}")
    return out


def decode_jpeg_batch(paths: List[str], grayscale: bool = False,
                      n_threads: int = 8) -> np.ndarray:
    """N same-sized JPEGs -> (N, H, W, 3) BGR or (N, H, W), decoded by the
    C++ thread pool (no GIL)."""
    lib = load_native()
    if lib is None:
        return np.stack([decode_jpeg(p, grayscale) for p in paths])
    w, h, _ = jpeg_info(paths[0])
    ch = 1 if grayscale else 3
    shape = (len(paths), h, w, ch) if ch == 3 else (len(paths), h, w)
    out = np.empty(shape, np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    fails = lib.agt_decode_jpeg_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.strides[0], ch, n_threads)
    if fails:
        raise IOError(f"{fails} jpeg decodes failed")
    return out


def boundary_mask(raw: np.ndarray, kernel_size: int = 5):
    """Binarize + boundary band, same semantics as
    MvRgbDatasetBase.get_boundary_mask (ref: dataset_mv_rgb.py:263-285).
    Returns (boundary bool, binarized bool)."""
    lib = load_native()
    raw = np.ascontiguousarray(raw.astype(np.uint8))
    if lib is None:
        from animatablegaussians_tpu.data.mv_rgb_dataset import \
            MvRgbDatasetBase
        b, m = MvRgbDatasetBase.get_boundary_mask(raw, kernel_size)
        return b, m
    h, w = raw.shape[:2]
    binarized = np.empty((h, w), np.uint8)
    boundary = np.empty((h, w), np.uint8)
    lib.agt_boundary_mask(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        kernel_size,
        binarized.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        boundary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return boundary.astype(bool), binarized.astype(bool)
