"""Camera math: FoV conversion, OpenGL-style projection with off-center
principal point, world->view transforms.

Conventions match the reference renderer (ref: utils/graphics_utils.py:51-85,
gaussians/gaussian_renderer.py:44-67): camera looks down +z in view space,
extr is world->view (row-major, applied as x_view = extr @ [x_world, 1]),
znear=0.1 / zfar=100 by default.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def projection_matrix(znear: float, zfar: float, K: np.ndarray,
                      img_w: int, img_h: int) -> np.ndarray:
    """Perspective projection supporting an off-center principal point.

    Maps view space to clip space; after perspective divide, x,y are in
    [-1, 1] NDC with the principal-point offset folded in, and z maps to
    [0, 1]-ish with w = z_view (ref: utils/graphics_utils.py:51-79).
    """
    near_fx = znear / K[0, 0]
    near_fy = znear / K[1, 1]
    left = -(img_w - K[0, 2]) * near_fx
    right = K[0, 2] * near_fx
    bottom = (K[1, 2] - img_h) * near_fy
    top = K[1, 2] * near_fy

    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def full_projection(extr: jnp.ndarray, intr: jnp.ndarray, img_w: int,
                    img_h: int, znear: float = 0.1,
                    zfar: float = 100.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (view 4x4, full projection 4x4 = P @ extr) as jnp arrays.

    Both are stored row-major and applied to column vectors.
    """
    K = np.asarray(intr, dtype=np.float32)
    P = projection_matrix(znear, zfar, K, img_w, img_h)
    extr = jnp.asarray(extr, dtype=jnp.float32)
    full = jnp.asarray(P) @ extr
    return extr, full


def camera_center(extr: jnp.ndarray) -> jnp.ndarray:
    """World-space camera position from a world->view matrix."""
    R = extr[:3, :3]
    t = extr[:3, 3]
    return -R.T @ t


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """(R, t) with R world->cam rotation stored transposed as in colmap
    convention -> 4x4 world->view (ref: utils/graphics_utils.py:31-36)."""
    Rt = np.zeros((4, 4), dtype=np.float32)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return Rt
