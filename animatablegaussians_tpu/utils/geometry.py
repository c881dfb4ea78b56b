"""Geometry helpers: bbox normalization, barycentric coordinates.

(ref: utils/geo_util.py:8-114)
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vert_bbox(verts: jnp.ndarray, attris: jnp.ndarray = None,
                        dim: int = 0, per_axis: bool = False) -> jnp.ndarray:
    """Normalize `attris` (or verts) into the [-1, 1] bbox of `verts`
    (ref: geo_util.py normalize_vert_bbox)."""
    xyz_min = jnp.min(verts, axis=dim, keepdims=True)
    xyz_max = jnp.max(verts, axis=dim, keepdims=True)
    out = attris if attris is not None else verts
    out = out - 0.5 * (xyz_min + xyz_max)
    if per_axis:
        scale = 0.5 * (xyz_max - xyz_min)
    else:
        scale = 0.5 * jnp.max(xyz_max - xyz_min, axis=-1, keepdims=True)
    return out / scale


def barycentric_coords(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                       c: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Barycentric coordinates of points p w.r.t. triangles (a, b, c),
    all (..., 3) -> (..., 3) weights (w_a, w_b, w_c)."""
    v0 = b - a
    v1 = c - a
    v2 = p - a
    d00 = jnp.sum(v0 * v0, axis=-1)
    d01 = jnp.sum(v0 * v1, axis=-1)
    d11 = jnp.sum(v1 * v1, axis=-1)
    d20 = jnp.sum(v2 * v0, axis=-1)
    d21 = jnp.sum(v2 * v1, axis=-1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def barycentric_interp(weights: jnp.ndarray, attrs: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) weights x (..., 3, C) per-corner attrs -> (..., C)."""
    return jnp.sum(weights[..., None] * attrs, axis=-2)
