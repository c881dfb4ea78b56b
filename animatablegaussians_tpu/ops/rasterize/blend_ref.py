"""Pure-JAX per-tile alpha compositing — the differentiable reference for the
Pallas blend kernels and the interpret-mode fallback.

Implements the exact front-to-back semantics of the CUDA renderCUDA kernel
(ref: cuda_rasterizer/forward.cu:261-381) in a *cumulative-product* form that
needs no sequential pixel loop:

  alpha_k   = min(0.99, op_k * exp(power_k)), zeroed when alpha < 1/255 or
              power > 0 (ref skip conditions)
  Pinc_k    = prod_{j<=k} (1 - alpha_j)          (raw running transmittance)
  contrib_k = alpha_k > 0 and Pinc_k >= 1e-4     (early-termination cutoff:
              since Pinc is non-increasing, this reproduces the reference's
              per-pixel `done` flag exactly)
  w_k       = alpha_k * Pinc_{k-1}   for contributing k
  color     = sum w_k c_k ; depth = sum w_k d_k ; T_final = last contributing Pinc

Background blending and mask = 1 - T_final happen *outside* (plain XLA), so
this op's custom gradient surface stays minimal.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99


def pixel_coords(tile: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat within-tile pixel coordinates, row-major: p -> (py, px)."""
    p = jnp.arange(tile * tile)
    return (p % tile).astype(dtype), (p // tile).astype(dtype)


def blend_tiles_ref(
    tile_data: jnp.ndarray,    # (T, 16, K): rows x,y,ca,cb,cc,op,r,g,b,d
    tile_count: jnp.ndarray,   # (T,) int32
    grid_x: int,
    tile: int = 16,
    tile_ids: jnp.ndarray = None,  # (T,) int32 global tile index per row
                                   # (active-tile compaction); default iota
) -> jnp.ndarray:
    """Returns (T, P, 8) with cols [r, g, b, depth, T_final, 0, 0, 0]."""
    T, _, K = tile_data.shape
    P = tile * tile
    px_local, py_local = pixel_coords(tile)

    tids = jnp.arange(T) if tile_ids is None else tile_ids
    ox = (tids % grid_x * tile).astype(jnp.float32)
    oy = (tids // grid_x * tile).astype(jnp.float32)

    def one_tile(data, count, ox, oy):
        x, y = data[0], data[1]
        ca, cb, cc = data[2], data[3], data[4]
        op = data[5]
        col = data[6:9]                              # (3, K)
        dep = data[9]
        pxx = (ox + px_local)[:, None]               # (P, 1)
        pxy = (oy + py_local)[:, None]

        dx = x[None, :] - pxx                        # (P, K)
        dy = y[None, :] - pxy
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(power)
        alpha = jnp.minimum(ALPHA_CLAMP, op[None, :] * G)
        kmask = (jnp.arange(K) < count)[None, :]
        use = kmask & (alpha >= ALPHA_MIN) & (power <= 0.0)
        alpha = jnp.where(use, alpha, 0.0)

        one_minus = 1.0 - alpha
        pinc = jnp.cumprod(one_minus, axis=1)        # (P, K)
        pexc = jnp.concatenate(
            [jnp.ones_like(pinc[:, :1]), pinc[:, :-1]], axis=1)
        contrib = use & (pinc >= T_EPS)
        w = jnp.where(contrib, alpha * pexc, 0.0)

        rgb = jnp.dot(w, col.T, precision=jax.lax.Precision.HIGHEST)  # (P, 3)
        depth = jnp.sum(w * dep[None, :], axis=1)
        t_final = jnp.min(jnp.where(contrib, pinc, 1.0), axis=1)
        zeros = jnp.zeros_like(depth)
        return jnp.stack([rgb[:, 0], rgb[:, 1], rgb[:, 2], depth, t_final,
                          zeros, zeros, zeros], axis=1)

    return jax.vmap(one_tile)(tile_data, tile_count, ox, oy)
