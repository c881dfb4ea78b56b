"""Public rasterization API — functional equivalent of the reference's
`render3` (ref: gaussians/gaussian_renderer.py:19-106) with the same output
contract: color, depth, alpha mask, radii.

Composition:
    preprocess (XLA, autodiff) -> pack per-Gaussian rows -> binning (int) ->
    gather per-tile lists (take; its VJP is the scatter-add the CUDA backward
    does with atomics) -> tile blend (Pallas kernel or pure-JAX ref) ->
    untile + background blend (XLA).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .binning import bin_gaussians
from .blend_ref import blend_tiles_ref
from .preprocess import preprocess


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile: int = 16          # pixels per tile side (ref: config.h BLOCK_X/Y)
    max_dup: int = 16       # static cap on tiles touched per Gaussian
    k_max: int = 512        # static cap on Gaussians per tile
    # "auto": Pallas kernel on TPU, pure-XLA reference blend elsewhere
    # (interpret-mode pallas emulation is pathologically slow to compile
    # on CPU); "pallas" | "ref" force a backend.
    backend: str = "auto"
    # gradient route for the tile gather: "scatter" = plain take-VJP
    # (XLA scatter-add; measured 0.37s at AvatarReX scale), "permute" =
    # sort-inversion gathers (0.66s — TPU row-gather at 64B granularity
    # loses to the scatter; kept for future pallas-gather work)
    grad_gather: str = "scatter"


def _pack_rows(pre, opacities, colors):
    """(N,...) fields -> (N, 16) rows [x y ca cb cc op r g b d 0..]."""
    N = opacities.shape[0]
    zeros = jnp.zeros((N,), jnp.float32)
    op = jnp.where(pre.valid, opacities.reshape(N), 0.0)
    return jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1],
        pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2],
        op,
        colors[:, 0], colors[:, 1], colors[:, 2],
        pre.depths,
        zeros, zeros, zeros, zeros, zeros, zeros,
    ], axis=1)


# ---------------------------------------------------------------------------
# Scatter-free tile gather.
#
# The VJP of a plain `rows[tile_gid]` gather is an XLA scatter-add over
# T*K entries — measured at ~335ms of a ~370ms splat backward at AvatarReX
# scale (518k Gaussians, 1500x2048). The CUDA reference pays the same cost
# as atomicAdd traffic (ref: backward.cu:555-598). Here the binning sort's
# permutation is inverted instead, so the backward is three gathers + one
# int sort + a max_dup-width segment sum: sorted position -> (tile, slot)
# via searchsorted on `starts`, then position -> source entry via the
# carried `sorted_src`, then depth-rank -> gaussian id via `order`.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gather_tile_rows(rows, tile_gid, starts, sorted_src, sorted_key, order,
                      k_max: int, max_dup: int):
    """(N, 16) rows -> (T, 16, K) per-tile lane-major tile data."""
    return jnp.swapaxes(rows[tile_gid], 1, 2)


def _gtr_fwd(rows, tile_gid, starts, sorted_src, sorted_key, order,
             k_max, max_dup):
    out = _gather_tile_rows(rows, tile_gid, starts, sorted_src, sorted_key,
                            order, k_max, max_dup)
    return out, (tile_gid, starts, sorted_src, sorted_key, order,
                 rows.shape[0])


def _gtr_bwd(k_max, max_dup, res, g):
    tile_gid, starts, sorted_src, sorted_key, order, N = res
    g = jnp.swapaxes(g, 1, 2)                       # (T, K, C)
    T, _, C = g.shape
    ND = N * max_dup
    s_idx = jnp.arange(ND, dtype=jnp.int32)

    # (tile, slot) of each sorted position: the tile IS the sort key (no
    # searchsorted — XLA's vectorized binary search costs ~0.8s at 8M);
    # slot = position - tile range start.
    t = jnp.minimum(sorted_key, T - 1)
    k = s_idx - starts[jnp.minimum(sorted_key, T)]
    valid = (sorted_key < T) & (k < k_max)
    # linear (tile, slot) index per sorted position, invalid -> 0 w/ mask
    tk = jnp.where(valid, t * k_max + jnp.minimum(k, k_max - 1), 0)

    # invert the tile sort with a permutation scatter (unique indices, no
    # accumulation — ~5ms where a pair sort costs ~1s)
    inv_pos = jnp.zeros((ND,), jnp.int32).at[sorted_src].set(
        s_idx, unique_indices=True)
    tk_flat = tk[inv_pos]
    valid_flat = valid[inv_pos]

    # single fp row gather in flat entry order, then the per-rank dup sum
    grad_flat = jnp.where(valid_flat[:, None],
                          g.reshape(T * k_max, C)[tk_flat], 0.0)
    per_rank = grad_flat.reshape(N, max_dup, C).sum(1)          # (N, C)
    inv_order = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True)
    grad_rows = per_rank[inv_order]
    z = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return (grad_rows, z(tile_gid), z(starts), z(sorted_src),
            z(sorted_key), z(order))


_gather_tile_rows.defvjp(_gtr_fwd, _gtr_bwd)


_N_LIVE_CH = 10  # packed rows: [x y ca cb cc op r g b d | 6 pad lanes]


@jax.custom_vjp
def _gather_scatter10(rows, tile_gid):
    """Plain tile gather whose backward scatter-adds only the 10 live
    channels (the 6 pad lanes always carry zero gradient). Measured: same
    0.37s as the full-width take-VJP at AvatarReX scale — XLA's TPU scatter
    cost is per-index, not per-byte — kept because it is never slower and
    shrinks the grad buffer."""
    return jnp.swapaxes(rows[tile_gid], 1, 2)


def _gs10_fwd(rows, tile_gid):
    return _gather_scatter10(rows, tile_gid), (tile_gid, rows.shape)


def _gs10_bwd(res, g):
    tile_gid, rows_shape = res
    g = jnp.swapaxes(g, 1, 2)                       # (T, K, 16)
    live = g[..., :_N_LIVE_CH].reshape(-1, _N_LIVE_CH)
    grad10 = jnp.zeros((rows_shape[0], _N_LIVE_CH), g.dtype
                       ).at[tile_gid.reshape(-1)].add(live)
    grad = jnp.zeros(rows_shape, g.dtype).at[:, :_N_LIVE_CH].set(grad10)
    return grad, jnp.zeros(tile_gid.shape, jax.dtypes.float0)


_gather_scatter10.defvjp(_gs10_fwd, _gs10_bwd)


def _blend(tile_data, tile_count, grid_x, tile, backend):
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    if backend == "pallas":
        from .blend_pallas import blend_tiles
        return blend_tiles(tile_data, tile_count, grid_x, tile)
    return blend_tiles_ref(tile_data, tile_count, grid_x, tile)


def _untile(img_t, grid_x, grid_y, tile, img_h, img_w):
    """(T, P) per-tile pixels -> (H, W) image crop."""
    img = img_t.reshape(grid_y, grid_x, tile, tile)
    img = img.transpose(0, 2, 1, 3).reshape(grid_y * tile, grid_x * tile)
    return img[:img_h, :img_w]


@partial(jax.jit, static_argnames=("img_w", "img_h", "config",
                                   "max_sh_degree"))
def render(
    means3d: jnp.ndarray,      # (N, 3) world space
    scales: jnp.ndarray,       # (N, 3) activated
    rotations: jnp.ndarray,    # (N, 4) unit quats wxyz
    opacities: jnp.ndarray,    # (N,) or (N, 1) activated
    colors: jnp.ndarray,       # (N, 3) precomputed RGB, or None with shs
    bg_color: jnp.ndarray,     # (3,)
    extr: jnp.ndarray,         # (4, 4) world->view
    intr: jnp.ndarray,         # (3, 3) K  (static contents used for proj)
    img_w: int,
    img_h: int,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    shs: jnp.ndarray = None,   # (N, (deg+1)^2, 3) SH coeffs (alt. to colors)
    max_sh_degree: int = 0,
) -> dict:
    assert (colors is None) != (shs is None) or shs is None, \
        "pass colors or shs, not both"
    if colors is None:
        colors = precompute_sh_colors(shs, max_sh_degree, means3d, extr)
    # FoV from intrinsics (ref: gaussian_renderer.py:45-48); works traced.
    fx = intr[0, 0]
    fy = intr[1, 1]
    tan_fovx = img_w / (2.0 * fx)
    tan_fovy = img_h / (2.0 * fy)

    viewmatrix, projmatrix = _full_projection_traced(extr, intr, img_w, img_h)

    pre = preprocess(means3d, scales, rotations, viewmatrix, projmatrix,
                     tan_fovx, tan_fovy, img_w, img_h, scale_modifier)

    rows = _pack_rows(pre, opacities, colors)          # (N, 16)

    bins = bin_gaussians(pre.means2d, pre.depths, pre.radii, pre.valid,
                         img_w, img_h, tile=config.tile,
                         max_dup=config.max_dup, k_max=config.k_max)

    # Gather per-tile rows as (T, 16, K) lane-major tile data.
    if config.grad_gather == "permute":
        tile_data = _gather_tile_rows(rows, bins.tile_gid, bins.starts,
                                      bins.sorted_src, bins.sorted_key,
                                      bins.order, config.k_max,
                                      config.max_dup)
    else:
        tile_data = _gather_scatter10(rows, bins.tile_gid)

    grid_x = -(-img_w // config.tile)
    grid_y = -(-img_h // config.tile)

    out = _blend(tile_data, bins.tile_count, grid_x, config.tile,
                 config.backend)                       # (T, P, 8)

    untile = lambda ch: _untile(out[:, :, ch], grid_x, grid_y, config.tile,
                                img_h, img_w)
    t_final = untile(4)
    color = jnp.stack([untile(0), untile(1), untile(2)], axis=-1)
    color = color + t_final[..., None] * bg_color[None, None, :]
    depth = untile(3)
    alpha = 1.0 - t_final

    return dict(render=color, depth=depth, mask=alpha, radii=pre.radii,
                visibility_filter=pre.radii > 0,   # ref: renderer.py:104
                means2d=pre.means2d,               # viewspace positions
                n_overflow=bins.n_overflow)


def precompute_sh_colors(shs: jnp.ndarray, max_sh_degree: int,
                         means3d: jnp.ndarray,
                         extr: jnp.ndarray) -> jnp.ndarray:
    """SH -> per-Gaussian RGB from the camera-to-point view directions
    (ref: gaussian_renderer.py:78-84). shs: (N, (deg+1)^2, 3)."""
    from animatablegaussians_tpu.ops.sh import eval_sh
    cam_center = -extr[:3, :3].T @ extr[:3, 3]
    dirs = means3d - cam_center[None]
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    rgb = eval_sh(max_sh_degree, jnp.swapaxes(shs, -1, -2), dirs)
    return jnp.maximum(rgb + 0.5, 0.0)


def mark_visible(means3d: jnp.ndarray, extr: jnp.ndarray,
                 znear: float = 0.2) -> jnp.ndarray:
    """Frustum-test mask (ref: GaussianRasterizer.markVisible,
    diff_gaussian_rasterization_depth_alpha/__init__.py:179-188 — near-plane
    cull only, matching auxiliary.h in_frustum)."""
    view = means3d @ extr[:3, :3].T + extr[:3, 3]
    return view[:, 2] > znear


def _full_projection_traced(extr, intr, img_w, img_h,
                            znear=0.1, zfar=100.0):
    """Projection matrix built with jnp so it works under jit with traced
    intrinsics (ref math: utils/graphics_utils.py:51-79)."""
    K = intr
    near_fx = znear / K[0, 0]
    near_fy = znear / K[1, 1]
    left = -(img_w - K[0, 2]) * near_fx
    right = K[0, 2] * near_fx
    bottom = (K[1, 2] - img_h) * near_fy
    top = K[1, 2] * near_fy

    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    extr = extr.astype(jnp.float32)
    return extr, P @ extr
