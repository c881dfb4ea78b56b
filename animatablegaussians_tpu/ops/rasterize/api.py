"""Public rasterization API — functional equivalent of the reference's
`render3` (ref: gaussians/gaussian_renderer.py:19-106) with the same output
contract: color, depth, alpha mask, radii.

Composition:
    preprocess (XLA, autodiff) -> pack per-Gaussian rows -> binning (int) ->
    active-tile compaction (top-A tiles by count; empty tiles never reach
    the kernels) -> gather per-tile lists -> tile blend (Pallas kernel or
    pure-JAX ref) -> scatter tiles back + background blend (XLA).

Gradient route: the VJP of the per-tile row gather is a scatter-add — the
op the CUDA backward does with atomicAdd from every pixel (ref:
backward.cu:555-598). XLA's TPU scatter cost is dominated by a per-index
fixed cost that amortizes over wide rows (measured on v5e: 524k x 10-f32
rows = 85 ms, 524k x 128-f32 rows = 35 ms), so the backward scatters
lane-padded 128-wide rows and slices the 16 live channels after — combined
with compaction this is ~10x cheaper than the round-1 full-grid scatter.
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
    # static cap on non-empty tiles actually blended (top-A by count);
    # 0 disables compaction. Tiles beyond the cap render as background and
    # are counted in n_overflow.
    max_active_tiles: int = 6144
    # lane width of the backward scatter rows (>=16; 128 = fastest on v5e)
    scatter_pad: int = 128
    # ragged mode: >0 switches binning/blending to the flat chunked layout
    # (see binning.RaggedBins) with this many chunk_kb-pair chunks. Removes
    # the per-tile k_max cap entirely (never-drop within tiles, like the
    # CUDA flat pair list) and shrinks gather/scatter volume from A*k_max
    # slots to the padded true pair count. Requires the pallas backend (or
    # interpret mode off-TPU); k_max is ignored.
    n_chunks: int = 0
    # pairs per chunk (multiple of 128). Wider chunks = fewer kernel grid
    # iterations but more per-tile padding; 256 balances both at the
    # measured bench-scale count distribution.
    chunk_kb: int = 128
    # static budget for the compact pair expansion+sort (binning.
    # _expand_pairs); 0 = legacy N*max_dup capacity. Autosize sets ~1.5x
    # the measured true pair count — the sort/gather volume scales with
    # this, not with N*max_dup.
    max_pairs: int = 0
    # "auto": Pallas kernel on TPU, pure-XLA reference blend elsewhere
    # (interpret-mode pallas emulation is pathologically slow to compile
    # on CPU); "pallas" | "ref" force a backend.
    backend: str = "auto"


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
# Tile gather with a lane-padded scatter-add VJP.
# ---------------------------------------------------------------------------

_N_LIVE_CH = 10  # packed rows: [x y ca cb cc op r g b d | 6 pad lanes]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_tiles(rows, tile_gid, scatter_pad: int):
    """(N, 16) rows -> (A, 16, K) lane-major per-tile data. The backward
    scatter-adds ``scatter_pad``-wide rows (semantics of the CUDA atomicAdd
    accumulation, ref: backward.cu:555-598)."""
    return jnp.swapaxes(rows[tile_gid], 1, 2)


def _gt_fwd(rows, tile_gid, scatter_pad):
    return _gather_tiles(rows, tile_gid, scatter_pad), \
        (tile_gid, rows.shape)


def _gt_bwd(scatter_pad, res, g):
    tile_gid, rows_shape = res
    N, C = rows_shape
    g = jnp.swapaxes(g, 1, 2)                       # (A, K, 16)
    live = g[..., :_N_LIVE_CH].reshape(-1, _N_LIVE_CH)
    pad = max(scatter_pad, _N_LIVE_CH)
    up = jnp.concatenate(
        [live, jnp.zeros((live.shape[0], pad - _N_LIVE_CH), g.dtype)],
        axis=1)
    acc = jnp.zeros((N, pad), g.dtype).at[tile_gid.reshape(-1)].add(up)
    grad = jnp.zeros(rows_shape, g.dtype).at[:, :_N_LIVE_CH].set(
        acc[:, :_N_LIVE_CH])
    return grad, jnp.zeros(tile_gid.shape, jax.dtypes.float0)


_gather_tiles.defvjp(_gt_fwd, _gt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_tiles_compressed(rows, tile_gid, pair_slot, pair_gid,
                             scatter_pad: int):
    """Rect-mode tile gather whose VJP scatter-adds only the S=max_pairs
    REAL pair rows (gathered out of the padded (A, K) cotangent via the
    binning pair_slot map) instead of all A*K padded slots. Semantically
    identical to _gather_tiles — the blend kernel zeroes gradients on dead
    slots (k >= count), so dropping them is exact — but the scatter volume
    is the true pair count, not the padding (5.24M -> 1.6M at bench scale,
    210 ms -> ~35 ms measured scatter cost)."""
    return jnp.swapaxes(rows[tile_gid], 1, 2)


def _gtc_fwd(rows, tile_gid, pair_slot, pair_gid, scatter_pad):
    return _gather_tiles_compressed(rows, tile_gid, pair_slot, pair_gid,
                                    scatter_pad), \
        (tile_gid.shape, rows.shape, pair_slot, pair_gid)


def _gtc_bwd(scatter_pad, res, g):
    (A, K), (N, C), pair_slot, pair_gid = res
    g = jnp.swapaxes(g, 1, 2).reshape(A * K, C)     # (A*K, 16)
    # dead slots point at A*K (clamped to a garbage row) but their gid is
    # the sentinel N, so the garbage lands in the sliced-away row.
    glive = g[jnp.minimum(pair_slot, A * K - 1), :_N_LIVE_CH]   # (S, 10)
    pad = max(scatter_pad, _N_LIVE_CH)
    up = jnp.concatenate(
        [glive, jnp.zeros((glive.shape[0], pad - _N_LIVE_CH), g.dtype)],
        axis=1)
    acc = jnp.zeros((N + 1, pad), g.dtype).at[pair_gid].add(up)
    grad = jnp.zeros((N, C), g.dtype).at[:, :_N_LIVE_CH].set(
        acc[:N, :_N_LIVE_CH])
    return (grad,
            jnp.zeros((A, K), jax.dtypes.float0),
            jnp.zeros(pair_slot.shape, jax.dtypes.float0),
            jnp.zeros(pair_gid.shape, jax.dtypes.float0))


_gather_tiles_compressed.defvjp(_gtc_fwd, _gtc_bwd)


# ---------------------------------------------------------------------------
# Ragged binning + chunk-data build in ONE pass: the 10 live row channels
# ride the tile sort as payload operands (binning._expand_pairs), so the
# blend kernels' (C, 16, KB) input comes from contiguous kb-slices of the
# sorted arrays instead of a per-pair row gather. Mathematically
# chunk_data == rows_sentinel[chunk_gid] (lanes >= chunk_n zeroed), so the
# VJP w.r.t. rows is the same lane-padded scatter-add as _gather_tiles
# (the CUDA atomicAdd accumulation, ref: backward.cu:555-598); binning's
# integer bookkeeping gets no gradient, matching the previous composition's
# stop_gradients.
# ---------------------------------------------------------------------------


def _splat_chunks_impl(rows, radii, valid, img_w, img_h, config):
    from .binning import bin_gaussians_ragged
    bins, chunk_data = bin_gaussians_ragged(
        rows[:, :2], rows[:, 9], radii, valid, img_w, img_h,
        tile=config.tile, max_dup=config.max_dup,
        n_chunks=config.n_chunks, kb=config.chunk_kb,
        max_active_tiles=config.max_active_tiles,
        max_pairs=config.max_pairs,
        payload=rows[:, :_N_LIVE_CH])
    # Tag the binning products for selective rematerialization: under
    # jax.checkpoint(..., policy=save_only_these_names("binned")) the
    # backward recompute restarts FROM these arrays instead of re-running
    # the pair expansion + 1.6M-slot tile sort (~50-60 ms at bench scale;
    # the arrays are ~185 MB at bench caps — the full-res image stack a
    # plain checkpoint avoids stays unsaved either way). Used by the
    # batched train step (training/avatar_trainer.compute_losses_batched).
    from jax.ad_checkpoint import checkpoint_name
    chunk_data = checkpoint_name(chunk_data, "binned")
    bins = type(bins)(*(checkpoint_name(b, "binned") for b in bins))
    return chunk_data, bins


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _splat_chunks(rows, radii, valid, img_w: int, img_h: int, config):
    return _splat_chunks_impl(rows, radii, valid, img_w, img_h, config)


def _sc_fwd(rows, radii, valid, img_w, img_h, config):
    chunk_data, bins = _splat_chunks_impl(rows, radii, valid, img_w, img_h,
                                          config)
    return (chunk_data, bins), (bins.chunk_gid, rows.shape)


def _sc_bwd(img_w, img_h, config, res, ct):
    chunk_gid, rows_shape = res
    g = ct[0]                                       # (C, 16, KB) cotangent
    N, C = rows_shape
    g = jnp.swapaxes(g, 1, 2)                       # (C_chunks, KB, 16)
    live = g[..., :_N_LIVE_CH].reshape(-1, _N_LIVE_CH)
    pad = max(config.scatter_pad, _N_LIVE_CH)
    up = jnp.concatenate(
        [live, jnp.zeros((live.shape[0], pad - _N_LIVE_CH), g.dtype)],
        axis=1)
    # pad lanes carry gid == N: their (zero) grads land in the sliced-away
    # sentinel row of the (N+1, pad) accumulator
    acc = jnp.zeros((N + 1, pad), g.dtype).at[chunk_gid.reshape(-1)].add(up)
    grad = jnp.zeros(rows_shape, g.dtype).at[:, :_N_LIVE_CH].set(
        acc[:N, :_N_LIVE_CH])
    f0 = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return grad, f0(jnp.zeros((N,), jnp.int32)), f0(jnp.zeros((N,), bool))


_splat_chunks.defvjp(_sc_fwd, _sc_bwd)


def _blend(tile_data, tile_count, tile_ids, grid_x, tile, backend):
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    if backend == "pallas":
        from .blend_pallas import blend_tiles
        return blend_tiles(tile_data, tile_count, tile_ids, grid_x, tile)
    return blend_tiles_ref(tile_data, tile_count, grid_x, tile,
                           tile_ids=tile_ids)


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
    valid_mask: jnp.ndarray = None,  # (N,) bool: statically-invalid points
                                     # (block-packing pads) are never binned
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
    if valid_mask is not None:
        pre = pre._replace(valid=pre.valid & valid_mask,
                           radii=jnp.where(valid_mask, pre.radii, 0))

    rows = _pack_rows(pre, opacities, colors)          # (N, 16)

    grid_x = -(-img_w // config.tile)
    grid_y = -(-img_h // config.tile)
    T = grid_x * grid_y
    P = config.tile * config.tile
    A = min(config.max_active_tiles or T, T)

    if config.n_chunks > 0:
        from .blend_pallas import blend_chunks
        # binning + chunk-data build in one pass (payload-sort route; the
        # rows channels NOT fed separately here — means2d/depths are rows
        # channels 0:2 and 9)
        chunk_data, bins = _splat_chunks(rows, pre.radii, pre.valid,
                                         img_w, img_h, config)
        n_overflow = bins.n_overflow
        counts_a, tile_ids = bins.tile_count, bins.tile_ids
        out_a = blend_chunks(chunk_data, bins.chunk_n, bins.chunk_tid,
                             bins.chunk_first, bins.chunk_arow, A, grid_x,
                             config.tile)                # (A, P, 8)
        # rows of active-list tiles that got no chunk (empty tiles) are
        # undefined kernel memory: mask them to background
        bg_row = jnp.zeros((1, P, 8), jnp.float32).at[:, :, 4].set(1.0)
        out_a = jnp.where((counts_a > 0)[:, None, None], out_a, bg_row)
    else:
        # binning performs active-tile compaction internally (top-A tiles
        # by count; empty tiles never reach the kernels or the gradient
        # scatter)
        bins = bin_gaussians(pre.means2d, pre.depths, pre.radii, pre.valid,
                             img_w, img_h, tile=config.tile,
                             max_dup=config.max_dup, k_max=config.k_max,
                             max_active_tiles=config.max_active_tiles,
                             max_pairs=config.max_pairs)
        n_overflow = bins.n_overflow
        counts_a, tile_ids, tile_gid = (bins.tile_count, bins.tile_ids,
                                        bins.tile_gid)

        tile_data = _gather_tiles_compressed(rows, tile_gid, bins.pair_slot,
                                             bins.pair_gid,
                                             config.scatter_pad)

        out_a = _blend(tile_data, counts_a, tile_ids, grid_x, config.tile,
                       config.backend)                     # (A, P, 8)

    if A < T:
        base = jnp.zeros((T, P, 8), jnp.float32).at[:, :, 4].set(1.0)
        out = base.at[tile_ids].set(out_a, unique_indices=True)
    else:
        out = out_a

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
                n_overflow=n_overflow, n_pairs=bins.n_pairs)


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
