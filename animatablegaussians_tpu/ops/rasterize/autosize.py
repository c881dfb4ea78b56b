"""Two-pass binning-cap sizing: count pass -> pick static caps -> bin pass.

The CUDA reference sizes its buffers dynamically per frame and never drops a
(gaussian, tile) pair (ref: cuda_rasterizer/rasterizer_impl.cu:278-309). XLA
needs static shapes, so the TPU design measures the workload once per
subject (a cheap count-only pass over sample frames, no blending) and
compiles the step with caps that cover it with margin:

  * the reference scale distribution is the canonical Gaussian init —
    create_from_pcd's KNN scales (ref: gaussians/gaussian_model.py:156-183)
    — which is exactly what the 5k-iter pretrain regresses the CNN onto
    (ref: main_avatar.py:126-164); trained deltas stay near it;
  * caps: max_dup >= max tiles touched by one Gaussian, k_max >= max
    Gaussians in one tile (rounded to the blend kernel's 128 lanes),
    max_active_tiles >= non-empty tiles;
  * drift beyond the margin at train time is caught by the driver's loud
    n_overflow-vs-n_pairs warning (training/driver.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .api import RasterizeConfig, _full_projection_traced
from .binning import tile_rect
from .preprocess import preprocess


class BinningStats(NamedTuple):
    max_tiles_per_gaussian: int
    max_per_tile: int
    n_active_tiles: int
    n_pairs: int
    # 128-pair chunks the ragged layout needs for this frame:
    # sum over active tiles of ceil(count / 128) (see binning.RaggedBins)
    n_chunks: int


@partial(jax.jit, static_argnames=("img_w", "img_h", "tile"))
def _count_pass(points, scales, rotations, extr, intr, img_w: int,
                img_h: int, tile: int, valid_mask=None):
    view, proj = _full_projection_traced(extr, intr, img_w, img_h)
    tan_fovx = img_w / (2.0 * intr[0, 0])
    tan_fovy = img_h / (2.0 * intr[1, 1])
    pre = preprocess(points, scales, rotations, view, proj, tan_fovx,
                     tan_fovy, img_w, img_h, 1.0)
    valid = pre.valid if valid_mask is None else pre.valid & valid_mask
    grid_x = -(-img_w // tile)
    grid_y = -(-img_h // tile)
    rx0, ry0, rx1, ry1 = tile_rect(pre.means2d, pre.radii, grid_x, grid_y,
                                   tile)
    ntiles = jnp.where(valid, (rx1 - rx0) * (ry1 - ry0), 0)
    # per-tile counts via a segment sum over the (clipped) rects: cheaper
    # and simpler here to reuse the dup+sort machinery caps-free is not
    # possible, so count with a bincount over duplicated tile ids capped at
    # the TRUE max tiles per gaussian of this frame.
    return pre, ntiles


def measure_binning_stats(points, scales, rotations, extr, intr,
                          img_w: int, img_h: int, tile: int = 16,
                          valid_mask=None) -> BinningStats:
    """One frame's exact binning workload (host round trip; setup-time only)."""
    pre, ntiles = _count_pass(jnp.asarray(points), jnp.asarray(scales),
                              jnp.asarray(rotations), jnp.asarray(extr),
                              jnp.asarray(intr), img_w, img_h, tile,
                              None if valid_mask is None
                              else jnp.asarray(valid_mask))
    ntiles_np = np.asarray(ntiles)
    max_dup_true = int(ntiles_np.max()) if ntiles_np.size else 0

    # exact per-tile counts with numpy rect accumulation (setup-time only)
    grid_x = -(-img_w // tile)
    grid_y = -(-img_h // tile)
    rx0, ry0, rx1, ry1 = (np.asarray(a) for a in tile_rect(
        jnp.asarray(np.asarray(pre.means2d)), jnp.asarray(
            np.asarray(pre.radii)), grid_x, grid_y, tile))
    live = ntiles_np > 0
    grid = np.zeros((grid_y + 1, grid_x + 1), np.int64)
    # 2-D difference-array accumulation of the clipped rects
    np.add.at(grid, (ry0[live], rx0[live]), 1)
    np.add.at(grid, (ry0[live], rx1[live]), -1)
    np.add.at(grid, (ry1[live], rx0[live]), -1)
    np.add.at(grid, (ry1[live], rx1[live]), 1)
    counts = grid.cumsum(0).cumsum(1)[:grid_y, :grid_x]
    return BinningStats(
        max_tiles_per_gaussian=max_dup_true,
        max_per_tile=int(counts.max()),
        n_active_tiles=int((counts > 0).sum()),
        n_pairs=int(ntiles_np.sum()),
        n_chunks=int(-(-counts // 128).sum()),
    )


def merge_stats(stats_list) -> BinningStats:
    return BinningStats(
        max(s.max_tiles_per_gaussian for s in stats_list),
        max(s.max_per_tile for s in stats_list),
        max(s.n_active_tiles for s in stats_list),
        max(s.n_pairs for s in stats_list),
        max(s.n_chunks for s in stats_list),
    )


def pick_caps(stats: BinningStats, margin: float = 1.5,
              base: RasterizeConfig = RasterizeConfig(),
              ragged: bool | None = None) -> RasterizeConfig:
    """Static caps covering the measured workload with margin. k_max rounds
    up to the Pallas blend's 128-lane blocks; max_dup to a power of two.
    ``ragged`` sizes the flat chunked layout (binning.RaggedBins) instead of
    the per-tile k_max rectangle; None auto-picks by padded slot count —
    rect pads every active tile to the frame's max per-tile count, so one
    dense tile multiplies the whole (A, 16, K) gather/blend/scatter volume
    (at trained avatar scale that is ~5x the true pair count and 12x slower
    end-to-end, measured on v5e), while the ragged layout wastes at most one
    chunk per tile. Rect is kept only when it is within 20% of the ragged
    slot count (small/uniform scenes, where its simpler indexing wins)."""
    def round_up(v, m):
        return max(m, -(-v // m) * m)

    md = 1
    while md < stats.max_tiles_per_gaussian * margin:
        md *= 2
    k_max = round_up(int(stats.max_per_tile * margin), 128)
    a = round_up(int(stats.n_active_tiles * margin), 256)
    kb = base.chunk_kb
    # chunks(kb) <= ceil(n_pairs/kb) + n_active_tiles (each tile wastes
    # under one chunk of padding); exact for kb=128 from the count pass
    bound = -(-stats.n_pairs // kb) + stats.n_active_tiles
    if kb == 128:
        bound = min(bound, stats.n_chunks)
    if ragged is None:
        # off-TPU the only ragged path is interpret-mode pallas, whose
        # compile is pathologically slow — auto-pick it only where it runs
        # native (forcing ragged=True stays available everywhere)
        ragged = (jax.default_backend() == "tpu"
                  and a * k_max > 1.2 * bound * kb)
    if ragged:
        n_chunks = round_up(int(bound * margin), 64)
    else:
        n_chunks = 0
    # compact pair-expansion budget: the sort/gather volume scales with
    # this (not with N*max_dup), so size it tightly over the measured count
    max_pairs = round_up(int(stats.n_pairs * margin), 4096)
    return RasterizeConfig(
        tile=base.tile, max_dup=max(md, 8), k_max=k_max,
        max_active_tiles=a, scatter_pad=base.scatter_pad,
        n_chunks=n_chunks, chunk_kb=kb, max_pairs=max_pairs,
        backend=base.backend)


def autosize_for_avatar(avatar_net, items_list, img_w: int, img_h: int,
                        scales=None, margin: float = 1.5,
                        ragged: bool | None = None) -> RasterizeConfig:
    """Caps for an AvatarNet from its canonical Gaussian geometry skinned to
    sample frames (the post-pretrain scale distribution; see module doc).
    ``scales``: activated (N, 3) canonical scales — pass
    ``jnp.exp(params["cano_gaussian"].scaling)``; derived via KNN when
    omitted."""
    stats = []
    if scales is None:
        from animatablegaussians_tpu.models.gaussian_model import \
            create_from_pcd
        g = create_from_pcd(avatar_net.init_points,
                            jnp.zeros((avatar_net.n_points, 3)))
        scales = jnp.exp(g.scaling)
    n = avatar_net.n_points
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    for items in items_list:
        mats = jnp.asarray(items["cano2live_jnt_mats"])
        pt_mats = jnp.einsum("nj,jxy->nxy", avatar_net.lbs, mats)
        pts = (jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3],
                          avatar_net.init_points) + pt_mats[:, :3, 3])
        stats.append(measure_binning_stats(
            pts, scales, rots, items["extr"], items["intr"], img_w, img_h,
            tile=avatar_net.raster_config.tile,
            valid_mask=avatar_net.valid))
    cfg = pick_caps(merge_stats(stats), margin,
                    base=avatar_net.raster_config, ragged=ragged)
    return cfg
