"""Measure the binning workload of a TRAINED-scale Gaussian distribution at
full AvatarReX scale (VERDICT round-2 Missing #1).

The model's post-pretrain state has scales == create_from_pcd's KNN init
(the 5k-iter pretrain regresses the CNN outputs onto the static canonical
Gaussians, ref: main_avatar.py:126-164 + gaussian_model.py:156-183), opacity
0.1. This script builds exactly that distribution on the synthetic full-scale
body (518k points from the 1024x2048 cano map), bins at 1500x2048, and
reports: total pairs, tiles-touched histogram, per-tile count histogram,
non-empty tile count, and n_overflow under candidate cap settings.

Runs on CPU or TPU:  python benchmarks/overflow_dist.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops.rasterize.binning import (bin_gaussians,
                                                           tile_rect)
from animatablegaussians_tpu.ops.rasterize.preprocess import preprocess
from animatablegaussians_tpu.ops.rasterize.api import _full_projection_traced
from animatablegaussians_tpu.utils import synthetic

MAP_H = 1024
IMG_W, IMG_H = 1500, 2048
TILE = 16


def main():
    pos, _, _ = synthetic.make_cano_map(map_h=MAP_H)
    items = synthetic.make_items(img_w=IMG_W, img_h=IMG_H, cano_pos_map=pos)
    mask = np.linalg.norm(pos, axis=-1) > 0
    points = jnp.asarray(pos[mask])
    n = points.shape[0]
    print(f"{n} gaussians")

    # KNN(k=4) mean-distance scales (create_from_pcd) computed via map
    # adjacency: on a smooth surface map the nearest neighbors ARE the
    # adjacent texels, so the texel spacing is the KNN distance (O(N)
    # instead of the brute-force O(N^2) knn, which the 1-core CPU host
    # cannot do at 518k)
    dx = np.linalg.norm(np.diff(pos, axis=1), axis=-1)[mask[:, :-1]]
    spacing = np.median(dx[dx > 0])
    print(f"texel spacing ~{spacing:.5f}")
    scales = jnp.full((n, 3), spacing, jnp.float32)
    print("scale stats:", float(scales.min()), float(jnp.median(scales)),
          float(scales.max()))

    extr = jnp.asarray(items["extr"])
    intr = jnp.asarray(items["intr"])
    view, proj = _full_projection_traced(extr, intr, IMG_W, IMG_H)
    tan_fovx = IMG_W / (2.0 * intr[0, 0])
    tan_fovy = IMG_H / (2.0 * intr[1, 1])

    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    pre = jax.jit(lambda: preprocess(
        points, scales, rots, view, proj,
        tan_fovx, tan_fovy, IMG_W, IMG_H, 1.0))()

    grid_x = -(-IMG_W // TILE)
    grid_y = -(-IMG_H // TILE)
    rx0, ry0, rx1, ry1 = tile_rect(pre.means2d, pre.radii, grid_x, grid_y,
                                   TILE)
    ntiles = np.asarray(jnp.where(pre.valid, (rx1 - rx0) * (ry1 - ry0), 0))
    radii = np.asarray(pre.radii)
    print(f"valid {int(np.asarray(pre.valid).sum())}; radii px "
          f"p50={np.percentile(radii[radii > 0], 50):.1f} "
          f"p99={np.percentile(radii[radii > 0], 99):.1f} "
          f"max={radii.max()}")
    print(f"pairs total {ntiles.sum()}; tiles/gaussian "
          f"p50={np.percentile(ntiles, 50):.0f} "
          f"p99={np.percentile(ntiles, 99):.0f} max={ntiles.max()}")

    for max_dup, k_max, max_at in ((16, 256, 6144), (32, 256, 6144),
                                   (32, 512, 6144), (64, 512, 8192),
                                   (64, 1024, 8192)):
        bins = jax.jit(lambda md=max_dup, km=k_max, ma=max_at: bin_gaussians(
            pre.means2d, pre.depths, pre.radii, pre.valid, IMG_W, IMG_H,
            tile=TILE, max_dup=md, k_max=km, max_active_tiles=ma))()
        counts = np.asarray(bins.tile_count)
        print(f"max_dup={max_dup} k_max={k_max} A={max_at}: "
              f"n_overflow={int(bins.n_overflow)} "
              f"nonempty={(counts > 0).sum()} "
              f"count p50={np.percentile(counts[counts > 0], 50):.0f} "
              f"p99={np.percentile(counts[counts > 0], 99):.0f} "
              f"max={counts.max()}")


if __name__ == "__main__":
    main()
