"""Two-pass cap auto-sizing: measured stats must match a brute-force numpy
count, and caps picked from them must render the same scene with zero
dropped (gaussian, tile) pairs — the static-shape answer to the CUDA
reference's dynamic buffer sizing (ref: cuda_rasterizer/rasterizer_impl.cu:
278-309, which never drops)."""

import numpy as np

import jax.numpy as jnp

from animatablegaussians_tpu.ops.rasterize import RasterizeConfig, render
from animatablegaussians_tpu.ops.rasterize.api import _full_projection_traced
from animatablegaussians_tpu.ops.rasterize.autosize import (
    BinningStats, measure_binning_stats, merge_stats, pick_caps)
from animatablegaussians_tpu.ops.rasterize.preprocess import preprocess

from tests.test_rasterize import H, TILE, W, make_scene


def brute_force_stats(means, scales, q, extr, intr):
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     *_full_projection_traced(jnp.asarray(extr),
                                              jnp.asarray(intr), W, H),
                     W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    xy, rad = np.asarray(pre.means2d), np.asarray(pre.radii)
    val = np.asarray(pre.valid)
    gx, gy = -(-W // TILE), -(-H // TILE)
    rx0 = np.clip(np.floor((xy[:, 0] - rad) / TILE), 0, gx).astype(int)
    ry0 = np.clip(np.floor((xy[:, 1] - rad) / TILE), 0, gy).astype(int)
    rx1 = np.clip(np.floor((xy[:, 0] + rad + TILE - 1) / TILE),
                  0, gx).astype(int)
    ry1 = np.clip(np.floor((xy[:, 1] + rad + TILE - 1) / TILE),
                  0, gy).astype(int)
    counts = np.zeros((gy, gx), np.int64)
    ntiles = np.zeros(len(xy), np.int64)
    for i in range(len(xy)):
        if not val[i]:
            continue
        counts[ry0[i]:ry1[i], rx0[i]:rx1[i]] += 1
        ntiles[i] = (ry1[i] - ry0[i]) * (rx1[i] - rx0[i])
    return BinningStats(int(ntiles.max()), int(counts.max()),
                        int((counts > 0).sum()), int(ntiles.sum()),
                        int(-(-counts // 128).sum()))


def test_measured_stats_match_brute_force():
    means, scales, q, _, _, extr, intr = make_scene(n=200, seed=3)
    got = measure_binning_stats(means, scales, q, extr, intr, W, H,
                                tile=TILE)
    want = brute_force_stats(means, scales, q, extr, intr)
    assert got == want
    assert got.n_pairs > 0 and got.max_per_tile > 0


def test_valid_mask_excludes_pads():
    means, scales, q, _, _, extr, intr = make_scene(n=100, seed=4)
    mask = np.ones(100, bool)
    mask[50:] = False
    full = measure_binning_stats(means, scales, q, extr, intr, W, H,
                                 tile=TILE)
    half = measure_binning_stats(means, scales, q, extr, intr, W, H,
                                 tile=TILE, valid_mask=mask)
    assert half.n_pairs < full.n_pairs
    want = brute_force_stats(means[:50], scales[:50], q[:50], extr, intr)
    assert half.n_pairs == want.n_pairs
    assert half.max_per_tile == want.max_per_tile


def test_picked_caps_give_zero_overflow():
    means, scales, q, opac, colors, extr, intr = make_scene(n=300, seed=5)
    stats = measure_binning_stats(means, scales, q, extr, intr, W, H,
                                  tile=TILE)
    cfg = pick_caps(stats, margin=1.2,
                    base=RasterizeConfig(tile=TILE))
    assert cfg.max_dup >= stats.max_tiles_per_gaussian
    assert cfg.k_max >= stats.max_per_tile and cfg.k_max % 128 == 0
    assert cfg.max_active_tiles >= stats.n_active_tiles
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(opac), jnp.asarray(colors),
                 jnp.zeros(3), jnp.asarray(extr), jnp.asarray(intr),
                 W, H, config=cfg)
    assert int(out["n_overflow"]) == 0
    assert int(out["n_pairs"]) == stats.n_pairs


def test_merge_stats_elementwise_max():
    a = BinningStats(3, 10, 7, 100, 12)
    b = BinningStats(5, 8, 9, 90, 15)
    assert merge_stats([a, b]) == BinningStats(5, 10, 9, 100, 15)


def test_undersized_caps_would_overflow():
    """Sanity: the scene genuinely needs the caps (guards against a test
    that passes because the workload is trivially tiny)."""
    means, scales, q, opac, colors, extr, intr = make_scene(n=300, seed=5)
    small = RasterizeConfig(tile=TILE, max_dup=1, k_max=128,
                            max_active_tiles=256)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(opac), jnp.asarray(colors),
                 jnp.zeros(3), jnp.asarray(extr), jnp.asarray(intr),
                 W, H, config=small)
    assert int(out["n_overflow"]) > 0
