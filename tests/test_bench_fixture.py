"""The bench fixture must exercise the honest trained-scale splat workload:
zeroed CNN head outputs collapse the Gaussians to exactly the
``create_from_pcd`` init (KNN scales, opacity 0.1 — the distribution the
5k-iter pretrain regresses onto, ref: main_avatar.py:126-164 +
gaussians/gaussian_model.py:156-183), and the two-pass autosized caps must
then bin it with zero dropped (gaussian, tile) pairs — never-drop parity
with the CUDA reference's dynamic buffer sizing
(ref: cuda_rasterizer/rasterizer_impl.cu:278-309)."""

import numpy as np

import jax
import jax.numpy as jnp

import bench
from animatablegaussians_tpu.ops.rasterize import autosize as az
from animatablegaussians_tpu.utils import synthetic

MAP_H, IMG = 128, 256


def _fixture():
    import __graft_entry__ as ge
    net, params, _ = ge._build_avatar(map_h=MAP_H, img=IMG,
                                      raster_kw=bench.RASTER_KW,
                                      channel_max=64)
    params = bench._zero_head_outputs(params)
    pos, _, _ = synthetic.make_cano_map(map_h=MAP_H)
    items = synthetic.make_items(img_w=IMG, img_h=IMG, cano_pos_map=pos)
    return net, params, items


def test_zeroed_heads_give_create_from_pcd_attributes():
    net, params, items = _fixture()
    pose_map = jnp.asarray(items["smpl_pos_map"][..., :3])
    positions = net.get_positions(params, pose_map)
    opacity, scales, rotations = net.get_others(params, pose_map)
    g = params["cano_gaussian"]
    np.testing.assert_allclose(np.asarray(positions),
                               np.asarray(g.get_xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(opacity), 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scales),
                               np.asarray(jnp.exp(g.scaling)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rotations[:, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rotations[:, 1:]), 0.0, atol=1e-6)


def test_autosized_caps_zero_overflow_on_fixture():
    net, params, items = _fixture()
    cfg = az.autosize_for_avatar(net, [items], IMG, IMG)
    net.raster_config = cfg
    out = net.render(params, {k: jnp.asarray(v) for k, v in items.items()},
                     bg_color=jnp.ones(3), training=True,
                     rng=jax.random.PRNGKey(1), img_w=IMG, img_h=IMG)
    assert int(out["n_overflow"]) == 0
    assert int(out["n_pairs"]) > 0
