"""Template trainer integration: jitted train step on synthetic rays
(color/mask/eikonal losses), Step LR schedule, geometry extraction to a
watertight-ish PLY."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_template import _uv_sphere


@pytest.fixture(scope="module")
def tiny_template():
    from animatablegaussians_tpu.models.template import TemplateNet
    from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume

    res, J = 12, 55
    w = np.zeros((res, res, res, J), np.float32)
    w[..., 0] = 1.0
    vol = CanoBlendWeightVolume(data=dict(
        diff_weight_volume=w,
        volume_bounds=np.array([[-1, -1, -1], [1, 1, 1]], np.float32)))
    net = TemplateNet(dict(multires=4, use_viewdir=False, with_hand=False,
                           use_root_finding=False), vol)
    params = net.init(jax.random.PRNGKey(0))

    sv, sf = _uv_sphere()
    mats = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    items = dict(
        cano2live_jnt_mats=jnp.asarray(mats),
        live_smpl_v=jnp.asarray(sv),
        smpl_faces=jnp.asarray(sf),
        smpl_lbs=jnp.zeros((sv.shape[0], J)).at[:, 0].set(1.0),
        cano_smpl_center=jnp.zeros(3),
    )
    return net, params, items, (sv, sf)


def test_template_train_step_decreases_loss(tiny_template):
    from animatablegaussians_tpu.training import template_trainer as tt

    net, params, items, _ = tiny_template
    opt = tt.make_template_optimizer(dict(type="Step", initial=1e-3,
                                          interval=1000, factor=0.9))
    state = tt.TemplateTrainState(params, opt.init(params),
                                  jnp.zeros((), jnp.int32))
    step = tt.make_template_train_step(
        net, opt, loss_weight=dict(color=1.0, mask=1.0, eikonal=0.1),
        n_samples=12, smpl_guided=True)

    R = 16
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ray_items = dict(items)
    ray_items.update(
        ray_o=jnp.asarray(np.repeat([[0, 0, -2.0]], R, 0), jnp.float32),
        ray_d=jnp.asarray(dirs),
        near=jnp.full((R,), 1.0), far=jnp.full((R,), 3.0),
        dist=jnp.zeros((R,)),
        color_gt=jnp.ones((R, 3)) * 0.6,
        mask_gt=jnp.ones((R,)))

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        state, terms = step(state, ray_items, key)  # same rng: comparable
        losses.append(float(terms["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "eikonal_loss" in terms


def test_template_geometry_export(tiny_template, tmp_path):
    from animatablegaussians_tpu.training import template_trainer as tt

    net, params, items, _ = tiny_template
    geo_items = dict(items)
    geo_items["cano_bounds"] = np.array([[-1, -1, -1], [1, 1, 1]],
                                        np.float32)
    verts, faces, normals = tt.test_geometry(
        net, params, geo_items, space="cano", testing_res=(24, 24, 24),
        chunk=2048)
    # geometric-init SDF is a ~0.7-radius sphere -> a closed surface exists
    assert verts.shape[0] > 50 and faces.shape[0] > 50
    r = np.linalg.norm(verts, axis=1)
    assert 0.3 < np.median(r) < 1.0
    p = str(tmp_path / "template.ply")
    tt.save_mesh_as_ply(p, verts, faces, normals)
    assert os.path.getsize(p) > 1000
