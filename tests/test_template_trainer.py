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


def test_template_with_hand_step_from_dataset(tmp_path):
    """with_hand=True template step on items from a real nerf-mode dataset
    carrying MANO crops (ref: network/template.py:146-202,
    dataset_mv_rgb.py:231-236)."""
    from tests.test_datasets import capture_dir as _  # noqa: F401
    from tests.test_datasets import (write_synthetic_mano,
                                     write_synthetic_smplx)
    import json
    import cv2 as cv

    # minimal on-disk nerf capture
    d = tmp_path / "cap"
    os.makedirs(d / "cam00" / "mask" / "pha")
    rng = np.random.default_rng(3)
    calib = {"cam00": dict(R=np.eye(3).reshape(-1).tolist(),
                           T=[0.0, 0.0, 2.0],
                           K=[120.0, 0, 48, 0, 120.0, 48, 0, 0, 1],
                           imgSize=[96, 96])}
    with open(d / "calibration_full.json", "w") as fp:
        json.dump(calib, fp)
    for f in range(2):
        img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        cv.imwrite(str(d / "cam00" / ("%08d.jpg" % f)), img)
        mask = np.zeros((96, 96), np.uint8)
        mask[20:80, 30:70] = 255
        cv.imwrite(str(d / "cam00" / "mask" / "pha" / ("%08d.jpg" % f)),
                   mask)
    np.savez(d / "smpl_params.npz",
             betas=np.zeros((1, 10), np.float32),
             global_orient=np.zeros((2, 3), np.float32),
             transl=np.zeros((2, 3), np.float32),
             body_pose=0.05 * rng.standard_normal((2, 63)).astype(
                 np.float32))
    smpl_path = str(d / "SMPLX_SYNTH.npz")
    write_synthetic_smplx(smpl_path)
    mano_dir = write_synthetic_mano(str(tmp_path / "mano"))

    from animatablegaussians_tpu.data import MvRgbDatasetAvatarReX
    ds = MvRgbDatasetAvatarReX(str(d), frame_range=[0, 2], used_cam_ids=[0],
                               mode="nerf", smpl_model_path=smpl_path,
                               mano_dir=mano_dir)
    item = ds[0]
    for k in ("left_cano_mano_v", "left_live_mano_v", "mano_face_closed"):
        assert k in item

    from animatablegaussians_tpu.models.template import TemplateNet
    from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume
    from animatablegaussians_tpu.training import template_trainer as tt

    res, J = 8, 55
    w = np.zeros((res, res, res, J), np.float32)
    w[..., 0] = 1.0
    vol = CanoBlendWeightVolume(data=dict(
        diff_weight_volume=w,
        volume_bounds=np.asarray(item["cano_bounds"], np.float32)))
    net = TemplateNet(dict(multires=2, use_viewdir=False, with_hand=True,
                           use_root_finding=False), vol)
    params = net.init(jax.random.PRNGKey(0))
    assert "left_hand" in params and "right_hand" in params

    opt = tt.make_template_optimizer(dict(type="Step", initial=1e-3,
                                          interval=1000, factor=0.9))
    state = tt.TemplateTrainState(params, opt.init(params),
                                  jnp.zeros((), jnp.int32))
    step = tt.make_template_train_step(
        net, opt, loss_weight=dict(color=1.0, mask=1.0, eikonal=0.1),
        n_samples=8, smpl_guided=True)

    R = 8
    rays = item["nerf_random"]
    items = dict(
        cano2live_jnt_mats=jnp.asarray(item["cano2live_jnt_mats"]),
        live_smpl_v=jnp.asarray(item["live_smpl_v"]),
        smpl_faces=jnp.asarray(item["smpl_faces"]),
        smpl_lbs=jnp.asarray(ds.smpl_model.data.lbs_weights),
        cano_smpl_center=jnp.asarray(item["cano_smpl_center"]),
        left_cano_mano_v=jnp.asarray(item["left_cano_mano_v"]),
        left_cano_mano_n=jnp.asarray(item["left_cano_mano_n"]),
        right_cano_mano_v=jnp.asarray(item["right_cano_mano_v"]),
        right_cano_mano_n=jnp.asarray(item["right_cano_mano_n"]),
        left_live_mano_v=jnp.asarray(item["left_live_mano_v"]),
        left_live_mano_n=jnp.asarray(item["left_live_mano_n"]),
        right_live_mano_v=jnp.asarray(item["right_live_mano_v"]),
        right_live_mano_n=jnp.asarray(item["right_live_mano_n"]),
        mano_face_closed=jnp.asarray(item["mano_face_closed"]),
        ray_o=jnp.asarray(rays["ray_o"][:R]),
        ray_d=jnp.asarray(rays["ray_d"][:R]),
        near=jnp.asarray(rays["near"][:R]),
        far=jnp.asarray(rays["far"][:R]),
        dist=jnp.zeros((R,), jnp.float32),
        color_gt=jnp.asarray(rays["color_gt"][:R]),
        mask_gt=jnp.asarray(rays["mask_gt"][:R]).astype(jnp.float32),
    )
    state2, terms = step(state, items, jax.random.PRNGKey(1))
    assert np.isfinite(float(terms["total_loss"]))
