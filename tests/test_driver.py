"""End-to-end AvatarTrainer integration on a synthetic on-disk capture:
pretrain iterations, one training epoch, mini-test snapshot, checkpoint
round trip, resume."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from tests.test_datasets import write_synthetic_smplx  # noqa: E402


@pytest.fixture(scope="module")
def full_capture(tmp_path_factory):
    from animatablegaussians_tpu.utils import synthetic

    d = tmp_path_factory.mktemp("capture")
    n_frames, cams = 4, ["cam00", "cam01"]
    rng = np.random.default_rng(0)

    import json
    calib = {cn: dict(R=np.eye(3).reshape(-1).tolist(),
                      T=[0.05 * i, 0.0, 2.0],
                      K=[120.0, 0, 48, 0, 120.0, 48, 0, 0, 1],
                      imgSize=[96, 96])
             for i, cn in enumerate(cams)}
    with open(d / "calibration_full.json", "w") as fp:
        json.dump(calib, fp)

    for cn in cams:
        os.makedirs(d / cn / "mask" / "pha")
        for f in range(n_frames):
            img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
            cv.imwrite(str(d / cn / ("%08d.jpg" % f)), img)
            mask = np.zeros((96, 96), np.uint8)
            mask[20:80, 30:70] = 255
            cv.imwrite(str(d / cn / "mask" / "pha" / ("%08d.jpg" % f)), mask)

    np.savez(d / "smpl_params.npz",
             betas=np.zeros((1, 10), np.float32),
             global_orient=0.05 * rng.standard_normal(
                 (n_frames, 3)).astype(np.float32),
             transl=0.05 * rng.standard_normal(
                 (n_frames, 3)).astype(np.float32),
             body_pose=0.05 * rng.standard_normal(
                 (n_frames, 63)).astype(np.float32),
             jaw_pose=np.zeros((n_frames, 3), np.float32),
             expression=np.zeros((n_frames, 10), np.float32),
             left_hand_pose=np.zeros((n_frames, 45), np.float32),
             right_hand_pose=np.zeros((n_frames, 45), np.float32))

    smpl_path = str(d / "SMPLX_SYNTH.npz")
    write_synthetic_smplx(smpl_path)

    # synthetic canonical + per-frame pose maps (map 64 -> CNN in 32);
    # this image's cv2 has no EXR support -> bundled codec
    from animatablegaussians_tpu.utils import exr
    pm_dir = d / "smpl_pos_map"
    os.makedirs(pm_dir)
    pos, nml, lbs = synthetic.make_cano_map(map_h=64)
    exr.write_exr(str(pm_dir / "cano_smpl_pos_map.exr"), pos)
    exr.write_exr(str(pm_dir / "cano_smpl_nml_map.exr"), nml)
    np.save(str(pm_dir / "init_pts_lbs.npy"), lbs)
    half_pose = synthetic.pose_map_from_cano(pos)       # (32, 32, 6)
    flat = np.concatenate([half_pose[..., :3], half_pose[..., 3:]], axis=1)
    for f in range(n_frames):
        exr.write_exr(str(pm_dir / ("%08d.exr" % f)), flat)
    return str(d), smpl_path


def _make_opt(data_dir, smpl_path, ckpt_dir):
    return dict(
        train=dict(
            dataset="MvRgbDatasetAvatarReX",
            data=dict(data_dir=data_dir, frame_range=[0, 3],
                      used_cam_ids=[0, 1], load_smpl_pos_map=True,
                      smpl_model_path=smpl_path),
            net_ckpt_dir=ckpt_dir,
            ckpt_interval=dict(epoch=1, batch=4),
            eval_interval=3,
            eval_training_ids=[0, 0],
            lr_init=5e-4,
            loss_weight=dict(l1=1.0, offset=0.005),
            finetune_color=False,
            batch_size=1, num_workers=2, random_bg_color=True),
        test=dict(n_pca=-1),
        model=dict(with_viewdirs=True, channel_max=32),
    )


def test_avatar_trainer_end_to_end(full_capture, tmp_path):
    from animatablegaussians_tpu.training.driver import AvatarTrainer

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "ckpt"))
    trainer = AvatarTrainer(opt)
    assert trainer.avatar_net.n_points > 100
    assert trainer.img_w == 96 and trainer.img_h == 96

    # few pretrain iterations decrease the head-regression loss
    trainer.PRETRAIN_ITERS = 3
    trainer.pretrain()
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "pretrained",
                                       "state.npz"))

    # one epoch of main training (6 items)
    trainer.train(num_epochs=1)
    assert trainer.iter_idx == 6
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "epoch_latest",
                                       "state.npz"))
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "loss.txt"))
    evals = os.listdir(os.path.join(trainer.net_ckpt_dir, "eval"))
    assert len(evals) >= 1  # mini-test snapshots written

    # resume restores the iteration counter
    trainer2 = AvatarTrainer(opt)
    trainer2.load_ckpt(os.path.join(trainer.net_ckpt_dir, "epoch_latest"))
    assert trainer2.iter_idx == 6


def test_data_parallel_trainer(full_capture, tmp_path):
    """DP path over the 8-virtual-CPU-device mesh (conftest): the real
    AvatarTrainer.train() trains a step with one item per device, and one
    dp step on 8 copies of the same item with the same rng equals the
    single-device step exactly (pmean of identical grads)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from animatablegaussians_tpu.training.driver import AvatarTrainer

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs a multi-device mesh")

    data_dir, smpl_path = full_capture

    # 4 frames x 2 cams = 8 items -> DP engages (one item per device)
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "dp_ckpt"))
    opt["train"]["data"]["frame_range"] = [0, 4]
    trainer = AvatarTrainer(opt)
    assert trainer.use_dp and trainer.n_devices == len(jax.devices())

    trainer.train(num_epochs=2)
    # 8 items / 8 devices = 1 global step per epoch
    assert trainer.iter_idx == 2
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "epoch_latest",
                                       "state.npz"))

    # equality: dp step on replicated item == single-device step
    opt_s = _make_opt(data_dir, smpl_path, str(tmp_path / "s_ckpt"))
    opt_s["train"]["data"]["frame_range"] = [0, 3]  # 6 items -> single-dev
    single = AvatarTrainer(opt_s)
    assert not single.use_dp
    # identical init (same seed/net config)
    chex = jax.tree.map(lambda a, b: np.allclose(np.asarray(a),
                                                 np.asarray(b)),
                        jax.device_get(single.state.params),
                        jax.device_get(trainer.state.params))
    # (params already trained 2 steps on trainer; only structure must match)
    del chex

    item = single.dataset.getitem(0, training=True)
    items = single._items_to_device(item)
    rng = jax.random.PRNGKey(7)
    s_state, s_terms = single.train_step(single.state, items, rng)

    fresh = AvatarTrainer(opt)  # fresh DP trainer, same init seed
    batch = {k: jnp.stack([jnp.asarray(v)] * fresh.n_devices)
             for k, v in items.items()}
    rngs = jnp.stack([rng] * fresh.n_devices)
    d_state, d_terms = fresh.train_step(jax.device_get(fresh.state), batch,
                                        rngs)

    for k in s_terms:
        np.testing.assert_allclose(np.asarray(d_terms[k]),
                                   np.asarray(s_terms[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    flat_s = jax.tree_util.tree_leaves(jax.device_get(s_state.params))
    flat_d = jax.tree_util.tree_leaves(jax.device_get(d_state.params))
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5)


def test_scan_steps_trainer(full_capture, tmp_path):
    """scan_steps=2: the trainer compiles 2 optimizer steps per dispatch
    (lax.scan over loader pairs) and one epoch of 6 items still advances
    iter_idx to 6, logs, and checkpoints."""
    from animatablegaussians_tpu.training.driver import AvatarTrainer

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "ckpt_scan"))
    opt["train"]["scan_steps"] = 2
    trainer = AvatarTrainer(opt)
    assert trainer.scan_steps == 2
    trainer.train(num_epochs=1)
    assert trainer.iter_idx == 6
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "epoch_latest",
                                       "state.npz"))
    assert os.path.exists(os.path.join(trainer.net_ckpt_dir, "loss.txt"))


def test_dp_scan_trainer_wiring(full_capture, tmp_path):
    """scan_steps composed with DP in the real trainer: with a dataset
    smaller than devices x scan the driver clamps scan_steps (the loader
    drops incomplete batches), and the dp+scan step it builds consumes a
    (n_devices, scan_steps, ...) batch and advances iter_idx by scan_steps
    per dispatch. (Step-math equality vs sequential dp steps is covered by
    tests/test_training.py::test_dp_scan_composes_with_data_parallel.)"""
    import jax
    import jax.numpy as jnp
    from animatablegaussians_tpu.training.driver import AvatarTrainer

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "dpscan_ckpt"))
    opt["train"]["data"]["frame_range"] = [0, 4]   # 8 items
    opt["train"]["scan_steps"] = 4                 # 8 // 8 devices -> 1
    trainer = AvatarTrainer(opt)
    assert trainer.use_dp
    assert trainer.scan_steps == 1                 # clamped

    # force the scan flavor at scan_steps=2 by rebuilding the step the way
    # the driver does for a big-enough dataset
    from animatablegaussians_tpu.parallel import data_parallel as dp
    from animatablegaussians_tpu.training import avatar_trainer as at
    n, n_scan = trainer.n_devices, 2
    per_example = at.make_train_step(
        trainer.avatar_net, trainer.optimizer, axis_name=dp.AXIS,
        loss_weight=trainer.loss_weight, lpips_params=trainer.lpips_params,
        random_bg_color=True, patch_size=trainer.PATCH_SIZE,
        img_w=trainer.img_w, img_h=trainer.img_h)
    dp_scan = dp.make_dp_train_scan(per_example, trainer.mesh)

    item = trainer._items_to_device(
        trainer.dataset.getitem(0, training=True))
    batch = {k: jnp.broadcast_to(v[None, None], (n, n_scan) + v.shape)
             for k, v in item.items()}
    rngs = jax.random.split(jax.random.PRNGKey(3), n * n_scan).reshape(
        n, n_scan, -1)
    state, terms = dp_scan(jax.device_get(trainer.state),
                           dp.shard_batch(trainer.mesh, batch),
                           dp.shard_batch(trainer.mesh, rngs))
    assert terms["total_loss"].shape == (n_scan,)
    assert np.isfinite(np.asarray(terms["total_loss"])).all()
    assert int(state.iter_idx) == 2


def test_overflow_self_heals_with_reautosize(full_capture, tmp_path):
    """A cap-busting configuration must trigger re-autosize + recompile +
    lossless re-run, not cropped gradients: caps grow, every loader item
    still lands exactly one applied optimizer step, and training proceeds
    (ref never-drop semantics: rasterizer_impl.cu:278-309)."""
    import jax
    from animatablegaussians_tpu.ops.rasterize import RasterizeConfig
    from animatablegaussians_tpu.training.driver import AvatarTrainer

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "heal_ckpt"))
    opt["train"]["data"]["frame_range"] = [0, 3]  # 6 items -> single-dev
    opt["model"]["autosize_raster"] = False       # start undersized
    trainer = AvatarTrainer(opt)
    assert not trainer.use_dp
    # cap-busting static caps (max_dup=1 crops most multi-tile gaussians)
    trainer.avatar_net.raster_config = RasterizeConfig(
        k_max=128, max_dup=1, max_active_tiles=256)
    trainer._build_train_step()

    trainer.train(num_epochs=1)

    cfg = trainer.avatar_net.raster_config
    assert cfg.max_dup > 1            # healing re-autosized the caps
    assert trainer.iter_idx == 6      # no step was lost to cropped grads
