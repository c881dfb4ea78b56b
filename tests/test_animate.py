"""Animation-path integration: novel-pose rendering through run_test with a
PoseDataset, pose-map regeneration, PCA projection and image export."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from tests.test_driver import full_capture, _make_opt  # noqa: E402,F401


def test_run_test_animates_poses(full_capture, tmp_path):
    from animatablegaussians_tpu.training.driver import AvatarTrainer
    from animatablegaussians_tpu.testing.animate import run_test
    from animatablegaussians_tpu.utils import exr

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "ckpt"))

    # driving poses (thuman4-style npz)
    rng = np.random.default_rng(5)
    n = 2
    pose_path = str(tmp_path / "thuman4_pose_00.npz")
    np.savez(pose_path,
             global_orient=0.05 * rng.standard_normal((n, 3)).astype(
                 np.float32),
             transl=0.02 * rng.standard_normal((n, 3)).astype(np.float32),
             body_pose=0.05 * rng.standard_normal((n, 63)).astype(
                 np.float32))

    opt["test"].update(
        pose_data=dict(data_path=pose_path, frame_range=[0, 2],
                       smpl_model_path=smpl_path),
        view_setting="front",
        img_scale=0.125,            # 128^2 output
        n_pca=-1,                   # too few frames for PCA here
        save_ply=True,
        render_skeleton=True,
        output_dir=str(tmp_path / "out"),
        prev_ckpt=None,
    )

    trainer = AvatarTrainer(opt)
    out_dir = run_test(trainer, opt)
    rgbs = sorted(os.listdir(os.path.join(out_dir, "rgb_map")))
    masks = sorted(os.listdir(os.path.join(out_dir, "mask_map")))
    plys = sorted(os.listdir(os.path.join(out_dir, "posed_gaussians")))
    assert len(rgbs) == 2 and len(masks) == 2 and len(plys) == 2
    skels = sorted(os.listdir(os.path.join(out_dir, "live_skeleton")))
    assert len(skels) == 2  # ref: main_avatar.py:699-711
    skel = cv.imread(os.path.join(out_dir, "live_skeleton", skels[0]))
    assert skel is not None and skel.min() < 250  # something was drawn

    img = cv.imread(os.path.join(out_dir, "rgb_map", rgbs[0]))
    assert img is not None and img.shape == (128, 128, 3)
    # untrained net on a white bg still renders something non-trivial
    assert img.std() > 1.0

    from animatablegaussians_tpu.models.gaussian_model import \
        load_gaussians_from_ply
    g = load_gaussians_from_ply(os.path.join(out_dir, "posed_gaussians",
                                             plys[0]))
    # PLY export filters the block-packing pad points
    assert g["positions"].shape[0] == trainer.avatar_net.n_valid


def test_run_test_fix_hand(full_capture, tmp_path):
    """fix_hand end-to-end: PoseDataset attaches MANO items, the animation
    driver builds mean-hand Gaussians from a fixed frame's pose map, and
    render blends them (ref: network/avatar.py:52-82,183-200,
    dataset_pose.py:436-437)."""
    from animatablegaussians_tpu.training.driver import AvatarTrainer
    from animatablegaussians_tpu.testing.animate import run_test
    from tests.test_datasets import write_synthetic_mano

    data_dir, smpl_path = full_capture
    opt = _make_opt(data_dir, smpl_path, str(tmp_path / "ckpt"))
    mano_dir = write_synthetic_mano(str(tmp_path / "mano"))

    rng = np.random.default_rng(11)
    pose_path = str(tmp_path / "thuman4_pose_00.npz")
    np.savez(pose_path,
             global_orient=0.05 * rng.standard_normal((2, 3)).astype(
                 np.float32),
             transl=np.zeros((2, 3), np.float32),
             body_pose=0.05 * rng.standard_normal((2, 63)).astype(
                 np.float32))

    opt["test"].update(
        pose_data=dict(data_path=pose_path, frame_range=[0, 2],
                       smpl_model_path=smpl_path, mano_dir=mano_dir),
        view_setting="front", img_scale=0.125, n_pca=-1,
        fix_hand=True, fix_hand_id=0,
        output_dir=str(tmp_path / "out_fix"), prev_ckpt=None)

    trainer = AvatarTrainer(opt)
    out_dir = run_test(trainer, opt)
    rgbs = sorted(os.listdir(os.path.join(out_dir, "rgb_map")))
    assert len(rgbs) == 2
    img = cv.imread(os.path.join(out_dir, "rgb_map", rgbs[0]))
    assert img is not None and np.isfinite(img).all()
