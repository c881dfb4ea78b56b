"""Dataset layer tests on a synthetic on-disk AvatarReX-format capture with
a synthetic SMPL-X npz model."""

import json
import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

J = 55
V = 120


def write_synthetic_smplx(path, seed=0):
    rng = np.random.default_rng(seed)
    parents = np.zeros(J, np.int64)
    parents[1:] = rng.integers(0, 3, J - 1)  # shallow random tree
    for j in range(1, J):
        parents[j] = min(parents[j], j - 1)
    np.savez(
        path,
        v_template=rng.standard_normal((V, 3)).astype(np.float32),
        shapedirs=0.03 * rng.standard_normal((V, 3, 400)).astype(np.float32),
        posedirs=0.01 * rng.standard_normal(
            (V, 3, (J - 1) * 9)).astype(np.float32),
        J_regressor=(lambda w: w / w.sum(1, keepdims=True))(
            rng.random((J, V)).astype(np.float32)),
        weights=(lambda w: w / w.sum(1, keepdims=True))(
            rng.random((V, J)).astype(np.float32)),
        hands_componentsl=rng.standard_normal((6, 45)).astype(np.float32),
        hands_componentsr=rng.standard_normal((6, 45)).astype(np.float32),
        hands_meanl=np.zeros(45, np.float32),
        hands_meanr=np.zeros(45, np.float32),
        kintree_table=np.stack([parents, np.arange(J)]),
        f=rng.integers(0, V, (50, 3)).astype(np.int64),
    )


def write_synthetic_mano(mano_dir, n_verts_total=V, n_hand=12, seed=3):
    """SMPL-X-hand -> MANO vertex index maps + closed-fan faces in the
    reference layout (ref: dataset/commons.py:8-19), scaled down to the
    synthetic body model."""
    os.makedirs(mano_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lid = rng.choice(n_verts_total, n_hand, replace=False)
    rid = rng.choice(n_verts_total, n_hand, replace=False)
    np.savez(os.path.join(mano_dir, "smplx_lhand_to_mano_rhand.npz"),
             smpl_vert_id_to_mano=lid.astype(np.int64))
    np.savez(os.path.join(mano_dir, "smplx_rhand_to_mano_rhand.npz"),
             smpl_vert_id_to_mano=rid.astype(np.int64))
    faces = rng.integers(0, n_hand, (20, 3)).astype(np.int64)
    np.savetxt(os.path.join(mano_dir, "mano_face_close.txt"), faces,
               fmt="%d")
    return mano_dir


@pytest.fixture(scope="module")
def capture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("avatarrex")
    n_frames, cams = 4, ["cam00", "cam01"]
    rng = np.random.default_rng(1)

    calib = {}
    for i, cn in enumerate(cams):
        calib[cn] = dict(
            R=np.eye(3).reshape(-1).tolist(),
            T=[0.1 * i, 0.0, 2.0],
            K=[200.0, 0, 64, 0, 200.0, 64, 0, 0, 1],
            imgSize=[128, 128])
    with open(d / "calibration_full.json", "w") as fp:
        json.dump(calib, fp)

    for cn in cams:
        os.makedirs(d / cn / "mask" / "pha")
        for f in range(n_frames):
            img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
            cv.imwrite(str(d / cn / ("%08d.jpg" % f)), img)
            mask = np.zeros((128, 128), np.uint8)
            mask[30:100, 40:90] = 255
            cv.imwrite(str(d / cn / "mask" / "pha" / ("%08d.jpg" % f)), mask)

    np.savez(
        d / "smpl_params.npz",
        betas=np.zeros((1, 10), np.float32),
        global_orient=0.1 * rng.standard_normal(
            (n_frames, 3)).astype(np.float32),
        transl=0.1 * rng.standard_normal((n_frames, 3)).astype(np.float32),
        body_pose=0.1 * rng.standard_normal(
            (n_frames, 63)).astype(np.float32),
        jaw_pose=np.zeros((n_frames, 3), np.float32),
        expression=np.zeros((n_frames, 10), np.float32),
        left_hand_pose=np.zeros((n_frames, 45), np.float32),
        right_hand_pose=np.zeros((n_frames, 45), np.float32),
    )

    smpl_path = str(d / "SMPLX_SYNTH.npz")
    write_synthetic_smplx(smpl_path)
    return str(d), smpl_path


def test_mv_rgb_dataset_items(capture_dir):
    from animatablegaussians_tpu.data import MvRgbDatasetAvatarReX
    data_dir, smpl_path = capture_dir
    ds = MvRgbDatasetAvatarReX(data_dir, frame_range=[0, 4],
                               used_cam_ids=[0, 1],
                               smpl_model_path=smpl_path)
    assert len(ds) == 8
    item = ds[0]
    assert item["cano2live_jnt_mats"].shape == (J, 4, 4)
    assert item["color_img"].shape == (128, 128, 3)
    assert item["color_img"].dtype == np.float32
    assert item["mask_img"].shape == (128, 128)
    assert item["boundary_mask_img"].shape == (128, 128)
    assert item["mask_img"].sum() > 0 and item["boundary_mask_img"].sum() > 0
    assert item["extr"].shape == (4, 4) and item["intr"].shape == (3, 3)
    assert np.isfinite(item["live_smpl_v"]).all()
    # A == live A (invertible), mats finite
    assert np.isfinite(item["cano2live_jnt_mats"]).all()


def test_mv_rgb_dataset_testing_mode(capture_dir):
    from animatablegaussians_tpu.data import MvRgbDatasetAvatarReX
    data_dir, smpl_path = capture_dir
    ds = MvRgbDatasetAvatarReX(data_dir, frame_range=[0, 2], training=False,
                               smpl_model_path=smpl_path)
    assert len(ds) == 2
    item = ds.getitem(0, training=False)
    assert item["img_h"] == 512 and item["img_w"] == 512
    assert item["extr"].shape == (4, 4)


def test_pose_dataset_thuman4_style(capture_dir, tmp_path):
    from animatablegaussians_tpu.data.pose_dataset import PoseDataset
    _, smpl_path = capture_dir
    rng = np.random.default_rng(2)
    n = 6
    pose_path = str(tmp_path / "thuman4_pose_00.npz")
    np.savez(pose_path,
             global_orient=0.1 * rng.standard_normal((n, 3)).astype(
                 np.float32),
             transl=0.05 * rng.standard_normal((n, 3)).astype(np.float32),
             body_pose=0.1 * rng.standard_normal((n, 63)).astype(np.float32))
    ds = PoseDataset(pose_path, frame_range=[0, 6, 2],
                     hand_pose_type="fist", smpl_model_path=smpl_path)
    assert len(ds) == 3
    item = ds.getitem_fast(0)
    assert item["cano2live_jnt_mats"].shape == (J, 4, 4)
    assert item["img_w"] == 512
    a_pose = ds.getitem_a_pose()
    np.testing.assert_allclose(
        a_pose["cano2live_jnt_mats"][0], np.eye(4), atol=1e-6)


def test_pose_dataset_attaches_mano_items(capture_dir, tmp_path):
    """fix_hand / with_hand need per-item canonical MANO crops
    (ref: dataset_pose.py:199-201,436-437,529)."""
    from animatablegaussians_tpu.data.pose_dataset import PoseDataset
    _, smpl_path = capture_dir
    mano_dir = write_synthetic_mano(str(tmp_path / "mano"))
    rng = np.random.default_rng(7)
    pose_path = str(tmp_path / "thuman4_pose_00.npz")
    np.savez(pose_path,
             global_orient=0.1 * rng.standard_normal((3, 3)).astype(
                 np.float32),
             transl=np.zeros((3, 3), np.float32),
             body_pose=0.1 * rng.standard_normal((3, 63)).astype(np.float32))
    ds = PoseDataset(pose_path, frame_range=[0, 3],
                     smpl_model_path=smpl_path, mano_dir=mano_dir)
    for item in (ds.getitem_fast(0), ds.getitem(1), ds.getitem_a_pose()):
        for k in ("left_cano_mano_v", "left_cano_mano_n",
                  "right_cano_mano_v", "right_cano_mano_n",
                  "mano_face_closed"):
            assert k in item, k
        assert item["left_cano_mano_v"].shape == (12, 3)
        n = np.linalg.norm(item["left_cano_mano_n"], axis=1)
        ok = n > 0  # isolated verts (not in any synthetic face) stay 0
        assert ok.any()
        np.testing.assert_allclose(n[ok], 1.0, atol=1e-5)
    # canonical crop indexes the canonical body vertices
    lid = np.load(os.path.join(mano_dir,
                               "smplx_lhand_to_mano_rhand.npz"))[
        "smpl_vert_id_to_mano"]
    np.testing.assert_allclose(ds.getitem_fast(0)["left_cano_mano_v"],
                               ds.cano_smpl["vertices"][lid], atol=1e-6)


def test_mv_dataset_attaches_mano_items(capture_dir, tmp_path):
    """nerf mode (template with_hand) and 3dgs synthesis items carry cano +
    live MANO crops (ref: dataset_mv_rgb.py:231-236)."""
    from animatablegaussians_tpu.data import MvRgbDatasetAvatarReX
    data_dir, smpl_path = capture_dir
    mano_dir = write_synthetic_mano(str(tmp_path / "mano"))
    ds = MvRgbDatasetAvatarReX(data_dir, frame_range=[0, 2],
                               used_cam_ids=[0], mode="nerf",
                               smpl_model_path=smpl_path, mano_dir=mano_dir)
    item = ds[0]
    for k in ("left_cano_mano_v", "right_cano_mano_n",
              "left_live_mano_v", "right_live_mano_n"):
        assert k in item, k
    # 3dgs training items must NOT pay the mano cost (reference gates it)
    ds2 = MvRgbDatasetAvatarReX(data_dir, frame_range=[0, 2],
                                used_cam_ids=[0], mode="3dgs",
                                smpl_model_path=smpl_path, mano_dir=mano_dir)
    assert "left_cano_mano_v" not in ds2[0]
    item3 = ds2.getitem(0, training=False)
    assert "left_cano_mano_v" in item3 and "left_live_mano_v" in item3


def test_loader_over_dataset(capture_dir):
    from animatablegaussians_tpu.data import MvRgbDatasetAvatarReX
    from animatablegaussians_tpu.data.loader import PrefetchLoader
    data_dir, smpl_path = capture_dir
    ds = MvRgbDatasetAvatarReX(data_dir, frame_range=[0, 4],
                               used_cam_ids=[0, 1],
                               smpl_model_path=smpl_path)
    loader = PrefetchLoader(ds, batch_size=2, num_threads=2)
    batches = list(iter(loader))
    assert len(batches) == 4
    assert batches[0]["color_img"].shape == (2, 128, 128, 3)
