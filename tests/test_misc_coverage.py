"""Coverage for remaining surfaces: PoseDataset NeRF items, the comparison
driver, profiling utilities, obj I/O."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from tests.test_datasets import write_synthetic_smplx  # noqa: E402


def test_pose_dataset_nerf_item(tmp_path):
    from animatablegaussians_tpu.data.pose_dataset import PoseDataset
    smpl_path = str(tmp_path / "SMPLX_SYNTH.npz")
    write_synthetic_smplx(smpl_path)
    rng = np.random.default_rng(0)
    pose_path = str(tmp_path / "avatarrex_pose.npz")
    np.savez(pose_path,
             global_orient=0.05 * rng.standard_normal((3, 3)).astype(
                 np.float32),
             transl=0.02 * rng.standard_normal((3, 3)).astype(np.float32),
             body_pose=0.05 * rng.standard_normal((3, 63)).astype(
                 np.float32))
    ds = PoseDataset(pose_path, smpl_model_path=smpl_path, denoise=True,
                     constrain_leg_pose=True, hand_pose_type="zero")
    item = ds.getitem(0, img_w=64, img_h=64)
    assert item["ray_o"].shape == item["ray_d"].shape
    assert item["ray_o"].shape[0] == item["near"].shape[0]
    assert item["pose"].shape == (63,)
    # fixed head/hand joints zeroed (ref: dataset_pose.py:292-298)
    assert np.all(item["pose"][3 * 11: 3 * 11 + 3] == 0)
    assert np.all(item["pose"][3 * 19: 3 * 20] == 0)


def test_comparison_driver(tmp_path):
    from animatablegaussians_tpu.eval.comparison import compare_methods
    rng = np.random.default_rng(1)
    gt_dir = tmp_path / "gt"
    mask_dir = tmp_path / "mask"
    m_dir = tmp_path / "ours"
    for d in (gt_dir, mask_dir, m_dir):
        os.makedirs(d)
    for f in (0, 1):
        mask = np.zeros((64, 64), np.uint8)
        mask[10:50, 15:45] = 255
        # methods render on white bg; the protocol whitens GT outside the
        # mask (ref: comparison_body_only_avatars.py:46)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        img[mask == 0] = 255
        cv.imwrite(str(gt_dir / ("%08d.jpg" % f)), img)
        noisy = np.clip(img.astype(int)
                        + rng.integers(-10, 10, img.shape), 0,
                        255).astype(np.uint8)
        noisy[mask == 0] = 255
        cv.imwrite(str(m_dir / ("%08d.jpg" % f)), noisy)
        cv.imwrite(str(mask_dir / ("%08d.jpg" % f)), mask)

    out = compare_methods(dict(ours=str(m_dir)), str(gt_dir), str(mask_dir),
                          [0, 1], patch_size=32,
                          crop_out_dir=str(tmp_path / "crops"))
    m = out["ours"]
    assert m.count == 2
    assert 10 < m.psnr / m.count < 50
    assert os.path.exists(tmp_path / "crops" / "gt" / "00000000.png")


def test_stage_timer_and_time_fn():
    import jax.numpy as jnp
    from animatablegaussians_tpu.utils.profiling import StageTimer, time_fn
    t = StageTimer()
    with t.stage("work") as out:
        out["result"] = jnp.ones(8) * 2
    assert t.counts["work"] == 1 and t.totals["work"] > 0
    assert "work" in t.summary()
    dt = time_fn(lambda x: x * 2, jnp.ones(16), iters=3, warmup=1)
    assert dt > 0


def test_obj_io_roundtrip(tmp_path):
    from animatablegaussians_tpu.utils.obj_io import (load_mesh, load_obj,
                                                      save_mesh_as_ply,
                                                      save_obj)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    m = load_obj(p)
    np.testing.assert_allclose(m["vertices"], verts)
    np.testing.assert_array_equal(m["faces"], faces)

    p2 = str(tmp_path / "m.ply")
    save_mesh_as_ply(p2, verts, faces, normals=verts)
    v2, f2 = load_mesh(p2)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_trace_report_and_synced_timing(tmp_path):
    """host_sync barrier, synced timing, and the HLO-correlated per-op
    trace report (the profiling workflow for the axon backend, where
    block_until_ready can return before device work finishes)."""
    import jax
    import jax.numpy as jnp
    from animatablegaussians_tpu.utils.profiling import (host_sync,
                                                         time_fn_synced,
                                                         trace, trace_report)

    f = jax.jit(lambda x: jnp.sort(x * 2.0))
    x = jnp.arange(2048.0)
    assert time_fn_synced(f, x, iters=2, warmup=1) > 0

    d = str(tmp_path / "trace")
    with trace(d):
        host_sync(f(x))
    rep = trace_report(d, f, (x,))
    assert "ms" in rep and len(rep.splitlines()) >= 1
