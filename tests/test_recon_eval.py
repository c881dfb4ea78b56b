"""Marching cubes, eval metrics, NeRF utils, visualize cameras."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_marching_cubes_sphere():
    from animatablegaussians_tpu.utils.recon import marching_cubes
    n = 32
    g = np.mgrid[:n, :n, :n].astype(np.float32)
    center = (n - 1) / 2
    r = 10.0
    sdf = np.sqrt(((g - center) ** 2).sum(0)) - r   # outside > 0
    verts, faces = marching_cubes(sdf, level=0.0)
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    # all vertices near the sphere surface
    d = np.abs(np.linalg.norm(verts - center, axis=1) - r)
    assert d.max() < 0.2
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < verts.shape[0]
    # surface area close to 4 pi r^2
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.05


def test_psnr_ssim_basics():
    from animatablegaussians_tpu.eval.score import compute_psnr, compute_ssim
    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 3)).astype(np.float32)
    assert compute_psnr(a, a) == float("inf")
    assert abs(compute_ssim(a, a) - 1.0) < 1e-6
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32)
    p = compute_psnr(b, a)
    assert 15 < p < 30
    s = compute_ssim(b, a)
    assert 0.1 < s < 0.95


def test_crop_image_square_resize():
    from animatablegaussians_tpu.eval.score import crop_image
    mask = np.zeros((200, 150), np.float32)
    mask[40:160, 30:120] = 1.0
    img = np.random.default_rng(1).random((200, 150, 3)).astype(np.float32)
    out = crop_image(mask, 64, img)
    assert out.shape == (64, 64, 3)


def test_nerf_ray_aabb_and_integration():
    from animatablegaussians_tpu.utils import nerf

    bounds = np.array([[-1, -1, 2], [1, 1, 4]], np.float32)
    ray_o = np.zeros((3, 3), np.float32)
    ray_d = np.array([[0, 0, 1], [0, 1, 0], [0.1, 0, 1]], np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=1, keepdims=True)
    near, far, mask = nerf.get_near_far(bounds, ray_o, ray_d)
    assert mask[0] and not mask[1]
    assert abs(near[0] - 1.99) < 0.02 and abs(far[0] - 4.01) < 0.02

    pts, z = nerf.sample_pts_on_rays(jnp.asarray(ray_o[:1]),
                                     jnp.asarray(ray_d[:1]),
                                     jnp.asarray([2.0]), jnp.asarray([4.0]),
                                     n_samples=8)
    assert pts.shape == (1, 8, 3)
    assert np.isclose(float(z[0, 0]), 2.0) and np.isclose(float(z[0, -1]),
                                                          4.0)

    # fully opaque first sample -> rgb == first color, acc == 1
    raw = jnp.zeros((1, 8, 4)).at[:, :, :3].set(0.5).at[:, 0, 3].set(1.0)
    rgb, disp, acc, w, depth = nerf.raw2outputs(raw, z)
    assert np.allclose(np.asarray(rgb), 0.5, atol=1e-5)
    assert np.isclose(float(acc[0]), 1.0, atol=1e-5)
    assert np.isclose(float(depth[0]), 2.0, atol=1e-5)


def test_sample_pdf_det_uniform():
    from animatablegaussians_tpu.utils.nerf import sample_pdf
    bins = jnp.linspace(0, 1, 9)[None]          # (1, 9)
    weights = jnp.ones((1, 8))
    s = sample_pdf(bins, weights, 16, det=True)
    assert s.shape == (1, 16)
    arr = np.asarray(s[0])
    assert (np.diff(arr) >= -1e-6).all()
    assert arr.min() >= 0 and arr.max() <= 1


def test_visualize_cameras_look_at_center():
    from animatablegaussians_tpu.utils import visualize as viz
    center = np.array([0.3, -0.2, 0.5], np.float32)
    for fn in (viz.calc_front_mv, viz.calc_back_mv):
        extr = fn(center)
        p = extr[:3, :3] @ center + extr[:3, 3]
        assert np.allclose(p, [0, 0, 2.0], atol=1e-5)
    extr = viz.calc_free_mv(center, rot_Y=1.0, rot_X=0.2)
    p = extr[:3, :3] @ center + extr[:3, 3]
    assert np.allclose(p, [0, 0, 2.0], atol=1e-5)


def test_to_hsv_range():
    from animatablegaussians_tpu.utils.visualize import to_hsv
    c = np.linspace(0, 1, 11)
    rgb = to_hsv(c)
    assert rgb.shape == (11, 3) and rgb.dtype == np.uint8
    assert rgb.max() == 255


def test_ssim_loss_matches_eval_ssim():
    from animatablegaussians_tpu.training.losses import ssim as ssim_train
    from animatablegaussians_tpu.eval.score import compute_ssim
    rng = np.random.default_rng(3)
    a = rng.random((48, 40, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32)
    got = float(ssim_train(jnp.asarray(a), jnp.asarray(b)))
    want = compute_ssim(a, b)
    assert abs(got - want) < 1e-4
    # differentiable
    g = jax.grad(lambda x: ssim_train(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()


def test_generated_configs_load():
    import glob
    from animatablegaussians_tpu.config import load_config
    cfgs = glob.glob("configs/*/avatar.yaml")
    assert len(cfgs) >= 10
    for path in cfgs[:3]:
        c = load_config(path)
        assert "data_dir" in c["train"]["data"]
        assert c["train"]["loss_weight"].get("l1") is not None
        assert c["test"]["n_pca"] == 20
        t = load_config(path.replace("avatar.yaml", "template.yaml"))
        assert t["train"]["lr"]["network"]["type"] == "Step"
        assert t["model"]["use_root_finding"] is True


def test_frechet_distance_properties():
    """FID math: zero on identical stats; matches the closed form for
    diagonal covariances; symmetric (ref: pytorch-fid semantics used by
    eval/comparison_body_only_avatars.py:97-112)."""
    from animatablegaussians_tpu.eval.fid import (frechet_distance,
                                                  gaussian_stats)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((200, 16))
    mu, cov = gaussian_stats(f)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6

    # diagonal case: sum (mu1-mu2)^2 + sum (sqrt(v1)-sqrt(v2))^2
    mu1, mu2 = np.zeros(4), np.array([1.0, 0, 0, 0])
    v1, v2 = np.array([1, 2, 3, 4.0]), np.array([2, 2, 1, 4.0])
    want = 1.0 + np.sum((np.sqrt(v1) - np.sqrt(v2)) ** 2)
    got = frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2), eps=0)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    got2 = frechet_distance(mu2, np.diag(v2), mu1, np.diag(v1), eps=0)
    np.testing.assert_allclose(got2, got, rtol=1e-8)


def test_fid_pipeline_separates_distributions(tmp_path):
    """End-to-end FID with the random-init Inception trunk: identical image
    sets give ~0, disjoint sets give a clearly larger value."""
    import cv2 as cv
    import jax
    from animatablegaussians_tpu.eval.fid import (InceptionV3Features,
                                                  compute_fid)
    rng = np.random.default_rng(1)
    d1, d2, d3 = [tmp_path / n for n in ("a", "b", "c")]
    for d in (d1, d2, d3):
        os.makedirs(d)
    for i in range(6):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv.imwrite(str(d1 / f"{i}.png"), img)
        cv.imwrite(str(d2 / f"{i}.png"), img)          # same distribution
        dark = (0.2 * rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv.imwrite(str(d3 / f"{i}.png"), dark)          # different

    model = InceptionV3Features.init_random(jax.random.PRNGKey(0))
    same = compute_fid(str(d1), str(d2), model, batch=3)
    diff = compute_fid(str(d1), str(d3), model, batch=3)
    assert same < 1e-3
    assert diff > same + 1e-2
