"""Gaussian pytree, KNN init, and PLY round-trip tests."""

import numpy as np
import jax.numpy as jnp

from animatablegaussians_tpu.models.gaussian_model import (
    GaussianParams, create_from_pcd, save_gaussians_as_ply,
    load_gaussians_from_ply)
from animatablegaussians_tpu.ops.knn import knn, knn_gather


def test_knn_vs_numpy():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((37, 3)).astype(np.float32)
    r = rng.standard_normal((53, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=4, chunk=16)
    full = ((q[:, None] - r[None]) ** 2).sum(-1)
    want_idx = np.argsort(full, axis=1)[:, :4]
    want_d2 = np.take_along_axis(full, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(d2), want_d2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)

    g = knn_gather(jnp.asarray(r), idx)
    np.testing.assert_allclose(np.asarray(g), r[want_idx], atol=0)


def test_create_from_pcd():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    g = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols))
    assert g.num_points == 100
    np.testing.assert_allclose(np.asarray(g.get_opacity),
                               np.full((100, 1), 0.1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.get_rotation)[:, 0], 1.0)
    # scale = sqrt(mean distance^2 to 3 NN)
    full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    d2 = np.sort(full, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(np.asarray(g.get_scaling)[:, 0],
                               np.sqrt(np.maximum(d2, 1e-7)), rtol=1e-4)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 50
    vals = dict(
        positions=rng.standard_normal((n, 3)).astype(np.float32),
        opacity=rng.uniform(0.05, 0.95, (n, 1)).astype(np.float32),
        scales=rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32),
        rotations=rng.standard_normal((n, 4)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
    )
    vals["rotations"] /= np.linalg.norm(vals["rotations"], axis=1,
                                        keepdims=True)
    path = str(tmp_path / "g.ply")
    save_gaussians_as_ply(path, vals)
    back = load_gaussians_from_ply(path)
    np.testing.assert_allclose(np.asarray(back["positions"]),
                               vals["positions"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(back["opacity"]).reshape(n, 1),
                               vals["opacity"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(back["scales"]), vals["scales"],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(back["colors"]), vals["colors"],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(back["rotations"]),
                               vals["rotations"], atol=1e-5)
