"""Template-stack tests: MLPs, density, weight volume, embedder, and the
TemplateNet render path on synthetic geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _uv_sphere(n_theta=8, n_phi=12, r=0.5):
    """Small closed triangle mesh of a sphere."""
    verts = [(0, 0, r), (0, 0, -r)]
    rows = []
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        row = []
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            row.append(len(verts))
            verts.append((r * np.sin(th) * np.cos(ph),
                          r * np.sin(th) * np.sin(ph), r * np.cos(th)))
        rows.append(row)
    faces = []
    for j in range(n_phi):
        faces.append((0, rows[0][j], rows[0][(j + 1) % n_phi]))
        faces.append((1, rows[-1][(j + 1) % n_phi], rows[-1][j]))
    for i in range(len(rows) - 1):
        for j in range(n_phi):
            a, b = rows[i][j], rows[i][(j + 1) % n_phi]
            c, d = rows[i + 1][j], rows[i + 1][(j + 1) % n_phi]
            faces.append((a, c, b))
            faces.append((b, c, d))
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def test_embedder_shapes_and_values():
    from animatablegaussians_tpu.ops.embedder import get_embedder
    fn, dim = get_embedder(4, 3)
    assert dim == 3 * (1 + 2 * 4)
    x = jnp.asarray([[0.1, -0.2, 0.3]])
    out = fn(x)
    assert out.shape == (1, dim)
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.1, -0.2, 0.3],
                               atol=1e-6)
    np.testing.assert_allclose(float(out[0, 3]), np.sin(0.1), atol=1e-6)
    np.testing.assert_allclose(float(out[0, 6]), np.cos(0.1), atol=1e-6)


def test_mlp_linear_and_res_layers():
    from animatablegaussians_tpu.models.mlp import MLPLinear
    net = MLPLinear(4, 2, [8, 8, 8], res_layers=[2], last_op="sigmoid")
    p = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    y = net.apply(p, x)
    assert y.shape == (5, 2)
    assert (np.asarray(y) > 0).all() and (np.asarray(y) < 1).all()


def test_sdf_mlp_geometric_init_is_spherical():
    from animatablegaussians_tpu.models.mlp import SdfMLP
    net = SdfMLP(3, 257, [512, 256, 256, 256, 256, 256], res_layers=[4],
                 bias=0.7)
    p = net.init(jax.random.PRNGKey(0))
    pts = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0], [0, 3.0, 0]])
    sdf = np.asarray(net.apply(p, pts)[:, 0])
    # geometric init approximates |x| - bias (inside negative at origin)
    assert sdf[0] < 0 < sdf[1] < sdf[2]


def test_laplace_density():
    from animatablegaussians_tpu.models.density import LaplaceDensity
    d = LaplaceDensity(beta_init=0.01)
    p = d.init()
    beta = float(d.get_beta(p))
    # VolSDF convention: sdf < 0 inside -> density saturates at 1/beta
    # (ref: network/density.py:28-30, Laplace(0, beta).cdf(-sdf))
    inside = float(d.apply(p, jnp.asarray([-1.0]))[0])
    outside = float(d.apply(p, jnp.asarray([1.0]))[0])
    mid = float(d.apply(p, jnp.asarray([0.0]))[0])
    assert abs(inside - 1.0 / beta) / (1.0 / beta) < 1e-3
    assert outside < 1e-3
    assert abs(mid - 0.5 / beta) / (1.0 / beta) < 1e-3


def test_weight_volume_roundtrip():
    from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume
    rng = np.random.default_rng(0)
    res, J = 16, 4
    w = rng.random((res, res, res, J)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    data = dict(diff_weight_volume=w, ori_weight_volume=w,
                sdf_volume=rng.standard_normal(
                    (res, res, res)).astype(np.float32),
                volume_bounds=np.array([[-1, -1, -1], [1, 1, 1]],
                                       np.float32),
                center=np.zeros(3, np.float32),
                smpl_bounds=np.array([[-1, -1, -1], [1, 1, 1]], np.float32))
    vol = CanoBlendWeightVolume(data=data)
    # exact voxel-center queries return the stored values
    ij = np.array([[0, 0, 0], [res - 1, res - 1, res - 1], [3, 7, 11]])
    pts = -1.0 + 2.0 * ij / (res - 1)
    out = np.asarray(vol.forward_weight(jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(out, w[ij[:, 0], ij[:, 1], ij[:, 2]],
                               atol=1e-5)
    sdf = np.asarray(vol.forward_sdf(jnp.asarray(pts, jnp.float32)))
    assert sdf.shape == (3, 1)
    g = vol.grad_volume
    assert g.shape == (res, res, res, J, 3)


def test_template_net_render_rays():
    from animatablegaussians_tpu.models.template import TemplateNet
    from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume

    res, J = 12, 55
    w = np.zeros((res, res, res, J), np.float32)
    w[..., 0] = 1.0  # fully rigid to joint 0
    data = dict(diff_weight_volume=w,
                volume_bounds=np.array([[-1, -1, -1], [1, 1, 1]],
                                       np.float32))
    vol = CanoBlendWeightVolume(data=data)
    net = TemplateNet(dict(multires=4, use_viewdir=False, with_hand=False,
                           use_root_finding=False), vol)
    params = net.init(jax.random.PRNGKey(0))

    sv, sf = _uv_sphere()
    mats = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    mats[:, 0, 3] = 0.05  # small global shift
    items = dict(
        cano2live_jnt_mats=jnp.asarray(mats),
        live_smpl_v=jnp.asarray(sv + np.array([0.05, 0, 0], np.float32)),
        smpl_faces=jnp.asarray(sf),
        smpl_lbs=jnp.zeros((sv.shape[0], J)).at[:, 0].set(1.0),
        cano_smpl_center=jnp.zeros(3),
    )

    R = 4
    ray_o = jnp.asarray(np.repeat([[0, 0, -2.0]], R, 0), jnp.float32)
    dirs = np.array([[0, 0, 1], [0.05, 0, 1], [0, 0.05, 1], [0.3, 0.3, 1]],
                    np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ray_d = jnp.asarray(dirs)
    near = jnp.full((R,), 1.0)
    far = jnp.full((R,), 3.0)

    out = net.render_rays(params, items, ray_o, ray_d, near, far,
                          n_samples=16, compute_normal=False)
    assert out["rgb_map"].shape == (R, 3)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    assert np.isfinite(np.asarray(out["acc_map"])).all()

    # live<->cano round trip for points near the surface
    cano_pts = jnp.asarray(sv * 0.9)
    posed = net.transform_cano2live(cano_pts, items)
    np.testing.assert_allclose(np.asarray(posed),
                               np.asarray(cano_pts) + [0.05, 0, 0],
                               atol=1e-5)
    back, near_flag = net.transform_live2cano(posed, items)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cano_pts),
                               atol=1e-4)
    assert bool(jnp.all(near_flag))


def test_hand_avatar_forward():
    from animatablegaussians_tpu.models.hand_avatar import HandAvatar
    net = HandAvatar()
    p = net.init(jax.random.PRNGKey(0))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    sdf = jax.random.normal(jax.random.PRNGKey(2), (10, 1))
    pose = jnp.zeros(45)
    c = net.apply(p, xyz, sdf, None, pose)
    assert c.shape == (10, 3)
    assert (np.asarray(c) >= 0).all() and (np.asarray(c) <= 1).all()
