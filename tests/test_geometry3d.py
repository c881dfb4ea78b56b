"""Geometry ops tests: point-triangle closest point vs brute-force numpy
oracle, nearest_face + barycentric consistency, near/far sphere bounds,
grid sampling vs direct trilinear math, root finding inverts skinning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _oracle_closest_point(p, a, b, c, n_grid=60):
    """Dense barycentric sampling oracle for closest point on a triangle."""
    best_d, best_pt = np.inf, None
    for i in range(n_grid + 1):
        for j in range(n_grid + 1 - i):
            u = i / n_grid
            v = j / n_grid
            w = 1 - u - v
            q = u * a + v * b + w * c
            d = np.sum((q - p) ** 2)
            if d < best_d:
                best_d, best_pt = d, q
    return best_pt, np.sqrt(best_d)


def test_closest_point_triangle_vs_oracle():
    from animatablegaussians_tpu.ops.geometry3d import closest_point_triangle
    rng = np.random.default_rng(0)
    tri = rng.standard_normal((3, 3)).astype(np.float32)
    pts = rng.standard_normal((12, 3)).astype(np.float32)
    cp, bary = closest_point_triangle(
        jnp.asarray(pts), jnp.asarray(tri[0])[None],
        jnp.asarray(tri[1])[None], jnp.asarray(tri[2])[None])
    for i in range(len(pts)):
        _, d_ref = _oracle_closest_point(pts[i], *tri)
        d_got = float(np.linalg.norm(np.asarray(cp[i]) - pts[i]))
        assert abs(d_got - d_ref) < 2e-2  # oracle grid resolution
        assert d_got <= d_ref + 1e-4     # ours is exact, oracle approx
    # barycentric reconstructs the closest point
    rec = (np.asarray(bary)[:, :1] * tri[0] + np.asarray(bary)[:, 1:2]
           * tri[1] + np.asarray(bary)[:, 2:] * tri[2])
    assert np.allclose(rec, np.asarray(cp), atol=1e-5)


def test_nearest_face_on_cube():
    from animatablegaussians_tpu.ops.geometry3d import (
        nearest_face, barycentric_interpolate)
    # unit right triangle pair (a square in z=0)
    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                        jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    pts = jnp.asarray([[0.25, 0.1, 0.5], [0.9, 0.9, -0.2], [2.0, 0.5, 0.0]],
                      jnp.float32)
    d, fi, bc = nearest_face(pts, verts, faces, chunk=4)
    assert np.allclose(np.asarray(d), [0.5, 0.2, 1.0], atol=1e-5)
    assert int(fi[0]) == 0
    # interpolation at the surface point equals the projected position
    attr = barycentric_interpolate(verts, faces, fi, bc)
    assert np.allclose(np.asarray(attr)[0, :2], [0.25, 0.1], atol=1e-5)
    assert np.allclose(np.asarray(bc).sum(-1), 1.0, atol=1e-5)


def test_near_far_smpl_sphere():
    from animatablegaussians_tpu.ops.geometry3d import near_far_smpl
    verts = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    rays_o = jnp.zeros((2, 3), jnp.float32)
    rays_d = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0]], jnp.float32)
    near, far, hit = near_far_smpl(verts, rays_o, rays_d, radius=0.1,
                                   chunk=2)
    assert bool(hit[0]) and not bool(hit[1])
    assert np.isclose(float(near[0]), 1.9, atol=1e-5)
    assert np.isclose(float(far[0]), 2.1, atol=1e-5)


def test_skinning_identity_and_blend():
    from animatablegaussians_tpu.ops.geometry3d import skinning
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((5, 3)),
                      jnp.float32)
    mats = jnp.tile(jnp.eye(4), (3, 1, 1)).at[1, :3, 3].set(
        jnp.asarray([1.0, 0, 0]))
    lbs = jnp.zeros((5, 3)).at[:, 1].set(1.0)
    out = skinning(pts, lbs, mats)
    assert np.allclose(np.asarray(out), np.asarray(pts) + [1, 0, 0],
                       atol=1e-6)


def test_grid_sample_trilinear_matches_manual():
    from animatablegaussians_tpu.ops.grid_sample import (
        sample_volume_trilinear, sample_volume_nearest)
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((5, 6, 7, 2)).astype(np.float32)
    # exact voxel centers -> exact values
    pts = np.asarray([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]], np.float32)
    out = sample_volume_trilinear(jnp.asarray(vol), jnp.asarray(pts))
    assert np.allclose(np.asarray(out[0]), vol[0, 0, 0], atol=1e-6)
    assert np.allclose(np.asarray(out[1]), vol[4, 5, 6], atol=1e-6)
    # p = 0.5*(res-1) = (2, 2.5, 3): interpolate y between 2 and 3
    man = 0.5 * (vol[2, 2, 3] + vol[2, 3, 3])
    assert np.allclose(np.asarray(out[2]), man, atol=1e-5)
    near = sample_volume_nearest(jnp.asarray(vol), jnp.asarray(pts))
    assert np.allclose(np.asarray(near[0]), vol[0, 0, 0])


def test_root_finding_inverts_forward_skinning():
    from animatablegaussians_tpu.ops.root_finding import root_finding
    from animatablegaussians_tpu.ops.geometry3d import skinning
    from animatablegaussians_tpu.ops.grid_sample import \
        sample_volume_trilinear

    # 2 joints; weight varies along x -> smooth blended transform
    res = 24
    J = 2
    xs = np.linspace(0, 1, res)
    w0 = 1.0 / (1.0 + np.exp((xs - 0.5) * 10))
    weight_volume = np.zeros((res, res, res, J), np.float32)
    weight_volume[..., 0] = w0[:, None, None]
    weight_volume[..., 1] = 1.0 - w0[:, None, None]
    bounds = np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32)

    # gradient volume: analytic dw/dx, others 0
    dw = np.gradient(w0, (xs[1] - xs[0]) * 2)  # d/dx in world units
    grad_volume = np.zeros((res, res, res, J * 3), np.float32)
    grad_volume[..., 0] = dw[:, None, None]
    grad_volume[..., 3] = -dw[:, None, None]

    mats = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    mats[0, :3, 3] = [0.02, 0.01, 0.0]
    mats[1, :3, 3] = [-0.02, 0.0, 0.01]

    rng = np.random.default_rng(2)
    cano_gt = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    w = sample_volume_trilinear(jnp.asarray(weight_volume),
                                (jnp.asarray(cano_gt) + 1) / 2)
    posed = skinning(jnp.asarray(cano_gt), w, jnp.asarray(mats))

    xc = root_finding(jnp.asarray(weight_volume), jnp.asarray(grad_volume),
                      posed, posed, jnp.asarray(mats),
                      jnp.asarray(bounds), lam=0.1, iter_num=10)
    # re-skint the solution: should land on the target
    w2 = sample_volume_trilinear(jnp.asarray(weight_volume),
                                 (xc + 1) / 2)
    posed2 = skinning(xc, w2, jnp.asarray(mats))
    err = np.abs(np.asarray(posed2) - np.asarray(posed)).max()
    assert err < 1e-3
