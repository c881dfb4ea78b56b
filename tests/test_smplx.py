"""SMPL-X / LBS tests against an independent per-vertex numpy oracle and
analytic rigid-motion properties, on a synthetic small body model."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from animatablegaussians_tpu.models.smplx import (
    SMPLX, SMPLXData, lbs, batch_rigid_transform)


def make_synthetic_model(V=40, J=6, n_betas=4, n_expr=2, seed=0):
    rng = np.random.default_rng(seed)
    parents = np.array([0, 0, 1, 2, 1, 4])[:J]
    v_template = rng.standard_normal((V, 3)).astype(np.float32)
    shapedirs = 0.05 * rng.standard_normal((V, 3, n_betas)).astype(np.float32)
    expr_dirs = 0.02 * rng.standard_normal((V, 3, n_expr)).astype(np.float32)
    posedirs = 0.01 * rng.standard_normal(((J - 1) * 9, V * 3)).astype(np.float32)
    Jreg = rng.random((J, V)).astype(np.float32)
    Jreg /= Jreg.sum(1, keepdims=True)
    W = rng.random((V, J)).astype(np.float32)
    W /= W.sum(1, keepdims=True)
    hand_comp = rng.standard_normal((6, 45)).astype(np.float32)
    data = SMPLXData(
        v_template=jnp.asarray(v_template), shapedirs=jnp.asarray(shapedirs),
        expr_dirs=jnp.asarray(expr_dirs), posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(Jreg), lbs_weights=jnp.asarray(W),
        left_hand_components=jnp.asarray(hand_comp),
        right_hand_components=jnp.asarray(hand_comp),
        left_hand_mean=jnp.zeros(45), right_hand_mean=jnp.zeros(45),
        parents=parents, faces=np.zeros((1, 3), np.int64))
    return data


def numpy_lbs_oracle(data, betas, pose_aa):
    """Slow direct implementation: per-joint recursive FK + per-vertex loops."""
    v_template = np.asarray(data.v_template, np.float64)
    shapedirs = np.asarray(data.shapedirs, np.float64)
    posedirs = np.asarray(data.posedirs, np.float64)
    Jreg = np.asarray(data.J_regressor, np.float64)
    W = np.asarray(data.lbs_weights, np.float64)
    parents = data.parents
    J = Jreg.shape[0]

    v_shaped = v_template + shapedirs @ betas
    joints = Jreg @ v_shaped
    R = Rotation.from_rotvec(pose_aa.reshape(J, 3)).as_matrix()

    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    # recursive global transforms
    G = np.zeros((J, 4, 4))
    for j in range(J):
        local = np.eye(4)
        local[:3, :3] = R[j]
        local[:3, 3] = joints[j] - (joints[parents[j]] if j > 0 else 0)
        G[j] = local if j == 0 else G[parents[j]] @ local
    A = G.copy()
    for j in range(J):
        A[j, :3, 3] -= A[j, :3, :3] @ joints[j]

    verts = np.zeros_like(v_posed)
    for v in range(v_posed.shape[0]):
        T = sum(W[v, j] * A[j] for j in range(J))
        verts[v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return verts, G[:, :3, 3], A


def test_lbs_matches_numpy_oracle():
    data = make_synthetic_model()
    rng = np.random.default_rng(1)
    betas = rng.standard_normal(4).astype(np.float32) * 0.5
    pose = (0.3 * rng.standard_normal(6 * 3)).astype(np.float32)

    verts, joints, A = lbs(
        jnp.asarray(betas)[None], jnp.asarray(pose)[None], data.v_template,
        data.shapedirs, data.posedirs, data.J_regressor, data.parents,
        data.lbs_weights)
    want_v, want_j, want_A = numpy_lbs_oracle(data, betas, pose)
    np.testing.assert_allclose(np.asarray(verts[0]), want_v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints[0]), want_j, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A[0]), want_A, atol=1e-5)


def test_zero_pose_is_identity():
    data = make_synthetic_model()
    verts, joints, A = lbs(
        jnp.zeros((1, 4)), jnp.zeros((1, 18)), data.v_template,
        data.shapedirs, data.posedirs, data.J_regressor, data.parents,
        data.lbs_weights)
    np.testing.assert_allclose(np.asarray(verts[0]),
                               np.asarray(data.v_template), atol=1e-6)
    ident = np.tile(np.eye(4), (6, 1, 1))
    np.testing.assert_allclose(np.asarray(A[0]), ident, atol=1e-6)


def test_global_rotation_is_rigid():
    data = make_synthetic_model()
    aa = np.array([0.3, -0.2, 0.5], np.float32)
    pose = np.zeros(18, np.float32)
    pose[:3] = aa
    verts, _, _ = lbs(
        jnp.zeros((1, 4)), jnp.asarray(pose)[None], data.v_template,
        data.shapedirs, data.posedirs, data.J_regressor, data.parents,
        data.lbs_weights)
    R = Rotation.from_rotvec(aa).as_matrix()
    root = np.asarray(data.J_regressor) @ np.asarray(data.v_template)
    root = root[0]
    want = (np.asarray(data.v_template) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), want, atol=1e-5)


def test_smplx_forward_api():
    data = make_synthetic_model(J=55 if False else 6)
    # full SMPLX forward requires 55 joints; build a 55-joint chain model
    rng = np.random.default_rng(2)
    V, J = 60, 55
    parents = np.concatenate([[0], rng.integers(0, 1, size=0)]).astype(int)
    parents = np.zeros(J, int)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    Jreg = rng.random((J, V)).astype(np.float32)
    Jreg /= Jreg.sum(1, keepdims=True)
    W = rng.random((V, J)).astype(np.float32)
    W /= W.sum(1, keepdims=True)
    data = SMPLXData(
        v_template=jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32)),
        shapedirs=jnp.asarray(0.03 * rng.standard_normal((V, 3, 10)).astype(np.float32)),
        expr_dirs=jnp.asarray(0.01 * rng.standard_normal((V, 3, 10)).astype(np.float32)),
        posedirs=jnp.asarray(0.01 * rng.standard_normal(((J - 1) * 9, V * 3)).astype(np.float32)),
        J_regressor=jnp.asarray(Jreg), lbs_weights=jnp.asarray(W),
        left_hand_components=jnp.asarray(rng.standard_normal((6, 45)).astype(np.float32)),
        right_hand_components=jnp.asarray(rng.standard_normal((6, 45)).astype(np.float32)),
        left_hand_mean=jnp.zeros(45), right_hand_mean=jnp.zeros(45),
        parents=parents, faces=np.zeros((1, 3), np.int64))
    model = SMPLX(data, use_pca=True, num_pca_comps=6)

    out = model(betas=jnp.zeros((1, 10)),
                transl=jnp.asarray([[0.1, 0.2, 0.3]]))
    assert out["vertices"].shape == (1, V, 3)
    assert out["joints"].shape == (1, J, 3)
    assert out["A"].shape == (1, J, 4, 4)

    # transl moves verts and A translation equally
    out0 = model(betas=jnp.zeros((1, 10)))
    np.testing.assert_allclose(
        np.asarray(out["vertices"] - out0["vertices"]),
        np.full((1, V, 3), [0.1, 0.2, 0.3], np.float32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["A"][..., :3, 3] - out0["A"][..., :3, 3]),
        np.full((1, J, 3), [0.1, 0.2, 0.3], np.float32), atol=1e-6)

    # cano2live composition: A_live @ inv(A_cano) applied to cano verts == live verts
    pose = 0.2 * rng.standard_normal((1, 63)).astype(np.float32)
    live = model(betas=jnp.zeros((1, 10)), body_pose=jnp.asarray(pose))
    cano = out0
    A_c2l = np.einsum("bjxy,bjyz->bjxz", np.asarray(live["A"]),
                      np.linalg.inv(np.asarray(cano["A"])))
    # one-hot weight vertex check: vertex with argmax weight ~ dominated joint
    # (exact only for one-hot weights; here just check shapes/finite)
    assert np.isfinite(A_c2l).all()
