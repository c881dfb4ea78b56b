"""Quaternion ops vs scipy.spatial.transform.Rotation."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from animatablegaussians_tpu.ops import quat


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_mat():
    q = random_quats(64)
    got = np.asarray(quat.quat_to_mat(jnp.asarray(q)))
    # scipy uses xyzw ordering
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mat_to_quat_roundtrip():
    q = random_quats(128, seed=1)
    m = quat.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(quat.mat_to_quat(m))
    # sign-canonicalize both
    qa = np.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(q2, qa, atol=1e-5)


def test_mat_to_quat_edge_cases():
    # identity and 180-degree rotations exercise all four pivots
    mats = [np.eye(3)]
    for axis in np.eye(3):
        mats.append(Rotation.from_rotvec(np.pi * axis).as_matrix())
    m = jnp.asarray(np.stack(mats))
    q = np.asarray(quat.mat_to_quat(m))
    back = np.asarray(quat.quat_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(back, np.stack(mats), atol=1e-5)


def test_axis_angle_to_mat():
    rng = np.random.default_rng(3)
    aa = rng.standard_normal((32, 3))
    got = np.asarray(quat.axis_angle_to_mat(jnp.asarray(aa)))
    want = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # zero rotation
    z = np.asarray(quat.axis_angle_to_mat(jnp.zeros((1, 3))))
    np.testing.assert_allclose(z[0], np.eye(3), atol=1e-6)


def test_quat_mul_and_rotate():
    qa, qb = random_quats(16, 4), random_quats(16, 5)
    got = np.asarray(quat.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    ra = Rotation.from_quat(qa[:, [1, 2, 3, 0]])
    rb = Rotation.from_quat(qb[:, [1, 2, 3, 0]])
    want = (ra * rb).as_quat()[:, [3, 0, 1, 2]]
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)

    v = np.random.default_rng(6).standard_normal((16, 3))
    rv = np.asarray(quat.rotate_vec(jnp.asarray(qa), jnp.asarray(v)))
    np.testing.assert_allclose(rv, ra.apply(v), atol=1e-5)


def test_normalize_zero_quat_finite_grad():
    """normalize(0) must be 0 with a zero (not NaN) gradient — pad rows and
    degenerate rotation sums hit this exactly (regression: NaN at bench
    step 0 via sel + g.rotation)."""
    import jax

    z = jnp.zeros((3, 4))
    out = np.asarray(quat.normalize(z))
    np.testing.assert_allclose(out, 0.0)
    g = jax.grad(lambda q: jnp.sum(quat.normalize(q) ** 2))(z)
    assert bool(jnp.isfinite(g).all())
    # nonzero quats: still an exact unit normalize
    q = jnp.asarray(random_quats(8, 3)) * 2.0
    n = np.asarray(quat.normalize(q))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
