"""Linear blend skinning core, pure JAX.

Functional equivalent of the reference LBS pipeline (ref: smplx/lbs.py:152-252,
349-405): shape blendshapes -> joint regression -> pose blendshapes ->
kinematic-chain rigid transforms -> vertex skinning. Returns the per-joint
translation-adjusted affine matrices ``A`` that the whole avatar pipeline
consumes as ``cano2live = A_live @ inv(A_cano)``
(ref: dataset/dataset_mv_rgb.py:172-173).

Design notes (TPU): the 55-joint kinematic chain is unrolled at trace time
(tiny, sequential by nature); everything else is batched einsums that XLA maps
onto the MXU. All ops are vmap/jit/grad friendly with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops.quat import axis_angle_to_mat


def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) -> (B, V, 3) shape displacement."""
    return jnp.einsum("bl,vcl->bvc", betas, shape_dirs, precision=jax.lax.Precision.HIGHEST)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", J_regressor, vertices, precision=jax.lax.Precision.HIGHEST)


def batch_rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    return axis_angle_to_mat(aa)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,       # (B, J, 3, 3)
    joints: jnp.ndarray,         # (B, J, 3) rest-pose joint locations
    parents: np.ndarray,         # (J,) static int array, parents[0] ignored
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics along the tree.

    Returns (posed_joints (B, J, 3), rel_transforms A (B, J, 4, 4)) where A_j
    maps a rest-pose-space point rigidly attached to joint j into posed space.
    """
    B, J = rot_mats.shape[:2]
    parents = np.asarray(parents)

    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, parents[1:]]], axis=1)

    # Local 4x4s.
    local = jnp.zeros((B, J, 4, 4), dtype=rot_mats.dtype)
    local = local.at[:, :, :3, :3].set(rot_mats)
    local = local.at[:, :, :3, 3].set(rel_joints)
    local = local.at[:, :, 3, 3].set(1.0)

    # Chain composition, unrolled over the (static, tiny) tree.
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    chain = [local[:, 0]]
    for i in range(1, J):
        chain.append(mm(chain[parents[i]], local[:, i]))
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]

    # Subtract the rotated rest joint so A acts on rest-space coordinates.
    t_correction = jnp.einsum("bjxy,bjy->bjx", transforms[:, :, :3, :3], joints,
                          precision=jax.lax.Precision.HIGHEST)
    A = transforms.at[:, :, :3, 3].add(-t_correction)
    return posed_joints, A


def lbs(
    betas: jnp.ndarray,          # (B, L)
    pose: jnp.ndarray,           # (B, J*3) axis-angle, or (B, J, 3, 3) if not pose2rot
    v_template: jnp.ndarray,     # (V, 3)
    shapedirs: jnp.ndarray,      # (V, 3, L)
    posedirs: jnp.ndarray,       # ((J-1)*9, V*3)
    J_regressor: jnp.ndarray,    # (J, V)
    parents: np.ndarray,         # (J,)
    lbs_weights: jnp.ndarray,    # (V, J)
    pose2rot: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full LBS. Returns (verts (B,V,3), joints (B,J,3), A (B,J,4,4))."""
    B = max(betas.shape[0], pose.shape[0])
    num_joints = J_regressor.shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    J = vertices2joints(J_regressor, v_shaped)

    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(B, -1, 3))
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = jnp.matmul(pose_feature, posedirs,
                          precision=jax.lax.Precision.HIGHEST).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, J, parents)

    # Per-vertex blended transforms: W (V, J) x A (B, J, 16) on the MXU.
    T = jnp.einsum("vj,bjpq->bvpq", lbs_weights, A,
               precision=jax.lax.Precision.HIGHEST)
    verts = (jnp.einsum("bvxy,bvy->bvx", T[:, :, :3, :3], v_posed,
                        precision=jax.lax.Precision.HIGHEST)
             + T[:, :, :3, 3])
    return verts, posed_joints, A
