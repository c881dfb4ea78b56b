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


def vertices2landmarks(
    vertices: jnp.ndarray,        # (B, V, 3)
    faces: np.ndarray,            # (F, 3) int
    lmk_faces_idx: jnp.ndarray,   # (B, L) int face index per landmark
    lmk_bary_coords: jnp.ndarray  # (B, L, 3) barycentric weights
) -> jnp.ndarray:
    """Barycentric face-point landmarks (ref: smplx/lbs.py:108-149).
    Returns (B, L, 3)."""
    faces = jnp.asarray(faces, jnp.int32)
    lmk_faces = faces[lmk_faces_idx]                  # (B, L, 3) vertex ids
    lmk_verts = jax.vmap(lambda v, f: v[f])(vertices, lmk_faces)  # (B,L,3,3)
    return jnp.einsum("blfc,blf->blc", lmk_verts, lmk_bary_coords,
                      precision=jax.lax.Precision.HIGHEST)


def rot_mat_to_euler(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Y euler angle of (..., 3, 3) rotations (ref: smplx/utils.py:122-128)."""
    sy = jnp.sqrt(rot_mats[..., 0, 0] ** 2 + rot_mats[..., 1, 0] ** 2)
    return jnp.arctan2(-rot_mats[..., 2, 0], sy)


def find_dynamic_lmk_idx_and_bcoords(
    pose: jnp.ndarray,                 # (B, J*3) axis-angle full pose
    dynamic_lmk_faces_idx: jnp.ndarray,   # (79, L_dyn) LUT rows by neck angle
    dynamic_lmk_bary_coords: jnp.ndarray, # (79, L_dyn, 3)
    neck_kin_chain,                    # static list of joint ids, leaf->root
) -> tuple:
    """Face-contour landmark LUT selection from the neck's global y rotation
    (ref: smplx/lbs.py:30-105). Pure gather math — LUT rows are selected per
    batch element with a jit-friendly integer clamp chain identical to the
    reference's mask arithmetic. Returns ((B, L_dyn) faces, (B, L_dyn, 3)
    barycentrics)."""
    B = pose.shape[0]
    aa = pose.reshape(B, -1, 3)[:, np.asarray(neck_kin_chain)]
    rot_mats = batch_rodrigues(aa)                    # (B, C, 3, 3)
    rel = jnp.broadcast_to(jnp.eye(3, dtype=rot_mats.dtype), (B, 3, 3))
    for i in range(len(neck_kin_chain)):
        rel = jnp.matmul(rot_mats[:, i], rel,
                         precision=jax.lax.Precision.HIGHEST)
    y_rot_angle = jnp.round(
        jnp.clip(-rot_mat_to_euler(rel) * 180.0 / np.pi,
                 max=39)).astype(jnp.int32)
    neg_mask = (y_rot_angle < 0).astype(jnp.int32)
    mask = (y_rot_angle < -39).astype(jnp.int32)
    neg_vals = mask * 78 + (1 - mask) * (39 - y_rot_angle)
    y_rot_angle = neg_mask * neg_vals + (1 - neg_mask) * y_rot_angle
    return (dynamic_lmk_faces_idx[y_rot_angle],
            dynamic_lmk_bary_coords[y_rot_angle])
