"""SMPL-X body model as a JAX pytree + jittable forward.

Reads the standard ``SMPLX_*.npz`` model archives (user-provided, as in the
reference; ref: smplx/body_models.py:959-1292). The forward returns the same
outputs the avatar pipeline consumes: vertices, 55 LBS joints, and the
translation-adjusted per-joint affine matrices ``A``
(ref: smplx/body_models.py:1272-1291).

Differences from the reference by design:
  * functional — model data is an immutable pytree, forward is a pure
    function usable under jit/vmap/pjit;
  * no torch module state; batch comes from the inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .lbs import lbs, blend_shapes

NUM_JOINTS = 55           # 1 global + 21 body + jaw + 2 eyes + 30 hand joints
NUM_BODY_JOINTS = 21
HAND_JOINTS = 15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLXData:
    """Immutable SMPL-X model tensors."""
    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, n_betas)
    expr_dirs: jnp.ndarray       # (V, 3, n_expr)
    posedirs: jnp.ndarray        # ((J-1)*9, V*3)
    J_regressor: jnp.ndarray     # (J, V)
    lbs_weights: jnp.ndarray     # (V, J)
    left_hand_components: jnp.ndarray   # (n_pca, 45)
    right_hand_components: jnp.ndarray  # (n_pca, 45)
    left_hand_mean: jnp.ndarray  # (45,)
    right_hand_mean: jnp.ndarray # (45,)
    parents: np.ndarray = dataclasses.field(metadata=dict(static=True))
    faces: np.ndarray = dataclasses.field(metadata=dict(static=True))


class SMPLX:
    """SMPL-X with a jittable functional forward.

    Args mirror the reference constructor where meaningful: num_pca_comps,
    use_pca, flat_hand_mean (ref: smplx/body_models.py:975-1007).
    """

    def __init__(self, data: SMPLXData, num_pca_comps: int = 6,
                 use_pca: bool = True, flat_hand_mean: bool = False):
        self.data = data
        self.use_pca = use_pca
        self.num_pca_comps = num_pca_comps
        self.flat_hand_mean = flat_hand_mean
        self.num_joints = int(data.J_regressor.shape[0])
        self.num_verts = int(data.v_template.shape[0])
        self.faces = data.faces

    # ------------------------------------------------------------------
    @staticmethod
    def from_npz(path: str, gender: str = "neutral", num_betas: int = 10,
                 num_expression: int = 10, **kw) -> "SMPLX":
        raw = np.load(path, allow_pickle=True)
        f32 = lambda k: jnp.asarray(np.asarray(raw[k], dtype=np.float32))
        shapedirs = np.asarray(raw["shapedirs"], dtype=np.float32)
        # SMPL-X ships 400 dirs: first 300 shape, last 100 expression;
        # slice to the active basis sizes (ref: smplx/body_models.py betas
        # default 10, expression 10).
        n_shape = min(num_betas, shapedirs.shape[-1])
        expr = (shapedirs[..., 300:300 + num_expression]
                if shapedirs.shape[-1] > 300 else
                np.zeros(shapedirs.shape[:2] + (num_expression,),
                         np.float32))
        data = SMPLXData(
            v_template=f32("v_template"),
            shapedirs=jnp.asarray(shapedirs[..., :n_shape]),
            expr_dirs=jnp.asarray(expr),
            # (V, 3, P) -> (V*3, P) -> (P, V*3), the lbs() layout
            posedirs=jnp.asarray(
                np.asarray(raw["posedirs"], np.float32).reshape(
                    -1, np.asarray(raw["posedirs"]).shape[-1]).T
                if np.asarray(raw["posedirs"]).ndim == 3 else
                np.asarray(raw["posedirs"], np.float32)),
            J_regressor=f32("J_regressor"),
            lbs_weights=f32("weights"),
            left_hand_components=f32("hands_componentsl"),
            right_hand_components=f32("hands_componentsr"),
            left_hand_mean=f32("hands_meanl"),
            right_hand_mean=f32("hands_meanr"),
            parents=np.asarray(raw["kintree_table"])[0].astype(np.int64),
            faces=np.asarray(raw["f"], dtype=np.int64),
        )
        # root parent sentinel (uint32 -1) -> 0
        data.parents[0] = 0
        return SMPLX(data, **kw)

    # ------------------------------------------------------------------
    def pose_mean(self) -> jnp.ndarray:
        """165-dim additive pose mean (zeros except hand means unless
        flat_hand_mean)."""
        zeros = jnp.zeros(3 + NUM_BODY_JOINTS * 3 + 9, dtype=jnp.float32)
        if self.flat_hand_mean:
            hands = jnp.zeros(90, dtype=jnp.float32)
        else:
            hands = jnp.concatenate([self.data.left_hand_mean,
                                     self.data.right_hand_mean])
        return jnp.concatenate([zeros, hands])

    def __call__(
        self,
        betas: jnp.ndarray,                       # (B, n_betas)
        global_orient: Optional[jnp.ndarray] = None,   # (B, 3)
        body_pose: Optional[jnp.ndarray] = None,       # (B, 63)
        left_hand_pose: Optional[jnp.ndarray] = None,  # (B, n_pca) or (B, 45)
        right_hand_pose: Optional[jnp.ndarray] = None,
        transl: Optional[jnp.ndarray] = None,          # (B, 3)
        expression: Optional[jnp.ndarray] = None,      # (B, n_expr)
        jaw_pose: Optional[jnp.ndarray] = None,        # (B, 3)
        leye_pose: Optional[jnp.ndarray] = None,
        reye_pose: Optional[jnp.ndarray] = None,
    ) -> dict:
        B = betas.shape[0]
        z3 = jnp.zeros((B, 3), dtype=jnp.float32)

        def dflt(x, shape):
            return jnp.zeros((B,) + shape, jnp.float32) if x is None else x

        global_orient = dflt(global_orient, (3,))
        body_pose = dflt(body_pose, (NUM_BODY_JOINTS * 3,))
        jaw_pose = dflt(jaw_pose, (3,))
        leye_pose = dflt(leye_pose, (3,))
        reye_pose = dflt(reye_pose, (3,))
        expression = dflt(expression, (self.data.expr_dirs.shape[-1],))
        if left_hand_pose is None:
            left_hand_pose = jnp.zeros(
                (B, self.num_pca_comps if self.use_pca else 45), jnp.float32)
        if right_hand_pose is None:
            right_hand_pose = jnp.zeros_like(left_hand_pose)

        if self.use_pca:
            left_hand_pose = left_hand_pose @ \
                self.data.left_hand_components[:self.num_pca_comps]
            right_hand_pose = right_hand_pose @ \
                self.data.right_hand_components[:self.num_pca_comps]

        full_pose = jnp.concatenate([
            global_orient.reshape(B, 3),
            body_pose.reshape(B, NUM_BODY_JOINTS * 3),
            jaw_pose, leye_pose, reye_pose,
            left_hand_pose.reshape(B, 45), right_hand_pose.reshape(B, 45),
        ], axis=1)
        full_pose = full_pose + self.pose_mean()[None]

        shape_components = jnp.concatenate([betas, expression], axis=-1)
        shapedirs = jnp.concatenate([self.data.shapedirs, self.data.expr_dirs],
                                    axis=-1)

        verts, joints, A = lbs(
            shape_components, full_pose, self.data.v_template, shapedirs,
            self.data.posedirs, self.data.J_regressor, self.data.parents,
            self.data.lbs_weights)

        if transl is not None:
            verts = verts + transl[:, None]
            joints = joints + transl[:, None]
            A = A.at[:, :, :3, 3].add(transl[:, None])

        v_shaped = self.data.v_template[None] + blend_shapes(
            betas, self.data.shapedirs)
        return dict(vertices=verts, joints=joints, A=A, v_shaped=v_shaped,
                    full_pose=full_pose)


class SMPL:
    """Body-only SMPL (24 joints) sharing the same lbs() core
    (ref: smplx/body_models.py SMPL class; the avatar pipeline itself uses
    SMPL-X, this exists for body-model family parity)."""

    NUM_JOINTS = 24

    def __init__(self, data: SMPLXData):
        self.data = data
        self.num_joints = int(data.J_regressor.shape[0])
        self.num_verts = int(data.v_template.shape[0])
        self.faces = data.faces

    @staticmethod
    def from_npz(path: str, num_betas: int = 10, **kw) -> "SMPL":
        raw = np.load(path, allow_pickle=True)
        f32 = lambda k: jnp.asarray(np.asarray(raw[k], dtype=np.float32))
        sd = np.asarray(raw["shapedirs"], np.float32)
        pd = np.asarray(raw["posedirs"], np.float32)
        if pd.ndim == 3:
            pd = pd.reshape(-1, pd.shape[-1]).T
        V = raw["v_template"].shape[0]
        z45 = jnp.zeros((45,), jnp.float32)
        data = SMPLXData(
            v_template=f32("v_template"),
            shapedirs=jnp.asarray(sd[..., :num_betas]),
            expr_dirs=jnp.zeros((V, 3, 0), jnp.float32),
            posedirs=jnp.asarray(pd),
            J_regressor=f32("J_regressor"),
            lbs_weights=f32("weights"),
            left_hand_components=jnp.zeros((1, 45), jnp.float32),
            right_hand_components=jnp.zeros((1, 45), jnp.float32),
            left_hand_mean=z45, right_hand_mean=z45,
            parents=np.asarray(raw["kintree_table"])[0].astype(np.int64),
            faces=np.asarray(raw["f"], dtype=np.int64),
        )
        data.parents[0] = 0
        return SMPL(data)

    def __call__(self, betas, global_orient=None, body_pose=None,
                 transl=None):
        B = betas.shape[0]

        def dflt(x, dim):
            return jnp.zeros((B, dim), jnp.float32) if x is None else x

        global_orient = dflt(global_orient, 3)
        body_pose = dflt(body_pose, (self.num_joints - 1) * 3)
        full_pose = jnp.concatenate(
            [global_orient.reshape(B, 3),
             body_pose.reshape(B, (self.num_joints - 1) * 3)], axis=1)

        verts, joints, A = lbs(
            betas, full_pose, self.data.v_template, self.data.shapedirs,
            self.data.posedirs, self.data.J_regressor, self.data.parents,
            self.data.lbs_weights)
        if transl is not None:
            verts = verts + transl[:, None]
            joints = joints + transl[:, None]
            A = A.at[:, :, :3, 3].add(transl[:, None])
        return dict(vertices=verts, joints=joints, A=A,
                    full_pose=full_pose)


class MANO:
    """Single hand (16 joints incl. wrist), same lbs() core with optional
    PCA hand pose space (ref: smplx/body_models.py MANO class)."""

    def __init__(self, data: SMPLXData, hand_components=None,
                 hand_mean=None, num_pca_comps: int = 6,
                 use_pca: bool = True, flat_hand_mean: bool = False):
        self.data = data
        self.hand_components = hand_components
        self.hand_mean = (jnp.zeros(45) if flat_hand_mean or hand_mean is
                          None else hand_mean)
        self.num_pca_comps = num_pca_comps
        self.use_pca = use_pca and hand_components is not None
        self.num_joints = int(data.J_regressor.shape[0])
        self.faces = data.faces

    def __call__(self, betas, global_orient=None, hand_pose=None,
                 transl=None):
        B = betas.shape[0]
        if global_orient is None:
            global_orient = jnp.zeros((B, 3), jnp.float32)
        if hand_pose is None:
            hand_pose = jnp.zeros(
                (B, self.num_pca_comps if self.use_pca else 45), jnp.float32)
        if self.use_pca:
            hand_pose = hand_pose @ self.hand_components[:self.num_pca_comps]
        hand_pose = hand_pose + self.hand_mean[None]
        full_pose = jnp.concatenate(
            [global_orient.reshape(B, 3), hand_pose.reshape(B, 45)], axis=1)
        verts, joints, A = lbs(
            betas, full_pose, self.data.v_template, self.data.shapedirs,
            self.data.posedirs, self.data.J_regressor, self.data.parents,
            self.data.lbs_weights)
        if transl is not None:
            verts = verts + transl[:, None]
            joints = joints + transl[:, None]
            A = A.at[:, :, :3, 3].add(transl[:, None])
        return dict(vertices=verts, joints=joints, A=A,
                    full_pose=full_pose)
