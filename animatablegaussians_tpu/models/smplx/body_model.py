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
    # face landmark embedding (present in real SMPL-X/FLAME archives;
    # ref: smplx/body_models.py:1000-1027): 51 static face landmarks as
    # (face id, barycentric) pairs plus the 79-row dynamic contour LUT
    lmk_faces_idx: Optional[jnp.ndarray] = None          # (L,) int
    lmk_bary_coords: Optional[jnp.ndarray] = None        # (L, 3)
    dynamic_lmk_faces_idx: Optional[jnp.ndarray] = None  # (79, 17) int
    dynamic_lmk_bary_coords: Optional[jnp.ndarray] = None  # (79, 17, 3)


def _kin_chain(joint_id: int, parents) -> list:
    """Joint ids from ``joint_id`` up to the root, inclusive
    (ref: smplx/utils.py:92-98; our parents[0] sentinel is 0, not -1)."""
    chain, cur = [], int(joint_id)
    while True:
        chain.append(cur)
        if cur == 0:
            break
        cur = int(parents[cur])
    return chain


def _extend_joints(joints, verts, full_pose, data: SMPLXData,
                   extra_joints_idxs, neck_kin_chain,
                   use_face_contour: bool):
    """The reference's full joints contract: LBS joints ++ extra vertex
    joints ++ face landmarks (static, plus the dynamic contour when enabled)
    (ref: smplx/body_models.py:1241-1267)."""
    from .lbs import find_dynamic_lmk_idx_and_bcoords, vertices2landmarks
    if extra_joints_idxs is not None:
        joints = jnp.concatenate(
            [joints, verts[:, jnp.asarray(extra_joints_idxs)]], axis=1)
    if data.lmk_faces_idx is not None:
        B = verts.shape[0]
        lmk_f = jnp.broadcast_to(data.lmk_faces_idx[None],
                                 (B,) + data.lmk_faces_idx.shape)
        lmk_b = jnp.broadcast_to(data.lmk_bary_coords[None],
                                 (B,) + data.lmk_bary_coords.shape)
        if use_face_contour:
            dyn_f, dyn_b = find_dynamic_lmk_idx_and_bcoords(
                full_pose, data.dynamic_lmk_faces_idx,
                data.dynamic_lmk_bary_coords, neck_kin_chain)
            lmk_f = jnp.concatenate([lmk_f, dyn_f], axis=1)
            lmk_b = jnp.concatenate([lmk_b, dyn_b], axis=1)
        landmarks = vertices2landmarks(verts, data.faces, lmk_f, lmk_b)
        joints = jnp.concatenate([joints, landmarks], axis=1)
    return joints


class SMPLX:
    """SMPL-X with a jittable functional forward.

    Args mirror the reference constructor where meaningful: num_pca_comps,
    use_pca, flat_hand_mean (ref: smplx/body_models.py:975-1007).
    """

    NECK_IDX = 12  # ref: smplx/body_models.py:900

    def __init__(self, data: SMPLXData, num_pca_comps: int = 6,
                 use_pca: bool = True, flat_hand_mean: bool = False,
                 vertex_ids=None, use_hands: bool = True,
                 use_feet_keypoints: bool = True,
                 use_face_contour: bool = False):
        """``vertex_ids``: dict or VERTEX_IDS key ("smplx") enabling the
        extra landmark joints appended after the LBS joints (nose/eyes/ears,
        feet, finger tips; ref: smplx/vertex_joint_selector.py) plus the
        face landmarks when the model data carries the embedding — the
        reference's full ``joints`` output contract
        (ref: smplx/body_models.py:1264-1267). None keeps the bare 55-joint
        LBS output (the avatar pipeline's contract for synthetic models)."""
        self.data = data
        self.use_pca = use_pca
        self.num_pca_comps = num_pca_comps
        self.flat_hand_mean = flat_hand_mean
        self.num_joints = int(data.J_regressor.shape[0])
        self.num_verts = int(data.v_template.shape[0])
        self.faces = data.faces
        self.use_face_contour = use_face_contour
        self.extra_joints_idxs = None
        if vertex_ids is not None:
            from .vertex_ids import VERTEX_IDS, extra_joints_indices
            if isinstance(vertex_ids, str):
                vertex_ids = VERTEX_IDS[vertex_ids]
            self.extra_joints_idxs = extra_joints_indices(
                vertex_ids, use_hands=use_hands,
                use_feet_keypoints=use_feet_keypoints)
        self.neck_kin_chain = _kin_chain(self.NECK_IDX, data.parents)

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
            # face landmark embedding ships in real SMPL-X archives only
            **({"lmk_faces_idx": jnp.asarray(
                    np.asarray(raw["lmk_faces_idx"], np.int32)),
                "lmk_bary_coords": f32("lmk_bary_coords")}
               if "lmk_faces_idx" in raw else {}),
            **({"dynamic_lmk_faces_idx": jnp.asarray(
                    np.asarray(raw["dynamic_lmk_faces_idx"], np.int32)),
                "dynamic_lmk_bary_coords": f32("dynamic_lmk_bary_coords")}
               if "dynamic_lmk_faces_idx" in raw else {}),
        )
        # root parent sentinel (uint32 -1) -> 0
        data.parents[0] = 0
        if "vertex_ids" not in kw:
            # the extra landmark joints exist only on the real SMPL-X
            # topology; synthetic/dev models keep the bare 55-joint contract
            from .vertex_ids import VERTEX_IDS
            if data.v_template.shape[0] > max(VERTEX_IDS["smplx"].values()):
                kw["vertex_ids"] = "smplx"
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

        joints = _extend_joints(joints, verts, full_pose, self.data,
                                self.extra_joints_idxs, self.neck_kin_chain,
                                self.use_face_contour)

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


class SMPLH:
    """SMPL+H: SMPL body with MANO hands — 52 LBS joints (1 global + 21 body
    + 30 hand), PCA hand pose space, optional extra landmark joints
    (ref: smplx/body_models.py:502-755)."""

    NUM_BODY_JOINTS = 21
    NUM_JOINTS = NUM_BODY_JOINTS + 2 * HAND_JOINTS + 1

    def __init__(self, data: SMPLXData, num_pca_comps: int = 6,
                 use_pca: bool = True, flat_hand_mean: bool = False,
                 vertex_ids=None, use_hands: bool = True,
                 use_feet_keypoints: bool = True):
        self.data = data
        self.use_pca = use_pca
        self.num_pca_comps = num_pca_comps
        self.flat_hand_mean = flat_hand_mean
        self.num_joints = int(data.J_regressor.shape[0])
        self.num_verts = int(data.v_template.shape[0])
        self.faces = data.faces
        self.extra_joints_idxs = None
        if vertex_ids is not None:
            from .vertex_ids import VERTEX_IDS, extra_joints_indices
            if isinstance(vertex_ids, str):
                vertex_ids = VERTEX_IDS[vertex_ids]
            self.extra_joints_idxs = extra_joints_indices(
                vertex_ids, use_hands=use_hands,
                use_feet_keypoints=use_feet_keypoints)

    def pose_mean(self) -> jnp.ndarray:
        """156-dim additive pose mean (zeros except the hand means;
        ref: smplx/body_models.py:666-676)."""
        zeros = jnp.zeros(3 + self.NUM_BODY_JOINTS * 3, dtype=jnp.float32)
        if self.flat_hand_mean:
            hands = jnp.zeros(90, dtype=jnp.float32)
        else:
            hands = jnp.concatenate([self.data.left_hand_mean,
                                     self.data.right_hand_mean])
        return jnp.concatenate([zeros, hands])

    def __call__(self, betas, global_orient=None, body_pose=None,
                 left_hand_pose=None, right_hand_pose=None, transl=None):
        B = betas.shape[0]

        def dflt(x, dim):
            return jnp.zeros((B, dim), jnp.float32) if x is None else x

        global_orient = dflt(global_orient, 3)
        body_pose = dflt(body_pose, self.NUM_BODY_JOINTS * 3)
        hp_dim = self.num_pca_comps if self.use_pca else 45
        left_hand_pose = dflt(left_hand_pose, hp_dim)
        right_hand_pose = dflt(right_hand_pose, hp_dim)
        if self.use_pca:
            left_hand_pose = left_hand_pose @ \
                self.data.left_hand_components[:self.num_pca_comps]
            right_hand_pose = right_hand_pose @ \
                self.data.right_hand_components[:self.num_pca_comps]
        full_pose = jnp.concatenate(
            [global_orient.reshape(B, 3),
             body_pose.reshape(B, self.NUM_BODY_JOINTS * 3),
             left_hand_pose.reshape(B, 45),
             right_hand_pose.reshape(B, 45)], axis=1)
        full_pose = full_pose + self.pose_mean()[None]

        verts, joints, A = lbs(
            betas, full_pose, self.data.v_template, self.data.shapedirs,
            self.data.posedirs, self.data.J_regressor, self.data.parents,
            self.data.lbs_weights)
        if self.extra_joints_idxs is not None:
            joints = jnp.concatenate(
                [joints, verts[:, jnp.asarray(self.extra_joints_idxs)]],
                axis=1)
        if transl is not None:
            verts = verts + transl[:, None]
            joints = joints + transl[:, None]
            A = A.at[:, :, :3, 3].add(transl[:, None])
        return dict(vertices=verts, joints=joints, A=A, full_pose=full_pose)

    @staticmethod
    def from_npz(path: str, num_betas: int = 10, **kw) -> "SMPLH":
        raw = np.load(path, allow_pickle=True)
        f32 = lambda k: jnp.asarray(np.asarray(raw[k], dtype=np.float32))
        sd = np.asarray(raw["shapedirs"], np.float32)
        pd = np.asarray(raw["posedirs"], np.float32)
        if pd.ndim == 3:
            pd = pd.reshape(-1, pd.shape[-1]).T
        V = raw["v_template"].shape[0]
        data = SMPLXData(
            v_template=f32("v_template"),
            shapedirs=jnp.asarray(sd[..., :num_betas]),
            expr_dirs=jnp.zeros((V, 3, 0), jnp.float32),
            posedirs=jnp.asarray(pd),
            J_regressor=f32("J_regressor"),
            lbs_weights=f32("weights"),
            left_hand_components=f32("hands_componentsl"),
            right_hand_components=f32("hands_componentsr"),
            left_hand_mean=f32("hands_meanl"),
            right_hand_mean=f32("hands_meanr"),
            parents=np.asarray(raw["kintree_table"])[0].astype(np.int64),
            faces=np.asarray(raw["f"], dtype=np.int64),
        )
        data.parents[0] = 0
        if "vertex_ids" not in kw:
            from .vertex_ids import VERTEX_IDS
            if V > max(VERTEX_IDS["smplh"].values()):
                kw["vertex_ids"] = "smplh"
        return SMPLH(data, **kw)


class FLAME:
    """Head-only FLAME: 5 LBS joints (global, neck, jaw, two eyes), shape +
    expression space, face landmarks incl. the dynamic contour LUT; no extra
    vertex joints (the reference empties the selector,
    ref: smplx/body_models.py:1771-2133)."""

    NUM_JOINTS = 5
    NECK_IDX = 0  # ref: smplx/body_models.py:1775

    def __init__(self, data: SMPLXData, use_face_contour: bool = False):
        self.data = data
        self.num_joints = int(data.J_regressor.shape[0])
        self.num_verts = int(data.v_template.shape[0])
        self.faces = data.faces
        self.use_face_contour = use_face_contour
        self.neck_kin_chain = _kin_chain(self.NECK_IDX, data.parents)

    def __call__(self, betas, global_orient=None, neck_pose=None,
                 jaw_pose=None, leye_pose=None, reye_pose=None,
                 expression=None, transl=None):
        B = betas.shape[0]

        def dflt(x, dim):
            return jnp.zeros((B, dim), jnp.float32) if x is None else x

        full_pose = jnp.concatenate(
            [dflt(p, 3).reshape(B, 3) for p in
             (global_orient, neck_pose, jaw_pose, leye_pose, reye_pose)],
            axis=1)
        expression = dflt(expression, self.data.expr_dirs.shape[-1])
        shape_components = jnp.concatenate([betas, expression], axis=-1)
        shapedirs = jnp.concatenate(
            [self.data.shapedirs, self.data.expr_dirs], axis=-1)

        verts, joints, A = lbs(
            shape_components, full_pose, self.data.v_template, shapedirs,
            self.data.posedirs, self.data.J_regressor, self.data.parents,
            self.data.lbs_weights)
        joints = _extend_joints(joints, verts, full_pose, self.data,
                                None, self.neck_kin_chain,
                                self.use_face_contour)
        if transl is not None:
            verts = verts + transl[:, None]
            joints = joints + transl[:, None]
            A = A.at[:, :, :3, 3].add(transl[:, None])
        return dict(vertices=verts, joints=joints, A=A, full_pose=full_pose)
