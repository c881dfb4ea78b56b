"""Per-hand color field (ref: network/hand_avatar.py:9-36): positional-
embedded canonical xyz + sdf + quaternion hand pose -> 5x64 MLP -> RGB."""

from __future__ import annotations

import jax.numpy as jnp

from animatablegaussians_tpu.models.mlp import MLPLinear
from animatablegaussians_tpu.ops.embedder import get_embedder
from animatablegaussians_tpu.ops.quat import axis_angle_to_quat


class HandAvatar:
    def __init__(self, multires: int = 4, view_multires: int = -1,
                 pose_dim: int = 15 * 4):
        self.pos_embedder, self.pos_dim = get_embedder(multires, 3)
        if view_multires == -1:
            self.view_embedder, self.view_dim = None, 0
        else:
            self.view_embedder, self.view_dim = get_embedder(view_multires, 3)
        self.pose_dim = pose_dim
        self.tex_mlp = MLPLinear(
            in_channels=self.pos_dim + 1 + self.view_dim + pose_dim,
            inter_channels=[64, 64, 64, 64, 64],
            out_channels=3, last_op="sigmoid")

    def init(self, key):
        return self.tex_mlp.init(key)

    def apply(self, params, cano_xyz: jnp.ndarray, sdf: jnp.ndarray,
              view_dir, hand_pose: jnp.ndarray) -> jnp.ndarray:
        """cano_xyz (N, 3), sdf (N, 1), hand_pose (45,) axis-angle -> (N, 3)."""
        n = cano_xyz.shape[0]
        feat = jnp.concatenate([self.pos_embedder(cano_xyz), sdf], -1)
        quat = axis_angle_to_quat(hand_pose.reshape(-1, 3)).reshape(-1)
        if self.view_embedder is not None:
            feat = jnp.concatenate([feat, self.view_embedder(view_dir)], -1)
        feat = jnp.concatenate(
            [feat, jnp.broadcast_to(quat[None], (n, quat.shape[0]))], -1)
        return self.tex_mlp.apply(params, feat)
