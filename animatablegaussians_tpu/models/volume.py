"""Canonical LBS weight volume: trilinear weight/SDF queries and the Sobel
gradient volume for root finding.

Equivalent of the reference's CanoBlendWeightVolume
(ref: network/volume.py:42-130) over the same ``cano_weight_volume.npz``
format (diff/ori weight volumes (X, Y, Z, J), optional sdf volume, bounds).
Volumes are kept channels-last (X, Y, Z, C) — no torch NDHW/zyx grid flip —
and queried via the hand-rolled trilinear gather in ops/grid_sample.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops.grid_sample import (sample_volume_nearest,
                                                     sample_volume_trilinear)


def compute_gradient_volume(weight_volume: jnp.ndarray,
                            voxel_size: jnp.ndarray) -> jnp.ndarray:
    """3D Sobel gradient of a (X, Y, Z, C) volume -> (X, Y, Z, C, 3)
    (ref: network/volume.py:9-40; same 16-normalized Sobel kernels)."""
    base = jnp.asarray([[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]],
                       jnp.float32)
    sx = jnp.stack([base, jnp.zeros_like(base), -base], axis=0)  # (3,3,3) dx
    sz = jnp.transpose(sx, (1, 2, 0))
    sy = jnp.transpose(sx, (2, 0, 1))
    kernels = jnp.stack([
        sx / (16 * 2 * voxel_size[0]),
        sy / (16 * 2 * voxel_size[1]),
        sz / (16 * 2 * voxel_size[2]),
    ], axis=0)                                            # (3, 3, 3, 3)

    C = weight_volume.shape[-1]
    x = jnp.moveaxis(weight_volume, -1, 0)[:, None]       # (C, 1, X, Y, Z)
    w = kernels[:, None]                                  # (3, 1, 3, 3, 3)
    g = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))    # (C, 3, X, Y, Z)
    return jnp.moveaxis(g, (0, 1), (3, 4))                # (X, Y, Z, C, 3)


class CanoBlendWeightVolume:
    def __init__(self, data_path: Optional[str] = None,
                 data: Optional[dict] = None):
        if data is None:
            data = dict(np.load(data_path))
        self.diff_weight_volume = jnp.asarray(
            data["diff_weight_volume"], jnp.float32)      # (X, Y, Z, J)
        self.ori_weight_volume = jnp.asarray(
            data.get("ori_weight_volume", data["diff_weight_volume"]),
            jnp.float32)
        sdf = data.get("sdf_volume")
        if sdf is not None:
            sdf = np.asarray(sdf)
            if sdf.ndim == 3:
                sdf = sdf[..., None]
            self.sdf_volume = jnp.asarray(sdf, jnp.float32)
        else:
            self.sdf_volume = None
        self.volume_bounds = jnp.asarray(data["volume_bounds"], jnp.float32)
        self.center = jnp.asarray(
            data.get("center", np.zeros(3)), jnp.float32)
        self.smpl_bounds = jnp.asarray(
            data.get("smpl_bounds", data["volume_bounds"]), jnp.float32)

        self.res_x, self.res_y, self.res_z, self.joint_num = \
            self.diff_weight_volume.shape
        extent = self.volume_bounds[1] - self.volume_bounds[0]
        self.voxel_size = extent / jnp.asarray(
            [self.res_x - 1, self.res_y - 1, self.res_z - 1], jnp.float32)
        self._grad_volume = None

    # ------------------------------------------------------------------
    def _scale(self, pts: jnp.ndarray) -> jnp.ndarray:
        return ((pts - self.volume_bounds[0])
                / (self.volume_bounds[1] - self.volume_bounds[0]))

    def forward_weight(self, pts: jnp.ndarray, requires_scale: bool = True,
                       volume_type: str = "diff") -> jnp.ndarray:
        """(N, 3) live-space pts -> (N, J) LBS weights
        (ref: network/volume.py:72-93)."""
        if requires_scale:
            pts = self._scale(pts)
        vol = (self.diff_weight_volume if volume_type == "diff"
               else self.ori_weight_volume)
        return sample_volume_trilinear(vol, pts)

    def forward_sdf(self, pts: jnp.ndarray,
                    requires_scale: bool = True) -> jnp.ndarray:
        """(N, 3) -> (N, 1) (ref: network/volume.py:116-130)."""
        assert self.sdf_volume is not None
        if requires_scale:
            pts = self._scale(pts)
        return sample_volume_trilinear(self.sdf_volume, pts)

    @property
    def grad_volume(self) -> jnp.ndarray:
        """(X, Y, Z, J, 3) Sobel gradient volume (lazy; ref:
        network/template.py:66-71 builds it once at startup)."""
        if self._grad_volume is None:
            self._grad_volume = compute_gradient_volume(
                self.diff_weight_volume, self.voxel_size)
        return self._grad_volume

    def forward_weight_grad(self, pts: jnp.ndarray,
                            requires_scale: bool = True) -> jnp.ndarray:
        """(N, 3) -> (N, J, 3), nearest sampling (ref:
        network/volume.py:95-114)."""
        if requires_scale:
            pts = self._scale(pts)
        J = self.joint_num
        flat = self.grad_volume.reshape(self.res_x, self.res_y, self.res_z,
                                        J * 3)
        return sample_volume_nearest(flat, pts).reshape(-1, J, 3)
