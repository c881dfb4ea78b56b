"""Per-Gaussian projection / covariance preprocessing.

Pure XLA, fully batched over N Gaussians, differentiable by JAX autodiff
(the reference hand-writes this backward; ref: cuda_rasterizer/forward.cu:74-256,
backward.cu:144-411 — here XLA derives it).

Math matches the reference exactly: EWA splatting Jacobian with FoV clamping,
+0.3px low-pass on the 2D covariance diagonal, conic = inverse 2D covariance,
radius = ceil(3 sigma_max) from the covariance eigenvalues, near-plane cull at
z <= 0.2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.ops.quat import quat_to_mat


class Preprocessed(NamedTuple):
    means2d: jnp.ndarray        # (N, 2) pixel coords
    depths: jnp.ndarray         # (N,) view-space z
    conics: jnp.ndarray         # (N, 3) upper-tri inverse 2D cov (a, b, c)
    radii: jnp.ndarray          # (N,) int32 screen radius, 0 = culled
    valid: jnp.ndarray          # (N,) bool


def covariance3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                 scale_modifier: float = 1.0) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T from activated scales and unit quaternions
    (ref: forward.cu:118-152)."""
    R = quat_to_mat(rotations)                       # (N, 3, 3)
    s = scales * scale_modifier
    M = R * s[..., None, :]                          # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def preprocess(
    means3d: jnp.ndarray,       # (N, 3)
    scales: jnp.ndarray,        # (N, 3) activated (positive)
    rotations: jnp.ndarray,     # (N, 4) unit quats wxyz
    viewmatrix: jnp.ndarray,    # (4, 4) world->view, row-major
    projmatrix: jnp.ndarray,    # (4, 4) full = P @ view
    tan_fovx: float,
    tan_fovy: float,
    img_w: int,
    img_h: int,
    scale_modifier: float = 1.0,
) -> Preprocessed:
    N = means3d.shape[0]
    ones = jnp.ones((N, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)

    t = p_hom4 @ viewmatrix.T                        # view space (N, 4)
    tz = t[:, 2]
    in_front = tz > 0.2                              # ref: auxiliary.h in_frustum

    clip = p_hom4 @ projmatrix.T
    p_w = 1.0 / (clip[:, 3] + 1e-7)
    p_proj = clip[:, :3] * p_w[:, None]
    # ndc2Pix: ((v + 1) * S - 1) / 2 (ref: auxiliary.h)
    means2d = jnp.stack([
        ((p_proj[:, 0] + 1.0) * img_w - 1.0) * 0.5,
        ((p_proj[:, 1] + 1.0) * img_h - 1.0) * 0.5,
    ], axis=1)

    # --- EWA 2D covariance (ref: forward.cu:74-113) ---
    focal_x = img_w / (2.0 * tan_fovx)
    focal_y = img_h / (2.0 * tan_fovy)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    txtz = jnp.clip(t[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    cov3d = covariance3d(scales, rotations, scale_modifier)   # (N, 3, 3)

    zero = jnp.zeros_like(tz_safe)
    J = jnp.stack([
        jnp.stack([focal_x / tz_safe, zero, -focal_x * tx / tz_safe ** 2], -1),
        jnp.stack([zero, focal_y / tz_safe, -focal_y * ty / tz_safe ** 2], -1),
    ], axis=-2)                                               # (N, 2, 3)
    W = viewmatrix[:3, :3]                                    # (3, 3)
    JW = J @ W                                                # (N, 2, 3)
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)             # (N, 2, 2)

    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    valid = in_front & (det > 0.0)
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    valid = valid & (radii > 0)

    # on-screen cull: tile rect handled in binning; here just keep depth
    depths = tz
    return Preprocessed(means2d=means2d, depths=depths, conics=conics,
                        radii=radii, valid=valid)
