"""Volume sampling: trilinear / nearest gather with border clamping.

JAX has no ``F.grid_sample``; this implements the 3D cases the reference
uses (ref: network/volume.py:72-130, align_corners=True, padding='border')
as plain gathers — XLA fuses the 8-corner interpolation into one kernel.

Convention: volumes are (X, Y, Z, C); query points in [0, 1]^3 with 0 ->
voxel 0 and 1 -> voxel R-1 (align_corners=True), matching how the reference
scales by volume_bounds before its xyz->zyx grid flip (the flip is an
artifact of torch's NDHW layout and does not exist here).
"""

from __future__ import annotations

import jax.numpy as jnp


def _clamp_idx(i, n):
    return jnp.clip(i, 0, n - 1)


def sample_volume_trilinear(vol: jnp.ndarray, pts01: jnp.ndarray):
    """vol (X, Y, Z, C), pts01 (N, 3) in [0,1] -> (N, C)."""
    X, Y, Z = vol.shape[:3]
    res = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32)
    p = jnp.clip(pts01, 0.0, 1.0) * res                 # (N, 3) voxel coords
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)
    p1 = p0 + 1

    x0, y0, z0 = (_clamp_idx(p0[:, 0], X), _clamp_idx(p0[:, 1], Y),
                  _clamp_idx(p0[:, 2], Z))
    x1, y1, z1 = (_clamp_idx(p1[:, 0], X), _clamp_idx(p1[:, 1], Y),
                  _clamp_idx(p1[:, 2], Z))
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    def g(xi, yi, zi):
        return vol[xi, yi, zi]                          # (N, C)

    c000, c001 = g(x0, y0, z0), g(x0, y0, z1)
    c010, c011 = g(x0, y1, z0), g(x0, y1, z1)
    c100, c101 = g(x1, y0, z0), g(x1, y0, z1)
    c110, c111 = g(x1, y1, z0), g(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sample_volume_nearest(vol: jnp.ndarray, pts01: jnp.ndarray):
    """vol (X, Y, Z, C), pts01 (N, 3) -> (N, C), nearest-voxel gather
    (the mode the root-finding gradient lookup uses;
    ref: network/volume.py:99-115, root_finding.cu nearest sampling)."""
    X, Y, Z = vol.shape[:3]
    res = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32)
    p = jnp.round(jnp.clip(pts01, 0.0, 1.0) * res).astype(jnp.int32)
    return vol[_clamp_idx(p[:, 0], X), _clamp_idx(p[:, 1], Y),
               _clamp_idx(p[:, 2], Z)]
