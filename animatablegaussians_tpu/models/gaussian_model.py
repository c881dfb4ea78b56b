"""3D Gaussian parameter container as a JAX pytree.

Functional port of the reference GaussianModel (ref:
gaussians/gaussian_model.py:44-292): raw parameters live in log/logit space;
activations are exp (scale), sigmoid (opacity), L2-normalize (rotation).
`create_from_pcd` initializes scales from the mean squared distance to the 3
nearest neighbours (knn K=4 incl. self; ref: gaussian_model.py:156-183) and
opacity at 0.1. PLY save/load follows the standard 3DGS attribute layout
(ref: gaussians/obj_io.py:24-99).

The densify/clone/split/prune machinery of the reference exists but is never
called by the avatar pipeline (fixed point set from the canonical pos map);
here densification utilities live in `densify()`-style pure functions
operating on the pytree (see densify.py when needed).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops.knn import knn
from animatablegaussians_tpu.ops.quat import normalize as quat_normalize
from animatablegaussians_tpu.ops.sh import rgb_to_sh, sh_to_rgb
from animatablegaussians_tpu.utils import ply as ply_io


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Raw (pre-activation) Gaussian parameters."""
    xyz: jnp.ndarray            # (N, 3)
    features_dc: jnp.ndarray    # (N, 1, 3) SH DC coeffs
    features_rest: jnp.ndarray  # (N, R, 3) higher SH coeffs
    scaling: jnp.ndarray        # (N, 3) log-scale
    rotation: jnp.ndarray       # (N, 4) raw quats wxyz
    opacity: jnp.ndarray        # (N, 1) logit-opacity

    # -- activations (ref: gaussian_model.py:46-61,115-147) ---------------
    @property
    def get_scaling(self):
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self):
        return quat_normalize(self.rotation)

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_xyz(self):
        return self.xyz

    @property
    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]


def create_from_pcd(points: jnp.ndarray, colors: jnp.ndarray,
                    sh_degree: int = 0) -> GaussianParams:
    """Initialize from a point cloud (ref: gaussian_model.py:156-183)."""
    n = points.shape[0]
    d2, _ = knn(points, points, k=4)
    dist2 = jnp.clip(jnp.mean(d2[:, 1:], axis=-1), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacities = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

    n_rest = (sh_degree + 1) ** 2 - 1
    return GaussianParams(
        # explicit copy: astype(same dtype) is a no-op alias, and trainable
        # params must not alias caller constants — a donating train step
        # would delete the caller's array (e.g. AvatarNet.init_points,
        # killing every later eager render with "Array has been deleted")
        xyz=jnp.array(points, jnp.float32, copy=True),
        features_dc=rgb_to_sh(colors.astype(jnp.float32))[:, None, :],
        features_rest=jnp.zeros((n, n_rest, 3), jnp.float32),
        scaling=scales.astype(jnp.float32),
        rotation=rots,
        opacity=opacities,
    )


# ---------------------------------------------------------------------------
# PLY I/O — activated-value round trip as in the reference
# (ref: gaussians/obj_io.py:24-99: save re-encodes activated values).
# ---------------------------------------------------------------------------

def save_gaussians_as_ply(path: str, gaussian_vals: dict) -> None:
    """gaussian_vals: activated dict with positions/opacity/scales/rotations
    and colors (RGB) — re-encoded into raw-space 3DGS PLY."""
    pos = np.asarray(gaussian_vals["positions"])
    n = pos.shape[0]
    opac = np.asarray(gaussian_vals["opacity"]).reshape(n, 1)
    opac = np.clip(opac, 1e-6, 1.0 - 1e-6)
    scales = np.asarray(gaussian_vals["scales"]).reshape(n, 3)
    rots = np.asarray(gaussian_vals["rotations"]).reshape(n, 4)
    colors = np.asarray(gaussian_vals["colors"]).reshape(n, 3)

    props = {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2]}
    for i, k in enumerate(["nx", "ny", "nz"]):
        props[k] = np.zeros(n, np.float32)
    f_dc = np.asarray(rgb_to_sh(colors))
    for i in range(3):
        props[f"f_dc_{i}"] = f_dc[:, i]
    props["opacity"] = np.log(opac / (1 - opac))[:, 0]
    log_scales = np.log(np.maximum(scales, 1e-10))
    for i in range(3):
        props[f"scale_{i}"] = log_scales[:, i]
    for i in range(4):
        props[f"rot_{i}"] = rots[:, i]
    ply_io.write_ply(path, {k: v.astype(np.float32) for k, v in props.items()})


def load_gaussians_from_ply(path: str) -> dict:
    """Load a 3DGS PLY back to an activated dict (ref: obj_io.py:49-99)."""
    verts, _ = ply_io.read_ply(path)
    n = len(verts["x"])
    pos = np.stack([verts["x"], verts["y"], verts["z"]], axis=1)
    f_dc = np.stack([verts[f"f_dc_{i}"] for i in range(3)], axis=1)
    opac = 1.0 / (1.0 + np.exp(-verts["opacity"]))
    scales = np.exp(np.stack([verts[f"scale_{i}"] for i in range(3)], axis=1))
    rots = np.stack([verts[f"rot_{i}"] for i in range(4)], axis=1)
    rots = rots / np.linalg.norm(rots, axis=1, keepdims=True)
    return dict(
        positions=jnp.asarray(pos),
        colors=jnp.asarray(np.asarray(sh_to_rgb(f_dc))),
        opacity=jnp.asarray(opac[:, None]),
        scales=jnp.asarray(scales),
        rotations=jnp.asarray(rots),
        max_sh_degree=0,
    )
