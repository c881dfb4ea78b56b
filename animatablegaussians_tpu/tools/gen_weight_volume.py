"""Build ``cano_weight_volume.npz``: diffused LBS-weight volume + barycentric
("ori") volume + signed-distance volume over a 128^3 canonical grid.

Equivalent of the reference preprocessing (ref:
gen_data/gen_weight_volume.py:19-170), with the external ``PointInterpolant``
screened-Poisson binary replaced by an in-process diffusion:

  * sample the canonical template surface densely; attach barycentric LBS
    weights from the nearest SMPL-X face;
  * "diff" volume: inverse-distance-weighted KNN scatter of the surface
    weights to grid points, then a few Jacobi smoothing sweeps — a discrete
    screened-Poisson diffusion with the surface samples as constraints;
  * "ori" volume: plain nearest-face barycentric query per grid point;
  * sdf volume: signed point-to-mesh distance via ops/geometry3d.nearest_face
    (sign from interpolated normals), replacing igl.signed_distance.

All queries run as batched JAX ops (chunked O(N*M) distance tiles).

Usage: python -m animatablegaussians_tpu.tools.gen_weight_volume -c <template.yaml>
"""

from __future__ import annotations

import os

import numpy as np

RES = 128


def sample_surface(verts: np.ndarray, faces: np.ndarray, count: int,
                   rng=None):
    """Area-weighted surface sampling (ref: utils/geo_util.py:39-80)."""
    rng = rng or np.random.default_rng(0)
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    fidx = rng.choice(len(faces), size=count, p=area / area.sum())
    r1 = np.sqrt(rng.random(count))
    r2 = rng.random(count)
    a, b, c = tri[fidx, 0], tri[fidx, 1], tri[fidx, 2]
    pts = (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b \
        + (r1 * r2)[:, None] * c
    return pts.astype(np.float32), fidx


def make_grid(bounds: np.ndarray, res: int = RES):
    xs = [np.linspace(bounds[0, i], bounds[1, i], res) for i in range(3)]
    g = np.meshgrid(*xs, indexing="ij")
    return np.stack(g, -1).reshape(-1, 3).astype(np.float32)


def knn_scatter_weights(grid: np.ndarray, surf_pts: np.ndarray,
                        surf_w: np.ndarray, k: int = 8,
                        chunk: int = 4096) -> np.ndarray:
    """IDW-KNN interpolation of surface LBS weights onto grid points."""
    import jax
    import jax.numpy as jnp

    sp = jnp.asarray(surf_pts)
    sw = jnp.asarray(surf_w)

    @jax.jit
    def one(q):
        d2 = jnp.sum((q[:, None] - sp[None]) ** 2, -1)        # (c, M)
        neg, idx = jax.lax.top_k(-d2, k)
        inv = 1.0 / jnp.maximum(jnp.sqrt(-neg), 1e-6)
        w = sw[idx]                                           # (c, k, J)
        out = jnp.sum(w * inv[..., None], 1) / jnp.sum(inv, 1)[:, None]
        return out

    pad = (-grid.shape[0]) % chunk
    gp = np.pad(grid, ((0, pad), (0, 0)))
    outs = [np.asarray(one(jnp.asarray(gp[i:i + chunk])))
            for i in range(0, gp.shape[0], chunk)]
    return np.concatenate(outs)[:grid.shape[0]]


def jacobi_smooth(vol: np.ndarray, iters: int = 10,
                  lam: float = 0.5) -> np.ndarray:
    """Few diffusion sweeps (X, Y, Z, J): the Poisson-diffusion analogue."""
    v = vol.copy()
    for _ in range(iters):
        nb = (np.roll(v, 1, 0) + np.roll(v, -1, 0)
              + np.roll(v, 1, 1) + np.roll(v, -1, 1)
              + np.roll(v, 1, 2) + np.roll(v, -1, 2)) / 6.0
        v = (1 - lam) * v + lam * nb
    return v


def signed_distance(grid: np.ndarray, verts: np.ndarray, faces: np.ndarray,
                    chunk: int = 2048) -> np.ndarray:
    """Signed point-mesh distance; sign from pseudo-normals at the closest
    surface point (igl.signed_distance replacement;
    ref: gen_weight_volume.py:160-166)."""
    import jax.numpy as jnp
    from animatablegaussians_tpu.ops.geometry3d import (
        barycentric_interpolate, nearest_face)
    from animatablegaussians_tpu.tools.gen_pos_maps import vertex_normals

    vn = jnp.asarray(vertex_normals(verts, faces))
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces, jnp.int32)
    out = []
    for i in range(0, grid.shape[0], chunk):
        q = jnp.asarray(grid[i:i + chunk])
        d, fi, bc = nearest_face(q, vj, fj, chunk=min(chunk, 1024))
        n = barycentric_interpolate(vn, fj, fi, bc)
        surf = barycentric_interpolate(vj, fj, fi, bc)
        sign = jnp.sign(jnp.sum(n * (q - surf), -1))
        out.append(np.asarray(sign * d))
    return np.concatenate(out)


def build_weight_volume(template_v: np.ndarray, template_f: np.ndarray,
                        smpl_v: np.ndarray, smpl_f: np.ndarray,
                        smpl_lbs: np.ndarray, res: int = RES,
                        n_surface: int = 100_000) -> dict:
    import jax.numpy as jnp
    from animatablegaussians_tpu.ops.geometry3d import calc_blending_weight

    mn = template_v.min(0) - 0.1
    mx = template_v.max(0) + 0.1
    bounds = np.stack([mn, mx]).astype(np.float32)
    grid = make_grid(bounds, res)

    surf_pts, _ = sample_surface(template_v, template_f, n_surface)
    surf_w, _ = calc_blending_weight(
        jnp.asarray(surf_pts), jnp.asarray(smpl_v),
        jnp.asarray(smpl_f, jnp.int32), jnp.asarray(smpl_lbs),
        method="barycentric")
    surf_w = np.asarray(surf_w)

    diff = knn_scatter_weights(grid, surf_pts, surf_w)
    diff = diff.reshape(res, res, res, -1)
    diff = jacobi_smooth(diff, iters=10)
    diff /= np.maximum(diff.sum(-1, keepdims=True), 1e-8)

    ori_w, _ = calc_blending_weight(
        jnp.asarray(grid), jnp.asarray(smpl_v),
        jnp.asarray(smpl_f, jnp.int32), jnp.asarray(smpl_lbs),
        method="barycentric")
    ori = np.asarray(ori_w).reshape(res, res, res, -1)

    sdf = signed_distance(grid, template_v, template_f).reshape(
        res, res, res)

    return dict(diff_weight_volume=diff.astype(np.float32),
                ori_weight_volume=ori.astype(np.float32),
                sdf_volume=sdf.astype(np.float32),
                volume_bounds=bounds,
                center=(0.5 * (mn + mx)).astype(np.float32),
                smpl_bounds=np.stack([smpl_v.min(0),
                                      smpl_v.max(0)]).astype(np.float32))


def main():
    from argparse import ArgumentParser
    from animatablegaussians_tpu.config import load_config
    from animatablegaussians_tpu.data import get_dataset_class

    ap = ArgumentParser()
    ap.add_argument("-c", "--config_path", required=True)
    ap.add_argument("--res", type=int, default=RES)
    args = ap.parse_args()
    opt = load_config(args.config_path).to_dict()
    ds_cls = get_dataset_class(opt["train"].get(
        "dataset", "MvRgbDatasetAvatarReX"))
    dataset = ds_cls(**opt["train"]["data"])
    data_dir = dataset.data_dir

    tpl_path = os.path.join(data_dir, "template.ply")
    if os.path.exists(tpl_path):
        from animatablegaussians_tpu.utils.ply import read_ply
        props, tfaces = read_ply(tpl_path)
        tv = np.stack([props["x"], props["y"], props["z"]], -1).astype(
            np.float32)
        tf = tfaces.astype(np.int64)
    else:
        tv = dataset.cano_smpl["vertices"]
        tf = np.asarray(dataset.smpl_model.faces, np.int64)

    data = build_weight_volume(
        tv, tf, dataset.cano_smpl["vertices"],
        np.asarray(dataset.smpl_model.faces, np.int64),
        np.asarray(dataset.smpl_model.data.lbs_weights), res=args.res)
    np.savez(os.path.join(data_dir, "cano_weight_volume.npz"), **data)
    print(f"# Wrote {os.path.join(data_dir, 'cano_weight_volume.npz')}")


if __name__ == "__main__":
    main()
