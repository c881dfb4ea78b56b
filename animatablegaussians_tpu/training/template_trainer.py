"""Template (SDF NeRF) training: jitted ray-batch step + geometry export.

Equivalent of the reference template trainer (ref: main_template.py:18-144):
color L1 + mask L1 + eikonal losses on randomly sampled rays; Adam with a
Step LR schedule; marching-cubes geometry extraction in chunks and export
to ``template.ply``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from animatablegaussians_tpu.training.lr_schedule import \
    get_learning_rate_schedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TemplateTrainState:
    params: Any
    opt_state: Any
    iter_idx: jnp.ndarray


def make_template_optimizer(lr_cfg: dict, finetune_hand: bool = False):
    sched = get_learning_rate_schedule(**lr_cfg)
    adam = optax.adam(learning_rate=sched)
    if not finetune_hand:
        return adam
    # only the two hand color fields stay trainable
    # (ref: main_template.py:83-87)
    def labels(params):
        return {k: ("train" if k in ("left_hand", "right_hand")
                    else "freeze") for k in params}
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, labels)


def make_template_train_step(net, optimizer, *, loss_weight: dict,
                             n_samples: int = 64,
                             smpl_guided: bool = True,
                             depth_guided: Optional[dict] = None):
    """Build the jitted step over one ray batch (static ray count).

    Near/far selection follows the reference's depth_guided_sampling block
    (ref: network/template.py:294-316): depth-guided when dist>0 is
    available, else SMPL-sphere-guided, else the AABB bounds.
    """
    dg = depth_guided or {}
    near_dist = float(dg.get("near_sur_dist", 0.05))
    n_dg_samples = int(dg.get("N_ray_samples", n_samples))
    use_depth = bool(dg.get("flag", False))

    def loss_fn(params, items, rng):
        ray_o, ray_d = items["ray_o"], items["ray_d"]
        near, far = items["near"], items["far"]
        if use_depth:
            valid = items["dist"] > 1e-6
            near = jnp.where(valid, items["dist"] - near_dist, near)
            far = jnp.where(valid, items["dist"] + near_dist, far)
            ns = n_dg_samples
        else:
            if smpl_guided:
                near, far = net.smpl_guided_near_far(items, ray_o, ray_d,
                                                     near, far)
            ns = n_samples

        out = net.render_rays(params, items, ray_o, ray_d, near, far,
                              n_samples=ns, training=True, rng=rng)
        total = 0.0
        terms = {}
        cl = jnp.abs(out["rgb_map"] - items["color_gt"]).mean()
        total += loss_weight.get("color", 1.0) * cl
        terms["color_loss_random"] = cl
        ml = jnp.abs(out["acc_map"] - items["mask_gt"]).mean()
        total += loss_weight.get("mask", 0.0) * ml
        terms["mask_loss_random"] = ml
        if "normal" in out and loss_weight.get("eikonal", 0.0) > 0:
            el = ((jnp.linalg.norm(out["normal"], axis=-1) - 1.0)
                  ** 2).mean()
            total += loss_weight["eikonal"] * el
            terms["eikonal_loss"] = el
        terms["total_loss"] = total
        return total, terms

    @jax.jit
    def step(state: TemplateTrainState, items, rng):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, items, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TemplateTrainState(params, opt_state,
                                  state.iter_idx + 1), terms

    return step


# ---------------------------------------------------------------------------
# geometry extraction (ref: main_template.py:103-133)
# ---------------------------------------------------------------------------

def generate_volume_points(bounds: np.ndarray, res) -> np.ndarray:
    """Dense grid of world points in bounds (ref: utils/net_util.py:48-63)."""
    rx, ry, rz = res
    xs = np.linspace(bounds[0, 0], bounds[1, 0], rx)
    ys = np.linspace(bounds[0, 1], bounds[1, 1], ry)
    zs = np.linspace(bounds[0, 2], bounds[1, 2], rz)
    g = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack(g, -1).reshape(-1, 3).astype(np.float32)


def test_geometry(net, params, items, space: str = "cano",
                  testing_res=(256, 256, 128), chunk: int = 256 * 256):
    """Chunked SDF evaluation -> marching cubes -> (verts, faces, normals)."""
    from animatablegaussians_tpu.utils.recon import (
        compute_sobel_normals, extract_mesh_from_sdf)

    bounds = np.asarray(items["live_bounds" if space == "live"
                              else "cano_bounds"])
    pts = generate_volume_points(bounds, testing_res)

    @jax.jit
    def sdf_chunk(p):
        if space == "live":
            cano, _ = net.transform_live2cano(p, items, near_thres=0.1)
        else:
            cano = p
        ret = net.forward_cano_body_nerf(params, cano, None,
                                         compute_grad=False)
        return ret["sdf"][:, 0]

    pad = (-pts.shape[0]) % chunk
    pts_p = np.pad(pts, ((0, pad), (0, 0)))
    sdfs = [np.asarray(sdf_chunk(jnp.asarray(pts_p[i:i + chunk])))
            for i in range(0, pts_p.shape[0], chunk)]
    sdf = np.concatenate(sdfs)[:pts.shape[0]].reshape(testing_res)

    # our 'sdf' output is inside-positive (ref: template.py:110); marching
    # cubes wants inside < level, so negate
    verts, faces = extract_mesh_from_sdf(-sdf, bounds, level=0.0)
    ii = np.clip(((verts - bounds[0]) / (bounds[1] - bounds[0])
                  * (np.asarray(testing_res) - 1)).astype(int), 0,
                 np.asarray(testing_res) - 1)
    nvol = compute_sobel_normals(-sdf)
    normals = nvol[ii[:, 0], ii[:, 1], ii[:, 2]]
    return verts, faces, normals


def save_mesh_as_ply(path: str, vertices, faces, normals=None):
    """(ref: utils/obj_io.py save_mesh_as_ply)."""
    from animatablegaussians_tpu.utils.ply import write_ply
    props = dict(x=vertices[:, 0], y=vertices[:, 1], z=vertices[:, 2])
    if normals is not None:
        props.update(nx=normals[:, 0], ny=normals[:, 1], nz=normals[:, 2])
    write_ply(path, props, faces=np.asarray(faces, np.int32))
