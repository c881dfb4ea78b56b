"""TemplateNet: SDF-NeRF geometry template with LBS canonicalization.

JAX re-design of the reference template model (ref: network/template.py:23-405):

  * positional-embedded SDF MLP (geometric init, softplus beta=100) + texture
    MLP + LaplaceDensity (ref: template.py:36-67);
  * live->cano inverse skinning: barycentric LBS weights from the nearest
    SMPL face -> inverse blended affines -> optional Newton root-finding
    refinement, skipping points owned by non-optimized bones [7,8,10,11]
    (ref: template.py:226-286);
  * cano->live forward skinning through the canonical weight volume
    (ref: template.py:209-224);
  * rigid hands when with_hand=False: hand joints [25:40)/[40:55) inherit
    the wrist transforms 20/21 (ref: template.py:211-214);
  * volume rendering with SMPL-guided near/far (ref: template.py:288-405).

JAX specifics: the chunked python ray loop becomes ``lax.map`` over
fixed-size chunks; SDF normals come from jax.grad instead of
torch.autograd.grad; the per-point Newton loop vmaps (ops/root_finding.py).
Sign convention preserved: the MLP's raw output is negated so outside<0
(ref: template.py:110 'sdf': -sdf).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.models.density import LaplaceDensity
from animatablegaussians_tpu.models.hand_avatar import HandAvatar
from animatablegaussians_tpu.models.mlp import MLPLinear, SdfMLP
from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume
from animatablegaussians_tpu.ops import geometry3d as g3d
from animatablegaussians_tpu.ops.embedder import get_embedder
from animatablegaussians_tpu.ops.root_finding import root_finding
from animatablegaussians_tpu.utils import nerf as nerf_util
from animatablegaussians_tpu.utils.geometry import normalize_vert_bbox

NONOPT_BONE_IDS = (7, 8, 10, 11)  # feet/toes skip root finding


class TemplateNet:
    def __init__(self, opt: dict, weight_volume: CanoBlendWeightVolume):
        self.opt = dict(opt or {})
        self.volume = weight_volume
        self.with_hand = self.opt.get("with_hand", False)
        self.use_root_finding = self.opt.get("use_root_finding", False)
        self.volume_type = self.opt.get("volume_type", "diff")

        self.pos_embedder, self.pos_dim = get_embedder(
            self.opt.get("multires", 6), 3)
        self.geo_mlp = SdfMLP(
            in_channels=self.pos_dim, out_channels=256 + 1,
            inter_channels=[512, 256, 256, 256, 256, 256],
            res_layers=[4], geometric_init=True, bias=0.7, weight_norm=True)

        if self.opt.get("use_viewdir", False):
            self.viewdir_embedder, self.viewdir_dim = get_embedder(
                self.opt.get("multires_viewdir", 4), 3)
        else:
            self.viewdir_embedder, self.viewdir_dim = None, 0
        self.tex_mlp = MLPLinear(
            in_channels=256 + self.viewdir_dim, out_channels=3,
            inter_channels=[256, 256, 256], last_op="sigmoid")

        self.density = LaplaceDensity(beta_init=0.01)
        self.left_hand = HandAvatar()
        self.right_hand = HandAvatar()

        wv = (weight_volume.diff_weight_volume if self.volume_type == "diff"
              else weight_volume.ori_weight_volume)
        self.weight_volume_arr = wv                      # (X, Y, Z, J)
        J = weight_volume.joint_num
        self.grad_volume_arr = weight_volume.grad_volume.reshape(
            wv.shape[0], wv.shape[1], wv.shape[2], J * 3)

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return dict(geo_mlp=self.geo_mlp.init(k1),
                    tex_mlp=self.tex_mlp.init(k2),
                    density=self.density.init(),
                    left_hand=self.left_hand.init(k3),
                    right_hand=self.right_hand.init(k4))

    # -- canonical radiance field (ref: template.py:92-140) --------------
    def forward_cano_body_nerf(self, params, xyz, viewdirs,
                               compute_grad: bool = False):
        def sdf_fn(p):
            feat = self.geo_mlp.apply(params["geo_mlp"],
                                      self.pos_embedder(p))
            return feat[..., 0], feat[..., 1:]

        sdf_raw, geo_feat = sdf_fn(xyz)
        if self.viewdir_embedder is not None:
            vd = jnp.zeros_like(xyz) if viewdirs is None else viewdirs
            geo_feat = jnp.concatenate(
                [geo_feat, self.viewdir_embedder(vd)], -1)
        color = self.tex_mlp.apply(params["tex_mlp"], geo_feat)
        density = self.density.apply(params["density"], sdf_raw[..., None])
        ret = dict(sdf=-sdf_raw[..., None], density=density, color=color,
                   cano_xyz=jax.lax.stop_gradient(xyz))
        if compute_grad:
            grad_fn = jax.grad(lambda p: sdf_fn(p[None])[0].sum())
            ret["normal"] = jax.vmap(grad_fn)(xyz)
        return ret

    # -- skinning (ref: template.py:209-286) ------------------------------
    def _rigid_hand_mats(self, jnt_mats: jnp.ndarray) -> jnp.ndarray:
        if self.with_hand:
            return jnt_mats
        m = jnt_mats
        m = m.at[25:40].set(m[20:21])
        m = m.at[40:55].set(m[21:22])
        return m

    def transform_cano2live(self, cano_pts, items, normals=None):
        mats = self._rigid_hand_mats(items["cano2live_jnt_mats"])
        w = self.volume.forward_weight(cano_pts, volume_type=self.volume_type)
        posed, pt_mats = g3d.skinning(cano_pts, w, mats, return_pt_mats=True)
        if normals is None:
            return posed
        return posed, jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3], normals)

    def transform_live2cano(self, posed_pts, items, normals=None,
                            near_thres: float = 0.08):
        mats = self._rigid_hand_mats(items["cano2live_jnt_mats"])
        pts_w, near_flag = g3d.calc_blending_weight(
            jax.lax.stop_gradient(posed_pts), items["live_smpl_v"],
            items["smpl_faces"], items["smpl_lbs"], near_thres,
            method="barycentric")
        pt_mats = jnp.einsum("nj,jxy->nxy", pts_w, mats)
        inv = jnp.linalg.inv(pt_mats)
        cano_pts = (jnp.einsum("nxy,ny->nx", inv[:, :3, :3], posed_pts)
                    + inv[:, :3, 3])
        cano_normals = None
        if normals is not None:
            cano_normals = jnp.einsum("nxy,ny->nx", inv[:, :3, :3], normals)

        if self.use_root_finding:
            refined = root_finding(
                self.weight_volume_arr, self.grad_volume_arr,
                posed_pts, cano_pts, mats, self.volume.volume_bounds)
            argmax = jnp.argmax(pts_w, -1)
            nonopt = jnp.zeros(argmax.shape, bool)
            for b in NONOPT_BONE_IDS:
                nonopt = nonopt | (argmax == b)
            cano_pts = jnp.where(nonopt[:, None], cano_pts, refined)

        if normals is None:
            return cano_pts, near_flag
        return cano_pts, cano_normals, near_flag

    # -- hand fusion (ref: template.py:146-202) ---------------------------
    def fuse_hands(self, params, body_ret, posed_xyz, view_dirs, items,
                   space: str = "live"):
        mano_faces = items["mano_face_closed"]          # (F, 3)

        def one_hand(side):
            v_key = f"{side}_live_mano_v" if space == "live" else \
                f"{side}_cano_mano_v"
            n_key = f"{side}_live_mano_n" if space == "live" else \
                f"{side}_cano_mano_n"
            hv, hn = items[v_key], items[n_key]
            hf = mano_faces[:, ::-1] if side == "left" else mano_faces
            dist, fidx, bary = g3d.nearest_face(posed_xyz, hv, hf)
            cano_hv = normalize_vert_bbox(items[f"{side}_cano_mano_v"],
                                          dim=0, per_axis=True)
            pts_cano = g3d.barycentric_interpolate(cano_hv, hf, fidx, bary)
            pts_live = g3d.barycentric_interpolate(hv, hf, fidx, bary)
            pts_n = g3d.barycentric_interpolate(hn, hf, fidx, bary)
            sdf = -jnp.sign(jnp.sum(pts_n * (posed_xyz - pts_live),
                                    -1)) * dist
            return pts_cano, sdf[:, None]

        l_cano, l_sdf = one_hand("left")
        r_cano, r_sdf = one_hand("right")

        zero_pose = jnp.zeros((45,), jnp.float32)
        c_l = self.left_hand.apply(params["left_hand"], l_cano, l_sdf,
                                   view_dirs, zero_pose)
        c_r = self.right_hand.apply(params["right_hand"], r_cano, r_sdf,
                                    view_dirs, zero_pose)

        cano_xyz = body_ret["cano_xyz"]
        wl = jax.nn.sigmoid(25 * (normalize_vert_bbox(
            items["left_cano_mano_v"], attris=cano_xyz, dim=0,
            per_axis=True)[:, 0:1] + 0.8))
        wr = jax.nn.sigmoid(-25 * (normalize_vert_bbox(
            items["right_cano_mano_v"], attris=cano_xyz, dim=0,
            per_axis=True)[:, 0:1] - 0.8))
        below = cano_xyz[:, 1] < items["cano_smpl_center"][1]
        wl = jnp.where(below[:, None], 0.0, wl)
        wr = jnp.where(below[:, None], 0.0, wr)
        s = jnp.maximum(wl + wr, 1.0)
        wl, wr = wl / s, wr / s
        w = wl + wr

        sdf = wl * l_sdf + wr * r_sdf + (1 - w) * body_ret["sdf"]
        color = wl * c_l + wr * c_r + (1 - w) * body_ret["color"]
        density = self.density.apply(params["density"], -sdf)
        out = dict(body_ret)
        out.update(sdf=sdf, color=color, density=density)
        return out

    # -- volume rendering (ref: template.py:288-405) ----------------------
    def render_rays(self, params, items, ray_o, ray_d, near, far,
                    n_samples: int = 64, space: str = "live",
                    white_bkgd: bool = False, training: bool = False,
                    rng: Optional[jax.Array] = None,
                    compute_normal: Optional[bool] = None):
        """Unchunked ray batch (R, 3)/(R,) -> dict of maps. Wrap in lax.map
        or call per-chunk for big images (chunking moved to caller;
        ref loop: template.py:321-391)."""
        R = ray_o.shape[0]
        rng_s = rng_v = None
        if rng is not None:
            rng_s, rng_v = jax.random.split(rng)
        pts, z_vals = nerf_util.sample_pts_on_rays(
            ray_o, ray_d, near, far, n_samples, perturb=training, rng=rng_s)
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        dists = jnp.concatenate([dists, dists[:, -1:]], -1)   # (R, S)

        flat = pts.reshape(R * n_samples, 3)
        if space == "live":
            cano_pts, _ = self.transform_live2cano(flat, items)
        else:
            cano_pts = flat

        viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        viewdirs = jnp.broadcast_to(viewdirs[:, None], pts.shape)
        viewdirs = viewdirs.reshape(R * n_samples, 3)
        if training and rng_v is not None:
            noise = 0.1 * jax.random.normal(rng_v, viewdirs.shape)
            viewdirs = viewdirs + noise
            viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1,
                                                  keepdims=True)

        if compute_normal is None:
            compute_normal = training
        ret = self.forward_cano_body_nerf(params, cano_pts, viewdirs,
                                          compute_grad=compute_normal)
        if self.with_hand:
            ret = self.fuse_hands(params, ret, flat, viewdirs, items, space)

        color = ret["color"].reshape(R, n_samples, 3)
        density = ret["density"].reshape(R, n_samples, 1)
        alpha = 1.0 - jnp.exp(-density[..., 0] * dists)
        raw = jnp.concatenate([color, alpha[..., None]], -1)
        rgb_map, _, acc_map, _, depth_map = nerf_util.raw2outputs(
            raw, z_vals, white_bkgd=white_bkgd)
        out = dict(rgb_map=rgb_map, acc_map=acc_map, depth_map=depth_map)
        if "normal" in ret:
            out["normal"] = ret["normal"].reshape(R, n_samples, 3)
        return out

    def smpl_guided_near_far(self, items, ray_o, ray_d, near, far):
        """SMPL-vertex-sphere near/far with AABB fallback
        (ref: template.py:304-312)."""
        n, f, hit = g3d.near_far_smpl(items["live_smpl_v"], ray_o, ray_d)
        return jnp.where(hit, n, near), jnp.where(hit, f, far)
