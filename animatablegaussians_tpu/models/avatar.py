"""AvatarNet: pose map -> Gaussian maps -> LBS skin -> splat.

Functional re-design of the reference avatar model (ref: network/avatar.py:16-239):

  * canonical geometry from the baked position map: masked texels are the
    (fixed) Gaussian point set; per-point LBS weights from init_pts_lbs.npy;
  * three DualStyleUNet heads on the 512^2 front pose map: position offsets
    (x0.05), `other` (opacity 1 + scale 3 + rot 4 added to the raw canonical
    Gaussian params before activation), color;
  * optional view-direction conditioning: per-point normal.viewdir rendered
    into the canonical map, encoded by a small conv net, injected into the
    color decoders at the 256^2 feature level;
  * LBS to the live pose via per-point blended joint affines, then the
    Pallas splatting pipeline.

JAX specifics: masked texel selection uses precomputed static index arrays
(shapes stay static under jit); parameters are a plain dict pytree.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.models import styleunet as su
from animatablegaussians_tpu.models.gaussian_model import (GaussianParams,
                                                           create_from_pcd)
from animatablegaussians_tpu.ops import quat as quat_ops
from animatablegaussians_tpu.ops.rasterize import RasterizeConfig, render
from animatablegaussians_tpu.utils.geometry import normalize_vert_bbox


class AvatarNet:
    """Static configuration + canonical buffers; parameters are pytrees."""

    def __init__(self, opt, cano_smpl_map: np.ndarray,
                 init_pts_lbs: np.ndarray,
                 cano_nml_map: Optional[np.ndarray] = None,
                 map_size: Optional[int] = None,
                 raster_config: RasterizeConfig = RasterizeConfig()):
        """cano_smpl_map: (H, 2H, 3) canonical position map (front|back);
        init_pts_lbs: (N, J) per-point LBS weights."""
        opt = dict(opt or {})
        self.random_style = opt.get("random_style", False)
        self.with_viewdirs = opt.get("with_viewdirs", True)
        self.weight_viewdirs = float(opt.get("weight_viewdirs", 1.0))
        self.raster_config = raster_config
        self.max_sh_degree = 0

        self.map_h, self.map_w = cano_smpl_map.shape[:2]
        self.inp_size = self.map_h // 2          # CNN input res (512)
        # CNN output res per side MUST equal the canonical map height so
        # the masked-texel gather indexes the full output map
        # (ref: avatar.py:34-36 — inp 512, out 1024 for the 1024x2048 map)
        self.out_size = map_size or self.map_h
        assert self.out_size == self.map_h, (
            f"CNN out_size {self.out_size} must equal cano map height "
            f"{self.map_h} (masked texels index the output map)")

        self.cano_smpl_map = jnp.asarray(cano_smpl_map, jnp.float32)
        mask = np.linalg.norm(np.asarray(cano_smpl_map), axis=-1) > 0.0
        self.cano_smpl_mask = mask

        # Block-packed masked-texel layout. XLA's TPU scatter/gather cost is
        # per-INDEX (~10-100 ns each; the round-2 fused select's VJP scatter
        # alone was ~26 ms/step at 518k texels). Selecting whole runs of
        # `texel_block` consecutive texels cuts the index count ~8x: the
        # point set becomes every texel of every 8-texel run that touches
        # the mask (~8% padding points, carried with a static validity mask
        # that zeroes their opacity/radii/losses). texel_block=1 reproduces
        # the exact-texel layout.
        self.texel_block = tb = int(opt.get("texel_block", 8))
        assert (self.map_h * self.map_w) % tb == 0
        flat = mask.reshape(-1)
        block_idx = np.nonzero(flat.reshape(-1, tb).any(axis=1))[0]
        self.block_idx = jnp.asarray(block_idx, jnp.int32)   # (B,)
        self.n_blocks = int(block_idx.shape[0])
        t = (block_idx[:, None] * tb + np.arange(tb)[None]).reshape(-1)
        iy = (t // self.map_w).astype(np.int32)
        ix = (t % self.map_w).astype(np.int32)
        self.mask_iy = jnp.asarray(iy)              # (N,) static gather idx
        self.mask_ix = jnp.asarray(ix)
        self.valid_np = flat[t]                     # (N,) pad mask (static)
        self.valid = jnp.asarray(self.valid_np)
        self.valid_f = jnp.asarray(self.valid_np.astype(np.float32))
        self.n_points = int(t.shape[0])             # padded count N'
        self.n_valid = int(self.valid_np.sum())
        self.init_points = self.cano_smpl_map[self.mask_iy, self.mask_ix]
        lbs_np = np.asarray(init_pts_lbs, np.float32)
        assert lbs_np.shape[0] == self.n_valid, (
            f"init_pts_lbs has {lbs_np.shape[0]} rows for {self.n_valid} "
            "masked texels")
        lbs_pad = np.zeros((self.n_points, lbs_np.shape[1]), np.float32)
        lbs_pad[self.valid_np] = lbs_np
        self.lbs = jnp.asarray(lbs_pad)             # (N, J); zero rows at pads

        if self.with_viewdirs:
            assert cano_nml_map is not None
            self.cano_nml_map = jnp.asarray(cano_nml_map, jnp.float32)
            self.cano_nmls = self.cano_nml_map[self.mask_iy, self.mask_ix]

        # Half-res viewdir-map scatter layout (get_viewdir_feat): the
        # reference nearest-downsamples the full-res dot map by 2
        # (ref: avatar.py:126-135 interpolate(0.5)), which only ever reads
        # even-(row, col) texels — so scatter those points straight into the
        # (H/2, W/2) map as contiguous tb/2-runs instead of materializing
        # the full-res map and strided-slicing it (~17 ms/step at 1024x2048).
        # Blocks are tb-aligned along x, so even-row blocks contribute their
        # even-x texels as one tb/2-run each.
        if (tb % 2 == 0 and self.map_w % tb == 0 and self.map_h % 2 == 0
                and self.map_w % 2 == 0):
            hb = tb // 2
            blk_t0 = block_idx * tb
            blk_iy = blk_t0 // self.map_w
            blk_ix0 = blk_t0 % self.map_w
            even = blk_iy % 2 == 0
            src = (np.nonzero(even)[0][:, None] * tb
                   + np.arange(0, tb, 2)[None]).reshape(-1)
            tgt = (blk_iy[even] // 2) * (self.map_w // 2 // hb) \
                + blk_ix0[even] // tb
            self.vd_half_src = jnp.asarray(src, jnp.int32)   # (B_even*hb,)
            self.vd_half_tgt = jnp.asarray(tgt, jnp.int32)   # (B_even,)
        else:
            self.vd_half_src = None
            self.vd_half_tgt = None

        # Direct CNN-output select layout: the (H, 2H) assembled map is
        # [front | back] along x with S = out_size columns each, and a
        # tb-aligned block never straddles the seam (S % tb == 0) — so the
        # masked select can read the raw (S, S, 2C) head outputs directly
        # (front blocks channels [:C], back blocks [C:]) and skip the three
        # full-res front|back width-concats of _net_out_to_map
        # (ref: network/avatar.py:84-124 assembles the same [front|back]
        # map before masking).
        S = self.out_size
        if self.map_w == 2 * S and S % tb == 0:
            blk_t0 = block_idx * tb
            blk_iy = blk_t0 // self.map_w
            blk_ix0 = blk_t0 % self.map_w
            front = blk_ix0 < S
            row = blk_iy * (S // tb) + np.where(front, blk_ix0,
                                                blk_ix0 - S) // tb
            self.dual_row = jnp.asarray(row, jnp.int32)          # (B,)
            self.dual_front = jnp.asarray(front[:, None, None])  # (B,1,1)
        else:
            self.dual_row = None
            self.dual_front = None

        kw = dict(inp_size=self.inp_size, inp_ch=3, out_size=self.out_size,
                  style_dim=512, n_mlp=2,
                  channel_max=int(opt.get("channel_max", 512)),
                  remat=bool(opt.get("remat", False)))
        self.color_net = su.DualStyleUNet(out_ch=3, **kw)
        self.position_net = su.DualStyleUNet(out_ch=3, **kw)
        self.other_net = su.DualStyleUNet(out_ch=8, **kw)
        self.style_dim = 512

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "color_net": self.color_net.init(k1),
            "position_net": self.position_net.init(k2),
            "other_net": self.other_net.init(k3),
            "cano_gaussian": create_from_pcd(
                self.init_points,
                jax.random.uniform(k4, (self.n_points, 3)),
                sh_degree=self.max_sh_degree),
        }
        if self.with_viewdirs:
            kv1, kv2 = jax.random.split(k4)
            lim1 = 1.0 / math.sqrt(1 * 16)
            lim2 = 1.0 / math.sqrt(64 * 16)
            params["viewdir_net"] = dict(
                conv1=dict(weight=jax.random.uniform(
                    kv1, (4, 4, 1, 64), jnp.float32, -lim1, lim1),
                    bias=jnp.zeros((64,))),
                conv2=dict(weight=jax.random.uniform(
                    kv2, (4, 4, 64, 128), jnp.float32, -lim2, lim2),
                    bias=jnp.zeros((128,))),
            )
        return params

    def constant_style(self) -> jnp.ndarray:
        return jnp.ones((1, self.style_dim)) / math.sqrt(self.style_dim)

    # -- map <-> point-set plumbing ------------------------------------
    def _select_masked(self, full_map: jnp.ndarray) -> jnp.ndarray:
        """(H, 2H, C) -> (N, C) at the block-packed mask texels.

        One gather of B block rows (each ``texel_block`` consecutive texels
        x C channels) instead of N single-texel rows: XLA's TPU gather and
        its scatter-add VJP pay per index, so 8-texel runs are ~8x cheaper
        (the VJP of this select was the single biggest op of the round-2
        step at ~26 ms). Indices are static, unique, sorted."""
        C = full_map.shape[-1]
        blocks = full_map.reshape(-1, self.texel_block, C).at[
            self.block_idx].get(unique_indices=True, indices_are_sorted=True,
                                mode="promise_in_bounds")
        return blocks.reshape(self.n_points, C)

    def _scatter_masked(self, vals: jnp.ndarray, channels: int = 0):
        """(N, [C]) point values -> (H, 2H, [C]) map, zeros elsewhere.

        Pad texels receive their point's value — their per-point inputs
        (zero LBS rows, zero normals) make those values 0 on every call
        path (viewdir dots, pose-map regen), matching the exact-texel
        layout."""
        tb = self.texel_block
        C = max(channels, 1)
        grid = (self.map_h * self.map_w) // tb
        out = jnp.zeros((grid, tb, C), jnp.float32).at[self.block_idx].set(
            vals.reshape(self.n_blocks, tb, C), unique_indices=True,
            indices_are_sorted=True, mode="promise_in_bounds")
        out = out.reshape(self.map_h, self.map_w, C)
        return out[..., 0] if channels == 0 else out

    def _scatter_masked_half(self, vals: jnp.ndarray, channels: int = 0):
        """(N, [C]) point values -> (H/2, W/2, [C]) half-res map: the
        reference's nearest x0.5 interpolate of the scattered full-res map
        (ref: network/avatar.py:126-135, 149-159) reads only even-(row,col)
        texels, so those points scatter straight into the half-res map as
        contiguous tb/2-runs (see the vd_half layout in __init__), skipping
        the full-res intermediate (~17 ms/step at 1024x2048). Equals
        _scatter_masked(vals)[::2, ::2] exactly (test_training.py pins it)."""
        tb = self.texel_block
        C = max(channels, 1)
        if self.vd_half_src is None:
            out = self._scatter_masked(vals, channels=channels)
            return out[::2, ::2]
        hb = tb // 2
        hh, hw = self.map_h // 2, self.map_w // 2
        v = vals.reshape(self.n_points, C)[self.vd_half_src]
        out = jnp.zeros((hh * hw // hb, hb, C), jnp.float32).at[
            self.vd_half_tgt].set(v.reshape(-1, hb, C), unique_indices=True,
                                  indices_are_sorted=True,
                                  mode="promise_in_bounds")
        out = out.reshape(hh, hw, C)
        return out[..., 0] if channels == 0 else out

    def _net_out_to_map(self, out: jnp.ndarray, out_ch: int) -> jnp.ndarray:
        """CNN output (1, S, S, 2C) -> (S, 2S, C) front|back map."""
        front, back = out[0, :, :, :out_ch], out[0, :, :, out_ch:]
        return jnp.concatenate([front, back], axis=1)

    def _select_masked_dual(self, outs) -> jnp.ndarray:
        """[(1, S, S, 2C_i)] raw head outputs -> (N, sum C_i) masked texels.

        Equals _select_masked(concat of _net_out_to_map(out_i)) exactly
        (test_training.py pins it), but reads the head outputs in place:
        front blocks take channels [:C_i], back blocks [C_i:] on the same
        block rows (see the dual_row layout in __init__), skipping three
        full-res front|back concat copies per step."""
        tb = self.texel_block
        S = self.out_size
        x = jnp.concatenate([o[0] for o in outs], axis=-1)
        # front and back blocks may share a raw row -> no unique/sorted
        # annotations (the VJP must scatter-ADD duplicates)
        rows = x.reshape(S * S // tb, tb, x.shape[-1])[self.dual_row]
        vals, off = [], 0
        for o in outs:
            c2 = o.shape[-1]
            seg = rows[:, :, off:off + c2]
            vals.append(jnp.where(self.dual_front, seg[:, :, :c2 // 2],
                                  seg[:, :, c2 // 2:]))
            off += c2
        return jnp.concatenate(vals, axis=-1).reshape(self.n_points, -1)

    # -- heads (ref: avatar.py:93-147) ----------------------------------
    def get_positions(self, params, pose_map, return_map=False):
        out = self.position_net.apply(params["position_net"],
                                      self.constant_style(), pose_map[None])
        position_map = self._net_out_to_map(out, 3)
        delta = 0.05 * self._select_masked(position_map)
        positions = delta + params["cano_gaussian"].get_xyz
        if return_map:
            return positions, position_map
        return positions

    def get_others(self, params, pose_map):
        out = self.other_net.apply(params["other_net"],
                                   self.constant_style(), pose_map[None])
        others = self._select_masked(self._net_out_to_map(out, 8))  # (N, 8)
        g: GaussianParams = params["cano_gaussian"]
        opacity = jax.nn.sigmoid(others[:, 0:1] + g.opacity)
        scales = jnp.exp(others[:, 1:4] + g.scaling)
        rotations = quat_ops.normalize(others[:, 4:8] + g.rotation)
        return opacity, scales, rotations

    def get_colors(self, params, pose_map, front_viewdirs=None,
                   back_viewdirs=None, style=None):
        style = self.constant_style() if style is None else style
        out = self.color_net.apply(params["color_net"], style, pose_map[None],
                                   view_feature1=front_viewdirs,
                                   view_feature2=back_viewdirs)
        color_map = self._net_out_to_map(out, 3)
        return self._select_masked(color_map), color_map

    def _viewdir_half_map(self, items, rng=None):
        """Per-frame normal.viewdir dots scattered to the (H/2, W/2) map
        (ref: avatar.py:126-147); vmap-able over stacked frames."""
        mats = items["cano2live_jnt_mats"]
        pt_mats = jnp.einsum("nj,jxy->nxy", self.lbs, mats)
        pt_mats = jax.lax.stop_gradient(pt_mats)
        live_pts = (jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3],
                               self.init_points) + pt_mats[:, :3, 3])
        live_nmls = jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3],
                               self.cano_nmls)
        extr = items["extr"]
        cam_pos = -extr[:3, :3].T @ extr[:3, 3]
        viewdirs = cam_pos[None] - live_pts
        viewdirs = viewdirs / jnp.maximum(
            jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-3)
        if rng is not None:  # training-time direction jitter
            viewdirs = viewdirs + 0.1 * jax.random.normal(rng, viewdirs.shape)
            viewdirs = viewdirs / jnp.maximum(
                jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-3)
        dots = jnp.sum(live_nmls * viewdirs, axis=-1)
        return self._scatter_masked_half(dots)                 # (H/2, W/2)

    def _encode_viewdirs(self, params, vmaps):
        """(B, H/2, W/2) half-res dot maps -> two (B, h, w, 128) conv
        features (front/back). Batched over frames."""
        half = vmaps.shape[2] // 2
        front, back = vmaps[:, :, :half], vmaps[:, :, half:]
        p = params["viewdir_net"]

        def encode(v):
            x = v[..., None]
            x = su.conv2d(x, p["conv1"]["weight"], stride=2, padding=1)
            x = x + p["conv1"]["bias"]
            x = jnp.where(x >= 0, x, 0.2 * x)
            x = su.conv2d(x, p["conv2"]["weight"], stride=2, padding=1)
            x = x + p["conv2"]["bias"]
            return x

        w = self.weight_viewdirs
        return w * encode(front), w * encode(back)

    def get_viewdir_feat(self, params, items, rng=None):
        """normal.viewdir scalar map -> conv features (ref: avatar.py:126-147)."""
        vmap = self._viewdir_half_map(items, rng)
        return self._encode_viewdirs(params, vmap[None])

    # -- skinning (ref: avatar.py:84-91) ---------------------------------
    def transform_cano2live(self, gaussian_vals: dict, items: dict) -> dict:
        # (N, J) @ (J, 16): a real matmul (contraction 55) — MXU-friendly.
        pt_mats = jnp.einsum("nj,jxy->nxy", self.lbs,
                             items["cano2live_jnt_mats"])
        # The remaining per-point 3x3 algebra is unrolled: batched tiny
        # matmuls lower to slow mul-reduce fusions on TPU (see
        # ops/rasterize/preprocess.py for the same treatment).
        m = [[pt_mats[:, i, j] for j in range(4)] for i in range(3)]
        p = gaussian_vals["positions"]
        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        positions = jnp.stack(
            [m[i][0] * px + m[i][1] * py + m[i][2] * pz + m[i][3]
             for i in range(3)], axis=1)
        q = quat_ops.quat_to_mat(gaussian_vals["rotations"])   # (N, 3, 3)
        rot = jnp.stack(
            [jnp.stack([m[i][0] * q[:, 0, j] + m[i][1] * q[:, 1, j]
                        + m[i][2] * q[:, 2, j]
                        for j in range(3)], axis=-1)
             for i in range(3)], axis=-2)                      # (N, 3, 3)
        out = dict(gaussian_vals)
        out["positions"] = positions
        out["rotations"] = quat_ops.mat_to_quat(rot)
        return out

    # -- pose-map regeneration for novel poses (ref: avatar.py:149-159) --
    def get_pose_map(self, items: dict) -> jnp.ndarray:
        pt_mats = jnp.einsum("nj,jxy->nxy", self.lbs,
                             items["cano2live_jnt_mats_woRoot"])
        live_pts = (jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3],
                               self.init_points) + pt_mats[:, :3, 3])
        live_map = self._scatter_masked_half(live_pts, channels=3)
        half = live_map.shape[1] // 2
        return jnp.concatenate([live_map[:, :half], live_map[:, half:]],
                               axis=-1)                        # (S, S, 6)

    # -- mean-hand freeze (ref: avatar.py:52-82,183-200) ------------------
    def hand_mask(self) -> np.ndarray:
        lbs_argmax = np.asarray(jnp.argmax(self.lbs, axis=1))
        return (lbs_argmax == 20) | (lbs_argmax == 21) | (lbs_argmax >= 25)

    def generate_mean_hands(self, params, pose_map):
        cano_pts = self.get_positions(params, pose_map)
        opacity, scales, rotations = self.get_others(params, pose_map)
        colors, _ = self.get_colors(params, pose_map)
        return dict(positions=cano_pts, opacity=opacity, scales=scales,
                    rotations=rotations, colors=colors)

    def blend_mean_hands(self, hand_vals, cano_pts, opacity, scales,
                         rotations, items):
        cano_xyz = self.init_points
        wl = jax.nn.sigmoid(2.5 * (normalize_vert_bbox(
            items["left_cano_mano_v"], attris=cano_xyz, dim=0,
            per_axis=True)[:, 0:1] + 2.0))
        wr = jax.nn.sigmoid(-2.5 * (normalize_vert_bbox(
            items["right_cano_mano_v"], attris=cano_xyz, dim=0,
            per_axis=True)[:, 0:1] - 2.0))
        below = cano_xyz[:, 1] < items["cano_smpl_center"][1]
        wl = jnp.where(below[:, None], 0.0, wl)
        wr = jnp.where(below[:, None], 0.0, wr)
        s = jnp.maximum(wl + wr, 1.0)
        wl, wr = wl / s, wr / s
        w = wl + wr
        return (w * hand_vals["positions"] + (1 - w) * cano_pts,
                w * hand_vals["opacity"] + (1 - w) * opacity,
                w * hand_vals["scales"] + (1 - w) * scales,
                w * hand_vals["rotations"] + (1 - w) * rotations)

    # -- full render (ref: avatar.py:161-239) -----------------------------
    def render(self, params, items, bg_color=(0.0, 0.0, 0.0),
               use_pca: bool = False, training: bool = False,
               rng: Optional[jax.Array] = None,
               hand_vals: Optional[dict] = None,
               img_w: Optional[int] = None,
               img_h: Optional[int] = None) -> dict:
        bg = jnp.asarray(bg_color, jnp.float32)
        key = "smpl_pos_map_pca" if use_pca else "smpl_pos_map"
        pose_map = items[key][..., :3]                         # (S, S, 3)

        if self.with_viewdirs:
            vd_rng = None
            if training and rng is not None:
                rng, vd_rng = jax.random.split(rng)
            front_vd, back_vd = self.get_viewdir_feat(params, items, vd_rng)
        else:
            front_vd = back_vd = None

        style = None
        if self.random_style and training and rng is not None:
            style = jax.random.uniform(rng, (1, self.style_dim))

        pos_out, other_out, color_out = self._head_outputs(
            params, pose_map[None], front_vd, back_vd, style)
        return self._finish_render(params, items, pos_out, other_out,
                                   color_out, bg, img_w, img_h, hand_vals,
                                   training)

    def _head_outputs(self, params, pose_maps, front_vd, back_vd, style):
        """Run the three DualStyleUNet heads on a (B, S, S, 3) pose-map
        batch -> three raw (B, S, S, 2C) outputs. With the constant style
        the modulated convs share one weight across the batch (see
        styleunet.modulated_conv2d), so B > 1 frames run as ONE batched
        conv stack — far better MXU utilization than B batch-1 passes."""
        pos_out = self.position_net.apply(params["position_net"],
                                          self.constant_style(), pose_maps)
        other_out = self.other_net.apply(params["other_net"],
                                         self.constant_style(), pose_maps)
        color_style = self.constant_style() if style is None else style
        color_out = self.color_net.apply(params["color_net"], color_style,
                                         pose_maps,
                                         view_feature1=front_vd,
                                         view_feature2=back_vd)
        return pos_out, other_out, color_out

    def _finish_render(self, params, items, pos_out, other_out, color_out,
                       bg, img_w, img_h, hand_vals, training):
        """Masked select -> Gaussian attributes -> LBS -> splat for ONE
        frame, from raw (1, S, S, 2C) head outputs."""
        # ONE masked-texel select on the three heads' concatenated
        # outputs: the three separate selects' VJPs were three ~22 ms
        # scatter-adds at 518k texels; identical indices fuse them into
        # one. The select reads the raw (S, S, 2C) outputs via the
        # dual_row layout when available (skips three full-res front|back
        # concat copies).
        if self.dual_row is not None:
            sel = self._select_masked_dual(
                [pos_out, other_out, color_out])           # (N, 14)
        else:
            sel = self._select_masked(jnp.concatenate(
                [self._net_out_to_map(pos_out, 3),
                 self._net_out_to_map(other_out, 8),
                 self._net_out_to_map(color_out, 3)], axis=-1))

        g: GaussianParams = params["cano_gaussian"]
        cano_pts = 0.05 * sel[:, :3] + g.get_xyz
        opacity = jax.nn.sigmoid(sel[:, 3:4] + g.opacity)
        scales = jnp.exp(sel[:, 4:7] + g.scaling)
        rotations = quat_ops.normalize(sel[:, 7:11] + g.rotation)
        colors = sel[:, 11:14]

        if hand_vals is not None:
            cano_pts, opacity, scales, rotations = self.blend_mean_hands(
                hand_vals, cano_pts, opacity, scales, rotations, items)

        gaussian_vals = dict(positions=cano_pts, opacity=opacity,
                             scales=scales, rotations=rotations,
                             colors=colors,
                             max_sh_degree=self.max_sh_degree)
        # pad points excluded: their CNN texels are garbage, not offsets
        nonrigid_offset = (cano_pts - self.init_points) * self.valid_f[:, None]
        gaussian_vals = self.transform_cano2live(gaussian_vals, items)

        # image size must be static under jit; allow override, else items
        # must carry plain Python ints.
        img_w = int(items["img_w"]) if img_w is None else img_w
        img_h = int(items["img_h"]) if img_h is None else img_h
        out = render(gaussian_vals["positions"], gaussian_vals["scales"],
                     gaussian_vals["rotations"],
                     gaussian_vals["opacity"].reshape(-1),
                     gaussian_vals["colors"], bg,
                     items["extr"], items["intr"],
                     img_w, img_h,
                     config=self.raster_config,
                     valid_mask=self.valid)

        # assembled (S, 2S, C) maps for visualization consumers; unused
        # outputs are dead code XLA eliminates inside the train step
        ret = dict(rgb_map=out["render"], mask_map=out["mask"],
                   depth_map=out["depth"], offset=nonrigid_offset,
                   pos_map=self._net_out_to_map(pos_out, 3),
                   n_overflow=out["n_overflow"],
                   n_pairs=out["n_pairs"])
        if not training:
            ret.update(cano_tex_map=self._net_out_to_map(color_out, 3),
                       posed_gaussians=gaussian_vals)
        return ret

    # -- sequence render: F frames per dispatch ---------------------------
    def render_sequence(self, params, items_seq, bg_color=(0.0, 0.0, 0.0),
                        use_pca: bool = False,
                        hand_vals: Optional[dict] = None,
                        img_w: Optional[int] = None,
                        img_h: Optional[int] = None) -> dict:
        """Render a stacked sequence of F frames in ONE dispatch. The
        reference test loop renders animation frames one eager torch call
        at a time (ref: main_avatar.py:525-776); here the three CNN heads
        run as ONE batch-F conv stack (the constant inference style makes
        the modulated weights frame-invariant — batch-1 convs at these
        shapes reach only a few % MXU utilization, BASELINE.md), then
        ``lax.map`` runs the per-frame select/skin/splat tail (binning
        shapes are per-frame). Returns rgb/mask/depth stacked
        (F, H, W[, 3])."""
        bg = jnp.asarray(bg_color, jnp.float32)
        key = "smpl_pos_map_pca" if use_pca else "smpl_pos_map"
        pose_maps = items_seq[key][..., :3]                # (F, S, S, 3)

        if self.with_viewdirs:
            # vmap only over the leaves _viewdir_half_map actually reads —
            # callers may carry per-sequence (unstacked) leaves in items_seq
            vd_items = {k: items_seq[k]
                        for k in ("cano2live_jnt_mats", "extr")}
            vmaps = jax.vmap(self._viewdir_half_map)(vd_items)
            front_vd, back_vd = self._encode_viewdirs(params, vmaps)
        else:
            front_vd = back_vd = None

        pos_out, other_out, color_out = self._head_outputs(
            params, pose_maps, front_vd, back_vd, None)

        def body(xs):
            items, po, oo, co = xs
            out = self._finish_render(params, items, po[None], oo[None],
                                      co[None], bg, img_w, img_h,
                                      hand_vals, training=True)
            return dict(rgb_map=out["rgb_map"], mask_map=out["mask_map"],
                        depth_map=out["depth_map"])

        return jax.lax.map(body, (items_seq, pos_out, other_out, color_out))
