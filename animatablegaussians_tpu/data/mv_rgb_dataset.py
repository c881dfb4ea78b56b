"""Multi-view RGB video datasets (AvatarReX / THuman4 / ActorsHQ formats).

Same item contract and on-disk formats as the reference
(ref: dataset/dataset_mv_rgb.py:15-500) with one structural redesign for TPU:

  **SMPL-X is precomputed in one batched JAX forward at init**, not three
  torch forwards per item inside DataLoader workers
  (ref: dataset_mv_rgb.py:119-144). All per-frame joint transforms
  (`cano2live_jnt_mats`, `..._woRoot`), vertices and joints are computed for
  the whole pose list with a single vmapped/jitted call and cached as numpy;
  `getitem` is then pure array indexing + image decode. This turns the
  hot-loop host work into O(image IO) only.

Conventions preserved from the reference (they are part of checkpoint/PSNR
parity): images stay BGR as cv2 loads them; masks binarize at 128 with a
5x5 erode/dilate boundary band (ref: dataset_mv_rgb.py:268-285); position
maps are front|back side-by-side EXRs reshaped to 6 channels
(ref: dataset_mv_rgb.py:146-151) — here kept NHWC, i.e. (H, W, 6).
"""

from __future__ import annotations

import csv
import glob
import json
import os
from typing import Optional, Sequence

import numpy as np

# must be set before cv2 import for EXR pose-map IO (ref: main_avatar.py:4)
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

try:
    import cv2 as cv
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv = None

from animatablegaussians_tpu import config as agt_config


def _imread(path: str, unchanged: bool = True):
    if path.endswith(".exr"):
        # this image's OpenCV has no EXR support; use the bundled codec
        from animatablegaussians_tpu.utils import exr
        return exr.read_exr(path)
    if path.endswith(".jpg"):
        # native decode path (C++ libjpeg; falls back to cv2). Mirror
        # cv2.IMREAD_UNCHANGED: grayscale files stay (H, W).
        from animatablegaussians_tpu.data import native_io
        try:
            _, _, c = native_io.jpeg_info(path)
            return native_io.decode_jpeg(path, grayscale=(c == 1))
        except Exception:
            pass
    if cv is None:
        raise RuntimeError("cv2 required for image IO")
    flags = cv.IMREAD_UNCHANGED if unchanged else cv.IMREAD_COLOR
    img = cv.imread(path, flags)
    if img is None:
        raise FileNotFoundError(path)
    return img


class MvRgbDatasetBase:
    """Items are (pose_idx, view_idx) pairs over frame_range x used_cam_ids
    (ref: dataset_mv_rgb.py:62-74)."""

    def __init__(self, data_dir: str, frame_range=None,
                 used_cam_ids: Optional[Sequence[int]] = None,
                 training: bool = True, subject_name: Optional[str] = None,
                 load_smpl_pos_map: bool = False,
                 load_smpl_nml_map: bool = False, mode: str = "3dgs",
                 smpl_model_path: Optional[str] = None,
                 precompute_device: str = "cpu",
                 mano_dir: Optional[str] = None):
        self.data_dir = data_dir
        self.training = training
        self.subject_name = subject_name or os.path.basename(data_dir)
        self.load_smpl_pos_map = load_smpl_pos_map
        self.load_smpl_nml_map = load_smpl_nml_map
        self.mode = mode  # '3dgs' | 'nerf'

        self.load_cam_data()
        self.load_smpl_data()

        # pose list (ref: dataset_mv_rgb.py:44-61)
        n_frames = self.smpl_data["body_pose"].shape[0]
        if frame_range is None:
            self.pose_list = list(range(n_frames))
        elif isinstance(frame_range, (list, tuple)):
            self.pose_list = list(range(*frame_range))
        elif isinstance(frame_range, str):
            self.pose_list = np.loadtxt(
                os.path.join(data_dir, frame_range)).astype(int).tolist()
        else:
            raise TypeError("Invalid frame_range")

        if training:
            self.used_cam_ids = (list(range(self.view_num))
                                 if used_cam_ids is None else
                                 list(used_cam_ids))
            self.data_list = [(p, v) for p in self.pose_list
                              for v in self.used_cam_ids]
            self.filter_missing_files()

        self._precompute_smpl(smpl_model_path, precompute_device)

        # MANO hand crops for nerf-mode (template with_hand training) and
        # 3dgs synthesis items (ref: dataset_mv_rgb.py:94,231-236)
        from animatablegaussians_tpu.data import commons
        self.mano = commons.try_load_mano(mano_dir)
        if self.mano is not None:
            self._cano_mano = commons.generate_two_manos(
                self.mano, self.cano_smpl["vertices"])

    def _attach_mano(self, item: dict, live_verts: np.ndarray):
        """Canonical + live MANO items on nerf / synthesis items
        (ref: dataset_mv_rgb.py:231-236)."""
        if self.mano is None:
            return
        from animatablegaussians_tpu.data import commons
        lv, ln, rv, rn = self._cano_mano
        item.update(left_cano_mano_v=lv, left_cano_mano_n=ln,
                    right_cano_mano_v=rv, right_cano_mano_n=rn,
                    mano_face_closed=self.mano.mano_face_closed)
        lv, ln, rv, rn = commons.generate_two_manos(self.mano, live_verts)
        item.update(left_live_mano_v=lv, left_live_mano_n=ln,
                    right_live_mano_v=rv, right_live_mano_n=rn)

    # ------------------------------------------------------------------
    def _precompute_smpl(self, smpl_model_path, device: str):
        """One batched SMPL-X forward for all frames; caches numpy results."""
        import jax
        import jax.numpy as jnp
        from animatablegaussians_tpu.models.smplx import SMPLX

        path = smpl_model_path or os.path.join(
            agt_config.PROJ_DIR, "smpl_files", "smplx",
            "SMPLX_NEUTRAL.npz")
        self.smpl_model = SMPLX.from_npz(path, use_pca=False,
                                         flat_hand_mean=True)

        sd = self.smpl_data
        idx = np.asarray(self.pose_list, np.int64)
        betas = np.broadcast_to(sd["betas"][0:1], (len(idx),
                                                   sd["betas"].shape[-1]))

        def take(key, dim):
            if key in sd:
                return sd[key][idx]
            return np.zeros((len(idx), dim), np.float32)

        n_expr = int(self.smpl_model.data.expr_dirs.shape[-1])
        kw_live = dict(
            betas=betas,
            global_orient=take("global_orient", 3),
            transl=take("transl", 3),
            body_pose=take("body_pose", 63),
            jaw_pose=take("jaw_pose", 3),
            expression=take("expression", n_expr)[..., :n_expr],
            left_hand_pose=take("left_hand_pose", 45),
            right_hand_pose=take("right_hand_pose", 45),
        )
        kw_cano = dict(
            betas=betas,
            global_orient=np.broadcast_to(
                agt_config.CANO_SMPL_GLOBAL_ORIENT, (len(idx), 3)),
            transl=np.broadcast_to(
                agt_config.CANO_SMPL_TRANSL, (len(idx), 3)),
            body_pose=np.broadcast_to(
                agt_config.CANO_SMPL_BODY_POSE, (len(idx), 63)),
            jaw_pose=kw_live["jaw_pose"],
            expression=kw_live["expression"],
        )
        kw_woroot = dict(
            betas=betas,
            body_pose=kw_live["body_pose"],
            jaw_pose=kw_live["jaw_pose"],
            expression=kw_live["expression"],
        )

        cpu = jax.devices(device)[0]
        with jax.default_device(cpu):
            fwd = jax.jit(lambda kw: self.smpl_model(**kw))
            # chunk to bound peak memory on long sequences
            outs = {"live": [], "cano": [], "woroot": []}
            B = 512
            for s in range(0, len(idx), B):
                sl = slice(s, min(s + B, len(idx)))
                take_sl = lambda kw: {k: jnp.asarray(v[sl]) for k, v in
                                      kw.items()}
                outs["live"].append(fwd(take_sl(kw_live)))
                outs["cano"].append(fwd(take_sl(kw_cano)))
                outs["woroot"].append(fwd(take_sl(kw_woroot)))

        def cat(name, key):
            return np.concatenate([np.asarray(o[key]) for o in outs[name]])

        live_A = cat("live", "A")
        cano_A = cat("cano", "A")
        woroot_A = cat("woroot", "A")
        inv_cano_A = np.linalg.inv(cano_A)
        self._frame_of_pose = {p: i for i, p in enumerate(self.pose_list)}
        self.cano2live_jnt_mats = (live_A @ inv_cano_A).astype(np.float32)
        self.cano2live_jnt_mats_woRoot = (
            woroot_A @ inv_cano_A).astype(np.float32)
        self.live_vertices = cat("live", "vertices").astype(np.float32)
        self.live_joints = cat("live", "joints").astype(np.float32)
        self.cano_vertices_per_frame = cat("cano", "vertices").astype(
            np.float32)
        self.cano_joints_per_frame = cat("cano", "joints").astype(np.float32)
        self.live_vertices_woRoot = cat("woroot", "vertices").astype(
            np.float32)

        # static canonical body (no jaw/expr; ref: dataset_mv_rgb.py:77-92)
        with jax.default_device(cpu):
            ret = self.smpl_model(
                betas=jnp.asarray(betas[:1]),
                global_orient=jnp.asarray(
                    agt_config.CANO_SMPL_GLOBAL_ORIENT)[None],
                transl=jnp.asarray(agt_config.CANO_SMPL_TRANSL)[None],
                body_pose=jnp.asarray(agt_config.CANO_SMPL_BODY_POSE)[None])
        self.cano_smpl = {k: np.asarray(v[0]) for k, v in ret.items()}
        self.inv_cano_jnt_mats = np.linalg.inv(self.cano_smpl["A"])
        v = self.cano_smpl["vertices"]
        min_xyz, max_xyz = v.min(0), v.max(0)
        self.cano_smpl_center = 0.5 * (min_xyz + max_xyz)
        min_xyz = min_xyz - np.array([0.05, 0.05, 0.15], np.float32)
        max_xyz = max_xyz + np.array([0.05, 0.05, 0.15], np.float32)
        self.cano_bounds = np.stack([min_xyz, max_xyz]).astype(np.float32)
        self.smpl_faces = np.asarray(self.smpl_model.faces, np.int32)

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.data_list) if self.training else len(self.pose_list)

    def __getitem__(self, index):
        return self.getitem(index, self.training)

    def getitem(self, index, training=True, **kwargs):
        if training or kwargs.get("eval", False):
            pose_idx, view_idx = self.data_list[index]
            pose_idx = kwargs.get("pose_idx", pose_idx)
            view_idx = kwargs.get("view_idx", view_idx)
            data_idx = (pose_idx, view_idx)
        else:
            pose_idx = self.pose_list[index]
            view_idx = None
            data_idx = pose_idx

        f = self._frame_of_pose[pose_idx]
        item = dict(
            item_idx=index,
            data_idx=data_idx,
            time_stamp=np.float32(pose_idx),
            joints=self.live_joints[f, :22],
            kin_parent=np.asarray(
                self.smpl_model.data.parents[:22], np.int64),
            global_orient=self.smpl_data["global_orient"][pose_idx],
            transl=self.smpl_data["transl"][pose_idx],
            live_smpl_v=self.live_vertices[f],
            live_smpl_v_woRoot=self.live_vertices_woRoot[f],
            cano_smpl_v=self.cano_vertices_per_frame[f],
            cano_jnts=self.cano_joints_per_frame[f],
            cano2live_jnt_mats=self.cano2live_jnt_mats[f],
            cano2live_jnt_mats_woRoot=self.cano2live_jnt_mats_woRoot[f],
            cano_smpl_center=self.cano_smpl_center,
            cano_bounds=self.cano_bounds,
            smpl_faces=self.smpl_faces,
        )
        lv = self.live_vertices[f]
        item["live_bounds"] = np.stack([lv.min(0) - 0.15,
                                        lv.max(0) + 0.15]).astype(np.float32)

        if self.load_smpl_pos_map:
            m = _imread(os.path.join(self.data_dir, "smpl_pos_map",
                                     "%08d.exr" % pose_idx))
            half = m.shape[1] // 2
            item["smpl_pos_map"] = np.concatenate(
                [m[:, :half], m[:, half:]], axis=2).astype(np.float32)
        if self.load_smpl_nml_map:
            m = _imread(os.path.join(self.data_dir, "smpl_nml_map",
                                     "%08d.jpg" % pose_idx))
            m = (m / 255.0).astype(np.float32)
            half = m.shape[1] // 2
            item["smpl_nml_map"] = np.concatenate(
                [m[:, :half], m[:, half:]], axis=2)

        if training and kwargs.get("skip_images", False):
            # pose-map-only item (pretrain needs no camera images;
            # ref pretrain also only consumes pos maps, main_avatar.py:266-326)
            item.update(img_h=int(self.img_heights[view_idx]),
                        img_w=int(self.img_widths[view_idx]),
                        extr=self.extr_mats[view_idx],
                        intr=self.intr_mats[view_idx])
        elif training:
            color, mask = self.load_color_mask_images(pose_idx, view_idx)
            color = (color / 255.0).astype(np.float32)
            boundary, mask_bin = self.get_boundary_mask(mask)
            if self.mode == "3dgs":
                item.update(
                    img_h=color.shape[0], img_w=color.shape[1],
                    extr=self.extr_mats[view_idx],
                    intr=self.intr_mats[view_idx],
                    color_img=color,
                    mask_img=mask_bin.astype(np.float32),
                    boundary_mask_img=boundary.astype(np.float32))
            elif self.mode == "nerf":
                from animatablegaussians_tpu.utils import nerf as nerf_util
                rays = nerf_util.sample_rays_for_training(
                    color, mask_bin, self.extr_mats[view_idx],
                    self.intr_mats[view_idx], item["live_bounds"],
                    unsample_region_mask=boundary)
                item.update(nerf_random=rays,
                            extr=self.extr_mats[view_idx],
                            intr=self.intr_mats[view_idx])
            else:
                raise ValueError("Invalid dataset mode")
        else:
            item.update(
                img_h=kwargs.get("img_h", 512),
                img_w=kwargs.get("img_w", 512),
                intr=kwargs.get("intr", np.array(
                    [[550, 0, 256], [0, 550, 256], [0, 0, 1]], np.float32)),
                extr=kwargs.get("extr", self._default_front_extr(item)))
        if self.mode == "nerf" or (self.mode == "3dgs" and not training):
            self._attach_mano(item, self.live_vertices[f])
        return item

    def _default_front_extr(self, item):
        from animatablegaussians_tpu.utils import visualize as viz
        return viz.calc_front_mv(item["live_bounds"].mean(0),
                                 tar_pos=np.array([0, 0, 2.5], np.float32))

    # -- subclass hooks -------------------------------------------------
    def load_cam_data(self):
        raise NotImplementedError

    def load_smpl_data(self):
        """smpl_params.npz with body_pose/global_orient/transl/betas/...
        (ref: dataset_mv_rgb.py:255-259)."""
        raw = np.load(os.path.join(self.data_dir, "smpl_params.npz"),
                      allow_pickle=True)
        self.smpl_data = {k: np.asarray(v, np.float32)
                          for k, v in dict(raw).items()}

    def filter_missing_files(self):
        pass

    def load_color_mask_images(self, pose_idx, view_idx):
        raise NotImplementedError

    # ------------------------------------------------------------------
    @staticmethod
    def get_boundary_mask(mask: np.ndarray, kernel_size: int = 5):
        """Binarize at 128; boundary band = dilate - erode plus soft-matte
        pixels in (5, 250) (ref: dataset_mv_rgb.py:263-285)."""
        mask_bk = mask.copy()
        mask = np.where(mask > 128, 1, 0).astype(np.uint8)
        kernel = np.ones((kernel_size, kernel_size), np.uint8)
        if cv is not None:
            mask_erode = cv.erode(mask.copy(), kernel)
            mask_dilate = cv.dilate(mask.copy(), kernel)
        else:  # scipy fallback
            from scipy import ndimage
            mask_erode = ndimage.binary_erosion(
                mask, np.ones((kernel_size, kernel_size))).astype(np.uint8)
            mask_dilate = ndimage.binary_dilation(
                mask, np.ones((kernel_size, kernel_size))).astype(np.uint8)
        boundary = (mask_dilate - mask_erode) == 1
        boundary = np.logical_or(
            boundary, np.logical_and(mask_bk > 5, mask_bk < 250))
        return boundary, mask == 1

    # -- PCA pose-space projection (ref: dataset_mv_rgb.py:287-321) ------
    def compute_pca(self, n_components: int = 10):
        from sklearn.decomposition import PCA
        import joblib

        ckpt = os.path.join(self.data_dir, "smpl_pos_map",
                            "pca_%d.ckpt" % n_components)
        if not os.path.exists(ckpt):
            pose_conds, mask = [], None
            for pose_idx in self.pose_list:
                m = _imread(os.path.join(self.data_dir, "smpl_pos_map",
                                         "%08d.exr" % pose_idx))
                m = m[:, : m.shape[1] // 2]
                if mask is None:
                    mask = np.linalg.norm(m, axis=-1) > 1e-6
                pose_conds.append(m[mask])
            x = np.stack(pose_conds).reshape(len(pose_conds), -1)
            self.pca = PCA(n_components=n_components)
            self.pca.fit(x)
            joblib.dump(self.pca, ckpt)
            self.pos_map_mask = mask
        else:
            self.pca = joblib.load(ckpt)
            first = sorted(glob.glob(os.path.join(
                self.data_dir, "smpl_pos_map", "0*.exr")))[0]
            m = _imread(first)
            m = m[:, : m.shape[1] // 2]
            self.pos_map_mask = np.linalg.norm(m, axis=-1) > 1e-6

    def transform_pca(self, pose_conds: np.ndarray, sigma_pca: float = 2.0):
        x = pose_conds.reshape(1, -1)
        low = self.pca.transform(x)
        std = np.sqrt(self.pca.explained_variance_)
        low = np.clip(low, -sigma_pca * std, sigma_pca * std)
        return self.pca.inverse_transform(low).reshape(-1, 3)


# ---------------------------------------------------------------------------
# Dataset-format subclasses (ref: dataset_mv_rgb.py:324-500)
# ---------------------------------------------------------------------------

class MvRgbDatasetTHuman4(MvRgbDatasetBase):
    """calibration.json with cam%02d keys (ref: dataset_mv_rgb.py:347-360)."""

    def load_cam_data(self):
        with open(os.path.join(self.data_dir, "calibration.json")) as fp:
            cams = json.load(fp)
        self.view_num = len(cams)
        self.cam_names = ["cam%02d" % i for i in range(self.view_num)]
        self.extr_mats, self.intr_mats = [], []
        self.img_widths, self.img_heights = [], []
        for name in self.cam_names:
            e = np.identity(4, np.float32)
            e[:3, :3] = np.array(cams[name]["R"], np.float32).reshape(3, 3)
            e[:3, 3] = np.array(cams[name]["T"], np.float32)
            self.extr_mats.append(e)
            self.intr_mats.append(
                np.array(cams[name]["K"], np.float32).reshape(3, 3))
            self.img_widths.append(cams[name]["imgSize"][0])
            self.img_heights.append(cams[name]["imgSize"][1])

    def filter_missing_files(self):
        path = os.path.join(self.data_dir, "missing_img_files.txt")
        if not os.path.exists(path):
            return
        missing = set()
        for line in open(path):
            line = line.replace("\\", "/")
            frame = int(os.path.basename(line).replace(".jpg", ""))
            view = int(os.path.basename(
                os.path.dirname(line)).replace("cam", ""))
            missing.add((frame, view))
        self.data_list = [d for d in self.data_list if d not in missing]

    def load_color_mask_images(self, pose_idx, view_idx):
        color = _imread(os.path.join(
            self.data_dir, "images", "cam%02d" % view_idx,
            "%08d.jpg" % pose_idx))
        mask = _imread(os.path.join(
            self.data_dir, "masks", "cam%02d" % view_idx,
            "%08d.jpg" % pose_idx))
        return color, mask


class MvRgbDatasetAvatarReX(MvRgbDatasetBase):
    """calibration_full.json keyed by camera name
    (ref: dataset_mv_rgb.py:404-417)."""

    def load_cam_data(self):
        with open(os.path.join(self.data_dir,
                               "calibration_full.json")) as fp:
            cams = json.load(fp)
        self.cam_names = list(cams.keys())
        self.view_num = len(self.cam_names)
        self.extr_mats, self.intr_mats = [], []
        self.img_widths, self.img_heights = [], []
        for name in self.cam_names:
            e = np.identity(4, np.float32)
            e[:3, :3] = np.array(cams[name]["R"], np.float32).reshape(3, 3)
            e[:3, 3] = np.array(cams[name]["T"], np.float32)
            self.extr_mats.append(e)
            self.intr_mats.append(
                np.array(cams[name]["K"], np.float32).reshape(3, 3))
            self.img_widths.append(cams[name]["imgSize"][0])
            self.img_heights.append(cams[name]["imgSize"][1])

    def filter_missing_files(self):
        path = os.path.join(self.data_dir, "missing_img_files.txt")
        if not os.path.exists(path):
            return
        missing = set()
        for line in open(path):
            line = line.replace("\\", "/")
            frame = int(os.path.basename(line).replace(".jpg", ""))
            view = self.cam_names.index(os.path.basename(
                os.path.dirname(line)))
            missing.add((frame, view))
        self.data_list = [d for d in self.data_list if d not in missing]

    def load_color_mask_images(self, pose_idx, view_idx):
        name = self.cam_names[view_idx]
        color = _imread(os.path.join(self.data_dir, name,
                                     "%08d.jpg" % pose_idx))
        mask = _imread(os.path.join(self.data_dir, name, "mask", "pha",
                                    "%08d.jpg" % pose_idx))
        return color, mask


class MvRgbDatasetActorsHQ(MvRgbDatasetBase):
    """4x/calibration.csv; extrinsics are cam->world and get inverted
    (ref: dataset_mv_rgb.py:466-494)."""

    def __init__(self, data_dir, **kw):
        super().__init__(data_dir, **kw)
        if kw.get("subject_name") is None:
            self.subject_name = os.path.basename(os.path.dirname(data_dir))

    def load_cam_data(self):
        self.cam_names, self.extr_mats, self.intr_mats = [], [], []
        self.img_widths, self.img_heights = [], []
        with open(os.path.join(self.data_dir, "4x", "calibration.csv"),
                  newline="", encoding="utf-8") as fp:
            for row in csv.DictReader(fp):
                self.cam_names.append(row["name"])
                w, h = int(row["w"]), int(row["h"])
                self.img_widths.append(w)
                self.img_heights.append(h)
                e = np.identity(4, np.float32)
                rvec = np.array([float(row["rx"]), float(row["ry"]),
                                 float(row["rz"])], np.float32)
                e[:3, :3] = cv.Rodrigues(rvec)[0]
                e[:3, 3] = [float(row["tx"]), float(row["ty"]),
                            float(row["tz"])]
                self.extr_mats.append(np.linalg.inv(e))
                k = np.identity(3, np.float32)
                k[0, 0] = float(row["fx"]) * w
                k[0, 2] = float(row["px"]) * w
                k[1, 1] = float(row["fy"]) * h
                k[1, 2] = float(row["py"]) * h
                self.intr_mats.append(k)
        self.view_num = len(self.cam_names)

    def load_color_mask_images(self, pose_idx, view_idx):
        name = self.cam_names[view_idx]
        color = _imread(os.path.join(
            self.data_dir, "4x", "rgbs", name,
            "%s_rgb%06d.jpg" % (name, pose_idx)))
        mask = _imread(os.path.join(
            self.data_dir, "4x", "masks", name,
            "%s_mask%06d.png" % (name, pose_idx)))
        return color, mask


_DATASETS = {
    "MvRgbDatasetAvatarReX": MvRgbDatasetAvatarReX,
    "MvRgbDatasetTHuman4": MvRgbDatasetTHuman4,
    "MvRgbDatasetActorsHQ": MvRgbDatasetActorsHQ,
}


def get_dataset_class(name: str):
    """String -> class, replacing the reference's importlib hook
    (ref: main_avatar.py:267-268)."""
    return _DATASETS[name]
