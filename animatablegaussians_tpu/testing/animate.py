"""Novel-pose animation / test rendering.

Equivalent of the reference test driver (ref: main_avatar.py:525-776):
view settings camera/free/front/back/moving/cano (216-frame orbit, 1100-focal
1024^2 synthesis camera), pose-map regeneration for novel poses, PCA
projection of the front pose map with +-sigma clamping, mean-hand freezing,
and rgb/mask/tex-map/PLY export.

The render function is jitted once per image size; per-frame host work is
only camera math + PCA (sklearn, CPU).
"""

from __future__ import annotations

import math
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.utils import visualize as viz


def _rodrigues(v):
    return viz._rodrigues(np.asarray(v, np.float32))


def compute_view(view_setting: str, idx: int, object_center, global_orient,
                 dataset, opt_test: dict):
    """extr/intr/img size for one frame (ref: main_avatar.py:593-672)."""
    img_scale = float(opt_test.get("img_scale", 1.0))
    use_go = opt_test.get("global_orient", False)
    go = global_orient if use_go else None

    if view_setting == "camera":
        cam_id = opt_test["render_view_idx"]
        intr = dataset.intr_mats[cam_id].copy()
        intr[:2] *= img_scale
        extr = dataset.extr_mats[cam_id].copy()
        img_h = int(dataset.img_heights[cam_id] * img_scale)
        img_w = int(dataset.img_widths[cam_id] * img_scale)
        return extr, intr, img_w, img_h

    bird = view_setting.endswith("bird")
    if view_setting.startswith("free"):
        rot_y = (idx % 216) / 216.0 * 2 * np.pi
        rot_x = 0.3 if bird else 0.0
    elif view_setting.startswith("front"):
        rot_y, rot_x = 0.0, (0.3 if bird else 0.0)
    elif view_setting.startswith("back"):
        rot_y, rot_x = np.pi, (0.5 * np.pi / 4.0 if bird else 0.0)
    elif view_setting.startswith("moving"):
        rot_y, rot_x = 0.0, (0.3 if bird else 0.0)
    elif view_setting.startswith("cano"):
        extr = np.identity(4, np.float32)
        extr[:3, 3] = -np.asarray(object_center)
        rx = np.identity(4, np.float32)
        rx[:3, :3] = _rodrigues([np.pi, 0, 0])
        extr = rx @ extr
        f_len = 5000.0
        extr[2, 3] += f_len / 512
        intr = np.array([[f_len, 0, 512], [0, f_len, 512], [0, 0, 1]],
                        np.float32)
        return extr, intr, 1024, 1024
    else:
        raise ValueError(f"Invalid view setting: {view_setting}")

    extr = viz.calc_free_mv(object_center, tar_pos=np.array([0, 0, 2.5]),
                            rot_Y=rot_y, rot_X=rot_x, global_orient=go)
    intr = np.array([[1100, 0, 512], [0, 1100, 512], [0, 0, 1]], np.float32)
    intr[:2] *= img_scale
    s = int(1024 * img_scale)
    return extr, intr, s, s


def run_test(trainer, opt: dict):
    import cv2 as cv
    from animatablegaussians_tpu.data import get_dataset_class
    from animatablegaussians_tpu.data.pose_dataset import PoseDataset
    from animatablegaussians_tpu.models.gaussian_model import \
        save_gaussians_as_ply

    opt_test = opt["test"]
    avatar_net = trainer.avatar_net

    ds_cls = get_dataset_class(opt["train"].get(
        "dataset", "MvRgbDatasetAvatarReX"))
    training_dataset = ds_cls(**opt["train"]["data"], training=False)
    n_pca = int(opt_test.get("n_pca", -1))
    use_pca = n_pca >= 1
    if use_pca:
        training_dataset.compute_pca(n_components=n_pca)

    if "pose_data" in opt_test:
        dataset = PoseDataset(**opt_test["pose_data"],
                              smpl_shape=training_dataset.smpl_data[
                                  "betas"][0])
        dataset_name, seq_name = dataset.dataset_name, dataset.seq_name
    else:
        dataset = ds_cls(**opt_test["data"], training=False)
        dataset_name, seq_name = "training", ""
        use_pca = False

    if opt_test.get("prev_ckpt"):
        trainer.load_ckpt(opt_test["prev_ckpt"], load_optm=False)

    view_setting = opt_test.get("view_setting", "free")
    view_folder = ("cam_%03d" % opt_test["render_view_idx"]
                   if view_setting == "camera" else view_setting + "_view")
    output_dir = opt_test.get("output_dir") or os.path.join(
        "test_results", training_dataset.subject_name,
        f"{dataset_name}_{seq_name}_{view_folder}",
        "batch_%06d" % trainer.iter_idx,
        ("pca_%d_sigma_%.2f" % (n_pca, float(opt_test.get("sigma_pca", 1.0)))
         if use_pca else "vanilla"))
    os.makedirs(os.path.join(output_dir, "rgb_map"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "mask_map"), exist_ok=True)
    print(f"# Output dir: {output_dir}")

    item0 = (dataset.getitem_fast(0) if hasattr(dataset, "getitem_fast")
             else dataset.getitem(0, training=False))
    object_center = item0["live_bounds"].mean(0)
    global_orient = _rodrigues(np.asarray(item0["global_orient"]))

    hand_vals = None
    if opt_test.get("fix_hand", False):
        # hand Gaussians frozen to a fixed training frame's pose map
        # (ref: network/avatar.py:52-82, config key test.fix_hand_id)
        fid = int(opt_test.get("fix_hand_id", 0))
        from animatablegaussians_tpu.utils import exr
        m = exr.read_exr(os.path.join(
            opt["train"]["data"]["data_dir"], "smpl_pos_map",
            "%08d.exr" % fid))
        half = m.shape[1] // 2
        fix_pose_map = np.concatenate([m[:, :half], m[:, half:]],
                                      axis=2)[..., :3]
        hand_vals = avatar_net.generate_mean_hands(
            trainer.state.params, jnp.asarray(fix_pose_map, jnp.float32))

    params = trainer.state.params
    render_cache = {}

    def get_render(img_w, img_h):
        key = (img_w, img_h)
        if key not in render_cache:
            render_cache[key] = jax.jit(partial(
                avatar_net.render, img_w=img_w, img_h=img_h,
                use_pca=use_pca, hand_vals=hand_vals,
                bg_color=(1.0, 1.0, 1.0)))
        return render_cache[key]

    seq_cache = {}

    def get_render_seq(img_w, img_h):
        key = (img_w, img_h)
        if key not in seq_cache:
            seq_cache[key] = jax.jit(partial(
                avatar_net.render_sequence, img_w=img_w, img_h=img_h,
                use_pca=use_pca, hand_vals=hand_vals,
                bg_color=(1.0, 1.0, 1.0)))
        return seq_cache[key]

    pose_map_fn = jax.jit(avatar_net.get_pose_map)

    # Frame-batched dispatch: stage F frames' host work (camera math, item
    # build, PCA), then render them all in ONE lax.map dispatch
    # (AvatarNet.render_sequence) — amortizes per-frame dispatch overhead
    # on the sequential animation workload. Falls back to per-frame calls
    # when a consumer needs render outputs the sequence path drops (tex
    # map, posed-Gaussian PLY). seq_frames=1 disables batching.
    seq_frames = int(opt_test.get("seq_frames", 8))
    if opt_test.get("save_tex_map", False) or opt_test.get("save_ply",
                                                           False):
        seq_frames = 1

    def prepare(idx):
        nonlocal object_center
        extr, intr, img_w, img_h = compute_view(
            view_setting, idx, object_center, global_orient, dataset,
            opt_test)
        getitem = (dataset.getitem_fast if hasattr(dataset, "getitem_fast")
                   else partial(dataset.getitem, training=False))
        item = getitem(idx, extr=extr, intr=intr, img_w=img_w, img_h=img_h)

        if view_setting.startswith("moving") or view_setting == "free_moving":
            cur = np.asarray(item["live_bounds"]).mean(0)
            object_center[0] += (cur - object_center)[0]

        items = {k: jnp.asarray(v) for k, v in item.items()
                 if isinstance(v, (np.ndarray, np.floating, np.integer,
                                   float, int))
                 and k not in ("img_w", "img_h")}
        if "smpl_pos_map" not in items:
            items["smpl_pos_map"] = pose_map_fn(items)

        if use_pca:
            mask = training_dataset.pos_map_mask
            live_pos_map = np.asarray(items["smpl_pos_map"])
            front, back = np.split(live_pos_map, [3], 2)
            new_conds = training_dataset.transform_pca(
                front[mask], sigma_pca=float(opt_test.get("sigma_pca", 2.0)))
            front = front.copy()
            front[mask] = new_conds
            items["smpl_pos_map_pca"] = jnp.asarray(
                np.concatenate([front, back], 2))
        return item, items, extr, intr, img_w, img_h

    idx = 0
    n_frames = len(dataset)
    while idx < n_frames:
        # stage up to seq_frames frames that share an image size
        staged = [prepare(idx)]
        size = staged[0][4:6]
        while (len(staged) < seq_frames and idx + len(staged) < n_frames):
            nxt = prepare(idx + len(staged))
            if nxt[4:6] != size:
                break
            staged.append(nxt)

        if len(staged) > 1:
            keys = staged[0][1].keys()
            items_seq = {k: jnp.stack([s[1][k] for s in staged])
                         for k in keys}
            seq_out = get_render_seq(*size)(params, items_seq)
            outputs = [{k: v[f] for k, v in seq_out.items()}
                       for f in range(len(staged))]
        else:
            outputs = [get_render(*size)(params, staged[0][1])]

        for (item, items, extr, intr, img_w, img_h), output in zip(
                staged, outputs):
            _write_frame(item, items, extr, intr, img_w, img_h, output,
                         output_dir, opt_test, trainer)
        idx += len(staged)

    return output_dir


def _write_frame(item, items, extr, intr, img_w, img_h, output,
                 output_dir, opt_test, trainer):
    import cv2 as cv

    from animatablegaussians_tpu.models.gaussian_model import \
        save_gaussians_as_ply

    rgb = np.clip(np.asarray(output["rgb_map"]), 0, 1)
    cv.imwrite(os.path.join(output_dir, "rgb_map",
                            "%08d.jpg" % item["data_idx"]),
               (rgb * 255).astype(np.uint8))
    mask = np.clip(np.asarray(output["mask_map"]), 0, 1)
    cv.imwrite(os.path.join(output_dir, "mask_map",
                            "%08d.png" % item["data_idx"]),
               (mask * 255).astype(np.uint8))
    if opt_test.get("save_tex_map", False):
        os.makedirs(os.path.join(output_dir, "cano_tex_map"),
                    exist_ok=True)
        tex = np.clip(np.asarray(output["cano_tex_map"]), 0, 1)
        cv.imwrite(os.path.join(output_dir, "cano_tex_map",
                                "%08d.jpg" % item["data_idx"]),
                   (tex * 255).astype(np.uint8))
    if opt_test.get("render_skeleton", False):
        # ball+cylinder skeleton overlay, phong-shaded on white
        # (ref: main_avatar.py:699-711)
        from animatablegaussians_tpu.utils.mesh_renderer import Renderer
        from animatablegaussians_tpu.utils.visualize_skeletons import \
            construct_skeletons
        from animatablegaussians_tpu.data.commons import _vertex_normals
        skel_v, skel_f = construct_skeletons(
            np.asarray(item["joints"]), np.asarray(item["kin_parent"]))
        normals = _vertex_normals(skel_v, skel_f)
        geo = Renderer(img_w, img_h, shader_name="phong_geometry",
                       bg_color=(1, 1, 1))
        geo.set_camera(extr, intr)
        geo.set_model(skel_v[skel_f.reshape(-1)],
                      normals[skel_f.reshape(-1)])
        skel_img = np.clip(geo.render()[:, :, :3], 0, 1)
        os.makedirs(os.path.join(output_dir, "live_skeleton"),
                    exist_ok=True)
        cv.imwrite(os.path.join(output_dir, "live_skeleton",
                                "%08d.jpg" % item["data_idx"]),
                   (skel_img * 255).astype(np.uint8))

    if opt_test.get("save_ply", False):
        os.makedirs(os.path.join(output_dir, "posed_gaussians"),
                    exist_ok=True)
        # drop the block-packing pad points (statically invalid)
        vmask = np.asarray(trainer.avatar_net.valid_np)
        save_gaussians_as_ply(
            os.path.join(output_dir, "posed_gaussians",
                         "%08d.ply" % item["data_idx"]),
            {k: (np.asarray(v)[vmask]
                 if np.ndim(v) > 0 and np.shape(v)[0] == vmask.shape[0]
                 else np.asarray(v))
             for k, v in output["posed_gaussians"].items()
             if not np.isscalar(v)})
