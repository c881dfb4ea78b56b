"""AvatarTrainer driver: config -> dataset -> jitted steps -> epochs.

Orchestration equivalent of the reference trainer (ref: main_avatar.py:37-523)
re-built around pure jitted step functions:

  * pretrain phase (5k iters) then main loop (800k) with cosine LR;
  * data-parallel over the device mesh when >1 device is present
    (per-chip batch 1, grad pmean — the reference is strictly 1 GPU);
  * TensorBoard scalars + loss.txt mirror every ``log_interval``
    (ref: main_avatar.py:375-410), config backup, param-count print;
  * mini-test JPG snapshots every eval_interval (ref: main_avatar.py:444-523);
  * rotating batch_%d / epoch_latest checkpoints (ref: main_avatar.py:420-442).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime
from typing import Optional

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from animatablegaussians_tpu import config as agt_config
from animatablegaussians_tpu.training import avatar_trainer as at
from animatablegaussians_tpu.training import checkpoint as ck


class AvatarTrainer:
    PATCH_SIZE = 512
    ITER_NUM = 800_000       # ref: main_avatar.py:42
    PRETRAIN_ITERS = 5_000   # ref: main_avatar.py:321-326

    def __init__(self, opt: dict, lpips_params: Optional[dict] = None):
        self.opt = opt
        self.lr_init = float(opt["train"].get("lr_init", 5e-4))
        self.loss_weight = opt["train"]["loss_weight"]
        self.finetune_color = opt["train"].get("finetune_color", False)
        self.random_bg_color = opt["train"].get("random_bg_color", True)
        self.net_ckpt_dir = opt["train"].get("net_ckpt_dir", "./results")
        self.ckpt_interval = opt["train"].get(
            "ckpt_interval", dict(epoch=10, batch=50_000))
        self.eval_interval = opt["train"].get("eval_interval", 1000)
        self.log_interval = 10
        if lpips_params is None:
            # auto-resolve (hard error if lpips weight > 0 and no weights;
            # the reference always trains with its vendored LPIPS,
            # ref: main_avatar.py:341-344)
            from animatablegaussians_tpu.training.lpips import (
                resolve_lpips_params)
            lpips_params = resolve_lpips_params(opt)
        self.lpips_params = lpips_params
        self.iter_idx = 0

        # dataset
        from animatablegaussians_tpu.data import get_dataset_class
        ds_cls = get_dataset_class(opt["train"].get(
            "dataset", "MvRgbDatasetAvatarReX"))
        self.dataset = ds_cls(**opt["train"]["data"])

        # model from the canonical pos map (ref: network/avatar.py:26-32)
        data_dir = opt["train"]["data"]["data_dir"]
        self.avatar_net = self._build_net(data_dir, opt.get("model", {}))
        self.params = self.avatar_net.init(jax.random.PRNGKey(31359))

        img_w = int(self.dataset.img_widths[self.dataset.used_cam_ids[0]])
        img_h = int(self.dataset.img_heights[self.dataset.used_cam_ids[0]])
        self.img_w, self.img_h = img_w, img_h

        # Two-pass binning-cap sizing (count pass -> static caps -> compile):
        # the CUDA reference sizes its pair buffers dynamically per frame and
        # never drops (rasterizer_impl.cu:278-309); the TPU static-shape
        # answer is to measure the subject's canonical-init workload over
        # sample frames and compile with covering caps. Drift past the
        # margin at train time trips the loud n_overflow warning below.
        self._autosize_kw = dict(
            margin=float(opt.get("model", {}).get("autosize_margin", 1.5)),
            ragged=opt.get("model", {}).get("raster_ragged", None))
        if opt.get("model", {}).get("autosize_raster", True):
            self._autosize_raster(**self._autosize_kw)

        self.optimizer = at.make_optimizer(
            self.lr_init, self.ITER_NUM, finetune_color=self.finetune_color)
        self.state = at.TrainState(self.params,
                                   self.optimizer.init(self.params),
                                   jnp.zeros((), jnp.int32))

        n_params = sum(int(np.prod(np.asarray(x).shape))
                       for x in jax.tree.leaves(self.params))
        print(f"# Parameter number of AvatarNet is {n_params}")

        # data parallelism over (pose, view) items: one item per device,
        # grads pmean-ed over the mesh (the reference is strictly one GPU,
        # SURVEY.md §2.9). Falls back to single-device when the dataset is
        # smaller than the mesh.
        self.n_devices = len(jax.devices())
        self.use_dp = (self.n_devices > 1
                       and len(self.dataset) >= self.n_devices)
        step_kw = dict(loss_weight=self.loss_weight,
                       lpips_params=self.lpips_params,
                       random_bg_color=self.random_bg_color,
                       patch_size=self.PATCH_SIZE, img_w=img_w, img_h=img_h)
        # scan_steps > 1: compile N sequential steps into one program
        # (one dispatch per N optimizer steps; material when per-execute
        # overhead is — see bench.py --scan). 1 = classic per-step
        # dispatch. Composes with DP: the scan runs inside the shard_map
        # body, so one dispatch covers N steps x n_devices examples.
        self.scan_steps = int(self.opt["train"].get("scan_steps", 1))
        if self.use_dp and self.scan_steps > 1:
            # the loader drops incomplete batches; a scan needs
            # n_devices * scan_steps items per dispatch
            max_scan = max(1, len(self.dataset) // self.n_devices)
            if self.scan_steps > max_scan:
                print(f"# scan_steps {self.scan_steps} -> {max_scan} "
                      f"(dataset of {len(self.dataset)} items over "
                      f"{self.n_devices} devices)")
                self.scan_steps = max_scan
        self._step_kw = step_kw
        self.mesh = None
        if self.use_dp:
            from animatablegaussians_tpu.parallel import data_parallel as dp
            self.mesh = dp.make_mesh()
        self._build_train_step()
        self.pretrain_step = at.make_pretrain_step(
            self.avatar_net,
            at.make_optimizer(5e-4, self.PRETRAIN_ITERS))

    def _build_train_step(self):
        """(Re)compile the train step against the net's CURRENT raster
        config — called at init and by the overflow self-healing path."""
        step_kw = self._step_kw
        if self.use_dp:
            from animatablegaussians_tpu.parallel import data_parallel as dp
            per_example = at.make_train_step(
                self.avatar_net, self.optimizer, axis_name=dp.AXIS,
                **step_kw)
            if self.scan_steps > 1:
                self.train_step = dp.make_dp_train_scan(per_example,
                                                        self.mesh)
                print(f"# Data-parallel over {self.n_devices} devices x "
                      f"lax.scan over {self.scan_steps} steps/dispatch")
            else:
                self.train_step = dp.make_dp_train_step(per_example,
                                                        self.mesh)
                print(f"# Data-parallel over {self.n_devices} devices "
                      f"(per-chip batch 1, grad pmean)")
        else:
            if self.scan_steps > 1:
                self.train_step = at.make_train_scan_batched(
                    at.make_train_step(self.avatar_net, self.optimizer,
                                       jit=False, **step_kw))
                print(f"# lax.scan over {self.scan_steps} steps/dispatch")
            else:
                self.train_step = at.make_train_step(
                    self.avatar_net, self.optimizer, **step_kw)

    @staticmethod
    def _build_net(data_dir: str, model_opt: dict):
        # `model.module` hook: an importable module exposing an AvatarNet
        # class with the same constructor contract (ref: main_avatar.py:45-47
        # imports the net module named by the config, default network.avatar)
        import importlib
        avatar_module = model_opt.get(
            "module", "animatablegaussians_tpu.models.avatar")
        AvatarNet = importlib.import_module(avatar_module).AvatarNet
        from animatablegaussians_tpu.utils import exr
        cano_map = exr.read_exr(
            os.path.join(data_dir, "smpl_pos_map", "cano_smpl_pos_map.exr"))
        lbs = np.load(os.path.join(data_dir, "smpl_pos_map",
                                   "init_pts_lbs.npy"))
        nml = None
        if model_opt.get("with_viewdirs", True):
            nml = exr.read_exr(
                os.path.join(data_dir, "smpl_pos_map",
                             "cano_smpl_nml_map.exr"))
        return AvatarNet(model_opt, cano_map, lbs, cano_nml_map=nml)

    def _autosize_raster(self, n_sample: int = 4, margin: float = 1.5,
                         ragged: bool | None = None, extra_items=()):
        """Count-only pass over sample frames -> static caps (see
        ops/rasterize/autosize.py). Uses the net's actual init scales.
        ``ragged`` (config key model.raster_ragged) picks the binning
        layout (None = auto by padded slot count). ``extra_items``: poses
        that must also be covered (the overflow self-healing path feeds the
        cap-busting item back in)."""
        from animatablegaussians_tpu.ops.rasterize import autosize as az
        n = len(self.dataset)
        idxs = sorted({int(i)
                       for i in np.linspace(0, n - 1, min(n_sample, n))})
        items = [self.dataset.getitem(i, training=True, skip_images=True)
                 for i in idxs]
        items += list(extra_items)
        # current trained canonical scales once a TrainState exists (the
        # healing path); the init copy before that
        params = self.state.params if hasattr(self, "state") else self.params
        cfg = az.autosize_for_avatar(
            self.avatar_net, items, self.img_w, self.img_h,
            scales=jnp.exp(jnp.asarray(
                jax.device_get(params["cano_gaussian"].scaling))),
            margin=margin, ragged=ragged)
        old = self.avatar_net.raster_config
        self.avatar_net.raster_config = cfg
        print(f"# Auto-sized raster caps: max_dup {old.max_dup}->"
              f"{cfg.max_dup}, k_max {old.k_max}->{cfg.k_max}, "
              f"max_active_tiles {old.max_active_tiles}->"
              f"{cfg.max_active_tiles}, n_chunks {cfg.n_chunks}")

    def _heal_overflow(self, batch):
        """Never train on cropped gradients: the step that overflowed
        discarded its own update (avatar_trainer.make_train_step gates on
        OVERFLOW_TOL), so re-measure caps WITH the cap-busting pose folded
        in, recompile the step, and let the caller re-run the same batch —
        the TPU static-shape analogue of the CUDA reference's per-frame
        dynamic buffer resize (ref: rasterizer_impl.cu:278-309)."""
        need = ("cano2live_jnt_mats", "extr", "intr")
        sub = {k: np.asarray(jax.device_get(batch[k])) for k in need}
        lead = sub["cano2live_jnt_mats"].ndim - 3  # item mats are (J, 4, 4)
        if lead:
            flat = {k: v.reshape((-1,) + v.shape[lead:])
                    for k, v in sub.items()}
            items = [{k: v[i] for k, v in flat.items()}
                     for i in range(len(flat["extr"]))]
        else:
            items = [sub]
        self._autosize_raster(extra_items=items, **self._autosize_kw)
        self._build_train_step()

    # ------------------------------------------------------------------
    def _items_to_device(self, item: dict) -> dict:
        drop = {"img_w", "img_h", "item_idx", "data_idx", "smpl_faces",
                "kin_parent"}
        return {k: jnp.asarray(v) for k, v in item.items() if k not in drop}

    def pretrain(self):
        """(ref: main_avatar.py:266-326). Single-device phase: pose-map
        regression is seconds per 100 iters; keep it off the mesh."""
        self.state = jax.device_get(self.state)  # host round trip (see train)
        state = at.TrainState(
            self.state.params,
            at.make_optimizer(5e-4, self.PRETRAIN_ITERS).init(
                self.state.params),
            jnp.zeros((), jnp.int32))
        n = len(self.dataset)
        for it in range(self.PRETRAIN_ITERS):
            # pose-map-only items: no camera image decode in this phase
            # (ref pretrain also only reads pos maps, main_avatar.py:266-326)
            item = self.dataset.getitem(it % n, training=True,
                                        skip_images=True)
            pose_map = jnp.asarray(item["smpl_pos_map"][..., :3])
            state, losses = self.pretrain_step(state, pose_map)
            if it % 100 == 0:
                msg = ", ".join(f"{k}: {float(v):.4f}"
                                for k, v in losses.items())
                print(f"Pretrain iter {it}: {msg}")
        self.state = at.TrainState(state.params, self.state.opt_state,
                                   self.state.iter_idx)
        out = os.path.join(self.net_ckpt_dir, "pretrained")
        ck.save_checkpoint(out, self.state.params)

    def train(self, num_epochs: int = 10**9):
        from animatablegaussians_tpu.data.loader import PrefetchLoader

        os.makedirs(self.net_ckpt_dir, exist_ok=True)
        with open(os.path.join(self.net_ckpt_dir, "config_bk.yaml"),
                  "w") as fp:
            yaml.dump(self.opt, fp)
        log_dir = os.path.join(
            self.net_ckpt_dir,
            datetime.now().strftime("%Y_%m_%d_%H_%M_%S"))
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir)
        except Exception:
            writer = None
        loss_txt = open(os.path.join(self.net_ckpt_dir, "loss.txt"), "a")

        batch_size = (self.n_devices * self.scan_steps if self.use_dp
                      else self.scan_steps)
        if self.use_dp:
            from animatablegaussians_tpu.parallel import data_parallel as dp
            drop = {"img_w", "img_h", "item_idx", "data_idx", "smpl_faces",
                    "kin_parent"}
            n_dev, n_scan = self.n_devices, self.scan_steps

            def put(b):
                b = {k: v for k, v in b.items() if k not in drop}
                if n_scan > 1:   # (n_dev*n_scan, ...) -> (n_dev, n_scan, ...)
                    b = {k: v.reshape((n_dev, n_scan) + v.shape[1:])
                         for k, v in b.items()}
                return dp.shard_batch(self.mesh, b)
            # params/opt state start on host (init / ckpt load / pretrain);
            # the jitted dp step's in_shardings replicate them on first call
            self.state = jax.device_get(self.state)
        else:
            put = None
        loader = PrefetchLoader(self.dataset, batch_size=batch_size,
                                shuffle=True, device_put_fn=put,
                                num_threads=self.opt["train"].get(
                                    "num_workers", 8))
        rng = jax.random.PRNGKey(31359)
        smooth: dict = {}
        epoch_idx = 0
        t0 = time.time()
        while self.iter_idx < self.ITER_NUM and epoch_idx < num_epochs:
            epoch_idx += 1
            for batch in loader:

                def run_batch():
                    nonlocal rng
                    if self.use_dp:
                        rng, sub = jax.random.split(rng)
                        rngs = jax.random.split(
                            sub, self.n_devices * self.scan_steps)
                        if self.scan_steps > 1:
                            rngs = rngs.reshape(self.n_devices,
                                                self.scan_steps,
                                                *rngs.shape[1:])
                        self.state, terms = self.train_step(self.state,
                                                            batch, rngs)
                    elif self.scan_steps > 1:
                        items = self._items_to_device(batch)  # (n,) axis
                        rng, sub = jax.random.split(rng)
                        keys = jax.random.split(sub, self.scan_steps)
                        self.state, terms = self.train_step(self.state,
                                                            items, keys)
                    else:
                        item = {k: v[0] for k, v in batch.items()}
                        items = self._items_to_device(item)
                        rng, step_rng = jax.random.split(rng)
                        self.state, terms = self.train_step(self.state,
                                                            items, step_rng)
                    return terms

                # Overflow self-healing: the step DISCARDS its own update
                # when the static binning caps materially overflow (cropped
                # image + cropped gradients; the CUDA reference never drops,
                # rasterizer_impl.cu:281-286), so on detection re-autosize
                # with the cap-busting pose folded in, recompile, and re-run
                # the identical batch from the untouched state.
                terms = run_batch()
                of_frac = float(jnp.max(
                    terms.get("n_overflow", jnp.zeros(()))
                    / jnp.maximum(terms.get("n_pairs", jnp.ones(())), 1.0)))
                if of_frac > at.OVERFLOW_TOL:
                    print(f"WARNING: binning caps dropped "
                          f"{100.0 * of_frac:.2f}% > "
                          f"{100.0 * at.OVERFLOW_TOL:.2f}% of "
                          f"(gaussian, tile) pairs — update discarded; "
                          f"re-autosizing caps and recompiling")
                    self._heal_overflow(batch)
                    terms = run_batch()
                    of_frac = float(jnp.max(
                        terms.get("n_overflow", jnp.zeros(()))
                        / jnp.maximum(terms.get("n_pairs", jnp.ones(())),
                                      1.0)))
                    if of_frac > at.OVERFLOW_TOL:
                        raise RuntimeError(
                            "binning caps still overflow after re-autosize "
                            f"({100.0 * of_frac:.2f}%) — raise "
                            "autosize_margin")
                if self.scan_steps > 1:
                    terms = {k: v[-1] for k, v in terms.items()}
                self.iter_idx = int(self.state.iter_idx)

                # `< scan_steps` == `== 0` at scan_steps 1; with scans the
                # counter advances N per call, so fire when a multiple of
                # the interval was crossed this call.
                if self.iter_idx % self.log_interval < self.scan_steps:
                    terms = {k: float(v) for k, v in terms.items()}
                    for k, v in terms.items():
                        smooth[k] = smooth.get(k, v) * 0.9 + v * 0.1
                        if writer:
                            writer.add_scalar(f"losses/{k}", smooth[k],
                                              self.iter_idx)
                    dt = time.time() - t0
                    msg = (f"Iter {self.iter_idx} ({dt:.1f}s): " +
                           ", ".join(f"{k}: {v:.4f}"
                                     for k, v in smooth.items()))
                    print(msg)
                    loss_txt.write(msg + "\n")
                    loss_txt.flush()

                if self.iter_idx % self.eval_interval < self.scan_steps:
                    self.mini_test()
                if self.iter_idx % self.ckpt_interval["batch"] \
                        < self.scan_steps:
                    d = os.path.join(self.net_ckpt_dir,
                                     f"batch_{self.iter_idx}")
                    self.save_ckpt(d)
                    ck.rotate_checkpoints(self.net_ckpt_dir)
            self.save_ckpt(os.path.join(self.net_ckpt_dir, "epoch_latest"))
        loss_txt.close()

    # ------------------------------------------------------------------
    def mini_test(self):
        """One fixed training pose/view + one testing pose/view to JPG,
        side by side with GT (ref: main_avatar.py:444-523; ids come from
        eval_training_ids / eval_testing_ids as (pose_idx, view_idx))."""
        import cv2 as cv
        out_dir = os.path.join(self.net_ckpt_dir, "eval")
        os.makedirs(out_dir, exist_ok=True)
        specs = [("training",
                  self.opt["train"].get("eval_training_ids", [0, 0])),
                 ("testing", self.opt["train"].get("eval_testing_ids"))]
        for tag, ids in specs:
            if ids is None:
                continue
            pose_idx, view_idx = (int(ids[0]), int(ids[1])) \
                if len(ids) > 1 else (int(ids[0]), 0)
            try:
                item = self.dataset.getitem(0, training=True,
                                            pose_idx=pose_idx,
                                            view_idx=view_idx, eval=True)
            except FileNotFoundError:
                continue  # frame missing on disk — anything else must raise
            items = self._items_to_device(item)
            params = (jax.device_get(self.state.params) if self.use_dp
                      else self.state.params)  # eval runs on the host device
            out = self.avatar_net.render(
                params, items, bg_color=(1.0, 1.0, 1.0),
                img_w=self.img_w, img_h=self.img_h)
            rgb = np.clip(np.asarray(out["rgb_map"]), 0, 1)
            gt = np.asarray(item["color_img"])
            side = np.concatenate([rgb, gt], axis=1)
            cv.imwrite(os.path.join(
                out_dir, f"{tag}_{self.iter_idx}.jpg"),
                (side * 255).astype(np.uint8))

    def save_ckpt(self, path: str):
        ck.save_checkpoint(path, self.state,
                           extra=dict(iter_idx=self.iter_idx))

    def load_ckpt(self, path: str, load_optm: bool = True):
        if load_optm:
            self.state, meta = ck.load_checkpoint(path, self.state)
        else:
            if not os.path.exists(os.path.join(path, "state.npz")):
                # a typo'd pretrained path must not silently train from
                # random init (ref resume precedence: main_avatar.py:346-366)
                raise FileNotFoundError(
                    f"checkpoint not found: {os.path.join(path, 'state.npz')}")
            params, meta = ck.load_checkpoint(path, self.state.params)
            self.state = at.TrainState(params, self.state.opt_state,
                                       self.state.iter_idx)
        self.iter_idx = int(meta.get("iter_idx", 0))
