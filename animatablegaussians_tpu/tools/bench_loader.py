"""Loader-fed trainer throughput at bench scale.

The device-only bench (bench.py) feeds one device-resident item forever;
real training must decode a 1500x2048 JPEG + mask + EXR pose map per item
AND overlap that host work with device compute — the reference hides all of
it in torch DataLoader workers (ref: main_avatar.py:273-277, num_workers=8).
This benchmark closes that gap with a measurement:

  1. writes a synthetic ON-DISK dataset at AvatarReX sizes (color JPEG
     1500x2048 q90, mask JPEG, pose-map EXR 512^2 x6 — the formats the real
     AvatarReX loader decodes, AVATARREX_DATASET.md);
  2. per __getitem__ does the REAL per-item host work: native libjpeg
     decode (color + mask), native boundary-mask morphology, EXR pose-map
     read, f32 conversion;
  3. runs the REAL jitted train step fed by data.loader.PrefetchLoader
     (thread pool + device prefetch queue) and reports steady-state it/s
     to compare against the device-only number.

Run on the chip:  python -m animatablegaussians_tpu.tools.bench_loader
Options: --frames N (dataset size, default 24), --steps N (timed steps,
default 40), --threads N (decoder threads, default 8), --batch B (batched
step; loader batch B feeding make_train_step_batched).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_dataset(root: str, n_frames: int, img_w: int, img_h: int,
                  map_h: int, seed: int = 0) -> None:
    """Synthetic frames at AvatarReX scale, written once and reused."""
    import cv2 as cv

    from animatablegaussians_tpu.utils import exr, synthetic

    stamp = os.path.join(root, f"done_{n_frames}_{img_w}x{img_h}_{map_h}")
    if os.path.exists(stamp):
        return
    os.makedirs(root, exist_ok=True)
    pos, _, _ = synthetic.make_cano_map(map_h=map_h)
    rng = np.random.default_rng(seed)
    metas = {}
    for f in range(n_frames):
        items = synthetic.make_items(img_w=img_w, img_h=img_h, seed=f,
                                     cano_pos_map=pos)
        # photographic-complexity color content (flat synthetics would make
        # the JPEG decode unrealistically cheap)
        noise = rng.standard_normal((img_h // 8, img_w // 8, 3))
        tex = cv.resize(noise, (img_w, img_h),
                        interpolation=cv.INTER_CUBIC)
        color = np.clip(0.5 + 0.25 * tex, 0, 1)
        cv.imwrite(os.path.join(root, f"color_{f:04d}.jpg"),
                   (color * 255).astype(np.uint8),
                   [cv.IMWRITE_JPEG_QUALITY, 90])
        mask = (np.asarray(items["mask_img"]) * 255).astype(np.uint8)
        cv.imwrite(os.path.join(root, f"mask_{f:04d}.jpg"), mask)
        exr.write_exr(os.path.join(root, f"pose_{f:04d}.exr"),
                      np.asarray(items["smpl_pos_map"], np.float32))
        metas[f"extr_{f}"] = np.asarray(items["extr"])
        metas[f"intr_{f}"] = np.asarray(items["intr"])
        metas[f"mats_{f}"] = np.asarray(items["cano2live_jnt_mats"])
    np.savez(os.path.join(root, "meta.npz"), **metas)
    open(stamp, "w").close()


class DiskDataset:
    """__getitem__ = the real AvatarReX per-item host pipeline: JPEG decode
    (native libjpeg), boundary-mask morphology (native), EXR pose map."""

    def __init__(self, root: str, n_frames: int):
        self.root = root
        self.n = n_frames
        self.meta = dict(np.load(os.path.join(root, "meta.npz")))

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> dict:
        from animatablegaussians_tpu.data import native_io
        from animatablegaussians_tpu.utils import exr

        color = native_io.decode_jpeg(
            os.path.join(self.root, f"color_{i:04d}.jpg"))
        mask_raw = native_io.decode_jpeg(
            os.path.join(self.root, f"mask_{i:04d}.jpg"), grayscale=True)
        boundary, binarized = native_io.boundary_mask(mask_raw)
        pose = exr.read_exr(os.path.join(self.root, f"pose_{i:04d}.exr"))
        return dict(
            color_img=color.astype(np.float32) / 255.0,
            mask_img=binarized.astype(np.float32),
            boundary_mask_img=boundary.astype(np.float32),
            smpl_pos_map=np.asarray(pose, np.float32),
            extr=self.meta[f"extr_{i}"],
            intr=self.meta[f"intr_{i}"],
            cano2live_jnt_mats=self.meta[f"mats_{i}"],
        )


def main() -> int:
    def argint(flag, default):
        if flag in sys.argv:
            i = sys.argv.index(flag)
            return int(sys.argv[i + 1])
        return default

    n_frames = argint("--frames", 24)
    n_steps = argint("--steps", 40)
    n_threads = argint("--threads", 8)
    batch_n = argint("--batch", 0)
    warm = 6

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench as bench_mod

    import jax
    import jax.numpy as jnp

    from animatablegaussians_tpu.data.loader import PrefetchLoader
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random

    img_w, img_h, map_h = bench_mod.IMG_W, bench_mod.IMG_H, bench_mod.MAP_H
    root = os.environ.get("AGT_LOADER_DS", "/tmp/agt_loader_ds")
    t0 = time.perf_counter()
    build_dataset(root, n_frames, img_w, img_h, map_h)
    print(f"dataset at {root} ({n_frames} frames, "
          f"{time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    # reuse bench's exact setup (zeroed heads, autosized ragged caps) so
    # the device compute is IDENTICAL to the device-only number
    net, params, _ = bench_mod._setup()

    optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
    state = at.TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))
    kw = dict(loss_weight=dict(l1=1.0, lpips=0.1, offset=0.005),
              lpips_params=init_random(jax.random.PRNGKey(7)),
              patch_size=512, img_w=img_w, img_h=img_h)

    ds = DiskDataset(root, n_frames)
    loader = PrefetchLoader(ds, batch_size=max(batch_n, 1), shuffle=True,
                            num_threads=n_threads, prefetch=2)
    rng = jax.random.PRNGKey(0)

    if batch_n:
        step = at.make_train_step_batched(net, optimizer, **kw)

        def run(state, batch, i):
            b = {k: jnp.asarray(v) for k, v in batch.items()}
            rngs = jax.random.split(jax.random.fold_in(rng, i), batch_n)
            return step(state, b, rngs)
    else:
        step = at.make_train_step(net, optimizer, **kw)

        def run(state, batch, i):
            items = {k: jnp.asarray(v[0]) for k, v in batch.items()}
            return step(state, items, jax.random.fold_in(rng, i))

    done = 0
    t_start = None
    items_per_step = max(batch_n, 1)
    while done < n_steps + warm:
        for batch in loader:
            state, terms = run(state, batch, done)
            done += 1
            if done == warm:
                jax.block_until_ready(state.params)
                t_start = time.perf_counter()
                t_items = 0
            elif done >= warm:
                t_items = (done - warm) * items_per_step
            if done >= n_steps + warm:
                break
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t_start
    it_s = t_items / dt
    n_overflow = int(terms["n_overflow"])
    print(f"loader-fed: {it_s:.3f} it/s over {t_items} items "
          f"({n_threads} decode threads, batch {items_per_step}); "
          f"n_overflow={n_overflow}", file=sys.stderr)
    assert n_overflow == 0
    print(json.dumps({"metric": "avatar_train_step_loader_fed",
                      "value": round(it_s, 3), "unit": "it/s",
                      "vs_baseline": round(it_s / 5.0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
