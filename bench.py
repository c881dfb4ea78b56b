"""Benchmark: avatar training step throughput at reference scale.

Measures full train-step it/sec (3x DualStyleUNet 512->1024 fwd+bwd, LBS
skinning, Pallas tile splat fwd+bwd at the AvatarReX image size, LPIPS 512^2,
adam update) on synthetic fixtures — the shapes match the reference hot loop
(ref: main_avatar.py:166-264, SURVEY.md §3.1).

Baseline: the reference publishes no wall-clock numbers (BASELINE.md); the
driver's north star is >=1.5x A100 train it/sec. ``A100_BASELINE_IT_S``
holds our standing estimate of the reference on A100 (batch 1); vs_baseline
is measured_it_s / A100_BASELINE_IT_S.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Estimated reference throughput on A100 (batch-1 torch train loop at
# 1024^2 gaussian maps + 1500x2048 rasterization + LPIPS). To be replaced
# with a measured number when an A100 run is available.
A100_BASELINE_IT_S = 2.0

MAP_H = 1024           # canonical map 1024x2048 -> CNN in 512^2, out 1024^2
IMG_W, IMG_H = 1500, 2048  # AvatarReX camera resolution
WARMUP = 2
ITERS = 10


def main():
    from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    # throughput run: bf16 MXU passes for convs (parity paths pin HIGHEST)
    from animatablegaussians_tpu.models import styleunet as su
    su.set_conv_precision("default")

    import __graft_entry__ as ge
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random
    from animatablegaussians_tpu.utils import synthetic

    net, params, _ = ge._build_avatar(
        map_h=MAP_H, img=IMG_W,
        raster_kw=dict(k_max=256, max_dup=16), remat=True)

    optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
    state = at.TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))
    lpips_params = init_random(jax.random.PRNGKey(7))

    step = at.make_train_step(
        net, optimizer,
        loss_weight=dict(l1=1.0, lpips=0.1, offset=0.005),
        lpips_params=lpips_params, patch_size=512,
        img_w=IMG_W, img_h=IMG_H)

    pos, _, _ = synthetic.make_cano_map(map_h=MAP_H)
    items_np = synthetic.make_items(img_w=IMG_W, img_h=IMG_H,
                                    cano_pos_map=pos)
    items = {k: jnp.asarray(v) for k, v in items_np.items()}
    rng = jax.random.PRNGKey(0)

    for i in range(WARMUP):
        state, terms = step(state, items, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, terms = step(state, items, jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    it_s = ITERS / dt
    print(json.dumps({
        "metric": "avatar_train_step",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": round(it_s / A100_BASELINE_IT_S, 3),
    }))


if __name__ == "__main__":
    main()
