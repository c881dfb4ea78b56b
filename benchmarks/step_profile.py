"""Full train-step per-op profile at bench scale (attribution for the
round-3 optimization work). Builds the exact bench.py train step, traces 3
steps, prints the aggregated per-op report with source attribution.

Run solo on the real TPU:  python benchmarks/step_profile.py [--fps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from animatablegaussians_tpu.utils.profiling import (host_sync, trace,
                                                         trace_report)

    net, params, items_np = bench._setup()
    items = {k: jnp.asarray(v) for k, v in items_np.items()}

    if "--fps" in sys.argv:
        bg = jnp.ones((3,), jnp.float32)

        @jax.jit
        def step_fn(params, items):
            out = net.render(params, items, bg_color=bg,
                             img_w=bench.IMG_W, img_h=bench.IMG_H)
            return out["rgb_map"]

        args = (params, items)
        runner = lambda: host_sync(step_fn(*args))
    else:
        from animatablegaussians_tpu.training import avatar_trainer as at
        from animatablegaussians_tpu.training.lpips import init_random

        optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
        state = at.TrainState(params, optimizer.init(params),
                              jnp.zeros((), jnp.int32))
        lpips_params = init_random(jax.random.PRNGKey(7))
        step = at.make_train_step(
            net, optimizer,
            loss_weight=dict(l1=1.0, lpips=0.1, offset=0.005),
            lpips_params=lpips_params, patch_size=512,
            img_w=bench.IMG_W, img_h=bench.IMG_H)
        rng = jax.random.PRNGKey(0)
        step_fn = step
        args = (state, items, rng)

        def runner():
            nonlocal state
            state, terms = step(state, items, rng)
            host_sync(terms["total_loss"])

    for _ in range(2):
        runner()
    t0 = time.perf_counter()
    for _ in range(5):
        runner()
    dt = (time.perf_counter() - t0) / 5
    print(f"step total {dt * 1e3:.2f} ms", flush=True)

    with trace("/tmp/step_trace") as d:
        for _ in range(3):
            runner()
    print(trace_report(d, step_fn, args, top=120))


if __name__ == "__main__":
    main()
