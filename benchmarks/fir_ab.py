"""A/B the Pallas FIR path on the real TPU + overflow diagnostic.

1. DualStyleUNet forward & fwd+bwd with PALLAS_FIR auto vs off — numerics
   (vs f32 conv path) and timing.
2. Bench-scale overflow diagnostic: radii/tiles-touched percentiles of the
   untrained bench fixture (explains the n_overflow reading in bench.py).

Run solo on the real TPU:  python benchmarks/fir_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.models import styleunet as su
from animatablegaussians_tpu.ops import upfirdn2d as uf
from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache
from animatablegaussians_tpu.utils.profiling import host_sync


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        host_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    host_sync(out)
    return (time.perf_counter() - t0) / iters


def ab_styleunet():
    su.set_conv_precision("default")
    net = su.DualStyleUNet(inp_size=512, inp_ch=3, out_ch=3, out_size=1024,
                           style_dim=512, n_mlp=2)
    params = net.init(jax.random.PRNGKey(0))
    style = jnp.ones((1, 512)) / np.sqrt(512)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 512, 512, 3)), jnp.float32)

    fwd = jax.jit(lambda p, x: net.apply(p, style, x))
    loss = lambda p, x: jnp.sum(net.apply(p, style, x) ** 2)
    bwd = jax.jit(jax.grad(loss))

    results = {}
    for mode in ("off", "auto"):
        uf.set_pallas_fir(mode)
        fwd_t = timeit(jax.jit(lambda p, x: net.apply(p, style, x)),
                       params, x)
        bwd_t = timeit(jax.jit(jax.grad(loss)), params, x)
        out = jax.jit(lambda p, x: net.apply(p, style, x))(params, x)
        results[mode] = (fwd_t, bwd_t, np.asarray(out))
        print(f"PALLAS_FIR={mode}: fwd {fwd_t * 1e3:.2f} ms, "
              f"fwd+bwd {bwd_t * 1e3:.2f} ms", flush=True)
    a, b = results["off"][2], results["auto"][2]
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"rel out err auto vs off: {err:.2e}")
    uf.set_pallas_fir("auto")


def overflow_diag():
    import bench
    from animatablegaussians_tpu.ops.rasterize.api import \
        _full_projection_traced
    from animatablegaussians_tpu.ops.rasterize.binning import tile_rect
    from animatablegaussians_tpu.ops.rasterize.preprocess import preprocess

    net, params, items_np = bench._setup()
    items = {k: jnp.asarray(v) for k, v in items_np.items()}

    @jax.jit
    def gvals(params, items):
        pose_map = items["smpl_pos_map"][..., :3]
        sel = net._select_masked(jnp.concatenate(
            [net._net_out_to_map(net.position_net.apply(
                params["position_net"], net.constant_style(),
                pose_map[None]), 3),
             net._net_out_to_map(net.other_net.apply(
                 params["other_net"], net.constant_style(),
                 pose_map[None]), 8)], axis=-1))
        g = params["cano_gaussian"]
        scales = jnp.exp(sel[:, 4:7] + g.scaling)  # pos 0:3, opac 3, scale 4:7
        return scales

    scales = np.asarray(gvals(params, items))
    vm = np.asarray(net.valid_np)
    s = scales[vm].max(1)
    print(f"scales (valid pts): p50={np.percentile(s, 50):.5f} "
          f"p99={np.percentile(s, 99):.5f} max={s.max():.5f}")

    g = params["cano_gaussian"]
    raw = np.asarray(jnp.exp(g.scaling).max(1))[vm]
    print(f"cano KNN scales:   p50={np.percentile(raw, 50):.5f} "
          f"p99={np.percentile(raw, 99):.5f} max={raw.max():.5f}")

    # full preprocess+rect at the bench camera
    extr, intr = items["extr"], items["intr"]
    W, H = bench.IMG_W, bench.IMG_H
    view, proj = _full_projection_traced(extr, intr, W, H)
    pts = jnp.einsum("nj,jxy->nxy", net.lbs, items["cano2live_jnt_mats"])

    @jax.jit
    def pre_fn(params, items):
        out = net.render(params, items, bg_color=jnp.zeros(3),
                         img_w=W, img_h=H)
        return out["n_overflow"], out["n_pairs"]

    n_of, n_pairs = pre_fn(params, items)
    print(f"render diag: n_overflow={int(n_of)} n_pairs={int(n_pairs)}")


if __name__ == "__main__":
    enable_compilation_cache()
    ab_styleunet()
    overflow_diag()
