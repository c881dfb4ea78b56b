"""Can the 3 DualStyleUNet heads run as ONE grouped-conv stack?

VERDICT r4 #4a: test `feature_group_count=3` with stacked weights as an
alternative to 3 sequential head passes (different from the measured-and-
rejected vmap-over-weights lowering). This microbench times the dominant
conv shapes of one head three ways on the real chip:
  seq     — 3 separate convs (what _head_outputs does today)
  grouped — one conv with feature_group_count=3 on channel-stacked input
  batched — one conv with the 3 heads stacked on the BATCH axis (only
            valid when the heads share weights — measured as the upper
            bound the batch-B train step already exploits)

Run solo on the real TPU:  python benchmarks/grouped_heads_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache

# dominant conv shapes of one DualStyleUNet (B=1): (H, Cin, Cout, k)
# from benchmarks/cnn_profile.py traces — decoder styled_convs + encoder
# conv_blocks carry ~all the FLOPs
SHAPES = [
    (64, 512, 512, 3),
    (128, 512, 256, 3),
    (256, 256, 128, 3),
    (512, 128, 64, 3),
    (1024, 64, 32, 3),
]


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"{'shape':>24} {'seq3':>8} {'grouped':>8} {'batched':>8}  (ms)")
    tot = [0.0, 0.0, 0.0]
    for (h, ci, co, k) in SHAPES:
        x = jnp.asarray(rng.standard_normal((1, h, h, ci)), jnp.float32)
        ws = [jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05,
                          jnp.float32) for _ in range(3)]

        def conv(x, w, groups=1):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((k // 2, k // 2),) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)

        seq = jax.jit(lambda x, w0, w1, w2: [conv(x, w) for w in
                                             (w0, w1, w2)])
        xg = jnp.concatenate([x, x, x], axis=-1)
        wg = jnp.concatenate(ws, axis=-1)  # (k,k,ci, 3co) grouped
        grouped = jax.jit(lambda xg, wg: conv(xg, wg, groups=3))
        xb = jnp.concatenate([x, x, x], axis=0)
        batched = jax.jit(lambda xb, w: conv(xb, w))

        t_seq = timeit(seq, x, *ws)
        t_grp = timeit(grouped, xg, wg)
        t_bat = timeit(batched, xb, ws[0])
        tot[0] += t_seq; tot[1] += t_grp; tot[2] += t_bat
        print(f"{(h, ci, co, k)!s:>24} {t_seq:8.2f} {t_grp:8.2f} "
              f"{t_bat:8.2f}")
    print(f"{'TOTAL':>24} {tot[0]:8.2f} {tot[1]:8.2f} {tot[2]:8.2f}")


if __name__ == "__main__":
    main()
