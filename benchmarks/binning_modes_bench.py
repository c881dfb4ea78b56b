"""Time ragged binning at bench scale: raw-order (tile, depth) two-key sort
vs depth-presorted expansion (argsort + reorder gather + one-key sort).

Run solo on the real TPU:  python benchmarks/binning_modes_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops.rasterize import binning as B
from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache

# bench-scale workload: 531k gaussians, 1500x2048 grid, ~1.07M true pairs
N = 531_000
IMG_W, IMG_H = 1500, 2048
MAX_PAIRS = 1_638_400
N_CHUNKS = 9984
A = 2560


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    # cluster centers over ~40% of the image to mimic the body silhouette
    means2d = jnp.asarray(
        rng.uniform([IMG_W * 0.3, IMG_H * 0.1], [IMG_W * 0.7, IMG_H * 0.9],
                    (N, 2)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1.0, 4.0, (N,)), jnp.float32)
    radii = jnp.asarray(np.minimum(rng.poisson(1.2, N) + 1, 24), jnp.int32)
    valid = jnp.asarray(rng.random(N) > 0.02)
    payload = jnp.asarray(rng.standard_normal((N, 10)), jnp.float32)

    for backend, presort in (("xla", False), ("xla", True),
                             ("pallas", False)):
        B.set_expand_backend(backend)
        fn = jax.jit(lambda m, d, r, v, p, ps=presort: B.bin_gaussians_ragged(
            m, d, r, v, IMG_W, IMG_H, max_dup=32, n_chunks=N_CHUNKS,
            max_active_tiles=A, max_pairs=MAX_PAIRS, payload=p,
            presort_depth=ps))
        out = fn(means2d, depths, radii, valid, payload)
        jax.block_until_ready(out)
        bins = out[0]
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = fn(means2d, depths, radii, valid, payload)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"expand={backend} presort_depth={presort}: {dt:7.2f} ms  "
              f"(n_pairs={int(bins.n_pairs)}, "
              f"n_overflow={int(bins.n_overflow)})")
    B.set_expand_backend("xla")


if __name__ == "__main__":
    main()
