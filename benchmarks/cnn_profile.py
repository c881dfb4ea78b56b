"""Per-op profile of one DualStyleUNet forward (and fwd+bwd) at bench scale.

Answers: where do the ~35 ms of a single 212-GFLOP head forward go, when a
clean chain of its dominant convs runs at ~36 TF/s (benchmarks/
conv_fusion_bench.py)? Run solo on the real TPU:
    python benchmarks/cnn_profile.py [--bwd]
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
from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache
from animatablegaussians_tpu.utils.profiling import (host_sync, trace,
                                                     trace_report)


def main():
    enable_compilation_cache()
    su.set_conv_precision("default")
    net = su.DualStyleUNet(inp_size=512, inp_ch=3, out_ch=3, out_size=1024,
                           style_dim=512, n_mlp=2)
    params = net.init(jax.random.PRNGKey(0))
    style = jnp.ones((1, 512)) / np.sqrt(512)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 512, 512, 3)), jnp.float32)

    if "--bwd" in sys.argv:
        def loss(p, x):
            return jnp.sum(net.apply(p, style, x) ** 2)
        fn = jax.jit(jax.grad(loss))
        args = (params, x)
    else:
        fn = jax.jit(lambda p, x: net.apply(p, style, x))
        args = (params, x)

    for _ in range(2):
        host_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"total {dt * 1e3:.2f} ms")

    with trace("/tmp/cnn_trace") as d:
        for _ in range(3):
            host_sync(fn(*args))
    print(trace_report(d, fn, args, top=40))


if __name__ == "__main__":
    main()
