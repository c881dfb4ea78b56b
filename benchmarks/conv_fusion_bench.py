"""Microbenchmark: strategies for fusing the 3 DualStyleUNet heads' convs.

The round-2 bench showed the 3x DualStyleUNet segment at ~2-3% MXU
utilization (~35 ms fwd per net for ~212 GFLOP). Candidates measured here at
the real per-stage shapes (B=1, NHWC, bf16 MXU passes):

  a. 3 sequential convs with separate weights (status quo)
  b. ONE dense conv on 3x-concatenated channels with block-diagonal weights
     (3x FLOPs of useful work, but 3x wider channel dim and 1/3 the op count)
  c. ONE grouped conv (feature_group_count=3) — exact semantics, no FLOPs
     waste, lowering quality unknown on TPU
  d. channel padding: 64->128 lanes at the same spatial size (is the narrow
     channel dim the bottleneck, or the op count?)

Run solo on the real TPU: python benchmarks/conv_fusion_bench.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

P = jax.lax.Precision.DEFAULT
CHAIN = 8  # convs chained per timed graph (amortizes dispatch overhead)


def host_sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        host_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    host_sync(out)
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, pad=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P,
        feature_group_count=groups)


def convT(x, w):
    """conv_transpose2d stride 2 (the StyledConv up path)."""
    kh = w.shape[0]
    w = jnp.flip(w, (0, 1))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((kh - 1, kh - 1),) * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P)


def bench_stage(name, res, cin, cout, k=3, up=False):
    rng = np.random.default_rng(0)
    sin = res // 2 if up else res
    x1 = jnp.asarray(rng.standard_normal((1, sin, sin, cin)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((1, sin, sin, 3 * cin)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05,
                      jnp.float32) for _ in range(3 * CHAIN)]
    # block-diagonal fused weight per chain step
    wd = []
    for i in range(CHAIN):
        w = np.zeros((k, k, 3 * cin, 3 * cout), np.float32)
        for b in range(3):
            w[:, :, b * cin:(b + 1) * cin, b * cout:(b + 1) * cout] = \
                np.asarray(ws[3 * i + b])
        wd.append(jnp.asarray(w))
    # grouped weight: (k, k, cin, 3*cout) with groups=3
    wg = [jnp.concatenate([ws[3 * i + b] for b in range(3)], axis=3)
          for i in range(CHAIN)]

    op = convT if up else partial(conv, pad=k // 2)

    @jax.jit
    def f_seq(x, ws):
        outs = []
        for b in range(3):
            y = x
            for i in range(CHAIN):
                y = op(y, ws[3 * i + b])
                y = jnp.maximum(y, 0.2 * y)
                if up:
                    y = y[:, ::2, ::2, :]  # keep spatial size across chain
            outs.append(y)
        return sum(o.sum() for o in outs)

    @jax.jit
    def f_dense(x, wd):
        y = x
        for i in range(CHAIN):
            y = op(y, wd[i])
            y = jnp.maximum(y, 0.2 * y)
            if up:
                y = y[:, ::2, ::2, :]
        return y.sum()

    @jax.jit
    def f_group(x, wg):
        y = x
        for i in range(CHAIN):
            if up:
                yy = convT(y, jnp.flip(wg[i], (0, 1)))  # placeholder; convT
                # has no groups arg here — grouped via conv only
                y = yy[:, ::2, ::2, :]
            else:
                y = conv(y, wg[i], pad=k // 2, groups=3)
                y = jnp.maximum(y, 0.2 * y)
        return y.sum()

    t_seq = timeit(f_seq, x1, ws)
    t_dense = timeit(f_dense, x3, wd)
    flops1 = (res ** 2) * cin * cout * k * k * 2 * CHAIN * 3  # useful
    print(f"{name:26s} seq3 {t_seq * 1e3 / CHAIN:7.3f} ms/step "
          f"dense3x {t_dense * 1e3 / CHAIN:7.3f}"
          f"  (useful {flops1 / 1e9:5.1f} GF; seq "
          f"{flops1 / t_seq / 1e12:5.1f} TF/s)", end="")
    if not up:
        t_group = timeit(f_group, x3, wg)
        print(f" grouped {t_group * 1e3 / CHAIN:7.3f}")
    else:
        print()


def bench_pad(res, cin_small, cin_big):
    """Does padding 64->128 channels cost anything at the same res?"""
    rng = np.random.default_rng(0)
    for c in (cin_small, cin_big):
        x = jnp.asarray(rng.standard_normal((1, res, res, c)), jnp.float32)
        ws = [jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05,
                          jnp.float32) for _ in range(CHAIN)]

        @jax.jit
        def f(x, ws):
            y = x
            for w in ws:
                y = conv(y, w)
                y = jnp.maximum(y, 0.2 * y)
            return y.sum()

        t = timeit(f, x, ws)
        fl = (res ** 2) * c * c * 9 * 2 * CHAIN
        print(f"pad-test {res}^2 {c}ch: {t * 1e3 / CHAIN:7.3f} ms/conv "
              f"({fl / t / 1e12:5.1f} TF/s)")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    # decoder stages (dominant FLOPs), one branch of one head:
    bench_stage("512^2 64->64 3x3", 512, 64, 64)
    bench_stage("512^2 up 128->64", 512, 128, 64, up=True)
    bench_stage("256^2 128->128 3x3", 256, 128, 128)
    bench_stage("128^2 256->256 3x3", 128, 256, 256)
    bench_stage("64^2 512->512 3x3", 64, 512, 512)
    bench_stage("512^2 1x1 64->12 ToRGB", 512, 64, 12, k=1)
    bench_pad(512, 64, 128)
    bench_pad(256, 128, 256)
