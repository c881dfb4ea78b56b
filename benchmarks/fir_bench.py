"""FIR/blur lowering experiments: the step spends ~40 ms in upfirdn2d
depthwise convs. Candidates at the hot shapes:

  a. current: one 4x4 depthwise conv (feature_group_count=C)
  b. separable: (4,1) then (1,4) depthwise convs
  c. shift-add: explicit pad + 4 scaled slices per axis (pure elementwise)
  d. up=2 variants of the above (zero-stuffed transposed forms)

Run solo on the real TPU: python benchmarks/fir_bench.py
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

from animatablegaussians_tpu.ops.upfirdn2d import make_kernel, upfirdn2d

CHAIN = 6


def host_sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        host_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    host_sync(out)
    return (time.perf_counter() - t0) / iters / CHAIN


KERN = make_kernel((1, 3, 3, 1))
K1 = np.asarray([1, 3, 3, 1], np.float32)
K1 = K1 / K1.sum()


def blur_current(x):
    return upfirdn2d(x, jnp.asarray(KERN), pad=(2, 1))


def blur_sep(x):
    c = x.shape[-1]
    kv = jnp.asarray(K1)[:, None, None, None] * jnp.ones((1, 1, 1, c))
    kh = jnp.asarray(K1)[None, :, None, None] * jnp.ones((1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, jnp.flip(kv, 0), (1, 1), ((2, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kh, 1), (1, 1), ((0, 0), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def blur_shift(x):
    # pad H and W by (2,1), then 4 scaled slices per axis
    xp = jnp.pad(x, ((0, 0), (2, 1), (0, 0), (0, 0)))
    H = x.shape[1]
    acc = sum(K1[j] * jax.lax.dynamic_slice_in_dim(xp, 3 - j, H, 1)
              for j in range(4))
    xp = jnp.pad(acc, ((0, 0), (0, 0), (2, 1), (0, 0)))
    W = x.shape[2]
    return sum(K1[j] * jax.lax.dynamic_slice_in_dim(xp, 3 - j, W, 2)
               for j in range(4))


def up_current(x):
    return upfirdn2d(x, jnp.asarray(KERN) * 4, up=2, pad=(2, 1))


def up_sep(x):
    c = x.shape[-1]
    kv = 2 * jnp.asarray(K1)[:, None, None, None] * jnp.ones((1, 1, 1, c))
    kh = 2 * jnp.asarray(K1)[None, :, None, None] * jnp.ones((1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, jnp.flip(kv, 0), (1, 1), ((2, 1 + 1), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kh, 1), (1, 1), ((0, 0), (2, 1 + 1)),
        lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def up_phase(x):
    """2x upsample via 2-tap phase convs + interleave (no zero-stuffing)."""
    # out_even[i] = k1*x[i-?]... phases of the 4-tap kernel * 2 (gain)
    ke = 2 * jnp.asarray([K1[1], K1[3]])   # taps hitting even outputs
    ko = 2 * jnp.asarray([K1[0], K1[2]])
    B, H, W, C = x.shape

    def axis_up(x, axis):
        xp = jnp.pad(x, [(0, 0)] * axis + [(1, 1)] + [(0, 0)] * (3 - axis))
        n = x.shape[axis]
        sl = lambda o: jax.lax.dynamic_slice_in_dim(xp, o, n, axis)
        even = ke[1] * sl(0) + ke[0] * sl(1)
        odd = ko[1] * sl(1) + ko[0] * sl(2)
        st = jnp.stack([even, odd], axis=axis + 1)
        shape = list(x.shape)
        shape[axis] = 2 * n
        return st.reshape(shape)

    return axis_up(axis_up(x, 1), 2)


def bench(name, fn, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1,) + shape), jnp.float32)

    @jax.jit
    def chain(x):
        for _ in range(CHAIN):
            x = fn(x)
            x = x[:, :x.shape[1] // 2 * 2, :x.shape[2] // 2 * 2, :]
            if x.shape[1] > shape[0]:  # keep size bounded for up variants
                x = x[:, ::2, ::2, :]
        return x

    t = timeit(chain, x)
    print(f"{name:14s} {shape}: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    for shape in ((512, 512, 64), (256, 256, 128), (128, 128, 256)):
        bench("blur-current", blur_current, shape)
        bench("blur-sep", blur_sep, shape)
        bench("blur-shift", blur_shift, shape)
    for shape in ((256, 256, 64), (256, 256, 128)):
        bench("up-current", up_current, shape)
        bench("up-sep", up_sep, shape)
        bench("up-phase", up_phase, shape)
    # correctness cross-checks
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)), jnp.float32)
    a = blur_current(x)
    for nm, f in (("sep", blur_sep), ("shift", blur_shift)):
        err = float(jnp.abs(f(x) - a).max())
        print(f"blur-{nm} err {err:.2e}")
    au = up_current(x)
    for nm, f in (("sep", up_sep), ("phase", up_phase)):
        err = float(jnp.abs(f(x) - au).max())
        print(f"up-{nm} err {err:.2e} shapes {f(x).shape} vs {au.shape}")
