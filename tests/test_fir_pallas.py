"""Pallas separable FIR kernel vs the XLA upfirdn2d reference — exact
forward agreement over every configuration the nets use, plus gradient
agreement vs JAX autodiff of the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.ops import upfirdn2d as uf
from animatablegaussians_tpu.ops.fir_pallas import (separable_factors,
                                                    upfirdn2d_pallas)

BLUR = uf.make_kernel((1, 3, 3, 1))


def run_both(x, kern2d, up, down, pad):
    ref = uf.upfirdn2d(jnp.asarray(x), jnp.asarray(kern2d), up=up, down=down,
                       pad=pad)
    fac = separable_factors(kern2d)
    assert fac is not None
    kv, kh = fac
    got = upfirdn2d_pallas(jnp.asarray(x), tuple(kv.tolist()),
                           tuple(kh.tolist()), up, down,
                           pad if len(pad) == 4 else
                           (pad[0], pad[1], pad[0], pad[1]))
    return np.asarray(ref), np.asarray(got)


CASES = [
    # (kernel, up, down, pad) — every call pattern in the nets
    (BLUR, 1, 1, (2, 2)),                 # conv_layer downsample pre-blur
    (BLUR, 1, 1, (2, 1)),                 # FromRGB-style blur
    (BLUR * 4.0, 1, 1, (1, 1)),           # StyledConv up-path post-blur
    (BLUR, 1, 2, (1, 1)),                 # downsample
    (BLUR * 4.0, 2, 1, (2, 1)),           # upsample
    (uf.haar_wavelets()[0], 1, 2, (0, 0)),    # haar ll
    (uf.haar_wavelets()[3], 1, 2, (0, 0)),    # haar hh (signed)
    (uf.haar_wavelets()[1], 2, 1, (1, 0, 1, 0)),  # iwt lh
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("shape", [(1, 16, 16, 3), (1, 24, 40, 5),
                                   (2, 32, 16, 130)])
def test_forward_matches_xla(case, shape):
    kern, up, down, pad = CASES[case]
    rng = np.random.default_rng(case)
    x = rng.standard_normal(shape).astype(np.float32)
    old = uf.FIR_PRECISION
    uf.set_fir_precision("highest")
    try:
        ref, got = run_both(x, kern, up, down, pad)
    finally:
        uf.set_fir_precision(old)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("case", [0, 3, 4, 7])
def test_grad_matches_xla(case):
    kern, up, down, pad = CASES[case]
    pad4 = pad if len(pad) == 4 else (pad[0], pad[1], pad[0], pad[1])
    rng = np.random.default_rng(10 + case)
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 3)), jnp.float32)
    kv, kh = separable_factors(kern)

    old = uf.FIR_PRECISION
    uf.set_fir_precision("highest")
    try:
        ref_fn = lambda x: jnp.sum(jnp.cos(uf.upfirdn2d(
            x, jnp.asarray(kern), up=up, down=down, pad=pad)))
        got_fn = lambda x: jnp.sum(jnp.cos(upfirdn2d_pallas(
            x, tuple(kv.tolist()), tuple(kh.tolist()), up, down, pad4)))
        g_ref = jax.grad(ref_fn)(x)
        g_got = jax.grad(got_fn)(x)
    finally:
        uf.set_fir_precision(old)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)


def test_separable_factors():
    assert separable_factors(BLUR) is not None
    for k in uf.haar_wavelets():
        kv, kh = separable_factors(k)
        np.testing.assert_allclose(np.outer(kv, kh), k, atol=1e-7)
    nonsep = np.eye(3, dtype=np.float32)
    assert separable_factors(nonsep) is None
