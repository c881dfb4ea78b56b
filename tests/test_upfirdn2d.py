"""upfirdn2d vs a direct numpy oracle (zero-stuff -> pad -> convolve ->
subsample), plus Haar round-trip and fused leaky-relu semantics."""

import numpy as np
import pytest
from scipy.signal import convolve2d

import jax.numpy as jnp

from animatablegaussians_tpu.ops import upfirdn2d as ufd


def upfirdn2d_np(x, k, up=1, down=1, pad=(0, 0)):
    """Oracle: same math as the reference torch-native path, in numpy."""
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    n, h, w, c = x.shape
    z = np.zeros((n, h * up, w * up, c), dtype=np.float64)
    z[:, ::up, ::up, :] = x
    # pad (may be negative -> crop)
    out_h = h * up + py0 + py1
    out_w = w * up + px0 + px1
    zp = np.zeros((n, max(out_h, 0), max(out_w, 0), c), dtype=np.float64)
    src_y0, src_x0 = max(-py0, 0), max(-px0, 0)
    dst_y0, dst_x0 = max(py0, 0), max(px0, 0)
    copy_h = min(h * up - src_y0, out_h - dst_y0)
    copy_w = min(w * up - src_x0, out_w - dst_x0)
    zp[:, dst_y0:dst_y0 + copy_h, dst_x0:dst_x0 + copy_w, :] = \
        z[:, src_y0:src_y0 + copy_h, src_x0:src_x0 + copy_w, :]
    kh, kw = k.shape
    out = np.zeros((n, out_h - kh + 1, out_w - kw + 1, c))
    for b in range(n):
        for ch in range(c):
            out[b, :, :, ch] = convolve2d(zp[b, :, :, ch], k, mode="valid")
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)),
    (2, 1, (2, 1)),
    (1, 2, (1, 1)),
    (2, 2, (2, 2)),
    (2, 1, (1, 0, 1, 0)),
    (1, 2, (0, 0)),
])
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    k = ufd.make_kernel([1, 3, 3, 1])
    got = np.asarray(ufd.upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    want = upfirdn2d_np(x, k, up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upfirdn2d_asymmetric_kernel():
    # Haar high-pass is asymmetric: catches kernel-flip convention bugs.
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    _, lh, _, _ = ufd.haar_wavelets()
    got = np.asarray(ufd.upfirdn2d(jnp.asarray(x), lh, down=2))
    want = upfirdn2d_np(x, lh, down=2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_haar_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    y = ufd.haar_transform(jnp.asarray(x))
    assert y.shape == (1, 8, 8, 12)
    back = ufd.inverse_haar_transform(y)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_fused_leaky_relu():
    x = jnp.array([[-1.0, 0.5]])
    b = jnp.array([0.5, 0.5])
    out = np.asarray(ufd.fused_leaky_relu(x, b))
    want = np.array([[-0.5 * 0.2, 1.0]]) * np.sqrt(2.0)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_up_down_sample_shapes():
    x = jnp.zeros((1, 32, 32, 4))
    k = ufd.make_kernel([1, 3, 3, 1])
    assert ufd.upsample(x, k).shape == (1, 64, 64, 4)
    assert ufd.downsample(x, k).shape == (1, 16, 16, 4)


def test_wavelet_upsample_matches_chain():
    """The fused ToRGB-skip conv must reproduce iwt -> FIR up -> haar
    exactly (one composed transposed conv vs 9 depthwise convs)."""
    rng = np.random.default_rng(3)
    for c, h in ((3, 16), (3, 9), (8, 12)):
        x = jnp.asarray(rng.standard_normal((2, h, h, 4 * c)), jnp.float32)
        kern = ufd.make_kernel((1, 3, 3, 1))
        want = ufd.haar_transform(
            ufd.upsample(ufd.inverse_haar_transform(x), kern))
        got = ufd.wavelet_upsample(x)
        assert got.shape == want.shape == (2, 2 * h, 2 * h, 4 * c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)


def test_wavelet_downsample_matches_chain():
    """The fused FromRGB-skip conv must reproduce iwt -> FIR down -> haar
    exactly (ref: dual_styleunet.py:442-470, use_wt=True)."""
    rng = np.random.default_rng(4)
    for c, h in ((3, 16), (3, 32), (8, 24)):
        x = jnp.asarray(rng.standard_normal((2, h, h, 4 * c)), jnp.float32)
        kern = ufd.make_kernel((1, 3, 3, 1))
        want = ufd.haar_transform(
            ufd.downsample(ufd.inverse_haar_transform(x), kern))
        got = ufd.wavelet_downsample(x)
        assert got.shape == want.shape == (2, h // 2, h // 2, 4 * c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)
