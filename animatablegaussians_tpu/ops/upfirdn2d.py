"""StyleGAN2-style FIR resampling (upfirdn2d) and fused bias+LeakyReLU.

The reference implements these as CUDA kernels
(ref: network/styleunet/upfirdn2d_kernel.cu, fused_bias_act_kernel.cu) with a
pure-torch oracle `upfirdn2d_native` (ref: network/styleunet/upfirdn2d.py:186-227).
On TPU both are single XLA ops: upfirdn2d is exactly a dilated depthwise
convolution (lhs_dilation = up, window_strides = down, negative padding for
crops), and bias+leaky-relu fuses into the surrounding convolution
automatically. No Pallas kernel is needed or beneficial here.

Layout: NHWC (TPU-native). Kernels are 2D (kh, kw) float arrays.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k: Sequence[float]) -> np.ndarray:
    """1D -> separable 2D FIR kernel, normalized to sum 1."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k


# FIR precision: HIGHEST is required for checkpoint-level numerical parity
# (JAX's default conv precision may round through bf16), but the depthwise
# FIR convs are measurably faster at default precision on TPU (~15% of a
# DualStyleUNet f+b pass) — throughput runs switch via set_fir_precision
# (models/styleunet.set_conv_precision forwards its mode here).
FIR_PRECISION = "highest"


def set_fir_precision(p: str):
    global FIR_PRECISION
    FIR_PRECISION = p


def _fir_precision():
    return (jax.lax.Precision.HIGHEST if FIR_PRECISION == "highest"
            else None)


def _norm_pad(pad) -> Tuple[int, int, int, int]:
    if len(pad) == 2:
        return pad[0], pad[1], pad[0], pad[1]
    return tuple(pad)  # (px0, px1, py0, py1)


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Upsample (zero-stuff) by `up`, pad, FIR-filter, downsample by `down`.

    x: (N, H, W, C). kernel: (kh, kw). pad: (p0, p1) applied to both axes or
    (px0, px1, py0, py1). Matches the reference native semantics bit-for-bit:
    the up-1 trailing zeros the reference inserts after zero-stuffing are
    folded into the right/bottom padding here.
    """
    px0, px1, py0, py1 = _norm_pad(pad)
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    c = x.shape[-1]
    # True convolution = cross-correlation with the flipped kernel.
    w = jnp.flip(kernel, (0, 1))[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=_fir_precision(),
    )


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jnp.ndarray:
    """bias-add + LeakyReLU(slope) * scale (ref: fused_act.py:33-132).

    bias broadcasts over the channel (last) axis.
    """
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


# ---------------------------------------------------------------------------
# Resampling layers' pad arithmetic (ref: dual_styleunet.py:32-90).
# ---------------------------------------------------------------------------

def upsample(x: jnp.ndarray, kernel: np.ndarray, factor: int = 2) -> jnp.ndarray:
    k = kernel * (factor ** 2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample(x: jnp.ndarray, kernel: np.ndarray, factor: int = 2) -> jnp.ndarray:
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jnp.ndarray, kernel: np.ndarray, pad: Tuple[int, int],
         upsample_factor: int = 1) -> jnp.ndarray:
    k = kernel * (upsample_factor ** 2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, pad=pad)


# ---------------------------------------------------------------------------
# Haar wavelet transforms (ref: dual_styleunet.py:374-425).
# ---------------------------------------------------------------------------

def haar_wavelets() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    l = np.full((1, 2), inv_sqrt2, dtype=np.float32)
    h = np.array([[-inv_sqrt2, inv_sqrt2]], dtype=np.float32)
    return l.T @ l, h.T @ l, l.T @ h, h.T @ h  # ll, lh, hl, hh


def haar_transform(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C) with [ll, lh, hl, hh] channel blocks."""
    ll, lh, hl, hh = haar_wavelets()
    return jnp.concatenate([
        upfirdn2d(x, ll, down=2),
        upfirdn2d(x, lh, down=2),
        upfirdn2d(x, hl, down=2),
        upfirdn2d(x, hh, down=2),
    ], axis=-1)


def inverse_haar_transform(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) -> (N, 2H, 2W, C)."""
    ll_k, lh_k, hl_k, hh_k = haar_wavelets()
    c = x.shape[-1] // 4
    ll, lh, hl, hh = (x[..., :c], x[..., c:2 * c], x[..., 2 * c:3 * c],
                      x[..., 3 * c:])
    pad = (1, 0, 1, 0)
    return (upfirdn2d(ll, ll_k, up=2, pad=pad)
            + upfirdn2d(lh, -lh_k, up=2, pad=pad)
            + upfirdn2d(hl, -hl_k, up=2, pad=pad)
            + upfirdn2d(hh, hh_k, up=2, pad=pad))
