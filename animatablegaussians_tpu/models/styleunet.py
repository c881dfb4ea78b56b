"""DualStyleUNet: pose-map -> dual (front/back) Gaussian-map CNN.

Re-implementation of the reference StyleGAN2-based U-Net (ref:
network/styleunet/dual_styleunet.py:636-910) as functional JAX/XLA:

  * encoder: conv_in + cascade of FromRGB(downsample, no wavelet) + ConvBlock
    down to 8x8 (ref: dual_styleunet.py:686-701, 852-862);
  * two independent StyleGAN2 decoders (modulated convs + fixed noise +
    fused leaky-relu) with wavelet-domain ToRGB skip chains, fed encoder
    features through comb_convs (ref: dual_styleunet.py:709-767, 867-906);
  * final inverse Haar transform to pixel space; outputs concat [front, back]
    maps along channels.

TPU-first design choices: NHWC layout, per-sample modulated weights via vmap
(XLA batches the grouped-conv trick away; ref: dual_styleunet.py:256-300),
upfirdn2d as dilated depthwise convs, bias+leaky-relu left to XLA fusion.
Parameters are plain nested dicts -> torch-checkpoint import is a name map
(see training/torch_import.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from animatablegaussians_tpu.ops import upfirdn2d
from animatablegaussians_tpu.ops.upfirdn2d import (
    blur, downsample, fused_leaky_relu, haar_transform,
    inverse_haar_transform, make_kernel, space_to_depth2, upsample,
    wavelet_upsample)

BLUR_KERNEL = (1, 3, 3, 1)

# Conv precision: "highest" for checkpoint-parity paths; "default" runs
# bf16 passes on the MXU with f32 activations; "bf16" additionally keeps
# activations in bf16 between layers (halves HBM traffic on the 512^2/1024^2
# stages — they are bandwidth-bound at these channel counts) with f32
# parameters and f32 demodulation/statistics.
CONV_PRECISION = "highest"


def set_conv_precision(p: str):
    global CONV_PRECISION
    CONV_PRECISION = p
    from animatablegaussians_tpu.ops import upfirdn2d as _uf
    _uf.set_fir_precision(p)


def _prec():
    return (jax.lax.Precision.HIGHEST if CONV_PRECISION == "highest"
            else jax.lax.Precision.DEFAULT)


def _act_dtype():
    return jnp.bfloat16 if CONV_PRECISION == "bf16" else None


def _cast_act(*xs):
    """Cast activations/weights into the compute dtype (no-op outside bf16
    mode). Params stay f32 in the pytree; the cast's VJP returns f32 grads."""
    dt = _act_dtype()
    out = tuple(x if x is None or dt is None else x.astype(dt) for x in xs)
    return out if len(out) > 1 else out[0]


# Opt-in custom weight-gradient lowering for stride-1 convs: XLA-TPU
# represents dW as a conv whose FILTER is the full-res cotangent, which the
# conv emitter cannot tile onto the MXU for large spatial extents (it falls
# back to multiply+reduce fusions). The custom path computes dW as k*k
# shifted (ci, N*H*W) @ (N*H*W, co) matmuls — clean MXU work — and dx as the
# standard flipped-kernel correlation. Enable with set_conv_mmgrad(True)
# after measuring on the target backend; numerics are pinned by
# tests/test_styleunet.py::test_conv_mmgrad_matches_autodiff.
CONV_MMGRAD = False


def set_conv_mmgrad(on: bool):
    global CONV_MMGRAD
    CONV_MMGRAD = bool(on)


def _conv_s1(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec())


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_s1_mmgrad(x, w, padding):
    return _conv_s1(x, w, padding)


def _conv_s1_mm_fwd(x, w, padding):
    return _conv_s1(x, w, padding), (x, w)


def _conv_s1_mm_bwd(padding, res, g):
    x, w = res
    kh, kw = w.shape[0], w.shape[1]
    (pt, pb), (pl, pr) = padding
    # dx: full correlation of g with the spatially flipped, io-transposed
    # kernel (pad so output matches x's extent)
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(w, (0, 1)).swapaxes(2, 3), (1, 1),
        ((kh - 1 - pt, kh - 1 - pb), (kw - 1 - pl, kw - 1 - pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec())
    # dW[a, b] = X_shifted(a, b)^T @ g over the flattened (N, H, W) rows
    n, ho, wo, co = g.shape
    ci = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    g2 = g.reshape(n * ho * wo, co)
    taps = []
    for a in range(kh):
        for b in range(kw):
            xs = xp[:, a:a + ho, b:b + wo, :].reshape(n * ho * wo, ci)
            taps.append(jnp.dot(xs.T, g2, precision=_prec()))
    dw = jnp.stack(taps).reshape(kh, kw, ci, co)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv_s1_mmgrad.defvjp(_conv_s1_mm_fwd, _conv_s1_mm_bwd)


def conv2d(x, w, stride=1, padding=0):
    """NHWC x HWIO correlation, matching torch.conv2d semantics."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x, w = _cast_act(x, w)
    if stride == 1 and CONV_MMGRAD:
        return _conv_s1_mmgrad(x, w, padding)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec())


def conv_transpose2d(x, w, stride=2):
    """torch.conv_transpose2d(stride, padding=0) with w in IOHW->HWIO form.

    Implemented as input-dilated correlation with the spatially flipped
    kernel (exact gradient-of-conv semantics).
    """
    kh, kw = w.shape[0], w.shape[1]
    x, w = _cast_act(x, w)
    w_flip = jnp.flip(w, (0, 1))
    return jax.lax.conv_general_dilated(
        x, w_flip, (1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec())


# ---------------------------------------------------------------------------
# layers (init returns param dicts; apply are pure functions)
# ---------------------------------------------------------------------------

def pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def equal_linear_init(key, in_dim, out_dim, bias_init=0.0, lr_mul=1.0):
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) / lr_mul
    return dict(weight=w, bias=jnp.full((out_dim,), bias_init, jnp.float32))


def equal_linear(p, x, lr_mul=1.0, activation=False):
    scale = (1.0 / math.sqrt(p["weight"].shape[0])) * lr_mul
    out = jnp.dot(x, p["weight"] * scale, precision=_prec())
    if activation:
        return fused_leaky_relu(out, p["bias"] * lr_mul)
    return out + p["bias"] * lr_mul


def equal_conv2d_init(key, in_ch, out_ch, k, bias=True):
    w = jax.random.normal(key, (k, k, in_ch, out_ch), jnp.float32)
    p = dict(weight=w)
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def equal_conv2d(p, x, stride=1, padding=0):
    k, _, in_ch, _ = p["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    out = conv2d(x, p["weight"] * scale, stride, padding)
    if "bias" in p:
        out = out + p["bias"]
    return out


def conv_layer_init(key, in_ch, out_ch, k, downsample_=False, activate=True,
                    bias=True):
    kc, kb = jax.random.split(key)
    p = dict(conv=equal_conv2d_init(kc, in_ch, out_ch, k,
                                    bias=bias and not activate))
    if activate:
        p["act_bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


_DOWNBLUR_COMPOSE: dict = {}


def _downblur_phase_mat(k: int) -> np.ndarray:
    """P[(a*2+b)*kh2*kw2 + r*kw2 + c, kk*k + jj] = M[2r+a, 2c+b, kk, jj]
    where M[a,b,kk,jj] = flip(blur)[a-kk, b-jj] (two successive correlations
    compose by kernel convolution). One (4*kh2*kw2, k*k) matmul with the
    flattened conv weight yields the 4-input-parity kernel of the fused
    blur -> stride-2 conv chain directly — the einsum+slice+concat chain it
    replaces lowered its backward to a ~8 ms reduce fusion per 512-ch layer
    on TPU (the tiny 9-element contraction axis defeats the MXU path)."""
    key = (k, BLUR_KERNEL)
    if key not in _DOWNBLUR_COMPOSE:
        bf = np.flip(make_kernel(BLUR_KERNEL), (0, 1))
        kb = bf.shape[0]
        kc = k + kb - 1
        m = np.zeros((kc, kc, k, k), np.float32)
        for a in range(kc):
            for b in range(kc):
                for kk in range(max(0, a - kb + 1), min(k, a + 1)):
                    for jj in range(max(0, b - kb + 1), min(k, b + 1)):
                        m[a, b, kk, jj] = bf[a - kk, b - jj]
        ph = np.stack([m[a::2, b::2] for a in (0, 1) for b in (0, 1)])
        kh2, kw2 = ph.shape[1], ph.shape[2]
        _DOWNBLUR_COMPOSE[key] = (
            ph.reshape(4 * kh2 * kw2, k * k), kh2, kw2)  # numpy (tracer-safe)
    return _DOWNBLUR_COMPOSE[key]


def _blur_conv_down(x, w, k):
    """FIR blur + k x k stride-2 conv as ONE dense conv on the four input
    phases. The blur is a full-res depthwise pass — bandwidth-bound with
    <10% lane utilization at the narrow-channel high-res stages (measured
    ~3.5 ms each at 512^2 on v5e) — so it is composed into the conv kernel
    ((k+3)^2, stride 2) which is then split into its 4 input parities:
    space-to-depth + one regular ceil((k+3)/2)^2 conv over 4*in_ch channels.
    Exact to f32 roundoff vs the chain (kernel composition reassociates two
    correlations)."""
    pm, kh2, kw2 = _downblur_phase_mat(k)
    ci, co = w.shape[2], w.shape[3]
    q = jnp.dot(jnp.asarray(pm), w.reshape(k * k, ci * co),
                precision=jax.lax.Precision.HIGHEST)
    kall = q.reshape(4, kh2, kw2, ci, co).transpose(1, 2, 0, 3, 4) \
        .reshape(kh2, kw2, 4 * ci, co)
    pd = (len(BLUR_KERNEL) - 2) + (k - 1)
    pl, pr = (pd + 1) // 2, pd // 2
    xp = jnp.pad(x, ((0, 0), (pl, pr), (pl, pr), (0, 0)))
    assert xp.shape[1] % 2 == 0 and xp.shape[2] % 2 == 0
    return conv2d(space_to_depth2(xp), kall, padding=0)


def conv_layer(p, x, k, downsample_=False, activate=True):
    """ConvLayer (ref: dual_styleunet.py:329-371)."""
    if downsample_:
        w = p["conv"]["weight"]
        scale = 1.0 / math.sqrt(w.shape[2] * k * k)
        out = _blur_conv_down(x, w * scale, k)
        if "bias" in p["conv"]:
            out = out + p["conv"]["bias"]
    else:
        out = equal_conv2d(p["conv"], x, stride=1, padding=k // 2)
    if activate:
        out = fused_leaky_relu(out, p["act_bias"])
        out = _cast_act(out)  # keep inter-stage activations in compute dtype
    return out


def conv_block_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return dict(conv1=conv_layer_init(k1, in_ch, in_ch, 3),
                conv2=conv_layer_init(k2, in_ch, out_ch, 3, downsample_=True))


def conv_block(p, x):
    x = conv_layer(p["conv1"], x, 3)
    return conv_layer(p["conv2"], x, 3, downsample_=True)


def modulated_conv2d_init(key, in_ch, out_ch, k, style_dim, demodulate=True):
    kw, km = jax.random.split(key)
    return dict(
        weight=jax.random.normal(kw, (k, k, in_ch, out_ch), jnp.float32),
        modulation=equal_linear_init(km, style_dim, in_ch, bias_init=1.0),
    )


_UPBLUR_COMPOSE: dict = {}


def _upblur_phase_mat(k: int) -> np.ndarray:
    """P[(pa*2+pb)*k*k + r*k + c, kk*k + jj] =
    M[idx[pa][r], idx[pb][c], k-1-kk, k-1-jj] where
    M[a,b,kk,jj] = flip(blur4)[a-kk, b-jj] and idx = ((1,3,5), (0,2,4)):
    one (4*k*k, k*k) matmul with the flattened modulated weight yields the
    4-output-parity kernel of the fused conv_transpose2d(stride 2) ->
    FIR-blur chain directly (flip and phase slicing folded into the
    matrix). The einsum+slice+concat chain it replaces lowered its
    backward to a ~8 ms reduce fusion per 512-ch layer on TPU (the tiny
    9-element contraction axis defeats the MXU path; 12 such layers ~94 ms
    of the round-3 step profile)."""
    key = (k, BLUR_KERNEL)
    if key not in _UPBLUR_COMPOSE:
        b4 = np.flip(make_kernel(BLUR_KERNEL) * 4.0, (0, 1))
        kb = b4.shape[0]
        kc = k + kb - 1
        m = np.zeros((kc, kc, k, k), np.float32)
        for a in range(kc):
            for b in range(kc):
                ka0, ka1 = max(0, a - kb + 1), min(k, a + 1)
                for kk in range(ka0, ka1):
                    kj0, kj1 = max(0, b - kb + 1), min(k, b + 1)
                    for jj in range(kj0, kj1):
                        m[a, b, kk, jj] = b4[a - kk, b - jj]
        mf = np.flip(m, (2, 3))            # fold the weight flip in
        idx = ((1, 3, 5), (0, 2, 4))       # output parity -> kernel taps
        ph = np.stack([mf[idx[pa], :][:, idx[pb]]
                       for pa in (0, 1) for pb in (0, 1)])   # (4,k,k,k,k)
        # cache NUMPY: jnp.asarray inside a jit trace yields a tracer, and
        # caching that leaks it across traces (UnexpectedTracerError).
        _UPBLUR_COMPOSE[key] = ph.reshape(4 * k * k, k * k)
    return _UPBLUR_COMPOSE[key]


def _up_conv_polyphase(xi, w):
    """conv_transpose2d(stride 2) + FIR blur as ONE regular conv.

    Fusing the 4x4 blur into the transposed conv's kernel removes a full-res
    depthwise pass (bandwidth-bound, no MXU; this chip streams ~150 GB/s so
    each full-res round trip is ~3-7 ms). The fused kernel is (k+3, k+3) on a
    2x-dilated input, which XLA lowers ~8x SLOWER than the chain — so it is
    split into its 4 output-parity phases: one regular (k, k) conv producing
    4*out_ch channels, then a depth-to-space interleave. Exact to f32
    roundoff vs the chain (1.7e-7 measured); f+b measured 12.6 -> 5.8 ms at
    512^2 64ch. Requires k == 3 (the only styled-conv kernel size,
    ref: dual_styleunet.py:652-712)."""
    k = w.shape[0]
    pm = _upblur_phase_mat(k)                              # (4*k*k, k*k)
    ci, co = w.shape[2], w.shape[3]
    q = jnp.dot(jnp.asarray(pm), w.reshape(k * k, ci * co),
                precision=jax.lax.Precision.HIGHEST)
    kall = q.reshape(4, k, k, ci, co).transpose(1, 2, 3, 0, 4) \
        .reshape(k, k, ci, 4 * co)                         # (k,k,in,4*out)
    o = conv2d(xi, kall, padding=k // 2)
    return upfirdn2d.depth_to_space2(o)


def modulated_conv2d(p, x, style, demodulate=True, up=False):
    """Style-modulated conv (ref: dual_styleunet.py:168-300). Per-sample
    weights via vmap — no grouped-conv reshaping needed."""
    k, _, in_ch, out_ch = p["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    s = equal_linear(p["modulation"], style)              # (B, in_ch)

    def mod_weight(si):
        w = scale * p["weight"] * si[None, None, :, None]  # (k,k,in,out)
        if demodulate:
            demod = jax.lax.rsqrt(jnp.sum(w * w, axis=(0, 1, 2)) + 1e-8)
            w = w * demod[None, None, None, :]
        return w

    def conv_apply(xi, w):
        if up:
            if k == 3:
                return _up_conv_polyphase(xi, w)
            out = conv_transpose2d(xi, w, stride=2)
            return blur(out, make_kernel(BLUR_KERNEL) * 4.0,
                        pad=_up_blur_pad(k))
        return conv2d(xi, w, padding=k // 2)

    if s.shape[0] == 1:
        # One style row modulates every sample: ONE shared weight and one
        # batched conv over all of x — the frame-batched inference path
        # (constant style; vmap-over-weights convs lower poorly on TPU,
        # see BASELINE.md "measured dead ends"). Identical math to the
        # per-sample branch when B == 1.
        return conv_apply(x, mod_weight(s[0]))

    def per_sample(xi, si):
        return conv_apply(xi[None], mod_weight(si))[0]

    return jax.vmap(per_sample)(x, s)


def _up_blur_pad(k):
    p = (len(BLUR_KERNEL) - 2) - (k - 1)
    return ((p + 1) // 2 + 1, p // 2 + 1)


def styled_conv_init(key, in_ch, out_ch, k, style_dim):
    kc, = jax.random.split(key, 1)
    return dict(
        conv=modulated_conv2d_init(kc, in_ch, out_ch, k, style_dim),
        noise_weight=jnp.zeros((), jnp.float32),
        act_bias=jnp.zeros((out_ch,), jnp.float32),
    )


def styled_conv(p, x, style, noise, up=False):
    out = modulated_conv2d(p["conv"], x, style, demodulate=True, up=up)
    if noise is not None:
        out = out + p["noise_weight"] * noise
    return _cast_act(fused_leaky_relu(out, p["act_bias"]))


def to_rgb_init(key, in_ch, style_dim, out_ch):
    return dict(
        conv=modulated_conv2d_init(key, in_ch, out_ch, 1, style_dim,
                                   demodulate=False),
        bias=jnp.zeros((out_ch,), jnp.float32),
    )


def to_rgb(p, x, style, skip=None):
    out = modulated_conv2d(p["conv"], x, style, demodulate=False) + p["bias"]
    if skip is not None:
        # iwt -> FIR upsample -> haar fused into one transposed conv
        # (9 depthwise convs + two 3-channel full-res intermediates -> 1 op)
        out = out + wavelet_upsample(skip, BLUR_KERNEL)
    return out


def from_rgb_apply(p, img, skip):
    """FromRGB with downsample=True, use_wt=False (encoder variant,
    ref: dual_styleunet.py:442-470)."""
    img = downsample(img, make_kernel(BLUR_KERNEL))
    out = conv_layer(p["conv"], img, 1)
    if skip is not None:
        out = out + skip
    return img, out


# ---------------------------------------------------------------------------
# DualStyleUNet
# ---------------------------------------------------------------------------

def _channels(mult: int) -> Dict[int, int]:
    return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * mult,
            128: 128 * mult, 256: 64 * mult, 512: 32 * mult,
            1024: 16 * mult, 2048: 16 * mult, 4096: 16 * mult}


class DualStyleUNet:
    def __init__(self, inp_size: int, inp_ch: int, out_ch: int, out_size: int,
                 style_dim: int, n_mlp: int, middle_size: int = 8,
                 channel_multiplier: int = 2, lr_mlp: float = 0.01,
                 channel_max: int = 512, remat: bool = False):
        # remat=True rematerializes each decoder stage in the backward pass
        # (jax.checkpoint) — trades ~1/3 more decoder FLOPs for not saving
        # the big high-res activations, the standard HBM lever at 1024^2
        self.remat = remat
        self.inp_size = inp_size
        self.inp_ch = inp_ch
        self.out_ch = out_ch
        self.out_size = out_size
        self.style_dim = style_dim
        self.n_mlp = n_mlp
        self.lr_mlp = lr_mlp
        self.middle_log_size = int(math.log2(middle_size))
        self.log_size = int(math.log2(out_size)) - 1
        # the encoder must emit at least one stage reaching middle_size so
        # the final comb_conv exists (same constraint as the reference
        # schedule, dual_styleunet.py:692-701)
        assert inp_size >= 4 * middle_size, \
            f"inp_size {inp_size} must be >= {4 * middle_size}"
        # channel_max < 512 shrinks the net uniformly (tests / dryruns on
        # weak hosts); 512 == the reference schedule exactly
        self.channels = {k: min(v, channel_max)
                         for k, v in _channels(channel_multiplier).items()}

        # encoder channel schedule
        self.enc_in = self.channels[inp_size // 2]
        self.enc_stages = []  # (in_ch, out_ch) for FromRGB/ConvBlock pairs
        in_ch = self.enc_in
        for i in range(int(math.log2(inp_size)) - 2, self.middle_log_size - 1, -1):
            out_c = self.channels[2 ** i]
            self.enc_stages.append((in_ch, out_c, i))
            in_ch = out_c

        # decoder stage schedule
        self.dec_stages = []  # (in_ch, out_ch)
        in_ch = self.channels[middle_size]
        for i in range(self.middle_log_size + 1, self.log_size + 1):
            out_c = self.channels[2 ** i]
            self.dec_stages.append((in_ch, out_c))
            in_ch = out_c
        self.num_layers = (self.log_size - self.middle_log_size) * 2
        self.n_latent = self.log_size * 2 - (self.middle_log_size * 2 - 1) + 1

    # -- init ---------------------------------------------------------------
    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, 256))
        nk = lambda: next(keys)
        p: dict = {}

        p["style"] = [equal_linear_init(nk(), self.style_dim, self.style_dim,
                                        lr_mul=self.lr_mlp)
                      for _ in range(self.n_mlp)]

        p["conv_in"] = conv_layer_init(nk(), self.inp_ch, self.enc_in, 3,
                                       downsample_=True)
        p["from_rgbs"] = []
        p["cond_convs"] = []
        p["comb_convs"] = [conv_layer_init(nk(), self.enc_in * 2,
                                           self.enc_in, 3)]
        for (in_ch, out_c, i) in self.enc_stages:
            p["from_rgbs"].append(
                dict(conv=conv_layer_init(nk(), self.inp_ch, in_ch, 1)))
            p["cond_convs"].append(conv_block_init(nk(), in_ch, out_c))
            if i > self.middle_log_size:
                p["comb_convs"].append(conv_layer_init(nk(), out_c * 2, out_c, 3))
            else:
                p["comb_convs"].append(conv_layer_init(nk(), out_c, out_c, 3))

        for branch in ("1", "2"):
            convs, rgbs = [], []
            for (in_ch, out_c) in self.dec_stages:
                convs.append(styled_conv_init(nk(), in_ch, out_c, 3,
                                              self.style_dim))
                convs.append(styled_conv_init(nk(), out_c, out_c, 3,
                                              self.style_dim))
                rgbs.append(to_rgb_init(nk(), out_c, self.style_dim,
                                        self.out_ch * 4))
            p[f"convs{branch}"] = convs
            p[f"to_rgbs{branch}"] = rgbs

        # fixed noise buffers (ref: dual_styleunet.py:717-721)
        noises = []
        for layer_idx in range(self.num_layers):
            res = (layer_idx + 2 * (self.middle_log_size + 1)) // 2
            noises.append(jax.random.normal(nk(), (1, 2 ** res, 2 ** res, 1)))
        p["noises"] = noises
        return p

    # -- forward ------------------------------------------------------------
    def apply(self, p: dict, style: jnp.ndarray, cond_img: jnp.ndarray,
              view_feature1: Optional[jnp.ndarray] = None,
              view_feature2: Optional[jnp.ndarray] = None,
              noise: Optional[List] = None,
              randomize_noise: bool = False,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """style: (B, style_dim); cond_img: (B, inp_size, inp_size, inp_ch)
        NHWC. Returns (B, out_size, out_size, 2*out_ch): [front, back]."""
        latent = style
        for lp in p["style"]:
            if lp is p["style"][0]:
                latent = pixel_norm(latent)
            latent = equal_linear(lp, latent, lr_mul=self.lr_mlp,
                                  activation=True)

        if noise is None:
            if randomize_noise:
                assert rng is not None
                rngs = jax.random.split(rng, self.num_layers)
                noise = [
                    jax.random.normal(rngs[i],
                                      (cond_img.shape[0],) + tuple(
                                          p["noises"][i].shape[1:]))
                    for i in range(self.num_layers)]
            else:
                # The reference registers noise maps as non-trainable
                # BUFFERS (ref: dual_styleunet.py:713-721 register_buffer):
                # no gradient flows to them. Without the stop_gradient the
                # backward spends ~60 ms/step on full-resolution
                # reduce-sums producing grads the reference never computes
                # (12 fusions at styleunet.py:410 in the step trace).
                noise = [jax.lax.stop_gradient(n) for n in p["noises"]]

        # encoder
        cond_img_cur = cond_img
        cond_out = conv_layer(p["conv_in"], cond_img, 3, downsample_=True)
        cond_list = [cond_out]
        for frgb, cblock in zip(p["from_rgbs"], p["cond_convs"]):
            cond_img_cur, cond_out = from_rgb_apply(frgb, cond_img_cur,
                                                    cond_out)
            cond_out = conv_block(cblock, cond_out)
            cond_list.append(cond_out)

        def decode(convs, rgbs, view_feature):
            out = None
            skip = None
            i = 0
            n_comb = len(p["comb_convs"])

            def stage_fn(c1, c2, rgb, n1, n2, out, skip):
                out = styled_conv(c1, out, latent, n1, up=True)
                out = styled_conv(c2, out, latent, n2)
                skip = to_rgb(rgb, out, latent, skip)
                return out, skip

            if self.remat:
                stage_fn = jax.checkpoint(stage_fn)

            for stage, ((c1, c2), rgb) in enumerate(
                    zip(zip(convs[::2], convs[1::2]), rgbs)):
                if i == 0:
                    out = conv_layer(p["comb_convs"][-1], cond_list[-1], 3)
                elif i < 2 * n_comb:
                    out = jnp.concatenate(
                        [out, cond_list[-1 - (i // 2)]], axis=-1)
                    out = conv_layer(p["comb_convs"][-1 - (i // 2)], out, 3)
                out, skip = stage_fn(c1, c2, rgb, noise[i], noise[i + 1],
                                     out, skip)
                if view_feature is not None and i == 8:
                    vf = jax.image.resize(
                        view_feature,
                        (view_feature.shape[0], out.shape[1], out.shape[2],
                         view_feature.shape[3]), method="bilinear")
                    out = out + vf
                i += 2
            return inverse_haar_transform(skip)

        image1 = decode(p["convs1"], p["to_rgbs1"], view_feature1)
        image2 = decode(p["convs2"], p["to_rgbs2"], view_feature2)
        return jnp.concatenate([image1, image2], axis=-1)
