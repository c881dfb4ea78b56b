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


def depth_to_space2(o: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4c) phase-major [a, b, c] channels -> (N, 2H, 2W, c).

    Algebraically identical to ``reshape(n,h,w,2,2,c).transpose(0,1,3,2,4,5)
    .reshape(n,2h,2w,c)`` but avoids the 6-D transpose: the column phase b is
    already adjacent to c in memory, so the W-interleave is a FREE reshape of
    each row half, and only the row interleave pays one stack copy. Measured
    on v5e at (1,512,512,4c): c=3 3.92 -> 1.61 ms, c=16 3.51 -> 2.10 ms,
    c=64 4.59 -> 4.53 ms — the transpose's strided copy is worst exactly at
    the full-res few-channel ToRGB/output stages."""
    n, h, w, c4 = o.shape
    c = c4 // 4
    r0 = o[..., :2 * c].reshape(n, h, 2 * w, c)    # a=0 rows
    r1 = o[..., 2 * c:].reshape(n, h, 2 * w, c)    # a=1 rows
    y = jnp.stack([r0, r1], axis=2)                # (N, H, 2, 2W, c)
    return y.reshape(n, 2 * h, 2 * w, c)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(N, 2H, 2W, c) -> (N, H, W, 4c) with phase-major [a, b, c] channels.

    Inverse of depth_to_space2 and algebraically identical to
    ``reshape(n,h,2,w,2,c).transpose(0,1,3,2,4,5).reshape(n,h,w,4c)`` minus
    the 6-D transpose: column de-interleave is a free reshape per row half;
    only the row split pays a (fusable) strided slice."""
    n, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x2 = x.reshape(n, h, 2, w2, c)
    r0 = x2[:, :, 0].reshape(n, h, w, 2 * c)       # a=0 rows, [b, c] chans
    r1 = x2[:, :, 1].reshape(n, h, w, 2 * c)
    return jnp.concatenate([r0, r1], axis=-1)


# Pallas FIR path: "auto" enables ops/fir_pallas.py for separable kernels on
# real TPU. Default "off": measured on v5e (round 3), the fused Pallas FIR is
# numerically exact but SLOWER than the XLA conv path end-to-end (DualStyleUNet
# fwd 28.5 -> 45.9 ms) — the small (8, W, C) blocks leave the kernel dominated
# by relayout/pipeline overhead. Kept (with exact tests) as the starting point
# for a future tuning pass.
PALLAS_FIR = "off"
_FACTOR_CACHE: dict = {}


def set_pallas_fir(mode: str):
    global PALLAS_FIR
    PALLAS_FIR = mode


def _try_pallas_fir(x, kernel, up, down, pad4):
    if PALLAS_FIR == "off" or up > 2 or down > 2:
        return None
    if x.shape[-1] < 32:
        # narrow-channel images lane-pad 4-42x in VMEM (blocks overflow the
        # scoped limit) and are cheap on the conv path anyway
        return None
    if not isinstance(kernel, np.ndarray):
        return None                      # traced kernels: conv path
    try:
        import jax
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    key = (kernel.tobytes(), kernel.shape)
    if key not in _FACTOR_CACHE:
        from animatablegaussians_tpu.ops.fir_pallas import separable_factors
        _FACTOR_CACHE[key] = separable_factors(kernel)
    fac = _FACTOR_CACHE[key]
    if fac is None:
        return None
    from animatablegaussians_tpu.ops.fir_pallas import upfirdn2d_pallas
    kv, kh = fac
    out = upfirdn2d_pallas(x, tuple(kv.tolist()), tuple(kh.tolist()),
                           up, down, pad4)
    return out.astype(x.dtype)


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Upsample (zero-stuff) by `up`, pad, FIR-filter, downsample by `down`.

    x: (N, H, W, C). kernel: (kh, kw). pad: (p0, p1) applied to both axes or
    (px0, px1, py0, py1). Matches the reference native semantics bit-for-bit:
    the up-1 trailing zeros the reference inserts after zero-stuffing are
    folded into the right/bottom padding here.
    """
    px0, px1, py0, py1 = _norm_pad(pad)
    out = _try_pallas_fir(x, kernel, up, down, (px0, px1, py0, py1))
    if out is not None:
        return out
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


_DOWN_POLY_CACHE: dict = {}


def downsample(x: jnp.ndarray, kernel: np.ndarray, factor: int = 2) -> jnp.ndarray:
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    c = x.shape[-1]
    if (factor == 2 and isinstance(kernel, np.ndarray)
            and kernel.shape[0] % 2 == 0 and kernel.shape[0] == kernel.shape[1]
            and (pad0 + pad1) % 2 == 0 and c <= 64
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        # Polyphase: a full-res depthwise FIR at c<=12 uses <10% of a vreg
        # lane-wise on TPU (measured ~3.5 ms per 512^2 call). Split the
        # stride-2 correlation into its 4 input parities: space-to-depth +
        # one dense (kh/2, kw/2, 4c, c) conv whose kernel is block-diagonal
        # (tap f at phase (a, b): flip(k)[2m+a, 2n+b] on the matching
        # channel). Identical taps, conv-order summation.
        key = (c, kernel.tobytes(), kernel.shape)
        if key not in _DOWN_POLY_CACHE:
            kf = np.flip(kernel.astype(np.float32), (0, 1))
            kh = kernel.shape[0]
            w = np.zeros((kh // 2, kh // 2, 4 * c, c), np.float32)
            for a in (0, 1):
                for b in (0, 1):
                    pidx = a * 2 + b
                    taps = kf[a::2, b::2]                  # (kh/2, kh/2)
                    for ci in range(c):
                        w[:, :, pidx * c + ci, ci] = taps
            _DOWN_POLY_CACHE[key] = w
        w = _DOWN_POLY_CACHE[key]
        xp = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))
        ph = space_to_depth2(xp)
        return jax.lax.conv_general_dilated(
            ph, jnp.asarray(w, x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_fir_precision())
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
    """(N, H, W, C) -> (N, H/2, W/2, 4C) with [ll, lh, hl, hh] channel blocks.

    A 2x2/stride-2 transform touches each input pixel exactly once per
    subband, so instead of four depthwise convolutions (pathological lane
    utilization at C<=12 on TPU: <10% of a vreg live) this is a
    space-to-depth phase split + 4-term weighted sums — pure elementwise
    work XLA fuses into one pass. Tap-for-tap identical math to the
    upfirdn2d formulation (ref: dual_styleunet.py:374-400):
    out_s[i,j] = sum_{a,b} k_s[a,b] * x[2i+1-a, 2j+1-b]."""
    kers = haar_wavelets()                     # ll, lh, hl, hh
    n, h, w, c = x.shape
    p = x.reshape(n, h // 2, 2, w // 2, 2, c)
    ph = {(a, b): p[:, :, a, :, b, :] for a in (0, 1) for b in (0, 1)}
    outs = []
    for k in kers:
        acc = None
        for a in (0, 1):
            for b in (0, 1):
                term = float(k[1 - a, 1 - b]) * ph[(a, b)]
                acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def inverse_haar_transform(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) -> (N, 2H, 2W, C).

    Inverse of haar_transform, likewise conv-free: with up=2 and a 2x2
    kernel every output pixel receives exactly one tap per subband
    (y[2i+a, 2j+b] = sum_s s_sign*k_s[a,b] * x_s[i,j]), so the synthesis is
    4 phase images of 4-term weighted sums + depth-to-space. Bit-identical
    summation order to the former 4-conv chain (ll + (-lh) + (-hl) + hh)."""
    ll_k, lh_k, hl_k, hh_k = haar_wavelets()
    c = x.shape[-1] // 4
    subs = (x[..., :c], x[..., c:2 * c], x[..., 2 * c:3 * c], x[..., 3 * c:])
    signs = (1.0, -1.0, -1.0, 1.0)
    kers = (ll_k, lh_k, hl_k, hh_k)
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            acc = None
            for s, sg, k in zip(subs, signs, kers):
                term = (sg * float(k[a, b])) * s
                acc = term if acc is None else acc + term
            phases.append(acc)
    # phases are elementwise sums, so the concat fuses into their producers;
    # only the row interleave inside depth_to_space2 pays a copy
    return depth_to_space2(jnp.concatenate(phases, axis=-1))


# ---------------------------------------------------------------------------
# Fused wavelet-domain 2x upsample: haar(upsample(iwt(x))) as ONE conv.
#
# The StyleGAN2 ToRGB skip chain runs inverse-Haar -> FIR upsample -> Haar on
# a 4C-channel wavelet image (ref: dual_styleunet.py ToRGB.forward via
# iwt/upsample/wt). That is 9 depthwise convolutions and two full-resolution
# 3-channel intermediates per call — terrible lane utilization on TPU (3/128
# lanes at 2x res). The composition is a single linear shift-equivariant map
# on the stride-2 lattice, i.e. exactly one transposed convolution
# (lhs_dilation=2) with a small fixed 4C->4C kernel. We build that kernel
# numerically once per (C, fir) by probing the chain with unit impulses and
# verify support/offsets; values are dyadic rationals (products of the Haar
# 1/sqrt(2) pairs and the normalized FIR taps), so the f32 kernel is exact.
# ---------------------------------------------------------------------------

_WAVELET_UP_CACHE: dict = {}


def _wavelet_upsample_kernel(c: int, fir: Tuple[float, ...]):
    """Composed kernel + padding for `wavelet_upsample`.

    Returns (w (kh, kw, 4C, 4C) np.float32, pad ((pl, pr), (pl, pr))).
    """
    key = (c, tuple(fir))
    if key in _WAVELET_UP_CACHE:
        return _WAVELET_UP_CACHE[key]
    import numpy as _np

    kern = make_kernel(fir)

    def chain(x):
        y = inverse_haar_transform(x)
        y = upsample(y, kern)
        return haar_transform(y)

    # Probe with one impulse per input channel on a grid big enough to hold
    # the composed support. S=8, impulse at (4,4).
    S, i0 = 8, 4
    x = _np.zeros((4 * c, S, S, 4 * c), _np.float32)
    for ch in range(4 * c):
        x[ch, i0, i0, ch] = 1.0
    # must escape any enclosing jit trace: the probe is a compile-time
    # constant computation
    with jax.ensure_compile_time_eval():
        y = _np.asarray(chain(jnp.asarray(x)))
    # y: (4C, 2S, 2S, 4C); response of output channel co to impulse in ci.
    nz = _np.argwhere(_np.abs(y).sum(axis=(0, 3)) > 1e-12)
    (u0, v0), (u1, v1) = nz.min(0), nz.max(0)
    kh, kw = u1 - u0 + 1, v1 - v0 + 1
    # For conv_general_dilated with lhs_dilation=2 and padding (pl, pr):
    # y[u] = sum_m xdil[u - pl + m] w[m], xdil[2i] = x[i]
    # => response to impulse at i0: y[u, co] = w[2*i0 + pl - u, ci, co]
    # Choose pl so taps m = 2*i0 + pl - u land in [0, kh): pl = u1 - 2*i0.
    pl_h, pl_w = int(u1 - 2 * i0), int(v1 - 2 * i0)
    w = _np.zeros((int(kh), int(kw), 4 * c, 4 * c), _np.float32)
    for ci in range(4 * c):
        block = y[ci, u0:u1 + 1, v0:v1 + 1, :]        # (kh, kw, co)
        w[:, :, ci, :] = block[::-1, ::-1]
    # output length check: out = (S-1)*2 + 1 + pl + pr - (k-1) + ... solve pr
    # from the required output size 2S: with lhs_dilation the dilated length
    # is 2S-1; out = 2S-1 + pl + pr - kh + 1 = 2S  =>  pr = kh - pl.
    pad = ((pl_h, int(kh) - pl_h), (pl_w, int(kw) - pl_w))
    _WAVELET_UP_CACHE[key] = (w, pad)
    return _WAVELET_UP_CACHE[key]


def _wavelet_downsample_kernel(c: int, fir: Tuple[float, ...]):
    """Composed kernel + padding for `wavelet_downsample` (stride-2 conv)."""
    key = ("down", c, tuple(fir))
    if key in _WAVELET_UP_CACHE:
        return _WAVELET_UP_CACHE[key]
    import numpy as _np

    kern = make_kernel(fir)

    def chain(x):
        y = inverse_haar_transform(x)
        y = downsample(y, kern)
        return haar_transform(y)

    # Stride-2 correlation with left pad pl: y[u] = sum_m x[2u + m - pl] w[m]
    # => an impulse at input position p contributes w[p + pl - 2u] to y[u] —
    # a single probe position only reveals taps of ONE parity, so probe the
    # four (row, col) phase combinations at (i0 | i0+1).
    S, i0 = 16, 8
    probes = [(i0, i0), (i0, i0 + 1), (i0 + 1, i0), (i0 + 1, i0 + 1)]
    x = _np.zeros((4 * c * 4, S, S, 4 * c), _np.float32)
    for pi, (pr_, pc_) in enumerate(probes):
        for ch in range(4 * c):
            x[pi * 4 * c + ch, pr_, pc_, ch] = 1.0
    with jax.ensure_compile_time_eval():
        y = _np.asarray(chain(jnp.asarray(x)))    # (4*4C, S/2, S/2, 4C)

    # support across all probes (in output coords, relative to the probe)
    nz = _np.argwhere(_np.abs(y).sum(axis=(0, 3)) > 1e-12)
    (u0, v0), (u1, v1) = nz.min(0), nz.max(0)
    # choose pl so every observed tap lands in [0, k): pl = 2*u1 - (i0 + 1)
    # covers the widest case; sizes come out of the probe extents.
    pl_h = int(2 * u1) - (i0 + 1)
    pl_w = int(2 * v1) - (i0 + 1)
    kh = (i0 + 1) + pl_h - 2 * int(u0) + 1
    kw = (i0 + 1) + pl_w - 2 * int(v0) + 1
    w = _np.zeros((kh, kw, 4 * c, 4 * c), _np.float32)
    for pi, (pr_, pc_) in enumerate(probes):
        for ci in range(4 * c):
            resp = y[pi * 4 * c + ci]             # (S/2, S/2, co)
            for u in range(int(u0), int(u1) + 1):
                m = pr_ + pl_h - 2 * u
                if not 0 <= m < kh:
                    continue
                for v in range(int(v0), int(v1) + 1):
                    n = pc_ + pl_w - 2 * v
                    if 0 <= n < kw:
                        # same tap may be probed twice (both parities hit the
                        # same index only when out of range); plain assign
                        w[m, n, ci, :] = resp[u, v, :]
    # out = floor((S + pl + pr - k)/2) + 1 = S/2  =>  pr = k - pl - 2
    pad = ((pl_h, kh - pl_h - 2), (pl_w, kw - pl_w - 2))
    _WAVELET_UP_CACHE[key] = (w, pad)
    return _WAVELET_UP_CACHE[key]


def wavelet_downsample(x: jnp.ndarray,
                       fir: Sequence[float] = (1, 3, 3, 1)) -> jnp.ndarray:
    """haar(downsample(iwt(x))) fused into one stride-2 conv.

    x: (N, H, W, 4C) wavelet image -> (N, H/2, W/2, 4C). The wavelet-domain
    FromRGB downsampling step (ref: dual_styleunet.py:442-470 use_wt=True).
    """
    c = x.shape[-1] // 4
    w, pad = _wavelet_downsample_kernel(c, tuple(fir))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (2, 2), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_fir_precision())


def _wavelet_upsample_split_kernel(c: int, fir: Tuple[float, ...]):
    """Polyphase form of `_wavelet_upsample_kernel`: the lhs_dilation=2
    transposed conv split into its 4 output parities, each a REGULAR conv
    over x — XLA lowers 2x-dilated convs ~8x slower than the equivalent
    phase split (same observation as styleunet._up_conv_polyphase).

    Output parity a reads only taps m = (pl - a) mod 2 of the dilated
    kernel (y[2u+a] = sum_t x[u + t - qa] w[2t + ra], ra = (pl-a) % 2,
    qa = (pl-a) // 2). Returns (kall (T, S, 4C, 4*4C), pad ((pl', pr'),
    (pl', pr'))) with parity kernels zero-aligned to a common left pad.
    """
    key = ("upsplit", c, tuple(fir))
    if key in _WAVELET_UP_CACHE:
        return _WAVELET_UP_CACHE[key]
    import numpy as _np

    w, ((pl_h, _), (pl_w, _)) = _wavelet_upsample_kernel(c, tuple(fir))
    kh, kw = w.shape[0], w.shape[1]
    assert pl_h >= 1 and pl_w >= 1, "split form needs positive left pad"

    def phase(axis_pl, axis_k, a):
        ra = (axis_pl - a) % 2
        qa = (axis_pl - a) // 2
        ta = len(range(ra, axis_k, 2))
        return ra, qa, ta

    specs_h = [phase(pl_h, kh, a) for a in (0, 1)]
    specs_w = [phase(pl_w, kw, b) for b in (0, 1)]
    T = max(s[2] + max(s_[1] for s_ in specs_h) - s[1] for s in specs_h)
    S = max(s[2] + max(s_[1] for s_ in specs_w) - s[1] for s in specs_w)
    qh = max(s[1] for s in specs_h)
    qw = max(s[1] for s in specs_w)
    ks = []
    for (ra, qa, ta) in specs_h:
        for (rb, qb, tb) in specs_w:
            kp = _np.zeros((T, S) + w.shape[2:], _np.float32)
            oh, ow = qh - qa, qw - qb
            kp[oh:oh + ta, ow:ow + tb] = w[ra::2, rb::2]
            ks.append(kp)
    kall = _np.concatenate(ks, axis=-1)            # (T, S, 4C, 4*4C)
    pad = ((qh, T - 1 - qh), (qw, S - 1 - qw))
    assert pad[0][1] >= 0 and pad[1][1] >= 0
    _WAVELET_UP_CACHE[key] = (kall, pad)
    return _WAVELET_UP_CACHE[key]


def wavelet_upsample(x: jnp.ndarray,
                     fir: Sequence[float] = (1, 3, 3, 1)) -> jnp.ndarray:
    """haar(upsample(iwt(x))) fused into one conv (+ depth-to-space).

    x: (N, H, W, 4C) wavelet image -> (N, 2H, 2W, 4C). Bit-compatible with
    the three-op chain up to float summation order (validated exactly in
    tests/test_upfirdn2d.py).
    """
    c = x.shape[-1] // 4
    kall, pad = _wavelet_upsample_split_kernel(c, tuple(fir))
    o = jax.lax.conv_general_dilated(
        x, jnp.asarray(kall, x.dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_fir_precision())
    return depth_to_space2(o)
