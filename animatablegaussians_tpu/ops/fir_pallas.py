"""Pallas TPU kernel for separable up-FIR-down resampling (upfirdn2d).

XLA lowers the depthwise FIR convolutions of the StyleGAN2 resampling ops
(blur / upsample / downsample, ops/upfirdn2d.py) to ~1-1.8 ms ops regardless
of input size — 10-25x off memory bandwidth; the round-2 train step spent
~40 ms/step in them (its largest single source line). The op is a <=4-tap
separable stencil — pure bandwidth — so this kernel streams it at memory
speed:

  * grid (C-blocks, outH-blocks); each step reads a (HB, W, CB) input block
    plus two HALO-row neighbour refs (tail of the previous H-block, head of
    the next — clamped index maps, edge rows masked to the zero padding the
    math requires);
  * vertical taps combine halo+current rows (major-dim slices);
  * horizontal taps are static column shifts over zero-padded copies;
  * up=2 computes the two output phases and interleaves them with
    pltpu.repeat + parity select; down=2 keeps the strided outputs
    (reference semantics: network/styleunet/upfirdn2d_kernel.cu:49-105,
    upfirdn2d.py:186-227);
  * f32 accumulation throughout — bit-closer to the reference than the XLA
    conv path is in bf16 throughput mode.

STATUS (round-3 measurement on v5e): exact on hardware (err ~4e-7 vs the
HIGHEST-precision conv path) but end-to-end SLOWER than the XLA conv path
(DualStyleUNet fwd 28.5 -> 45.9 ms, f+b 68.6 -> 101.9 ms) — the (8, W, C)
blocks leave it relayout/pipeline-bound. Disabled by default
(ops/upfirdn2d.PALLAS_FIR = "off"); revisit with bigger blocks + manual DMA
pipelining.

Backward is the same operator transposed — upfirdn2d(g, flip(k), up=down,
down=up, grad pads), the identity the reference autograd uses
(ref: network/styleunet/upfirdn2d.py:33-164) — so the custom VJP reuses the
kernel.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4   # rows fetched from each neighbouring H-block (>= max pad + 1)
HB = 8     # input rows per grid step


def separable_factors(kernel: np.ndarray):
    """(kh, kw) 2D FIR -> (kv (kh,), kh (kw,)) if rank-1, else None."""
    k = np.asarray(kernel, np.float64)
    if k.ndim != 2 or min(k.shape) < 1 or max(k.shape) > HALO:
        return None
    u, s, vt = np.linalg.svd(k)
    if min(k.shape) > 1 and s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    g = math.sqrt(float(s[0]))
    kv = (u[:, 0] * g).astype(np.float32)
    kh_ = (vt[0] * g).astype(np.float32)
    if kv.sum() < 0 and kh_.sum() < 0:  # stabilize the sign split
        kv, kh_ = -kv, -kh_
    return kv, kh_


def _take(win, axis, start, num, stride=1):
    """Static strided slice along `axis`, zero-padded outside the window.

    Mosaic has no strided vector slice (it would lower as a gather), so
    stride 2 is expressed as a contiguous slice + axis split + unit index."""
    L = win.shape[axis]
    span = num * stride
    pad_lo = max(0, -start)
    pad_hi = max(0, start + span - L)
    if pad_lo or pad_hi:
        zshape_lo = list(win.shape)
        zshape_lo[axis] = pad_lo
        zshape_hi = list(win.shape)
        zshape_hi[axis] = pad_hi
        parts = []
        if pad_lo:
            parts.append(jnp.zeros(zshape_lo, win.dtype))
        parts.append(win)
        if pad_hi:
            parts.append(jnp.zeros(zshape_hi, win.dtype))
        win = jnp.concatenate(parts, axis=axis)
        start += pad_lo
    sl = [slice(None)] * win.ndim
    sl[axis] = slice(start, start + span)
    part = win[tuple(sl)]
    if stride == 1:
        return part
    assert stride == 2
    shape = list(part.shape)
    shape[axis:axis + 1] = [num, 2]
    part = part.reshape(shape)
    sl = [slice(None)] * len(shape)
    sl[axis + 1] = 0
    return part[tuple(sl)]


def _interleave2(even, odd, axis):
    """out[2j] = even[j], out[2j+1] = odd[j] along `axis`.

    (NB: pltpu.repeat is tile-concat, not element repeat — stack+reshape
    expresses the interleave directly.)"""
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _axis_fir(win, taps, up, down, pad0, n_out, axis, halo):
    """1-D upfirdn along `axis`. Window rows w hold input rows w - halo
    (already zeroed where the global row is out of range); block-local
    output rows o = i satisfy the global relation with the t-dependence
    cancelled (both sides advance by HB*up//down rows per grid step)."""
    # upfirdn is a true convolution: y[o] = sum_m k[K-1-m] xup[o + m - p0]
    # (the XLA reference correlates with the flipped kernel). Symmetric
    # blur taps hide the difference; Haar's anti-symmetric taps do not.
    taps = taps[::-1]
    k = len(taps)
    if up == 1:
        acc = None
        for m in range(k):
            part = _take(win, axis, m - pad0 + halo, n_out, stride=down)
            term = part * taps[m]
            acc = term if acc is None else acc + term
        return acc

    assert down == 1
    n_half = -(-n_out // 2)
    phase = []
    for par in range(2):
        acc = None
        for m in range(k):
            u = par + m - pad0           # dilated index at i = par
            if u % 2 != 0:
                continue
            part = _take(win, axis, u // 2 + halo, n_half)
            term = part * taps[m]
            acc = term if acc is None else acc + term
        if acc is None:
            shape = list(win.shape)
            shape[axis] = n_half
            acc = jnp.zeros(shape, win.dtype)
        phase.append(acc)
    out = _interleave2(phase[0], phase[1], axis)
    if out.shape[axis] != n_out:
        out = _take(out, axis, 0, n_out)
    return out


def _vfir_kernel(cur_ref, prev_ref, next_ref, out_ref, *, taps, up, down,
                 pad0, H, hb_out):
    t = pl.program_id(1)

    iota = lambda ref: jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    # global input rows, computed from the UNCLAMPED t (masking turns the
    # clamped edge fetches into the zero padding the FIR needs)
    prev = jnp.where((t * HB - HALO + iota(prev_ref) >= 0)
                     & (t * HB - HALO + iota(prev_ref) < H),
                     prev_ref[...], 0.0)[0]
    cur = jnp.where(t * HB + iota(cur_ref) < H, cur_ref[...], 0.0)[0]
    nxt = jnp.where((t + 1) * HB + iota(next_ref) < H,
                    next_ref[...], 0.0)[0]

    win = jnp.concatenate([prev, cur, nxt], axis=0)  # (HALO+HB+HALO, W, CB)
    out_ref[0] = _axis_fir(win, taps, up, down, pad0, hb_out, axis=0,
                           halo=HALO)


def _hfir_kernel(cur_ref, out_ref, *, taps, up, down, pad0, OW):
    out_ref[0] = _axis_fir(cur_ref[0], taps, up, down, pad0, OW, axis=1,
                           halo=0)


def _vhfir_kernel(cur_ref, prev_ref, next_ref, out_ref, *, kv, kh, up,
                  down, padv, padh, H, OW, hb_out):
    """Fused vertical+horizontal in one kernel (one pallas call per FIR —
    per-call overhead dominates at these block sizes)."""
    t = pl.program_id(1)
    iota = lambda ref: jax.lax.broadcasted_iota(jnp.int32, ref.shape, 1)
    prev = jnp.where((t * HB - HALO + iota(prev_ref) >= 0)
                     & (t * HB - HALO + iota(prev_ref) < H),
                     prev_ref[...], 0.0)[0]
    cur = jnp.where(t * HB + iota(cur_ref) < H, cur_ref[...], 0.0)[0]
    nxt = jnp.where((t + 1) * HB + iota(next_ref) < H,
                    next_ref[...], 0.0)[0]
    win = jnp.concatenate([prev, cur, nxt], axis=0)
    y = _axis_fir(win, kv, up, down, padv, hb_out, axis=0, halo=HALO)
    out_ref[0] = _axis_fir(y, kh, up, down, padh, OW, axis=1, halo=0)


def _out_len(n, k, up, down, p0, p1):
    # matches ops.upfirdn2d.upfirdn2d, whose conv pads (p0, p1 + up - 1)
    # around the (n*up - (up-1))-long zero-stuffed signal
    return (n * up + p0 + p1 - k) // down + 1


def _pallas_core(x, kv, kh, up, down, pad):
    """One fused vertical+horizontal kernel per FIR (per-pallas-call
    overhead dominates at these block sizes; the scoped-VMEM limit is
    raised to fit the fused temporaries)."""
    px0, px1, py0, py1 = pad
    N, H, W, C = x.shape
    OH = _out_len(H, len(kv), up, down, py0, py1)
    OW = _out_len(W, len(kh), up, down, px0, px1)

    CB = min(C, 128)
    grid_c = -(-C // CB)
    interp = jax.default_backend() != "tpu"
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20)
    except Exception:
        params = None

    hb_out = HB * up // down
    grid_in = -(-H // HB)
    grid_out = -(-OH // hb_out)
    j_max = -(-H // HALO) - 1  # halo-block index bound

    cur_map = lambda c, t: (0, jnp.minimum(t, grid_in - 1), 0, c)
    prev_map = lambda c, t: (
        0, jnp.clip(t * (HB // HALO) - 1, 0, j_max), 0, c)
    next_map = lambda c, t: (
        0, jnp.minimum((t + 1) * (HB // HALO), j_max), 0, c)

    out = pl.pallas_call(
        partial(_vhfir_kernel, kv=tuple(float(v) for v in kv),
                kh=tuple(float(v) for v in kh), up=up, down=down,
                padv=py0, padh=px0, H=H, OW=OW, hb_out=hb_out),
        grid=(grid_c, grid_out),
        in_specs=[
            pl.BlockSpec((1, HB, W, CB), cur_map),
            pl.BlockSpec((1, HALO, W, CB), prev_map),
            pl.BlockSpec((1, HALO, W, CB), next_map),
        ],
        out_specs=pl.BlockSpec((1, hb_out, OW, CB),
                               lambda c, t: (0, t, 0, c)),
        out_shape=jax.ShapeDtypeStruct(
            (1, grid_out * hb_out, OW, CB * grid_c), jnp.float32),
        interpret=interp,
        compiler_params=params,
    )(x, x, x)
    return out[:, :OH, :, :C]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def upfirdn2d_pallas(x: jnp.ndarray, kv: tuple, kh: tuple, up: int,
                     down: int, pad: Tuple[int, int, int, int]):
    """x: (N, H, W, C) f32. kv/kh: static tap tuples. pad: (px0, px1, py0,
    py1). Matches ops.upfirdn2d.upfirdn2d for separable kernels with
    up/down in {1, 2} (validated exactly in tests/test_fir_pallas.py)."""
    N = x.shape[0]
    x = x.astype(jnp.float32)
    if N == 1:
        return _pallas_core(x, kv, kh, up, down, pad)
    return jnp.concatenate(
        [_pallas_core(x[i:i + 1], kv, kh, up, down, pad)
         for i in range(N)], axis=0)


def _fwd(x, kv, kh, up, down, pad):
    return upfirdn2d_pallas(x, kv, kh, up, down, pad), x.shape


def _bwd(kv, kh, up, down, pad, in_shape, g):
    # transpose identity (ref: network/styleunet/upfirdn2d.py:33-164)
    px0, px1, py0, py1 = pad
    N, H, W, C = in_shape
    OH = _out_len(H, len(kv), up, down, py0, py1)
    OW = _out_len(W, len(kh), up, down, px0, px1)
    gx0 = len(kh) - px0 - 1
    gx1 = W * up - OW * down + px0 - up + 1
    gy0 = len(kv) - py0 - 1
    gy1 = H * up - OH * down + py0 - up + 1
    grad = upfirdn2d_pallas(g, tuple(reversed(kv)), tuple(reversed(kh)),
                            down, up, (gx0, gx1, gy0, gy1))
    return (grad,)


upfirdn2d_pallas.defvjp(_fwd, _bwd)
