"""2D feature fields: differentiable grid sampling, conv stacks, a 5-level
U-Net, and tri-plane / UV learned feature maps.

Re-implementation of `utils/feature2d.py` (ref: feature2d.py:9-183):
  * ``grid_sample2d`` — bilinear sampling of an NHWC feature image at
    normalized [-1, 1] points, differentiable w.r.t. both image and points
    (the reference hand-writes this so torch's grid_sample gets a custom
    double-backward; JAX autodiff handles it directly);
  * ``triplane_sample`` / ``TriPlaneFeature`` — sample the (xy, yz, zx)
    planes of a 3C-channel plane stack at 3D points and concat;
  * ``UVFeature`` — a single learned UV feature plane;
  * ``ConvStack`` — k-size-{3,5,7} same-res conv stack with optional leaky
    ReLU (ref: feature2d.py:27-56);
  * ``UNet5`` — 5-level stride-2 U-Net with transposed-conv decoder and
    skip concats (BatchNorm folded away: inference-style, scale handled by
    the convs — ref: feature2d.py:58-89 trains with use_bn=True but the
    shipped pipeline never instantiates it).

Layout: NHWC throughout (TPU-native); the reference is NCHW.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# grid sampling
# ---------------------------------------------------------------------------

def grid_sample2d(image: jnp.ndarray, p2d: jnp.ndarray) -> jnp.ndarray:
    """image: (B, H, W, C); p2d: (B, ..., 2) in [-1, 1] (x, y order,
    align_corners=True semantics). Returns (B, ..., C)."""
    B, H, W, C = image.shape
    pts_shape = p2d.shape[1:-1]
    p = p2d.reshape(B, -1, 2)
    ix = (p[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (p[..., 1] + 1.0) * 0.5 * (H - 1)
    ix0 = jnp.floor(jax.lax.stop_gradient(ix))
    iy0 = jnp.floor(jax.lax.stop_gradient(iy))
    # corner weights keep full gradients w.r.t. the points
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def g(xi, yi):
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = image.reshape(B, H * W, C)
        idx = yi * W + xi                             # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    out = (g(ix0, iy0) * (wx0 * wy0)[..., None]
           + g(ix0 + 1, iy0) * (wx1 * wy0)[..., None]
           + g(ix0, iy0 + 1) * (wx0 * wy1)[..., None]
           + g(ix0 + 1, iy0 + 1) * (wx1 * wy1)[..., None])
    return out.reshape((B,) + tuple(pts_shape) + (C,))


def triplane_sample(xyz: jnp.ndarray, fmap: jnp.ndarray) -> jnp.ndarray:
    """xyz: (B, ..., 3) in [-1, 1]; fmap: (B, H, W, 3C) plane stack
    [xy | yz | zx]. Returns (B, ..., 3C) concat of the three plane samples
    (ref: feature2d.py:144-153)."""
    C = fmap.shape[-1] // 3
    outs = []
    for pi, (a1, a2) in enumerate(((0, 1), (1, 2), (2, 0))):
        plane = fmap[..., pi * C:(pi + 1) * C]
        p2d = jnp.stack([xyz[..., a1], xyz[..., a2]], axis=-1)
        outs.append(grid_sample2d(plane, p2d))
    return jnp.concatenate(outs, axis=-1)


class TriPlaneFeature:
    """Learned (1, S, S, 3C) plane stack (ref: feature2d.py:156-167)."""

    def __init__(self, feat_dim: int, feat_size: int):
        self.feat_dim = feat_dim
        self.feat_size = feat_size

    def init(self, key) -> dict:
        return dict(fmap=0.03 * jax.random.normal(
            key, (1, self.feat_size, self.feat_size, 3 * self.feat_dim)))

    def apply(self, p: dict, batch: int) -> jnp.ndarray:
        return jnp.broadcast_to(
            p["fmap"], (batch,) + tuple(p["fmap"].shape[1:]))

    @staticmethod
    def sample_feat(xyz, fmap):
        return triplane_sample(xyz, fmap)


class UVFeature:
    """Learned (1, S, S, C) UV plane (ref: feature2d.py:170-182)."""

    def __init__(self, feat_dim: int, feat_size: int):
        self.feat_dim = feat_dim
        self.feat_size = feat_size

    def init(self, key) -> dict:
        return dict(fmap=0.03 * jax.random.normal(
            key, (1, self.feat_size, self.feat_size, self.feat_dim)))

    def apply(self, p: dict, batch: int) -> jnp.ndarray:
        return jnp.broadcast_to(
            p["fmap"], (batch,) + tuple(p["fmap"].shape[1:]))

    @staticmethod
    def sample_feat(p2d, fmap):
        return grid_sample2d(fmap, p2d)


# ---------------------------------------------------------------------------
# conv stacks
# ---------------------------------------------------------------------------

def _conv_init(key, cin, cout, k, bias=False):
    w = jax.random.normal(key, (k, k, cin, cout)) * math.sqrt(
        2.0 / (k * k * cin))
    p = dict(w=w.astype(jnp.float32))
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _conv(p, x, stride=1, pad=None):
    k = p["w"].shape[0]
    pd = (k - 1) // 2 if pad is None else pad
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pd, pd), (pd, pd)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"] if "b" in p else y


def _deconv(p, x):
    """Transposed 3x3 stride-2 conv with output_padding=1 (torch deconv3x3,
    ref: feature2d.py:18-24): exact 2x upsampling."""
    w = jnp.flip(p["w"], (0, 1))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"] if "b" in p else y


class ConvStack:
    """Same-resolution conv stack (ref: feature2d.py:27-56)."""

    def __init__(self, in_dim: int, out_dim: int,
                 hid_dim: Optional[int] = None, kernel_size: int = 5,
                 layer_num: int = 3, use_relu: bool = False):
        assert kernel_size in (3, 5, 7)
        self.dims = ([in_dim] + [hid_dim or out_dim] * (layer_num - 1)
                     + [out_dim])
        self.k = kernel_size
        self.use_relu = use_relu

    def init(self, key) -> list:
        keys = jax.random.split(key, len(self.dims) - 1)
        return [_conv_init(k, self.dims[i], self.dims[i + 1], self.k)
                for i, k in enumerate(keys)]

    def apply(self, p: list, x: jnp.ndarray) -> jnp.ndarray:
        for i, cp in enumerate(p):
            x = _conv(cp, x)
            if self.use_relu and i < len(p) - 1:
                x = jnp.where(x >= 0, x, 0.2 * x)
        return x


class UNet5:
    """5-level U-Net (ref: feature2d.py:58-89). The reference wraps each
    conv in BatchNorm+ReLU; here LeakyReLU only (BN folds into conv scales
    at inference and the net is unused by every shipped config)."""

    def __init__(self, in_c: int, out_c: int, nf: int):
        self.in_c, self.out_c, self.nf = in_c, out_c, nf

    def init(self, key) -> dict:
        nf = self.nf
        ks = iter(jax.random.split(key, 16))
        return dict(
            conv1=_conv_init(next(ks), self.in_c, nf, 3),
            conv2=_conv_init(next(ks), nf, 2 * nf, 3),
            conv3=_conv_init(next(ks), 2 * nf, 4 * nf, 3),
            conv4=_conv_init(next(ks), 4 * nf, 8 * nf, 3),
            conv5=_conv_init(next(ks), 8 * nf, 8 * nf, 3),
            deconv1=_conv_init(next(ks), 8 * nf, 8 * nf, 3),
            deconv2=_conv_init(next(ks), 16 * nf, 4 * nf, 3),
            deconv3=_conv_init(next(ks), 8 * nf, 2 * nf, 3),
            deconv4=_conv_init(next(ks), 4 * nf, nf, 3),
            deconv5=_conv_init(next(ks), 2 * nf, nf, 3),
            tail=_conv_init(next(ks), nf, self.out_c, 1, bias=True),
        )

    def apply(self, p: dict, x: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: jnp.where(v >= 0, v, 0.2 * v)
        x1 = act(_conv(p["conv1"], x))
        x2 = act(_conv(p["conv2"], x1, stride=2))
        x3 = act(_conv(p["conv3"], x2, stride=2))
        x4 = act(_conv(p["conv4"], x3, stride=2))
        x5 = act(_conv(p["conv5"], x4, stride=2))
        y1 = act(_deconv(p["deconv1"], x5))
        y2 = act(_deconv(p["deconv2"], jnp.concatenate([y1, x4], -1)))
        y3 = act(_deconv(p["deconv3"], jnp.concatenate([y2, x3], -1)))
        y4 = act(_deconv(p["deconv4"], jnp.concatenate([y3, x2], -1)))
        y5 = act(_conv(p["deconv5"], jnp.concatenate([y4, x1], -1)))
        return _conv(p["tail"], y5)
