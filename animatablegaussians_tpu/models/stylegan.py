"""StyleGAN2 generator with wavelet ToRGB skips.

Re-implementation of `network/styleunet/stylegan.py::StyleGenerator`
(ref: stylegan.py:148-331): mapping MLP, learned constant 4x4 input,
modulated-conv synthesis pairs with noise injection, wavelet-domain ToRGB
skip chain, final inverse Haar to pixel space, and the full latent API
(mixing / truncation / W+ / input_is_latent). The companion Discriminator
lives in models/discriminator.py.

TPU-first: shares v1's functional primitives; the ToRGB resampling chain is
the fused single-conv `wavelet_upsample`.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.styleunet import (
    BLUR_KERNEL, _channels, equal_linear, equal_linear_init,
    modulated_conv2d, modulated_conv2d_init, pixel_norm, styled_conv,
    styled_conv_init)
from animatablegaussians_tpu.ops.upfirdn2d import (inverse_haar_transform,
                                                   wavelet_upsample)


class StyleGenerator:
    def __init__(self, size: int, style_dim: int, n_mlp: int,
                 out_ch: int = 3, channel_multiplier: int = 2,
                 lr_mlp: float = 0.01, channel_max: int = 512):
        self.size = size
        self.style_dim = style_dim
        self.n_mlp = n_mlp
        self.out_ch = out_ch
        self.lr_mlp = lr_mlp
        self.channels = {k: min(v, channel_max)
                         for k, v in _channels(channel_multiplier).items()}
        self.log_size = int(math.log2(size)) - 1
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.n_latent = self.log_size * 2 - 2
        self.stages = []            # (in_ch, out_ch) for 8..size/2
        in_ch = self.channels[4]
        for i in range(3, self.log_size + 1):
            self.stages.append((in_ch, self.channels[2 ** i]))
            in_ch = self.channels[2 ** i]

    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, 256))
        nk = lambda: next(keys)
        ch4 = self.channels[4]
        p: dict = {
            "style": [equal_linear_init(nk(), self.style_dim, self.style_dim,
                                        lr_mul=self.lr_mlp)
                      for _ in range(self.n_mlp)],
            "input": jax.random.normal(nk(), (1, 4, 4, ch4)),
            "conv1": styled_conv_init(nk(), ch4, ch4, 3, self.style_dim),
            "to_rgb1": dict(
                conv=modulated_conv2d_init(nk(), ch4, self.out_ch * 4, 1,
                                           self.style_dim, demodulate=False),
                bias=jnp.zeros((self.out_ch * 4,), jnp.float32)),
        }
        convs, rgbs = [], []
        for (in_ch, out_c) in self.stages:
            convs.append(styled_conv_init(nk(), in_ch, out_c, 3,
                                          self.style_dim))
            convs.append(styled_conv_init(nk(), out_c, out_c, 3,
                                          self.style_dim))
            rgbs.append(dict(
                conv=modulated_conv2d_init(nk(), out_c, self.out_ch * 4, 1,
                                           self.style_dim, demodulate=False),
                bias=jnp.zeros((self.out_ch * 4,), jnp.float32)))
        p["convs"] = convs
        p["to_rgbs"] = rgbs
        noises = [jax.random.normal(nk(), (1, 4, 4, 1))]
        for i in range(3, self.log_size + 1):
            for _ in range(2):
                noises.append(jax.random.normal(nk(), (1, 2 ** i, 2 ** i, 1)))
        p["noises"] = noises
        return p

    def get_latent(self, p, style):
        latent = pixel_norm(style)
        for lp in p["style"]:
            latent = equal_linear(lp, latent, lr_mul=self.lr_mlp,
                                  activation=True)
        return latent

    def mean_latent(self, p, n_latent: int, rng) -> jnp.ndarray:
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return self.get_latent(p, z).mean(0, keepdims=True)

    def make_noise(self, rng=None, zero_noise: bool = False) -> List:
        shapes = [(1, 4, 4, 1)]
        for i in range(3, self.log_size + 1):
            shapes += [(1, 2 ** i, 2 ** i, 1)] * 2
        out = []
        for s in shapes:
            if zero_noise or rng is None:
                out.append(jnp.zeros(s))
            else:
                rng, k = jax.random.split(rng)
                out.append(jax.random.normal(k, s))
        return out

    def apply(self, p: dict, styles,
              return_latents: bool = False,
              inject_index: Optional[int] = None,
              truncation: float = 1.0,
              truncation_latent: Optional[jnp.ndarray] = None,
              input_is_latent: bool = False,
              noise: Optional[List] = None,
              randomize_noise: bool = True,
              rng: Optional[jax.Array] = None):
        """styles: list of (B, style_dim) vectors (or one (B, L, D) W+).
        Returns (image (B, size, size, out_ch), latents-or-None)."""
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [self.get_latent(p, s) for s in styles]
        if truncation < 1.0:
            assert truncation_latent is not None
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]

        if len(styles) < 2:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], self.n_latent, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                inject_index = self.n_latent // 2
            l1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None],
                            self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)

        B = latent.shape[0]
        if noise is None:
            if randomize_noise and rng is not None:
                rngs = jax.random.split(rng, self.num_layers)
                noise = [jax.random.normal(
                    rngs[i], (B,) + tuple(p["noises"][i].shape[1:]))
                    for i in range(self.num_layers)]
            else:
                # non-trainable buffers in the reference (register_buffer)
                noise = [jax.lax.stop_gradient(n) for n in p["noises"]]

        def to_rgb(rp, x, w, skip):
            out = modulated_conv2d(rp["conv"], x, w,
                                   demodulate=False) + rp["bias"]
            if skip is not None:
                out = out + wavelet_upsample(skip, BLUR_KERNEL)
            return out

        out = jnp.broadcast_to(p["input"], (B,) + tuple(p["input"].shape[1:]))
        out = styled_conv(p["conv1"], out, latent[:, 0], noise[0])
        skip = to_rgb(p["to_rgb1"], out, latent[:, 1], None)

        i = 1
        for (c1, c2), rgb, n1, n2 in zip(
                zip(p["convs"][::2], p["convs"][1::2]), p["to_rgbs"],
                noise[1::2], noise[2::2]):
            out = styled_conv(c1, out, latent[:, i], n1, up=True)
            out = styled_conv(c2, out, latent[:, i + 1], n2)
            skip = to_rgb(rgb, out, latent[:, min(i + 2, self.n_latent - 1)],
                          skip)
            i += 2

        image = inverse_haar_transform(skip)
        return (image, latent) if return_latents else (image, None)
