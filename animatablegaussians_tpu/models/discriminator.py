"""StyleGAN2 wavelet-input Discriminator.

Re-implementation of the reference discriminator
(ref: network/styleunet/dual_styleunet.py:473-567): Haar-domain input,
FromRGB/ConvBlock pyramid down to 4x4, minibatch standard deviation
feature, and an optional pose-projection head (`c_dim > 0`) that scores
via the inner product with a normalized pose embedding. Together with the
StyleGAN d/g/R1 losses in training/losses.py this completes the GAN
fine-tuning surface the reference ships (defined there, unused by the
shipped configs — same status here).

TPU-first: NHWC, wavelet FromRGB downsampling as the fused single conv
(ops/upfirdn2d.wavelet_downsample), minibatch stddev as plain reductions.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.styleunet import (
    BLUR_KERNEL, _channels, conv_block, conv_block_init, conv_layer,
    conv_layer_init, equal_linear, equal_linear_init)
from animatablegaussians_tpu.ops.upfirdn2d import (haar_transform,
                                                   wavelet_downsample)


class Discriminator:
    def __init__(self, size: int, img_channel: int = 6,
                 channel_multiplier: int = 2, c_dim: int = 0,
                 channel_max: int = 512, stddev_group: int = 4,
                 stddev_feat: int = 1):
        self.size = size
        self.img_channel = img_channel
        self.c_dim = c_dim
        self.stddev_group = stddev_group
        self.stddev_feat = stddev_feat
        self.channels = {k: min(v, channel_max)
                         for k, v in _channels(channel_multiplier).items()}
        self.log_size = int(math.log2(size)) - 1
        # (in_ch, out_ch, downsample) per pyramid level
        # (ref: dual_styleunet.py:500-508)
        self.stages = []
        in_ch = self.channels[size]
        for i in range(self.log_size, 2, -1):
            out_ch = self.channels[2 ** (i - 1)]
            self.stages.append((in_ch, out_ch, i != self.log_size))
            in_ch = out_ch
        self.final_in = in_ch

    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, 128))
        nk = lambda: next(keys)
        p: dict = {"from_rgbs": [], "convs": []}
        for (in_ch, out_ch, _) in self.stages:
            p["from_rgbs"].append(dict(conv=conv_layer_init(
                nk(), self.img_channel * 4, in_ch, 1)))
            p["convs"].append(conv_block_init(nk(), in_ch, out_ch))
        p["final_from_rgb"] = dict(conv=conv_layer_init(
            nk(), self.img_channel * 4, self.channels[4], 1))
        p["final_conv"] = conv_layer_init(nk(), self.final_in + 1,
                                          self.channels[4], 3)
        p["final_linear"] = [
            equal_linear_init(nk(), self.channels[4] * 4 * 4,
                              self.channels[4]),
            equal_linear_init(nk(), self.channels[4], 1),
        ]
        if self.c_dim > 0:
            dims = [self.c_dim, 64, 64, 64, 64]
            p["mapping"] = [equal_linear_init(nk(), dims[i], dims[i + 1],
                                              lr_mul=0.01)
                            for i in range(4)]
        return p

    def _minibatch_stddev(self, out: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) -> concat one per-group stddev channel
        (ref: dual_styleunet.py:548-556)."""
        B, H, W, C = out.shape
        group = min(B, self.stddev_group)
        m = B // group
        g = out.reshape(group, m, H, W, self.stddev_feat,
                        C // self.stddev_feat)
        stddev = jnp.sqrt(jnp.var(g, axis=0) + 1e-8)   # (m, H, W, F, C/F)
        stddev = stddev.mean(axis=(1, 2, 4))           # (m, F); F == 1
        stddev = stddev.mean(axis=1)                   # (m,)
        stddev = jnp.tile(stddev, (group,))            # (B,) b = g*m + j
        stddev = jnp.broadcast_to(stddev[:, None, None, None], (B, H, W, 1))
        return jnp.concatenate([out, stddev], axis=-1)

    def apply(self, p: dict, img: jnp.ndarray,
              flat_pose: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """img: (B, size, size, img_channel) NHWC -> (B, 1) logits."""
        x = haar_transform(img)                       # wavelet-domain input
        out = None
        for (stage, fp, cp) in zip(self.stages, p["from_rgbs"], p["convs"]):
            _, _, down = stage
            if down:
                x = wavelet_downsample(x, BLUR_KERNEL)
            skip = conv_layer(fp["conv"], x, 1)
            out = skip if out is None else skip + out
            out = conv_block(cp, out)
        x = wavelet_downsample(x, BLUR_KERNEL)
        out = conv_layer(p["final_from_rgb"]["conv"], x, 1) + out

        out = self._minibatch_stddev(out)
        out = conv_layer(p["final_conv"], out, 3)
        out = out.reshape(out.shape[0], -1)
        out = equal_linear(p["final_linear"][0], out, activation=True)
        out = equal_linear(p["final_linear"][1], out)   # (B, 1)

        if self.c_dim > 0:
            assert flat_pose is not None
            e = flat_pose
            for lp_ in p["mapping"]:
                e = equal_linear(lp_, e, lr_mul=0.01, activation=True)
            e = e * jax.lax.rsqrt(jnp.mean(e * e, axis=1,
                                           keepdims=True) + 1e-8)
            out = jnp.sum(out * e, axis=1, keepdims=True) / math.sqrt(
                self.c_dim)
        return out
