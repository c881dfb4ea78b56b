"""DualStyleUNet v2 family: the reference's alternate-module nets.

Re-implementation of `network/styleunet/dual_styleunet_v2.py` (reachable in
the reference through the `model.module` importlib hook,
ref: main_avatar.py:45-47) as functional JAX on the v1 primitives:

  * ``DualStyleUNetV2`` — v1 architecture plus the full StyleGAN2 latent
    API: style-list mixing with ``inject_index``, truncation toward a mean
    latent, ``input_is_latent``, per-layer W+ latents, and an optional
    conditioning vector concatenated into the mapping MLP when ``c_dim > 0``
    (ref: dual_styleunet_v2.py:634-901);
  * ``mode="add_dwt"`` — the condition image enters in the Haar wavelet
    domain: cond = dwt(img), conv_in consumes 4*inp_ch, the FromRGB cascade
    downsamples in wavelet space (use_wt=True), one fewer encoder stage
    (ref: dual_styleunet_v2.py:903-1184);
  * ``mode="wo_dwt"`` — no wavelets anywhere: one extra decoder stage up to
    out_size, pixel-space ToRGB skips (use_wt=False, FIR upsample only),
    the branch output is the skip itself (ref: dual_styleunet_v2.py:1186-1451).

TPU-first notes: the wavelet FromRGB/ToRGB resampling chains use the fused
single-conv forms (ops/upfirdn2d.wavelet_up/downsample); everything else
shares v1's NHWC/vmap design (models/styleunet.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.styleunet import (
    BLUR_KERNEL, _channels, conv_block, conv_block_init, conv_layer,
    conv_layer_init, equal_linear, equal_linear_init, modulated_conv2d,
    modulated_conv2d_init, pixel_norm, styled_conv, styled_conv_init)
from animatablegaussians_tpu.ops.upfirdn2d import (
    downsample, haar_transform, inverse_haar_transform, make_kernel,
    upsample, wavelet_downsample, wavelet_upsample)


class DualStyleUNetV2:
    """v2 net (ref: dual_styleunet_v2.py:634-901 and variants)."""

    MODES = ("base", "add_dwt", "wo_dwt")

    def __init__(self, inp_size: int, inp_ch: int, out_ch: int, out_size: int,
                 style_dim: int, n_mlp: int, middle_size: int = 8,
                 c_dim: int = 0, channel_multiplier: int = 2,
                 lr_mlp: float = 0.01, channel_max: int = 512,
                 mode: str = "base"):
        assert mode in self.MODES, mode
        self.mode = mode
        self.inp_size = inp_size
        self.inp_ch = inp_ch
        self.out_ch = out_ch
        self.out_size = out_size
        self.style_dim = style_dim
        self.c_dim = c_dim
        self.n_mlp = n_mlp
        self.lr_mlp = lr_mlp
        self.middle_log_size = int(math.log2(middle_size))
        self.log_size = int(math.log2(out_size)) - 1
        self.channels = {k: min(v, channel_max)
                         for k, v in _channels(channel_multiplier).items()}

        # encoder schedule (ref: v2 base 680-699; add_dwt starts one stage
        # later on the half-res wavelet stream, v2:951-965)
        if mode == "add_dwt":
            self.enc_in = self.channels[inp_size // 4]
            enc_top = int(math.log2(inp_size)) - 3
            self.cond_ch = inp_ch * 4
        else:
            self.enc_in = self.channels[inp_size // 2]
            enc_top = int(math.log2(inp_size)) - 2
            self.cond_ch = inp_ch
        self.enc_stages = []
        in_ch = self.enc_in
        for i in range(enc_top, self.middle_log_size - 1, -1):
            self.enc_stages.append((in_ch, self.channels[2 ** i], i))
            in_ch = self.channels[2 ** i]

        # decoder schedule (wo_dwt runs one stage further: pixel space needs
        # out_size, wavelet space only out_size/2; ref v2:1282-1299)
        dec_top = self.log_size + (2 if mode == "wo_dwt" else 1)
        self.dec_stages = []
        in_ch = self.channels[middle_size]
        for i in range(self.middle_log_size + 1, dec_top):
            self.dec_stages.append((in_ch, self.channels[2 ** i]))
            in_ch = self.channels[2 ** i]
        self.num_layers = 2 * len(self.dec_stages)
        # W+ length (ref: v2:764 base/add_dwt; v2:1301 wo_dwt)
        self.n_latent = self.log_size * 2 - (self.middle_log_size * 2 - 1) + 1
        if mode == "wo_dwt":
            self.n_latent += 3
        # ToRGB channel count: wavelet modes emit out_ch*4 subband channels,
        # wo_dwt divides back to pixel channels (ref: ToRGB.__init__,
        # dual_styleunet.py:607-616)
        self.rgb_ch = out_ch * 4 if mode != "wo_dwt" else out_ch

    # -- init ---------------------------------------------------------------
    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, 512))
        nk = lambda: next(keys)
        p: dict = {}

        # mapping MLP; first layer takes [style, cond] when c_dim > 0
        # (ref: v2:644-660)
        dims = [self.style_dim + self.c_dim] + [self.style_dim] * self.n_mlp
        p["style"] = [equal_linear_init(nk(), dims[i], dims[i + 1],
                                        lr_mul=self.lr_mlp)
                      for i in range(self.n_mlp)]

        p["conv_in"] = conv_layer_init(nk(), self.cond_ch, self.enc_in, 3,
                                       downsample_=True)
        p["from_rgbs"] = []
        p["cond_convs"] = []
        p["comb_convs"] = [conv_layer_init(nk(), self.enc_in * 2,
                                           self.enc_in, 3)]
        for (in_ch, out_c, i) in self.enc_stages:
            p["from_rgbs"].append(
                dict(conv=conv_layer_init(nk(), self.cond_ch, in_ch, 1)))
            p["cond_convs"].append(conv_block_init(nk(), in_ch, out_c))
            if i > self.middle_log_size:
                p["comb_convs"].append(conv_layer_init(nk(), out_c * 2,
                                                       out_c, 3))
            else:
                p["comb_convs"].append(conv_layer_init(nk(), out_c, out_c, 3))

        for branch in ("1", "2"):
            convs, rgbs = [], []
            for (in_ch, out_c) in self.dec_stages:
                convs.append(styled_conv_init(nk(), in_ch, out_c, 3,
                                              self.style_dim))
                convs.append(styled_conv_init(nk(), out_c, out_c, 3,
                                              self.style_dim))
                rgbs.append(dict(
                    conv=modulated_conv2d_init(nk(), out_c, self.rgb_ch, 1,
                                               self.style_dim,
                                               demodulate=False),
                    bias=jnp.zeros((self.rgb_ch,), jnp.float32)))
            p[f"convs{branch}"] = convs
            p[f"to_rgbs{branch}"] = rgbs

        noises = []
        for layer_idx in range(self.num_layers):
            res = (layer_idx + 2 * (self.middle_log_size + 1)) // 2
            noises.append(jax.random.normal(nk(), (1, 2 ** res, 2 ** res, 1)))
        p["noises"] = noises
        return p

    # -- latent utilities (ref: v2:766-788) ---------------------------------
    def get_latent(self, p, style, cond=None):
        if cond is not None:
            style = jnp.concatenate([style, cond], axis=-1)
        latent = pixel_norm(style)
        for lp in p["style"]:
            latent = equal_linear(lp, latent, lr_mul=self.lr_mlp,
                                  activation=True)
        return latent

    def mean_latent(self, p, n_latent: int, rng) -> jnp.ndarray:
        z = jax.random.normal(rng, (n_latent, self.style_dim + self.c_dim))
        if self.c_dim:
            w = self.get_latent(p, z[:, :self.style_dim],
                                z[:, self.style_dim:])
        else:
            w = self.get_latent(p, z)
        return w.mean(0, keepdims=True)

    def make_noise(self, rng=None, zero_noise: bool = False) -> List:
        out = []
        for i in range(self.num_layers):
            res = (i + 2 * (self.middle_log_size + 1)) // 2
            shape = (1, 2 ** res, 2 ** res, 1)
            if zero_noise or rng is None:
                out.append(jnp.zeros(shape))
            else:
                rng, k = jax.random.split(rng)
                out.append(jax.random.normal(k, shape))
        return out

    # -- forward pieces (shared with SWGANUnet) ------------------------------
    def _prepare_latent(self, p, styles, cond, inject_index, truncation,
                        truncation_latent, input_is_latent):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            styles = [self.get_latent(p, s, cond) for s in styles]

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
            # style mixing: layers < inject_index from styles[0], the rest
            # from styles[1] (ref: v2:836-843). The reference draws a
            # host-side random.randint(1, n_latent-1) per eager call; we
            # match that draw here. inject_index must be static under jit
            # (it shapes the repeat), so jitted callers should pass an
            # explicit index — each distinct draw is a retrace otherwise.
            if inject_index is None:
                import random as _random
                inject_index = _random.randint(1, self.n_latent - 1)
            l1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None],
                            self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)
        return latent

    def _resolve_noise(self, p, noise, randomize_noise, batch, rng):
        if noise is not None:
            return noise
        if randomize_noise and rng is not None:
            rngs = jax.random.split(rng, self.num_layers)
            return [jax.random.normal(
                rngs[i], (batch,) + tuple(p["noises"][i].shape[1:]))
                for i in range(self.num_layers)]
        # reference noise maps are non-trainable buffers
        # (ref: dual_styleunet_v2.py register_buffer) — no grads
        return [jax.lax.stop_gradient(n) for n in p["noises"]]

    def _encode(self, p, cond_img):
        if self.mode == "add_dwt":
            cond_cur = haar_transform(cond_img)      # (ref: v2:1119)
        else:
            cond_cur = cond_img
        cond_out = conv_layer(p["conv_in"], cond_cur, 3, downsample_=True)
        cond_list = [cond_out]
        kern = make_kernel(BLUR_KERNEL)
        for frgb, cblock in zip(p["from_rgbs"], p["cond_convs"]):
            if self.mode == "add_dwt":
                # wavelet-domain FromRGB downsample (use_wt=True,
                # ref: dual_styleunet.py:456-463) — fused single conv
                cond_cur = wavelet_downsample(cond_cur, BLUR_KERNEL)
            else:
                cond_cur = downsample(cond_cur, kern)
            skip = conv_layer(frgb["conv"], cond_cur, 1)
            cond_out = conv_block(cblock, skip + cond_out)
            cond_list.append(cond_out)
        return cond_list

    def _decode(self, p, convs, rgbs, latent, noise, cond_list):
        kern = make_kernel(BLUR_KERNEL)

        def to_rgb_v2(rp, x, w, skip):
            out = modulated_conv2d(rp["conv"], x, w,
                                   demodulate=False) + rp["bias"]
            if skip is not None:
                if self.mode == "wo_dwt":
                    skip = upsample(skip, kern)      # pixel-space skip
                else:
                    skip = wavelet_upsample(skip, BLUR_KERNEL)
                out = out + skip
            return out

        out = None
        skip = None
        i = 0
        n_comb = len(p["comb_convs"])
        for (c1, c2), rgb in zip(zip(convs[::2], convs[1::2]), rgbs):
            if i == 0:
                out = conv_layer(p["comb_convs"][-1], cond_list[-1], 3)
            elif i < 2 * n_comb:
                out = jnp.concatenate(
                    [out, cond_list[-1 - (i // 2)]], axis=-1)
                out = conv_layer(p["comb_convs"][-1 - (i // 2)], out, 3)
            out = styled_conv(c1, out, latent[:, i], noise[i], up=True)
            out = styled_conv(c2, out, latent[:, i + 1], noise[i + 1])
            skip = to_rgb_v2(rgb, out, latent[:, min(i + 2,
                                                     self.n_latent - 1)],
                             skip)
            i += 2
        if self.mode == "wo_dwt":
            return skip                              # already pixel space
        return inverse_haar_transform(skip)

    # -- forward (ref: v2:789-901) ------------------------------------------
    def apply(self, p: dict, styles, cond_img: jnp.ndarray,
              cond: Optional[jnp.ndarray] = None,
              return_latents: bool = False,
              inject_index: Optional[int] = None,
              truncation: float = 1.0,
              truncation_latent: Optional[jnp.ndarray] = None,
              input_is_latent: bool = False,
              noise: Optional[List] = None,
              randomize_noise: bool = True,
              rng: Optional[jax.Array] = None):
        """styles: list of (B, style_dim) z or w vectors (or one (B, L, D)
        W+ tensor in a 1-list). cond_img: (B, S, S, inp_ch) NHWC. Returns
        (images, latents-or-None) like the reference forward."""
        latent = self._prepare_latent(p, styles, cond, inject_index,
                                      truncation, truncation_latent,
                                      input_is_latent)
        noise = self._resolve_noise(p, noise, randomize_noise,
                                    cond_img.shape[0], rng)
        cond_list = self._encode(p, cond_img)
        image1 = self._decode(p, p["convs1"], p["to_rgbs1"], latent, noise,
                              cond_list)
        image2 = self._decode(p, p["convs2"], p["to_rgbs2"], latent, noise,
                              cond_list)
        images = jnp.concatenate([image1, image2], axis=-1)
        return (images, latent) if return_latents else (images, None)


class SWGANUnet(DualStyleUNetV2):
    """Single-decoder StyleUNet ``SWGAN_unet``
    (ref: network/styleunet/styleunet.py:634-860): exactly the v2 "base"
    architecture — pixel-space encoder, wavelet-domain decoder with the full
    StyleGAN2 latent API — but with ONE decoder branch (``convs``/``to_rgbs``)
    producing a single out_size image through the final inverse Haar
    transform."""

    def __init__(self, *args, **kw):
        assert kw.pop("mode", "base") == "base", \
            "SWGAN_unet has no wavelet-input/pixel-skip variants"
        super().__init__(*args, mode="base", **kw)

    def init(self, key) -> dict:
        p = super().init(key)
        p["convs"] = p.pop("convs1")
        p["to_rgbs"] = p.pop("to_rgbs1")
        del p["convs2"], p["to_rgbs2"]
        return p

    def apply(self, p: dict, styles, cond_img: jnp.ndarray,
              cond: Optional[jnp.ndarray] = None,
              return_latents: bool = False,
              inject_index: Optional[int] = None,
              truncation: float = 1.0,
              truncation_latent: Optional[jnp.ndarray] = None,
              input_is_latent: bool = False,
              noise: Optional[List] = None,
              randomize_noise: bool = True,
              rng: Optional[jax.Array] = None):
        """Returns (image (B, out_size, out_size, out_ch), latents-or-None)
        like the reference forward (styleunet.py:773-860)."""
        latent = self._prepare_latent(p, styles, cond, inject_index,
                                      truncation, truncation_latent,
                                      input_is_latent)
        noise = self._resolve_noise(p, noise, randomize_noise,
                                    cond_img.shape[0], rng)
        cond_list = self._encode(p, cond_img)
        image = self._decode(p, p["convs"], p["to_rgbs"], latent, noise,
                             cond_list)
        return (image, latent) if return_latents else (image, None)
