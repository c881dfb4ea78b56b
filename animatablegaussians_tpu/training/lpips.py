"""LPIPS perceptual metric/loss (VGG backbone) in JAX.

Re-implementation of the vendored LPIPS the reference uses as a frozen
perceptual loss (ref: network/lpips/lpips.py, main_avatar.py:117-124,341-344)
and as an eval metric (ref: eval/score.py:87-98):

  * inputs in [0, 1] (``normalize=True`` semantics) are mapped to [-1, 1],
    then shifted/scaled by the ImageNet statistics baked into LPIPS;
  * a VGG16 feature trunk taps activations after relu1_2, relu2_2, relu3_3,
    relu4_3, relu5_3;
  * per-layer: channel-unit-normalize both feature maps, squared difference,
    1x1 non-negative "lin" conv, spatial mean; the five terms sum.

TPU-first notes: NHWC layout, conv via lax.conv_general_dilated (MXU), the
whole metric is one fused XLA program and differentiates through jax.grad.

Weights: the backbone (torchvision ``vgg16`` features) and the 1x1 lin heads
are loaded from torch checkpoint files at runtime via ``load_torch_weights``
(torch CPU is available in this image). Without weight files, ``init_random``
gives architecture-correct random parameters (tests; NOT a valid metric).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 convolutional trunk: (out_channels | 'M' for maxpool).
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# Indices (into the conv list) after which LPIPS taps features: relu1_2,
# relu2_2, relu3_3, relu4_3, relu5_3.
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)
_LIN_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input normalization (shift/scale applied to [-1, 1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_shapes() -> List[tuple]:
    shapes = []
    in_ch = 3
    for c in _VGG16_CFG:
        if c == "M":
            continue
        shapes.append((3, 3, in_ch, c))
        in_ch = c
    return shapes


def init_random(key: jax.Array) -> dict:
    """Architecture-correct random params (for tests/shape checks only)."""
    convs = []
    for shape in _conv_shapes():
        key, k = jax.random.split(key)
        fan_in = shape[0] * shape[1] * shape[2]
        w = jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)
        convs.append(dict(weight=w, bias=jnp.zeros((shape[3],), jnp.float32)))
    lins = []
    for c in _LIN_CHANNELS:
        key, k = jax.random.split(key)
        lins.append(jnp.abs(jax.random.normal(k, (c,), jnp.float32)) / c)
    return dict(convs=convs, lins=lins)


def load_torch_weights(vgg_path: str, lin_path: str) -> dict:
    """Build params from torch checkpoints: torchvision ``vgg16`` features
    state-dict (``features.N.weight``/``.bias`` or bare ``N.weight``) and the
    LPIPS lin heads (``linK.model.1.weight``, non-negative 1x1 convs)."""
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu")
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = torch.load(lin_path, map_location="cpu")

    def find(sd, i, kind):
        for k in (f"features.{i}.{kind}", f"{i}.{kind}"):
            if k in sd:
                return np.asarray(sd[k].detach().numpy(), np.float32)
        raise KeyError(f"vgg16 layer {i}.{kind} not in checkpoint")

    convs = []
    torch_idx = 0  # position in the torch Sequential (convs + relus + pools)
    for c in _VGG16_CFG:
        if c == "M":
            torch_idx += 1
            continue
        w = find(vgg_sd, torch_idx, "weight")        # (out, in, kh, kw)
        b = find(vgg_sd, torch_idx, "bias")
        convs.append(dict(weight=jnp.asarray(w.transpose(2, 3, 1, 0)),
                          bias=jnp.asarray(b)))
        torch_idx += 2  # conv + relu

    lins = []
    for i, c in enumerate(_LIN_CHANNELS):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lin_sd:
                w = np.asarray(lin_sd[k].detach().numpy(), np.float32)
                lins.append(jnp.asarray(w.reshape(c)))
                break
        else:
            raise KeyError(f"lin{i} weight not in {lin_path}")
    return dict(convs=convs, lins=lins)


def _vgg_features(params: dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) normalized. Returns the 5 tapped relu outputs."""
    feats = []
    conv_i = 0
    for c in _VGG16_CFG:
        if c == "M":
            # 2x2/stride-2 maxpool as a reshape + block max: identical
            # values to reduce_window, but the VJP is a fused
            # compare-select instead of XLA's select_and_scatter
            # (~11 ms/step of the round-3 profile at 512^2). Tie-break
            # differs only in gradient (equal split vs first-wins) on
            # exactly-equal activations — float VGG features never tie.
            n, h, w, ch = x.shape
            x = x[:, :h // 2 * 2, :w // 2 * 2]  # VALID drops odd tails
            x = x.reshape(n, h // 2, 2, w // 2, 2, ch).max(axis=(2, 4))
            continue
        p = params["convs"][conv_i]
        x = jax.lax.conv_general_dilated(
            x, p["weight"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + p["bias"])
        if conv_i in _TAP_AFTER_CONV:
            feats.append(x)
        conv_i += 1
    return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def lpips(params: dict, img0: jnp.ndarray, img1: jnp.ndarray,
          normalize: bool = True) -> jnp.ndarray:
    """img0/img1: (B, H, W, 3) RGB. ``normalize=True`` expects [0, 1]
    (ref call: main_avatar.py:119-123). Returns (B,) distances."""
    if normalize:
        img0 = 2.0 * img0 - 1.0
        img1 = 2.0 * img1 - 1.0
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale

    f0 = _vgg_features(params, x0)
    f1 = _vgg_features(params, x1)

    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2      # (B,H,W,C)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def resolve_lpips_params(opt: dict) -> Optional[dict]:
    """Resolve LPIPS weights for a training run from the config/convention,
    mirroring how the reference always constructs its perceptual net with
    vendored weights (ref: main_avatar.py:341-344, network/lpips/lpips.py).

    Resolution order:
      1. ``train.lpips_weights: {vgg: <vgg16.pth>, lin: <lin.pth>}`` —
         explicit paths (torchvision vgg16 features state-dict + LPIPS v0.1
         lin heads, the same files the reference vendors);
      2. ``train.lpips_weights: random`` — architecture-correct random
         params (tests / ablations; NOT a valid perceptual metric);
      3. ``$AGT_LPIPS_WEIGHTS`` or ``<PROJ_DIR>/lpips_weights/`` containing
         ``vgg16.pth`` and ``lin.pth`` (or ``vgg.pth`` for the lin heads).

    Raises RuntimeError when ``loss_weight.lpips > 0`` but no weights can be
    resolved — a silent skip would train a visibly different model.
    """
    import os

    train = opt.get("train", {})
    spec = train.get("lpips_weights")
    w_lp = float(train.get("loss_weight", {}).get("lpips", 0.0))

    if isinstance(spec, dict):
        return load_torch_weights(spec["vgg"], spec["lin"])
    if spec == "random":
        return init_random(jax.random.PRNGKey(0))

    from animatablegaussians_tpu import config as agt_config
    candidates = []
    env_dir = os.environ.get("AGT_LPIPS_WEIGHTS")
    if env_dir:
        candidates.append(env_dir)
    candidates.append(os.path.join(agt_config.PROJ_DIR, "lpips_weights"))
    for d in candidates:
        vgg = os.path.join(d, "vgg16.pth")
        if not os.path.exists(vgg):
            continue
        for lin_name in ("lin.pth", "vgg.pth"):
            lin = os.path.join(d, lin_name)
            if os.path.exists(lin):
                return load_torch_weights(vgg, lin)

    if w_lp > 0:
        raise RuntimeError(
            f"loss_weight.lpips = {w_lp} but no LPIPS weights were found. "
            "Provide train.lpips_weights: {vgg: ..., lin: ...} in the "
            "config, set $AGT_LPIPS_WEIGHTS to a directory containing "
            "vgg16.pth and lin.pth, place them under "
            "<PROJ_DIR>/lpips_weights/, or set train.lpips_weights: random "
            "to opt out explicitly (not a valid metric).")
    return None


class LPIPS:
    """Convenience wrapper mirroring the reference's frozen module usage."""

    def __init__(self, params: Optional[dict] = None,
                 vgg_path: Optional[str] = None,
                 lin_path: Optional[str] = None,
                 key: Optional[jax.Array] = None):
        if params is not None:
            self.params = params
        elif vgg_path is not None and lin_path is not None:
            self.params = load_torch_weights(vgg_path, lin_path)
        else:
            self.params = init_random(key if key is not None
                                      else jax.random.PRNGKey(0))
        # frozen: block gradient flow into the metric weights
        self.params = jax.tree.map(jax.lax.stop_gradient, self.params)

    def __call__(self, img0, img1, normalize: bool = True):
        return lpips(self.params, img0, img1, normalize=normalize)
