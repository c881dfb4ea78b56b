"""Checkpointing: native npz pytree snapshots + torch ``net.pt`` import.

Native format: one ``state.npz`` per checkpoint dir with flattened key paths
(framework-neutral, no pickle). Directory rotation mirrors the reference
(rotating ``batch_%d``, periodic ``epoch_%d``, ``epoch_latest``;
ref: main_avatar.py:420-442, 778-813).

Torch import reads the reference's ``net.pt`` (``avatar_net`` state_dict;
ref: main_avatar.py:778-793) and maps the three DualStyleUNet trees +
viewdir encoder onto our parameter pytrees, converting layouts:
conv (out,in,kh,kw) -> HWIO, linear (out,in) -> (in,out), modulated conv
(1,out,in,k,k) -> (k,k,in,out), noise buffers NCHW -> NHWC.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# native npz checkpoints
# ---------------------------------------------------------------------------

def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(ckpt_dir: str, state, extra: Optional[dict] = None):
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = _flatten(state)
    np.savez(os.path.join(ckpt_dir, "state.npz"), **flat)
    meta = dict(extra or {})
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as fp:
        json.dump(meta, fp)


def load_checkpoint(ckpt_dir: str, state_template):
    """Restore into the same pytree structure as ``state_template``."""
    raw = np.load(os.path.join(ckpt_dir, "state.npz"))
    paths, treedef = jax.tree_util.tree_flatten_with_path(state_template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        arr = raw[key]
        leaves.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
    meta_path = os.path.join(ckpt_dir, "meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def rotate_checkpoints(base_dir: str, keep_pattern: str = r"^batch_\d+$",
                       keep_latest: int = 1):
    """Delete old rotating ``batch_%d`` dirs, keeping the newest
    (ref: main_avatar.py:420-425)."""
    if not os.path.isdir(base_dir):
        return
    batches = []
    for d in os.listdir(base_dir):
        m = re.match(keep_pattern, d)
        if m:
            batches.append((int(d.split("_")[1]), d))
    for _, d in sorted(batches)[:-keep_latest]:
        shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)


def resolve_resume_dir(net_ckpt_dir: str, prev_ckpt: Optional[str] = None,
                       pretrained_dir: Optional[str] = None):
    """Resume precedence: explicit prev_ckpt -> epoch_latest (with optm) ->
    pretrained (weights only) -> None (ref: main_avatar.py:346-366).
    Returns (dir, load_optimizer)."""
    if prev_ckpt:
        return prev_ckpt, True
    latest = os.path.join(net_ckpt_dir, "epoch_latest")
    if os.path.exists(latest):
        return latest, True
    for cand in (pretrained_dir,
                 os.path.join(os.path.dirname(net_ckpt_dir), "pretrained")):
        if cand and os.path.exists(cand):
            return cand, False
    return None, False


# ---------------------------------------------------------------------------
# torch checkpoint import (reference net.pt)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str, key: str = "avatar_net") -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}


def _conv_w(a):    # (out, in, kh, kw) -> (kh, kw, in, out)
    return jnp.asarray(a.transpose(2, 3, 1, 0))


def _lin_w(a):     # (out, in) -> (in, out)
    return jnp.asarray(a.T)


def import_dual_styleunet(sd: dict, prefix: str, net,
                          branches=(("convs1", "to_rgbs1"),
                                    ("convs2", "to_rgbs2"))) -> dict:
    """Map a torch DualStyleUNet subtree at ``prefix.*`` onto our param
    layout (models/styleunet.py). Raises KeyError on missing keys so layout
    drift is loud."""
    g = lambda k: sd[f"{prefix}.{k}" if prefix else k]
    p: dict = {}

    p["style"] = [dict(weight=_lin_w(g(f"style.{i + 1}.weight")),
                       bias=jnp.asarray(g(f"style.{i + 1}.bias")))
                  for i in range(net.n_mlp)]

    def conv_layer(k: str, downsample: bool):
        ci = 1 if downsample else 0
        return dict(conv=dict(weight=_conv_w(g(f"{k}.{ci}.weight"))),
                    act_bias=jnp.asarray(g(f"{k}.{ci + 1}.bias")))

    p["conv_in"] = conv_layer("conv_in", downsample=True)
    p["from_rgbs"] = [
        dict(conv=conv_layer(f"from_rgbs.{i}.conv", downsample=False))
        for i in range(len(net.enc_stages))]
    p["cond_convs"] = [
        dict(conv1=conv_layer(f"cond_convs.{i}.conv1", downsample=False),
             conv2=conv_layer(f"cond_convs.{i}.conv2", downsample=True))
        for i in range(len(net.enc_stages))]
    p["comb_convs"] = [conv_layer(f"comb_convs.{i}", downsample=False)
                       for i in range(len(net.enc_stages) + 1)]

    def styled_conv(k: str):
        return dict(
            conv=dict(
                weight=_conv_w(g(f"{k}.conv.weight")[0]),
                modulation=dict(
                    weight=_lin_w(g(f"{k}.conv.modulation.weight")),
                    bias=jnp.asarray(g(f"{k}.conv.modulation.bias")))),
            noise_weight=jnp.asarray(g(f"{k}.noise.weight")).reshape(()),
            act_bias=jnp.asarray(g(f"{k}.activate.bias")))

    def to_rgb(k: str):
        return dict(
            conv=dict(
                weight=_conv_w(g(f"{k}.conv.weight")[0]),
                modulation=dict(
                    weight=_lin_w(g(f"{k}.conv.modulation.weight")),
                    bias=jnp.asarray(g(f"{k}.conv.modulation.bias")))),
            bias=jnp.asarray(g(f"{k}.bias")).reshape(-1))

    for convs_key, rgbs_key in branches:
        n_dec = len(net.dec_stages)
        p[convs_key] = [styled_conv(f"{convs_key}.{i}")
                        for i in range(2 * n_dec)]
        p[rgbs_key] = [to_rgb(f"{rgbs_key}.{i}")
                       for i in range(n_dec)]

    p["noises"] = [
        jnp.asarray(g(f"noises.noise_{i}").transpose(0, 2, 3, 1))
        for i in range(net.num_layers)]
    return p


def import_dual_styleunet_v2(sd: dict, prefix: str, net) -> dict:
    """Map a torch v2-family net (``DualStyleUNet`` / ``_add_dwt`` /
    ``_wo_dwt``, ref: network/styleunet/dual_styleunet_v2.py:634,903,1186)
    onto models/styleunet_v2.py's layout.

    The v2 state-dict key layout is identical to v1's (style.{i},
    conv_in, from_rgbs.{i}.conv, cond_convs.{i}, comb_convs.{i},
    convs{1,2}.{i}, to_rgbs{1,2}.{i}, noises.noise_{i}); the per-mode
    differences (stage counts, wavelet-vs-pixel resampling, conv_in input
    channels) are all captured by the net's schedule attributes, which
    ``import_dual_styleunet`` already consumes."""
    return import_dual_styleunet(sd, prefix, net)


def import_swgan_unet(sd: dict, prefix: str, net) -> dict:
    """Map a torch ``SWGAN_unet`` (ref: network/styleunet/styleunet.py:634-860)
    onto models/styleunet_v2.SWGANUnet's layout — the v2-base key layout with
    a single ``convs``/``to_rgbs`` decoder branch."""
    return import_dual_styleunet(sd, prefix, net,
                                 branches=(("convs", "to_rgbs"),))


def import_avatar_params(path_or_sd, avatar_net, base_params: dict) -> dict:
    """torch net.pt -> our AvatarNet params. ``base_params`` supplies the
    non-checkpointed leaves (cano_gaussian, which the reference recomputes
    from the canonical pos map at ctor; network/avatar.py:26-32)."""
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    params = dict(base_params)
    for name, net in (("color_net", avatar_net.color_net),
                      ("position_net", avatar_net.position_net),
                      ("other_net", avatar_net.other_net)):
        params[name] = import_dual_styleunet(sd, name, net)
    if avatar_net.with_viewdirs and "viewdir_net.0.weight" in sd:
        params["viewdir_net"] = dict(
            conv1=dict(weight=_conv_w(sd["viewdir_net.0.weight"]),
                       bias=jnp.asarray(sd["viewdir_net.0.bias"])),
            conv2=dict(weight=_conv_w(sd["viewdir_net.2.weight"]),
                       bias=jnp.asarray(sd["viewdir_net.2.bias"])))
    return params


def import_discriminator(sd: dict, prefix: str, disc) -> dict:
    """Map a torch StyleGAN2 Discriminator subtree at ``prefix.*``
    (ref: network/styleunet/dual_styleunet.py:473-567) onto
    models/discriminator.py's layout."""
    g = lambda k: sd[f"{prefix}.{k}" if prefix else k]

    def conv_layer(k: str, downsample: bool):
        ci = 1 if downsample else 0
        return dict(conv=dict(weight=_conv_w(g(f"{k}.{ci}.weight"))),
                    act_bias=jnp.asarray(g(f"{k}.{ci + 1}.bias")))

    n = len(disc.stages)
    p: dict = {
        "from_rgbs": [dict(conv=conv_layer(f"from_rgbs.{i}.conv",
                                           downsample=False))
                      for i in range(n)],
        "convs": [dict(conv1=conv_layer(f"convs.{i}.conv1",
                                        downsample=False),
                       conv2=conv_layer(f"convs.{i}.conv2",
                                        downsample=True))
                  for i in range(n)],
        "final_from_rgb": dict(conv=conv_layer(f"from_rgbs.{n}.conv",
                                               downsample=False)),
        "final_conv": conv_layer("final_conv", downsample=False),
        # final_linear.0 consumes the flattened 4x4 feature map: torch
        # flattens NCHW (C-major), we flatten NHWC — reorder its columns
        "final_linear": [
            dict(weight=_lin_w(
                g("final_linear.0.weight")
                .reshape(-1, disc.channels[4], 4, 4)
                .transpose(0, 2, 3, 1)
                .reshape(-1, disc.channels[4] * 16)),
                 bias=jnp.asarray(g("final_linear.0.bias"))),
            dict(weight=_lin_w(g("final_linear.1.weight")),
                 bias=jnp.asarray(g("final_linear.1.bias"))),
        ],
    }
    if disc.c_dim > 0:
        p["mapping"] = [dict(weight=_lin_w(g(f"mapping.{i}.weight")),
                             bias=jnp.asarray(g(f"mapping.{i}.bias")))
                        for i in range(4)]
    return p


def import_style_generator(sd: dict, prefix: str, gen) -> dict:
    """Map a torch StyleGenerator subtree (ref: stylegan.py:148-331) onto
    models/stylegan.py's layout."""
    g = lambda k: sd[f"{prefix}.{k}" if prefix else k]

    def styled_conv(k: str):
        return dict(
            conv=dict(
                weight=_conv_w(g(f"{k}.conv.weight")[0]),
                modulation=dict(
                    weight=_lin_w(g(f"{k}.conv.modulation.weight")),
                    bias=jnp.asarray(g(f"{k}.conv.modulation.bias")))),
            noise_weight=jnp.asarray(g(f"{k}.noise.weight")).reshape(()),
            act_bias=jnp.asarray(g(f"{k}.activate.bias")))

    def to_rgb(k: str):
        return dict(
            conv=dict(
                weight=_conv_w(g(f"{k}.conv.weight")[0]),
                modulation=dict(
                    weight=_lin_w(g(f"{k}.conv.modulation.weight")),
                    bias=jnp.asarray(g(f"{k}.conv.modulation.bias")))),
            bias=jnp.asarray(g(f"{k}.bias")).reshape(-1))

    n_dec = len(gen.stages)
    return {
        "style": [dict(weight=_lin_w(g(f"style.{i + 1}.weight")),
                       bias=jnp.asarray(g(f"style.{i + 1}.bias")))
                  for i in range(gen.n_mlp)],
        "input": jnp.asarray(g("input.input").transpose(0, 2, 3, 1)),
        "conv1": styled_conv("conv1"),
        "to_rgb1": to_rgb("to_rgb1"),
        "convs": [styled_conv(f"convs.{i}") for i in range(2 * n_dec)],
        "to_rgbs": [to_rgb(f"to_rgbs.{i}") for i in range(n_dec)],
        "noises": [jnp.asarray(g(f"noises.noise_{i}").transpose(0, 2, 3, 1))
                   for i in range(gen.num_layers)],
    }
