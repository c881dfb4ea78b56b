"""Fréchet Inception Distance.

The reference computes FID with `pytorch-fid` over mask-cropped patch
directories (ref: eval/comparison_body_only_avatars.py:97-112). Here the
metric is self-contained:

  * ``frechet_distance`` — the exact Fréchet/Wasserstein-2 gaussian distance
    ||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}), with the matrix square
    root via eigendecomposition of the symmetrized product (no scipy);
  * ``InceptionV3Features`` — the pool3 (2048-d) feature trunk of
    torchvision InceptionV3 in JAX/NHWC, loadable from a torch state dict
    (`pt_inception-2015-12-05` / torchvision ``inception_v3`` weights, the
    same files pytorch-fid uses). Without weight files ``init_random`` gives
    architecture-correct random params (pipeline tests; NOT a valid metric);
  * ``compute_fid`` — directory-to-directory FID like the reference CLI.

TPU-first notes: features run as one jitted NHWC conv program in batches;
statistics accumulate in float64 on host (FID is numerically touchy).
"""

from __future__ import annotations

import math
import os
from typing import Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------

def gaussian_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu (D,), cov (D, D)) in float64."""
    f = np.asarray(feats, np.float64)
    mu = f.mean(0)
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def _sqrtm_product(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """tr((C1 C2)^{1/2}) via the symmetric form: with S = C1^{1/2},
    (C1 C2)^{1/2} has the same eigenvalues as (S C2 S)^{1/2}, which is
    symmetric PSD — eigendecompose and take sqrt of clipped eigenvalues."""
    w1, v1 = np.linalg.eigh(c1)
    s = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T        # C1^{1/2}
    m = s @ c2 @ s
    w = np.linalg.eigvalsh((m + m.T) * 0.5)
    return float(np.sqrt(np.clip(w, 0, None)).sum())


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}) (FID formula)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(mu1.shape[0])
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(mu2.shape[0])
    diff = mu1 - mu2
    tr_sqrt = _sqrtm_product(cov1, cov2)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * tr_sqrt)


# ---------------------------------------------------------------------------
# InceptionV3 pool3 feature trunk (torchvision layout)
# ---------------------------------------------------------------------------

def _bn_fold(conv_w, bn_w, bn_b, bn_m, bn_v, eps=1e-3):
    """Fold BatchNorm into the conv (inference only) -> (w, b)."""
    scale = bn_w / np.sqrt(bn_v + eps)
    w = conv_w * scale[:, None, None, None]      # (out, in, kh, kw)
    b = bn_b - bn_m * scale
    return w, b


class _Spec:
    """Static InceptionV3 architecture description (torchvision names)."""

    STEM = [  # (name, out_ch, k, stride, pad)
        ("Conv2d_1a_3x3", 32, 3, 2, 0),
        ("Conv2d_2a_3x3", 32, 3, 1, 0),
        ("Conv2d_2b_3x3", 64, 3, 1, 1),
        ("POOL", 0, 3, 2, 0),
        ("Conv2d_3b_1x1", 80, 1, 1, 0),
        ("Conv2d_4a_3x3", 192, 3, 1, 0),
        ("POOL", 0, 3, 2, 0),
    ]
    # Inception blocks: torchvision Mixed_5b..7c; each entry lists the
    # branches as sequences of (suffix, k, stride, pad) conv names.
    BLOCKS = [
        ("Mixed_5b", "A", 192, 32), ("Mixed_5c", "A", 256, 64),
        ("Mixed_5d", "A", 288, 64),
        ("Mixed_6a", "B", 288, 0),
        ("Mixed_6b", "C", 768, 128), ("Mixed_6c", "C", 768, 160),
        ("Mixed_6d", "C", 768, 160), ("Mixed_6e", "C", 768, 192),
        ("Mixed_7a", "D", 768, 0),
        ("Mixed_7b", "E", 1280, 0), ("Mixed_7c", "E", 2048, 0),
    ]


def _conv(x, w, b, stride=1, pad=0):
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride) if isinstance(stride, int) else stride, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _pool(x, k=3, stride=2, pad=0, kind="max"):
    if isinstance(pad, int):
        pad = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    init, op = ((-jnp.inf, jax.lax.max) if kind == "max"
                else (0.0, jax.lax.add))
    y = jax.lax.reduce_window(x, init, op, (1, k, k, 1),
                              (1, stride, stride, 1), pad)
    if kind == "avg":
        ones = jnp.ones_like(x[..., :1])
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                                    (1, stride, stride, 1), pad)
        y = y / jnp.maximum(cnt, 1.0)
    return y


class InceptionV3Features:
    """pool3 (2048-d) features. Params: {name: {w (HWIO), b}} flat dict."""

    def __init__(self, params: dict):
        self.params = params

    # -- weight loading ------------------------------------------------
    @staticmethod
    def from_torch(path: str) -> "InceptionV3Features":
        """torchvision ``inception_v3`` state dict (BN folded)."""
        import torch
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        np_sd = {k: np.asarray(v.detach().numpy(), np.float64)
                 for k, v in sd.items() if "fc" not in k and "Aux" not in k}

        params = {}
        prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                           for k in np_sd if k.endswith("conv.weight")})
        for p in prefixes:
            w, b = _bn_fold(np_sd[f"{p}.conv.weight"],
                            np_sd[f"{p}.bn.weight"], np_sd[f"{p}.bn.bias"],
                            np_sd[f"{p}.bn.running_mean"],
                            np_sd[f"{p}.bn.running_var"])
            params[p] = dict(w=jnp.asarray(w.transpose(2, 3, 1, 0),
                                           jnp.float32),
                             b=jnp.asarray(b, jnp.float32))
        return InceptionV3Features(params)

    @staticmethod
    def init_random(key) -> "InceptionV3Features":
        """Architecture-correct random params (tests only). Only the conv
        shapes matter; generated by tracing the forward graph shape-wise."""
        params = {}

        def need(name, kh, kw, cin, cout):
            nonlocal key
            key, k = jax.random.split(key)
            # He init (ReLU gain sqrt(2)): keeps activation scale ~O(1)
            # through the ~20-conv trunk so random-trunk FIDs are not
            # vanishingly small
            w = jax.random.normal(k, (kh, kw, cin, cout),
                                  jnp.float32) * math.sqrt(2.0 / (kh * kw * cin))
            params[name] = dict(w=w, b=jnp.zeros((cout,), jnp.float32))

        _build_shapes(need)
        return InceptionV3Features(params)

    # -- forward ---------------------------------------------------------
    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) in [0, 1] -> (B, 2048). Resized to 299 and
        mapped to [-1, 1] exactly like pytorch-fid."""
        x = jax.image.resize(images, (images.shape[0], 299, 299, 3),
                             method="bilinear")
        x = x * 2.0 - 1.0
        return _forward(self.params, x)


def _block_a(p, x, name, pool_ch):
    c = lambda n, xx, **kw: _conv(xx, p[f"{name}.{n}"]["w"],
                                  p[f"{name}.{n}"]["b"], **kw)
    b1 = c("branch1x1", x)
    b2 = c("branch5x5_2", c("branch5x5_1", x), pad=2)
    b3 = c("branch3x3dbl_3",
           c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=1), pad=1)
    b4 = c("branch_pool", _pool(x, 3, 1, 1, "avg"))
    return jnp.concatenate([b1, b2, b3, b4], -1)


def _block_b(p, x, name):
    c = lambda n, xx, **kw: _conv(xx, p[f"{name}.{n}"]["w"],
                                  p[f"{name}.{n}"]["b"], **kw)
    b1 = c("branch3x3", x, stride=2)
    b2 = c("branch3x3dbl_3",
           c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=1), stride=2)
    b3 = _pool(x, 3, 2, 0, "max")
    return jnp.concatenate([b1, b2, b3], -1)


def _block_c(p, x, name):
    c = lambda n, xx, **kw: _conv(xx, p[f"{name}.{n}"]["w"],
                                  p[f"{name}.{n}"]["b"], **kw)
    pad7a = ((0, 0), (3, 3))
    pad7b = ((3, 3), (0, 0))
    b1 = c("branch1x1", x)
    b2 = c("branch7x7_3", c("branch7x7_2", c("branch7x7_1", x),
                            pad=pad7a), pad=pad7b)
    b3 = c("branch7x7dbl_5",
           c("branch7x7dbl_4",
             c("branch7x7dbl_3",
               c("branch7x7dbl_2", c("branch7x7dbl_1", x), pad=pad7b),
               pad=pad7a), pad=pad7b), pad=pad7a)
    b4 = c("branch_pool", _pool(x, 3, 1, 1, "avg"))
    return jnp.concatenate([b1, b2, b3, b4], -1)


def _block_d(p, x, name):
    c = lambda n, xx, **kw: _conv(xx, p[f"{name}.{n}"]["w"],
                                  p[f"{name}.{n}"]["b"], **kw)
    pad7a = ((0, 0), (3, 3))
    pad7b = ((3, 3), (0, 0))
    b1 = c("branch3x3_2", c("branch3x3_1", x), stride=2)
    b2 = c("branch7x7x3_4",
           c("branch7x7x3_3",
             c("branch7x7x3_2", c("branch7x7x3_1", x), pad=pad7a),
             pad=pad7b), stride=2)
    b3 = _pool(x, 3, 2, 0, "max")
    return jnp.concatenate([b1, b2, b3], -1)


def _block_e(p, x, name):
    c = lambda n, xx, **kw: _conv(xx, p[f"{name}.{n}"]["w"],
                                  p[f"{name}.{n}"]["b"], **kw)
    pad3a = ((0, 0), (1, 1))
    pad3b = ((1, 1), (0, 0))
    b1 = c("branch1x1", x)
    m2 = c("branch3x3_1", x)
    b2 = jnp.concatenate([c("branch3x3_2a", m2, pad=pad3a),
                          c("branch3x3_2b", m2, pad=pad3b)], -1)
    m3 = c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=1)
    b3 = jnp.concatenate([c("branch3x3dbl_3a", m3, pad=pad3a),
                          c("branch3x3dbl_3b", m3, pad=pad3b)], -1)
    b4 = c("branch_pool", _pool(x, 3, 1, 1, "avg"))
    return jnp.concatenate([b1, b2, b3, b4], -1)


def _forward(p, x):
    for name, _, k, s, pd in _Spec.STEM:
        if name == "POOL":
            x = _pool(x, k, s, pd, "max")
        else:
            x = _conv(x, p[name]["w"], p[name]["b"], stride=s, pad=pd)
    for name, kind, _, pool_ch in _Spec.BLOCKS:
        if kind == "A":
            x = _block_a(p, x, name, pool_ch)
        elif kind == "B":
            x = _block_b(p, x, name)
        elif kind == "C":
            x = _block_c(p, x, name)
        elif kind == "D":
            x = _block_d(p, x, name)
        else:
            x = _block_e(p, x, name)
    x = jnp.mean(x, axis=(1, 2))                      # adaptive avg pool
    return x


def _build_shapes(need):
    """Declare every conv's shape (must mirror _forward exactly)."""
    cin = 3
    for name, cout, k, s, pd in _Spec.STEM:
        if name == "POOL":
            continue
        need(name, k, k, cin, cout)
        cin = cout
    ch = cin  # 192
    for name, kind, in_ch, pool_ch in _Spec.BLOCKS:
        ch = in_ch
        if kind == "A":
            need(f"{name}.branch1x1", 1, 1, ch, 64)
            need(f"{name}.branch5x5_1", 1, 1, ch, 48)
            need(f"{name}.branch5x5_2", 5, 5, 48, 64)
            need(f"{name}.branch3x3dbl_1", 1, 1, ch, 64)
            need(f"{name}.branch3x3dbl_2", 3, 3, 64, 96)
            need(f"{name}.branch3x3dbl_3", 3, 3, 96, 96)
            need(f"{name}.branch_pool", 1, 1, ch, pool_ch)
        elif kind == "B":
            need(f"{name}.branch3x3", 3, 3, ch, 384)
            need(f"{name}.branch3x3dbl_1", 1, 1, ch, 64)
            need(f"{name}.branch3x3dbl_2", 3, 3, 64, 96)
            need(f"{name}.branch3x3dbl_3", 3, 3, 96, 96)
        elif kind == "C":
            c7 = pool_ch
            need(f"{name}.branch1x1", 1, 1, ch, 192)
            need(f"{name}.branch7x7_1", 1, 1, ch, c7)
            need(f"{name}.branch7x7_2", 1, 7, c7, c7)
            need(f"{name}.branch7x7_3", 7, 1, c7, 192)
            need(f"{name}.branch7x7dbl_1", 1, 1, ch, c7)
            need(f"{name}.branch7x7dbl_2", 7, 1, c7, c7)
            need(f"{name}.branch7x7dbl_3", 1, 7, c7, c7)
            need(f"{name}.branch7x7dbl_4", 7, 1, c7, c7)
            need(f"{name}.branch7x7dbl_5", 1, 7, c7, 192)
            need(f"{name}.branch_pool", 1, 1, ch, 192)
        elif kind == "D":
            need(f"{name}.branch3x3_1", 1, 1, ch, 192)
            need(f"{name}.branch3x3_2", 3, 3, 192, 320)
            need(f"{name}.branch7x7x3_1", 1, 1, ch, 192)
            need(f"{name}.branch7x7x3_2", 1, 7, 192, 192)
            need(f"{name}.branch7x7x3_3", 7, 1, 192, 192)
            need(f"{name}.branch7x7x3_4", 3, 3, 192, 192)
        elif kind == "E":
            need(f"{name}.branch1x1", 1, 1, ch, 320)
            need(f"{name}.branch3x3_1", 1, 1, ch, 384)
            need(f"{name}.branch3x3_2a", 1, 3, 384, 384)
            need(f"{name}.branch3x3_2b", 3, 1, 384, 384)
            need(f"{name}.branch3x3dbl_1", 1, 1, ch, 448)
            need(f"{name}.branch3x3dbl_2", 3, 3, 448, 384)
            need(f"{name}.branch3x3dbl_3a", 1, 3, 384, 384)
            need(f"{name}.branch3x3dbl_3b", 3, 1, 384, 384)
            need(f"{name}.branch_pool", 1, 1, ch, 192)


# ---------------------------------------------------------------------------
# Directory FID (the reference CLI semantics)
# ---------------------------------------------------------------------------

def features_of_images(model: InceptionV3Features,
                       images: Iterable[np.ndarray],
                       batch: int = 8) -> np.ndarray:
    fn = jax.jit(model.features)
    feats: List[np.ndarray] = []
    buf: List[np.ndarray] = []

    def flush():
        if not buf:
            return
        x = jnp.asarray(np.stack(buf), jnp.float32)
        feats.append(np.asarray(fn(x)))
        buf.clear()

    for im in images:
        buf.append(np.asarray(im, np.float32))
        if len(buf) == batch:
            flush()
    flush()
    return np.concatenate(feats) if feats else np.zeros((0, 2048))


def compute_fid(dir1: str, dir2: str, model: InceptionV3Features,
                batch: int = 8) -> float:
    """FID between two image directories (ref:
    comparison_body_only_avatars.py:97-112 / pytorch-fid CLI)."""
    import cv2 as cv

    def images(d):
        for f in sorted(os.listdir(d)):
            img = cv.imread(os.path.join(d, f))
            if img is not None:
                yield img[..., ::-1] / 255.0
    s1 = gaussian_stats(features_of_images(model, images(dir1), batch))
    s2 = gaussian_stats(features_of_images(model, images(dir2), batch))
    return frechet_distance(s1[0], s1[1], s2[0], s2[1])
