"""Training losses (ref: main_avatar.py:207-246, utils/losses.py).

L1 color with boundary masking, mask (alpha) loss, offset norm penalty, and
the patch-cropping logic for the perceptual (LPIPS) term.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            weight: jnp.ndarray | None = None) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    if weight is not None:
        diff = diff * weight
    return jnp.mean(diff)


def mask_loss(pred_mask: jnp.ndarray, target_mask: jnp.ndarray,
              boundary_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 between rendered alpha and the binarized GT mask, excluding the
    eroded/dilated boundary band (ref: main_avatar.py:215-222)."""
    diff = jnp.abs(pred_mask - target_mask)
    if boundary_mask is not None:
        diff = diff * boundary_mask
    return jnp.mean(diff)


def offset_loss(offset: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 norm of the non-rigid position offsets
    (ref: main_avatar.py:239-241, torch.linalg.norm(offset, dim=-1).mean()).

    Zero-safe: torch defines the norm subgradient at 0 as 0, but
    jnp.linalg.norm's VJP there is 0/0 = NaN (hit in practice: pad points and
    freshly-initialized heads produce exactly-zero offsets). Double-where
    keeps the primal exact and the gradient 0 at the origin."""
    sq = jnp.sum(offset * offset, axis=-1)
    pos = sq > 0
    norm = jnp.sqrt(jnp.where(pos, sq, 1.0))
    return jnp.mean(jnp.where(pos, norm, 0.0))


def crop_square(img: jnp.ndarray, center_xy: jnp.ndarray,
                size: int) -> jnp.ndarray:
    """Dynamic square crop (H, W, C) -> (size, size, C), clamped to bounds
    (ref patch-crop for LPIPS: main_avatar.py:75-115)."""
    h, w = img.shape[:2]
    x0 = jnp.clip(center_xy[0] - size // 2, 0, w - size)
    y0 = jnp.clip(center_xy[1] - size // 2, 0, h - size)
    return jax.lax.dynamic_slice(
        img, (y0.astype(jnp.int32), x0.astype(jnp.int32), 0),
        (size, size, img.shape[2]))


def mask_center(mask: jnp.ndarray) -> jnp.ndarray:
    """Centroid of a binary mask in (x, y) pixel coords."""
    h, w = mask.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    cy = jnp.sum(mask * ys[:, None]) / total
    cx = jnp.sum(mask * xs[None, :]) / total
    return jnp.stack([cx, cy]).astype(jnp.int32)


def random_crop_center(rng: jax.Array, mask: jnp.ndarray,
                       size: int) -> jnp.ndarray:
    """Random center inside the mask bbox (used after iter 300k in the
    reference; ref: main_avatar.py:98-115)."""
    h, w = mask.shape[:2]
    ys = jnp.any(mask > 0.5, axis=1)
    xs = jnp.any(mask > 0.5, axis=0)
    idx_y = jnp.arange(h)
    idx_x = jnp.arange(w)
    y0 = jnp.min(jnp.where(ys, idx_y, h))
    y1 = jnp.max(jnp.where(ys, idx_y, 0))
    x0 = jnp.min(jnp.where(xs, idx_x, w))
    x1 = jnp.max(jnp.where(xs, idx_x, 0))
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), jnp.minimum(y0, y1), jnp.maximum(y1, y0 + 1))
    cx = jax.random.randint(kx, (), jnp.minimum(x0, x1), jnp.maximum(x1, x0 + 1))
    return jnp.stack([cx, cy]).astype(jnp.int32)


def crop_to_mask(imgs, mask: jnp.ndarray, patch_size: int,
                 rng: jax.Array | None = None):
    """Crop each (H, W, C) image to the mask's square bbox and resample to
    (patch_size, patch_size, C) (ref: main_avatar.py:75-115).

    With ``rng`` (the post-300k-iter mode) a random patch_size window inside
    the bbox is sliced instead. Dynamic bbox + static output shapes come from
    ``jax.image.scale_and_translate`` — no data-dependent shapes under jit.
    """
    h, w = mask.shape[:2]
    ys = jnp.any(mask > 0.5, axis=1)
    xs = jnp.any(mask > 0.5, axis=0)
    idx_y = jnp.arange(h)
    idx_x = jnp.arange(w)
    min_v = jnp.min(jnp.where(ys, idx_y, h - 1))
    max_v = jnp.max(jnp.where(ys, idx_y, 0)) + 1
    min_u = jnp.min(jnp.where(xs, idx_x, w - 1))
    max_u = jnp.max(jnp.where(xs, idx_x, 0)) + 1
    len_v = jnp.maximum(max_v - min_v, 1)
    len_u = jnp.maximum(max_u - min_u, 1)
    max_size = jnp.maximum(len_v, len_u)

    single = not isinstance(imgs, (list, tuple))
    img_list = [imgs] if single else list(imgs)

    if rng is not None:
        # random patch_size window whose top-left stays inside the bbox
        kv, ku = jax.random.split(rng)
        fv = jax.random.uniform(kv)
        fu = jax.random.uniform(ku)
        v0 = min_v + (fv * jnp.maximum(len_v - patch_size, 0)).astype(jnp.int32)
        u0 = min_u + (fu * jnp.maximum(len_u - patch_size, 0)).astype(jnp.int32)
        v0 = jnp.clip(v0, 0, max(h - patch_size, 0))
        u0 = jnp.clip(u0, 0, max(w - patch_size, 0))
        out = [jax.lax.dynamic_slice(im, (v0, u0, 0),
                                     (patch_size, patch_size, im.shape[2]))
               for im in img_list]
    else:
        # square bbox -> patch_size^2 resample (bilinear)
        scale = patch_size / max_size.astype(jnp.float32)
        cy = 0.5 * (min_v + max_v).astype(jnp.float32)
        cx = 0.5 * (min_u + max_u).astype(jnp.float32)
        trans_y = 0.5 * patch_size - cy * scale
        trans_x = 0.5 * patch_size - cx * scale
        out = [jax.image.scale_and_translate(
            im, (patch_size, patch_size, im.shape[2]), (0, 1),
            jnp.stack([scale, scale]), jnp.stack([trans_y, trans_x]),
            method="bilinear") for im in img_list]
    return out[0] if single else out


# generic losses (ref: utils/losses.py)

def mse(a, b):
    return jnp.mean((a - b) ** 2)


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    dy = jnp.abs(img[1:, :] - img[:-1, :]).mean()
    dx = jnp.abs(img[:, 1:] - img[:, :-1]).mean()
    return dx + dy


def eikonal_loss(grads: jnp.ndarray) -> jnp.ndarray:
    """|| |grad sdf| - 1 ||^2 (ref: main_template.py:52-59)."""
    return jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03):
    """Differentiable SSIM (uniform window, skimage-equivalent semantics) on
    (H, W, C) images; used by the actor08-style ``ssim`` loss weight."""
    C = a.shape[-1]
    kern = jnp.ones((win_size, win_size, 1, 1), a.dtype) / win_size ** 2
    kern = jnp.tile(kern, (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[None], kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)[0]

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1)
    ua, ub = filt(a), filt(b)
    va = cov_norm * (filt(a * a) - ua * ua)
    vb = cov_norm * (filt(b * b) - ub * ub)
    vab = cov_norm * (filt(a * b) - ua * ub)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ua * ub + c1) * (2 * vab + c2)
         / ((ua ** 2 + ub ** 2 + c1) * (va + vb + c2)))
    return jnp.mean(s)


def ssim_loss(pred, target):
    return 1.0 - ssim(pred, target)


def second_order_smoothness(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Sequence acceleration penalty (ref: utils/losses.py:16-31)."""
    x0 = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 2, axis=axis)
    x1 = jax.lax.slice_in_dim(x, 1, x.shape[axis] - 1, axis=axis)
    x2 = jax.lax.slice_in_dim(x, 2, x.shape[axis], axis=axis)
    return jnp.mean((2 * x1 - x2 - x0) ** 2)


def weighted_mse(pred, target, weight):
    """(ref: utils/losses.py:34-40)."""
    return jnp.mean((pred * weight - target * weight) ** 2)


def cosine_distance(pred, target, weight=None, axis=-1,
                    normalized: bool = True):
    """1 - cos similarity (ref: utils/losses.py:43-62)."""
    if normalized:
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=axis, keepdims=True), 1e-8)
        target = target / jnp.maximum(
            jnp.linalg.norm(target, axis=axis, keepdims=True), 1e-8)
    d = 1.0 - jnp.sum(pred * target, axis=axis)
    if weight is not None:
        d = d * weight
    return jnp.mean(d)


def iou_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU of soft masks (ref: utils/losses.py:80-89)."""
    dims = tuple(range(predict.ndim)[1:])
    intersect = jnp.sum(predict * target, dims)
    union = jnp.sum(predict + target - predict * target, dims) + 1e-6
    return jnp.mean(1.0 - intersect / union)


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE KL(q || N(0,1)) (ref: utils/losses.py:92-104)."""
    return jnp.mean(-0.5 * jnp.sum(
        1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))


# StyleGAN adversarial losses (ref: utils/losses.py:139-159). R1 uses plain
# jax.grad — no conv2d_gradfix machinery needed under XLA.

def d_logistic_loss(real_pred, fake_pred):
    return jnp.mean(jax.nn.softplus(-real_pred)
                    + jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_loss(discriminator_fn, real_img):
    """R1 gradient penalty: ||d D/d x||^2 on real images."""
    def scalar_out(x):
        return jnp.sum(discriminator_fn(x))
    grads = jax.grad(scalar_out)(real_img)
    return jnp.sum(grads ** 2) / real_img.shape[0]
