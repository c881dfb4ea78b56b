"""Evaluation metrics: PSNR / SSIM / LPIPS + mask-crop protocol.

Same protocol as the reference harness (ref: eval/score.py:9-108): PSNR and
SSIM on full frames (data_range=1), LPIPS on mask-cropped square patches
with 50px padding resized to 512^2. skimage is not in this image, so PSNR
and SSIM are implemented directly with skimage-equivalent semantics
(uniform 7x7 window, K1=0.01/K2=0.03, border crop, channel mean).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.ndimage import uniform_filter


class Metrics:
    """Running means (ref: eval/score.py:9-20)."""

    def __init__(self):
        self.psnr = 0.0
        self.ssim = 0.0
        self.lpips = 0.0
        self.count = 0

    def update(self, psnr=0.0, ssim=0.0, lpips=0.0):
        self.psnr += psnr
        self.ssim += ssim
        self.lpips += lpips
        self.count += 1

    def __repr__(self):
        if self.count == 0:
            return "count is 0!"
        c = self.count
        return (f"Count: {c}, PSNR: {self.psnr / c}, SSIM: {self.ssim / c}, "
                f"LPIPS: {self.lpips / c}")


def compute_psnr(src: np.ndarray, tar: np.ndarray,
                 data_range: float = 1.0) -> float:
    """skimage.metrics.peak_signal_noise_ratio semantics."""
    mse = np.mean((src.astype(np.float64) - tar.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float,
                 win_size: int = 7, k1: float = 0.01,
                 k2: float = 0.03) -> float:
    """skimage.structural_similarity defaults (uniform window, crop pad)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    np_ = win_size ** x.ndim
    cov_norm = np_ / (np_ - 1)

    filt = lambda im: uniform_filter(im, size=win_size)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    sl = tuple(slice(pad, dim - pad) for dim in s.shape)
    return float(s[sl].mean())


def compute_ssim(src: np.ndarray, tar: np.ndarray,
                 data_range: float = 1.0) -> float:
    """Multichannel SSIM = mean over channels (skimage multichannel=True)."""
    if src.ndim == 2:
        return _ssim_single(src, tar, data_range)
    return float(np.mean([
        _ssim_single(src[..., c], tar[..., c], data_range)
        for c in range(src.shape[-1])]))


_lpips_obj = None


def compute_lpips(src: np.ndarray, tar: np.ndarray,
                  lpips_params: Optional[dict] = None) -> float:
    """LPIPS (VGG) on (H, W, 3) float [0,1] images; non-square inputs are
    padded to square with ones (ref: eval/score.py:73-98)."""
    import jax.numpy as jnp
    from animatablegaussians_tpu.training import lpips as lp

    global _lpips_obj
    params = lpips_params
    if params is None:
        if _lpips_obj is None:
            _lpips_obj = lp.LPIPS()  # random weights unless user loads
        params = _lpips_obj.params

    def cut_rect(img):
        h, w = img.shape[:2]
        size = max(h, w)
        out = np.ones((size, size, img.shape[2]), img.dtype)
        out[:h, :w] = img
        return out

    if src.shape[0] != src.shape[1]:
        src, tar = cut_rect(src), cut_rect(tar)
    d = lp.lpips(params, jnp.asarray(src)[None], jnp.asarray(tar)[None],
                 normalize=True)
    return float(d[0])


def crop_image(gt_mask: np.ndarray, patch_size: int, *args):
    """Mask-bbox square crop (pad 50) resized to patch_size
    (ref: eval/score.py:23-60)."""
    import cv2 as cv

    uv = np.argwhere(gt_mask > 0.0)
    min_v, min_u = uv.min(0)
    max_v, max_u = uv.max(0)
    pad = 50
    min_v = max(min_v - pad, 0)
    min_u = max(min_u - pad, 0)
    max_v = min(max_v + pad, gt_mask.shape[0])
    max_u = min(max_u + pad, gt_mask.shape[1])
    len_v, len_u = max_v - min_v, max_u - min_u
    size = max(len_v, len_u)

    out = []
    for image in args:
        if image is None:
            out.append(None)
            continue
        patch = np.ones((size, size, 3), image.dtype)
        if len_v > len_u:
            s = (size - len_u) // 2
            patch[:, s:s + len_u] = image[min_v:max_v, min_u:max_u]
        else:
            s = (size - len_v) // 2
            patch[s:s + len_v, :] = image[min_v:max_v, min_u:max_u]
        out.append(cv.resize(patch, (patch_size, patch_size),
                             interpolation=cv.INTER_LINEAR))
    return out[0] if len(out) == 1 else out
