"""Batch quantitative comparison over rendered-vs-GT frame directories.

Generalized rewrite of the reference's hard-coded comparison driver
(ref: eval/comparison_body_only_avatars.py:12-112): evaluates any number of
method directories against a GT directory on the reference protocol —
PSNR/SSIM on white-composited full frames, LPIPS on mask-cropped 512^2
patches, FID on the crops (gated: requires user-supplied Inception weights;
reported as None otherwise).

Usage:
    python -m animatablegaussians_tpu.eval.comparison \
        --gt_dir .../images/cam18 --mask_dir .../masks/cam18 \
        --method ours=.../rgb_map --frames 2000 2500
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from animatablegaussians_tpu.eval.score import (Metrics, compute_lpips,
                                                compute_psnr, compute_ssim,
                                                crop_image)


def _read(path: str) -> Optional[np.ndarray]:
    import cv2 as cv
    img = cv.imread(path, cv.IMREAD_UNCHANGED)
    if img is None:
        return None
    return (img / 255.0).astype(np.float32)


def compare_methods(method_dirs: Dict[str, str], gt_dir: str, mask_dir: str,
                    frame_list: List[int], patch_size: int = 512,
                    lpips_params: Optional[dict] = None,
                    name_fmt: str = "%08d.jpg",
                    gt_fmt: str = "%08d.jpg",
                    crop_out_dir: Optional[str] = None) -> Dict[str, Metrics]:
    """Returns per-method running Metrics; optionally dumps the cropped
    patches (the FID input directories, ref: comparison:59-66)."""
    import cv2 as cv

    metrics = {m: Metrics() for m in method_dirs}
    if crop_out_dir:
        for m in list(method_dirs) + ["gt"]:
            os.makedirs(os.path.join(crop_out_dir, m), exist_ok=True)

    for frame_id in frame_list:
        gt = _read(os.path.join(gt_dir, gt_fmt % frame_id))
        mask = _read(os.path.join(mask_dir, gt_fmt % frame_id))
        if gt is None or mask is None:
            continue
        mask = mask > 0.5
        if mask.ndim == 3:
            mask = mask[..., 0]
        gt = gt.copy()
        gt[~mask] = 1.0
        gt_crop = crop_image(mask, patch_size, gt)
        if crop_out_dir:
            cv.imwrite(os.path.join(crop_out_dir, "gt",
                                    "%08d.png" % frame_id),
                       (gt_crop * 255).astype(np.uint8))

        for m, d in method_dirs.items():
            img = _read(os.path.join(d, name_fmt % frame_id))
            if img is None:
                continue
            img_crop = crop_image(mask, patch_size, img)
            metrics[m].update(
                psnr=compute_psnr(img, gt),
                ssim=compute_ssim(img, gt),
                lpips=compute_lpips(img_crop, gt_crop,
                                    lpips_params=lpips_params))
            if crop_out_dir:
                cv.imwrite(os.path.join(crop_out_dir, m,
                                        "%08d.png" % frame_id),
                           (img_crop * 255).astype(np.uint8))
    return metrics


def main():
    from argparse import ArgumentParser
    ap = ArgumentParser()
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--mask_dir", required=True)
    ap.add_argument("--method", action="append", default=[],
                    help="name=dir, repeatable")
    ap.add_argument("--frames", type=int, nargs=2, default=[2000, 2500])
    ap.add_argument("--crop_out_dir", default="./tmp_quant")
    ap.add_argument("--inception_weights", default=None,
                    help="torchvision inception_v3 state dict; enables FID "
                         "over the mask-cropped patch dirs (ref: "
                         "comparison_body_only_avatars.py:97-112)")
    args = ap.parse_args()

    methods = dict(m.split("=", 1) for m in args.method)
    out = compare_methods(methods, args.gt_dir, args.mask_dir,
                          list(range(*args.frames)),
                          crop_out_dir=args.crop_out_dir)
    for name, m in out.items():
        print(f"{name} metrics: {m}")
    if args.inception_weights:
        from animatablegaussians_tpu.eval.fid import (InceptionV3Features,
                                                      compute_fid)
        model = InceptionV3Features.from_torch(args.inception_weights)
        gt_crops = os.path.join(args.crop_out_dir, "gt")
        for name in methods:
            fid = compute_fid(os.path.join(args.crop_out_dir, name),
                              gt_crops, model)
            print(f"{name} FID: {fid:.3f}")
    else:
        print("# FID: pass --inception_weights to score the crop dirs in",
              args.crop_out_dir)


if __name__ == "__main__":
    main()
