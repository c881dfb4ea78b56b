from .score import (Metrics, compute_psnr, compute_ssim, compute_lpips,
                    crop_image)

__all__ = ["Metrics", "compute_psnr", "compute_ssim", "compute_lpips",
           "crop_image"]
