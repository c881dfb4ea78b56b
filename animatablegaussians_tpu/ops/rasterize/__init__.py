"""Differentiable tile-based 3D Gaussian splatting, TPU-native.

Pipeline (re-designed from the CUDA reference, ref:
gaussians/diff_gaussian_rasterization_depth_alpha/cuda_rasterizer/):

  1. `preprocess` — project, EWA cov2D, conic, radius (pure XLA, autodiff).
  2. `binning`    — global depth sort + stable tile-key sort with static caps
                    (replaces cub scan + radix sort; ref: rasterizer_impl.cu:278-309).
  3. `blend`      — per-tile front-to-back alpha compositing as a Pallas
                    kernel in a matrix formulation (pixels x gaussians blocks,
                    MXU accumulation), with a recompute-based custom VJP
                    (replaces forward.cu:261-381 / backward.cu:414-601).

Outputs match the reference contract: color, depth, alpha(mask), radii
(ref: gaussians/gaussian_renderer.py:99-106).
"""

from .api import render, RasterizeConfig
from .preprocess import preprocess
from .binning import bin_gaussians
