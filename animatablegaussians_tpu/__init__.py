"""animatablegaussians_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
pose-conditioned 3D-Gaussian human avatars.

Re-designed from scratch with the capability surface of the CVPR'24
"Animatable Gaussians" pipeline (reference: lizhe00/AnimatableGaussians):
StyleUNet pose-map -> Gaussian-map CNN, LBS skinning, differentiable tile-based
Gaussian splatting with depth/alpha outputs, SDF-NeRF template stage, SMPL-X
body model, multi-view RGB training and novel-pose animation.

TPU-first design notes:
  * compute path is pure JAX/XLA with Pallas kernels for the splat blend;
  * static shapes everywhere (padded Gaussian sets, capped per-tile lists);
  * parallelism via jax.sharding.Mesh + shard_map, not host processes;
  * parameters are plain pytrees; optimization via optax; ckpts via orbax
    plus a torch-checkpoint importer for reference-ckpt compatibility.
"""

__version__ = "0.1.0"
