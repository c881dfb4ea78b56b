"""Newton-iteration inverse LBS ("root finding").

TPU-native replacement for the reference CUDA kernel
(ref: utils/root_finding/root_finding.cu:43-154): per target point xt, solve
fwd(xc) = xt for the canonical point xc by iterating

    xc <- xc - clip((J1 + lambda*J2)^-1 (fwd(xc) - xt), +-0.01)

where fwd(xc) = sum_j w_j(xc) (R_j xc + t_j), J1 = sum_j w_j R_j (the
blended rotation) and J2 = sum_j (R_j xc + t_j) outer grad w_j(xc) from a
Sobel gradient volume. Weights are sampled trilinearly, gradients nearest —
matching the CUDA kernel's sampling modes.

The CUDA one-thread-per-point loop becomes a ``lax.fori_loop`` over 10
iterations of fully batched (N, J) einsums + one batched 3x3 solve —
embarrassingly parallel, jit/vmap-friendly, static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.ops.grid_sample import (sample_volume_nearest,
                                                     sample_volume_trilinear)


@partial(jax.jit, static_argnames=("iter_num",))
def root_finding(weight_volume: jnp.ndarray,   # (X, Y, Z, J)
                 grad_volume: jnp.ndarray,     # (X, Y, Z, J*3)
                 xt: jnp.ndarray,              # (N, 3) target (live) points
                 xc_init: jnp.ndarray,         # (N, 3) initial cano guess
                 jnt_mats: jnp.ndarray,        # (J, 4, 4) cano->live
                 bounds: jnp.ndarray,          # (2, 3) volume bounds
                 lam: float = 0.1,
                 iter_num: int = 10) -> jnp.ndarray:
    J = weight_volume.shape[-1]
    R = jnt_mats[:, :3, :3]                    # (J, 3, 3)
    t = jnt_mats[:, :3, 3]                     # (J, 3)
    lo, hi = bounds[0], bounds[1]
    extent = hi - lo

    def scale(p):
        return (p - lo) / extent

    def body(_, xc):
        w = sample_volume_trilinear(weight_volume, scale(xc))      # (N, J)
        g = sample_volume_nearest(grad_volume, scale(xc))          # (N, J*3)
        g = g.reshape(-1, J, 3)

        fwd_sep = jnp.einsum("jxy,ny->njx", R, xc) + t[None]       # (N, J, 3)
        fwd = jnp.einsum("nj,njx->nx", w, fwd_sep)
        J1 = jnp.einsum("nj,jxy->nxy", w, R)                       # (N, 3, 3)
        J2 = jnp.einsum("njx,njy->nxy", fwd_sep, g)

        A = J1 + lam * J2
        delta = fwd - xt
        # batched 3x3 solve; fall back to pinv-free adjugate via lax solve
        update = jnp.linalg.solve(A, delta[..., None])[..., 0]
        update = jnp.clip(update, -0.01, 0.01)
        return xc - update

    return jax.lax.fori_loop(0, iter_num, body, xc_init)
