"""SDF -> density transforms (VolSDF family).

Functional port of the reference density heads (ref: network/density.py:22-53,
itself from VolSDF): LaplaceDensity is alpha * Laplace(0, beta).cdf(-sdf)
with a learnable beta; AbsDensity and SimpleDensity are the NeRF++ / NeRF
style variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LaplaceDensity:
    """density = (1/beta) * (0.5 + 0.5 sign(sdf) expm1(-|sdf|/beta))
    (ref: network/density.py:22-35)."""

    def __init__(self, beta_init: float = 0.01, beta_min: float = 1e-4):
        self.beta_init = float(beta_init)
        self.beta_min = float(beta_min)

    def init(self) -> dict:
        return dict(beta=jnp.asarray(self.beta_init, jnp.float32))

    def get_beta(self, params: dict) -> jnp.ndarray:
        return jnp.abs(params["beta"]) + self.beta_min

    def apply(self, params: dict, sdf: jnp.ndarray, beta=None) -> jnp.ndarray:
        if beta is None:
            beta = self.get_beta(params)
        alpha = 1.0 / beta
        return alpha * (0.5 + 0.5 * jnp.sign(sdf)
                        * jnp.expm1(-jnp.abs(sdf) / beta))


class AbsDensity:
    """NeRF++-style |sdf| (ref: network/density.py:38-40)."""

    def init(self) -> dict:
        return {}

    def apply(self, params: dict, sdf, beta=None):
        return jnp.abs(sdf)


class SimpleDensity:
    """relu(sdf) with optional training noise (ref: network/density.py:43-53)."""

    def __init__(self, noise_std: float = 1.0):
        self.noise_std = noise_std

    def init(self) -> dict:
        return {}

    def apply(self, params: dict, sdf, beta=None, rng=None):
        if rng is not None and self.noise_std > 0:
            sdf = sdf + self.noise_std * jax.random.normal(rng, sdf.shape)
        return jax.nn.relu(sdf)
