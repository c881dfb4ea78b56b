"""NeRF positional encoding (ref: utils/embedder.py:38-50).

get_embedder(multires, d) -> (fn, out_dim) with
fn(x) = concat([x, sin(2^k x), cos(2^k x) for k in 0..multires-1], -1).
One fused elementwise op on TPU: the frequency bank is a single broadcast
multiply instead of a Python list of lambdas.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_embedder(multires: int, input_dims: int = 3):
    freqs = 2.0 ** jnp.arange(multires, dtype=jnp.float32)  # (L,)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        # x (..., d) -> (..., d * (1 + 2L)); ordering matches the reference:
        # [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]
        xb = x[..., None, :] * freqs[:, None]               # (..., L, d)
        sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., L, 2, d)
        flat = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
        return jnp.concatenate([x, flat], axis=-1)

    return embed, out_dim
