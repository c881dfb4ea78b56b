"""Brute-force k-nearest-neighbour search, MXU-tiled.

Replaces pytorch3d.ops.knn_points (ref: gaussians/gaussian_model.py:170) and
the posevocab `nearest_face` brute-force op (ref:
utils/posevocab_custom_ops/nearest_face.py:18-27). Point counts in this
pipeline (<=1M queries, <=1M refs) make tiled O(Q*M) distance matmuls cheap
on the MXU — no spatial data structure needed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int = 4,
        chunk: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared distances and indices of the k nearest refs per query.

    query: (Q, D), ref: (M, D) -> (Q, k) f32 dists^2, (Q, k) i32 indices,
    ascending by distance (index 0 is the nearest; when query == ref that is
    the point itself, as in pytorch3d's knn_points).
    """
    Q, D = query.shape
    M = ref.shape[0]
    pad = (-Q) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    ref_sq = jnp.sum(ref * ref, axis=1)

    def one_chunk(qc):
        d2 = (jnp.sum(qc * qc, axis=1, keepdims=True) + ref_sq[None, :]
              - 2.0 * jnp.dot(qc, ref.T, precision=jax.lax.Precision.HIGHEST))
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx

    nchunks = (Q + pad) // chunk
    d2s, idxs = jax.lax.map(one_chunk, q.reshape(nchunks, chunk, D))
    d2 = d2s.reshape(-1, k)[:Q]
    idx = idxs.reshape(-1, k)[:Q]
    return jnp.maximum(d2, 0.0), idx.astype(jnp.int32)


def knn_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features for knn indices: (M, C), (Q, k) -> (Q, k, C)
    (ref: utils/knn.py:4-15)."""
    return x[idx]
