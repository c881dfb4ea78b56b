"""3DGS densification: clone / split / prune / opacity reset as pure
functions over the GaussianParams pytree.

Functional port of the reference machinery
(ref: gaussians/gaussian_model.py:294-443). The avatar pipeline never calls
it (fixed point set from the canonical pos map; SURVEY.md §2.2), but it is
part of the 3DGS layer's API. These run on host between jit steps (point
count changes force a recompile of downstream jitted fns, as in any 3DGS
trainer); the accompanying ``grow_adam_state`` performs the reference's
optimizer-state surgery (zero moments for new rows,
ref: gaussian_model.py:294-341).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from animatablegaussians_tpu.models.gaussian_model import (GaussianParams,
                                                           inverse_sigmoid)
from animatablegaussians_tpu.ops.quat import quat_to_mat


def _mask_params(g: GaussianParams, keep: jnp.ndarray) -> GaussianParams:
    return jax.tree.map(lambda x: x[keep], g)


def _cat_params(a: GaussianParams, b: GaussianParams) -> GaussianParams:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], 0), a, b)


def densify_and_clone(g: GaussianParams, grad_norms: jnp.ndarray,
                      grad_threshold: float, scene_extent: float,
                      percent_dense: float = 0.01) -> GaussianParams:
    """Duplicate small high-gradient Gaussians
    (ref: gaussian_model.py:383-395)."""
    small = jnp.max(g.get_scaling, axis=1) <= percent_dense * scene_extent
    sel = (grad_norms >= grad_threshold) & small
    clones = _mask_params(g, jnp.nonzero(sel)[0])
    return _cat_params(g, clones)


def densify_and_split(g: GaussianParams, grad_norms: jnp.ndarray,
                      grad_threshold: float, scene_extent: float,
                      n_split: int = 2, percent_dense: float = 0.01,
                      rng: jax.Array | None = None) -> GaussianParams:
    """Split large high-gradient Gaussians into n smaller samples
    (ref: gaussian_model.py:365-381): sample offsets from the Gaussian,
    shrink scales by 1/(0.8 n); originals are removed."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    big = jnp.max(g.get_scaling, axis=1) > percent_dense * scene_extent
    sel = jnp.nonzero((grad_norms >= grad_threshold) & big)[0]
    picked = _mask_params(g, sel)
    m = picked.xyz.shape[0]

    stds = jnp.repeat(picked.get_scaling, n_split, axis=0)       # (m*n, 3)
    samples = stds * jax.random.normal(rng, stds.shape)
    rots = quat_to_mat(jnp.repeat(picked.get_rotation, n_split, axis=0))
    new_xyz = (jnp.einsum("nij,nj->ni", rots, samples)
               + jnp.repeat(picked.xyz, n_split, axis=0))
    new_scaling = jnp.log(stds / (0.8 * n_split))

    rep = lambda x: jnp.repeat(x, n_split, axis=0)
    news = GaussianParams(
        xyz=new_xyz,
        features_dc=rep(picked.features_dc),
        features_rest=rep(picked.features_rest),
        scaling=new_scaling,
        rotation=rep(picked.rotation),
        opacity=rep(picked.opacity))

    keep = jnp.nonzero(~((grad_norms >= grad_threshold) & big))[0]
    return _cat_params(_mask_params(g, keep), news)


def prune(g: GaussianParams, min_opacity: float = 0.005,
          scene_extent: float | None = None,
          max_screen_size: float | None = None,
          radii: jnp.ndarray | None = None) -> GaussianParams:
    """Drop transparent / oversized Gaussians
    (ref: gaussian_model.py:397-407)."""
    drop = g.get_opacity[:, 0] < min_opacity
    if max_screen_size is not None and radii is not None:
        drop = drop | (radii > max_screen_size)
        if scene_extent is not None:
            drop = drop | (jnp.max(g.get_scaling, 1)
                           > 0.1 * scene_extent)
    return _mask_params(g, jnp.nonzero(~drop)[0])


def reset_opacity(g: GaussianParams,
                  ceiling: float = 0.01) -> GaussianParams:
    """Clamp opacities down to <= ceiling (ref: gaussian_model.py:216-220)."""
    new = inverse_sigmoid(jnp.minimum(g.get_opacity, ceiling))
    return dataclasses.replace(g, opacity=new)


def grow_adam_state(opt_state, old_params, new_params):
    """Optimizer-state surgery: zero adam moments for appended rows, keep
    existing ones (ref: gaussian_model.py:294-341). Works on any optax state
    whose leaves are per-parameter arrays."""
    old_leaves = {id(l): True for l in jax.tree.leaves(old_params)}

    def grow(leaf, old_leaf, new_leaf):
        if leaf.shape == old_leaf.shape and leaf.shape != new_leaf.shape:
            pad = jnp.zeros((new_leaf.shape[0] - leaf.shape[0],)
                            + leaf.shape[1:], leaf.dtype)
            return jnp.concatenate([leaf, pad], 0)
        return leaf

    def rec(state):
        if isinstance(state, (tuple, list)) and not hasattr(state, "_fields"):
            return type(state)(rec(s) for s in state)
        if hasattr(state, "_fields"):  # NamedTuple optax states
            return type(state)(*[
                jax.tree.map(grow, getattr(state, f), old_params, new_params)
                if _matches(getattr(state, f), old_params) else
                getattr(state, f)
                for f in state._fields])
        return state

    def _matches(tree, params):
        try:
            return (jax.tree_util.tree_structure(tree)
                    == jax.tree_util.tree_structure(params))
        except Exception:
            return False

    return rec(opt_state)
