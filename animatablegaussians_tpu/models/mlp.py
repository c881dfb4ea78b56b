"""MLP zoo: MLPLinear, MLP (pointwise), SdfMLP with geometric init and
weight normalization.

Functional JAX equivalents of the reference modules
(ref: network/mlp.py:16-120, 195-241). The reference's ``MLP`` uses 1x1
Conv1d over a point axis — identical math to a dense layer applied per
point, so both share one implementation here (an (N, C) matmul batches all
points onto the MXU).

Weight norm is stored as (v, g) with w = g * v / ||v||_row (torch
``nn.utils.weight_norm`` semantics, dim=0 over output rows).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def softplus_beta(x, beta: float = 100.0):
    """torch nn.Softplus(beta): log(1+exp(beta x))/beta with linear
    overflow guard at beta*x > 20."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0)))
                     / beta)


_ACTS = {
    "relu": jax.nn.relu,
    "softplus100": lambda x: softplus_beta(x, 100.0),
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    None: lambda x: x,
}


def _linear_init(key, in_dim, out_dim):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / math.sqrt(in_dim)
    return dict(
        weight=jax.random.uniform(k1, (in_dim, out_dim), jnp.float32,
                                  -lim, lim),
        bias=jax.random.uniform(k2, (out_dim,), jnp.float32, -lim, lim))


def _apply_linear(p, x):
    if "g" in p:  # weight-normed: w = g * v / ||v|| (rows = outputs)
        v = p["weight"]                                    # (in, out)
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
        w = p["g"][None, :] * v / norm
    else:
        w = p["weight"]
    return x @ w + p["bias"]


class MLPLinear:
    """Dense MLP with optional input-skip layers and last activation
    (ref: network/mlp.py:87-120). Layer l in res_layers consumes
    concat([x, input])."""

    def __init__(self, in_channels: int, out_channels: int,
                 inter_channels: Sequence[int],
                 res_layers: Sequence[int] = (),
                 nlactv: str = "relu", last_op: Optional[str] = None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.res_layers = tuple(res_layers)
        self.act = _ACTS[nlactv]
        self.last = _ACTS[last_op]
        chans = [in_channels] + list(inter_channels) + [out_channels]
        # layer l consumes concat([x, input]) when l in res_layers; only its
        # own input dim grows (ref: mlp.py:100-113 builds layers in-loop)
        self.layer_dims = [
            (chans[l] + (in_channels if l in self.res_layers else 0),
             chans[l + 1])
            for l in range(len(chans) - 1)]

    def init(self, key) -> List[dict]:
        keys = jax.random.split(key, len(self.layer_dims))
        return [_linear_init(k, i, o)
                for k, (i, o) in zip(keys, self.layer_dims)]

    def apply(self, params: List[dict], x: jnp.ndarray,
              return_inter_layer: Sequence[int] = ()) -> jnp.ndarray:
        tmp = x
        inters = []
        n = len(params)
        for i, p in enumerate(params):
            if i in self.res_layers:
                x = jnp.concatenate([x, tmp], axis=-1)
            x = _apply_linear(p, x)
            if i < n - 1:
                x = self.act(x)
            else:
                x = self.last(x)
            if i in return_inter_layer:
                inters.append(x)
        if return_inter_layer:
            return x, inters
        return x


# the reference's conv1d-based MLP is mathematically the same pointwise net
MLP = MLPLinear


class SdfMLP(MLPLinear):
    """SDF MLP: softplus(beta=100), geometric initialization (sphere of
    radius ``bias``) and weight norm (ref: network/mlp.py:195-241; template
    config at network/template.py:36-46)."""

    def __init__(self, in_channels, out_channels, inter_channels,
                 res_layers=(), nlactv: str = "softplus100",
                 geometric_init: bool = True, bias: float = 0.5,
                 weight_norm: bool = True):
        super().__init__(in_channels, out_channels, inter_channels,
                         res_layers, nlactv, None)
        self.geometric_init = geometric_init
        self.bias = bias
        self.weight_norm = weight_norm

    def init(self, key) -> List[dict]:
        params = []
        n = len(self.layer_dims)
        keys = jax.random.split(key, n)
        for l, (k, (in_dim, out_dim)) in enumerate(
                zip(keys, self.layer_dims)):
            if not self.geometric_init:
                p = _linear_init(k, in_dim, out_dim)
            elif l == n - 1:
                w = (np.sqrt(np.pi) / np.sqrt(in_dim)
                     + 1e-4 * jax.random.normal(k, (in_dim, out_dim)))
                p = dict(weight=jnp.asarray(w, jnp.float32),
                         bias=jnp.full((out_dim,), -self.bias, jnp.float32))
            elif l == 0:
                w = jnp.zeros((in_dim, out_dim), jnp.float32)
                w = w.at[:3].set(
                    jax.random.normal(k, (3, out_dim))
                    * np.sqrt(2) / np.sqrt(out_dim))
                p = dict(weight=w, bias=jnp.zeros((out_dim,), jnp.float32))
            elif l in self.res_layers:
                w = jax.random.normal(k, (in_dim, out_dim)) * (
                    np.sqrt(2) / np.sqrt(out_dim))
                extra = self.in_channels - 3
                w = w.at[-extra:].set(0.0) if extra > 0 else w
                p = dict(weight=w.astype(jnp.float32),
                         bias=jnp.zeros((out_dim,), jnp.float32))
            else:
                w = jax.random.normal(k, (in_dim, out_dim)) * (
                    np.sqrt(2) / np.sqrt(out_dim))
                p = dict(weight=w.astype(jnp.float32),
                         bias=jnp.zeros((out_dim,), jnp.float32))
            if self.weight_norm:
                norm = jnp.sqrt(jnp.sum(p["weight"] ** 2, axis=0) + 1e-12)
                p = dict(weight=p["weight"], bias=p["bias"], g=norm)
            params.append(p)
        return params
