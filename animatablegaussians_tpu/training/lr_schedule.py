"""LR schedules: Step / Warmup / Constant (ref: utils/lr_schedule.py:14-65)
as jnp-traceable functions usable with optax.inject_hyperparams or
scale_by_schedule."""

from __future__ import annotations

import jax.numpy as jnp


def constant_schedule(value: float):
    return lambda step: jnp.asarray(value, jnp.float32)


def step_schedule(initial: float, interval: int, factor: float,
                  min: float | None = None):
    def sched(step):
        lr = initial * factor ** jnp.floor_divide(step, interval).astype(
            jnp.float32)
        if min is not None:
            lr = jnp.maximum(lr, min)
        return lr
    return sched


def warmup_schedule(initial: float, warmed_up: float, length: int):
    def sched(step):
        frac = jnp.minimum(step.astype(jnp.float32) / length, 1.0)
        return initial + (warmed_up - initial) * frac
    return sched


def get_learning_rate_schedule(type: str, **kw):
    """YAML-driven factory with the reference's schema
    (ref: utils/lr_schedule.py:41-65; template config
    configs/*/template.yaml train.lr.network)."""
    if type == "Step":
        return step_schedule(kw["initial"], kw["interval"], kw["factor"],
                             kw.get("min"))
    if type == "Warmup":
        return warmup_schedule(kw["initial"], kw["final"], kw["length"])
    if type == "Constant":
        return constant_schedule(kw["value"])
    raise ValueError(f"Unknown lr schedule type {type}")
