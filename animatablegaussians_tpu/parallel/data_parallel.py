"""Data parallelism over (pose, view) items via shard_map on an ICI mesh.

The reference trains strictly on one GPU with batch 1 (SURVEY.md §2.9;
ref: config.py:6, configs/avatarrex_zzr/avatar.yaml:47). The TPU-native
design parallelizes over the natural batch axis the reference iterates
serially — (pose, camera) pairs — with one item per chip:

  * params + optimizer state are replicated (this model is ~100M params;
    no parameter sharding needed);
  * each device renders + differentiates its own item (the Pallas splat
    kernel runs unbatched per shard — no vmap over pallas_call);
  * gradients are pmean-ed over the ``data`` axis (one psum over ICI),
    then every device applies the identical optimizer update.

With per-chip batch 1 and pmean, the update equals the reference's
gradient-accumulation semantics at global batch = n_devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from animatablegaussians_tpu.training.avatar_trainer import TrainState

AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = AXIS):
    """Place a leading-axis batch pytree onto the mesh's data axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def make_dp_train_step(step_fn, mesh: Mesh, axis: str = AXIS):
    """Wrap an unjitted per-example step
    ``step_fn(state, items, rng) -> (state, terms)`` (built with
    ``make_train_step(..., axis_name=axis)``, so it already pmean-s grads)
    into a jitted SPMD step over ``mesh``:

        dp_step(state, items_batch, rngs) -> (state, terms)

    where ``items_batch`` leaves have leading dim == mesh size and ``rngs``
    is a (n_devices,) key array.
    """

    def shard_body(state, items, rngs):
        # local shard: leading dim 1 -> squeeze to the unbatched example
        local_items = jax.tree.map(lambda x: x[0], items)
        local_rng = rngs[0]
        new_state, terms = step_fn(state, local_items, local_rng)
        return new_state, terms

    # varying-mesh-axes checking can't see through pallas_call out_shapes;
    # replication of the outputs is guaranteed by the pmean inside step_fn
    specs = dict(mesh=mesh, in_specs=(P(), P(axis), P(axis)),
                 out_specs=(P(), P()))
    try:
        sharded = shard_map(shard_body, check_vma=False, **specs)
    except TypeError:  # older jax spelling
        sharded = shard_map(shard_body, check_rep=False, **specs)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        sharded,
        in_shardings=(repl, NamedSharding(mesh, P(axis)),
                      NamedSharding(mesh, P(axis))),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def make_dp_train_scan(step_fn, mesh: Mesh, axis: str = AXIS):
    """scan_steps composed with data parallelism: ONE dispatch runs
    ``n_steps`` sequential optimizer steps, each step consuming
    ``n_devices`` examples in parallel (grads pmean-ed inside ``step_fn``,
    which must be built with ``make_train_step(..., axis_name=axis)``).
    This is the v5p-8 production configuration: the scan amortizes the
    per-execute dispatch overhead that the DP step alone still pays once
    per optimizer step (measured ms-scale on axon, BASELINE.md).

        dp_scan(state, items_batch, rngs) -> (state, terms)

    ``items_batch`` leaves are (n_devices, n_steps, ...) sharded on the
    device axis; ``rngs`` is (n_devices, n_steps) keys. ``terms`` come back
    stacked along a leading (n_steps,) axis (replicated across devices),
    matching make_train_scan_batched.
    """

    def shard_body(state, items, rngs):
        local_items = jax.tree.map(lambda x: x[0], items)  # (n_steps, ...)
        local_rngs = rngs[0]

        def body(s, xk):
            it, k = xk
            return step_fn(s, it, k)

        return jax.lax.scan(body, state, (local_items, local_rngs))

    specs = dict(mesh=mesh, in_specs=(P(), P(axis), P(axis)),
                 out_specs=(P(), P()))
    try:
        sharded = shard_map(shard_body, check_vma=False, **specs)
    except TypeError:  # older jax spelling
        sharded = shard_map(shard_body, check_rep=False, **specs)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        sharded,
        in_shardings=(repl, NamedSharding(mesh, P(axis)),
                      NamedSharding(mesh, P(axis))),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))
