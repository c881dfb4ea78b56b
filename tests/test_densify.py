"""Densify/clone/split/prune + adam-state surgery tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax


def _toy(n=20, seed=0):
    from animatablegaussians_tpu.models.gaussian_model import create_from_pcd
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    cols = jnp.asarray(rng.random((n, 3)), jnp.float32)
    return create_from_pcd(pts, cols)


def test_clone_split_prune_counts():
    from animatablegaussians_tpu.models import densify as D

    g = _toy(20)
    grads = jnp.zeros(20).at[:5].set(1.0)

    # force every selected gaussian to be "small" -> all cloned
    g_small = jax.tree.map(lambda x: x, g)
    cloned = D.densify_and_clone(g_small, grads, 0.5, scene_extent=1e6)
    assert cloned.xyz.shape[0] == 25

    # force "big": tiny scene extent -> split (originals removed, x2 added)
    split = D.densify_and_split(g, grads, 0.5, scene_extent=1e-6, n_split=2)
    assert split.xyz.shape[0] == 15 + 10

    pruned = D.prune(split, min_opacity=0.5)  # init opacity 0.1 -> all go
    assert pruned.xyz.shape[0] == 0

    reset = D.reset_opacity(g, ceiling=0.01)
    assert float(reset.get_opacity.max()) <= 0.01 + 1e-5


def test_grow_adam_state():
    from animatablegaussians_tpu.models import densify as D

    g = _toy(10)
    opt = optax.adam(1e-3)
    state = opt.init(g)
    grads = jnp.zeros(10).at[:3].set(1.0)
    g2 = D.densify_and_clone(g, grads, 0.5, scene_extent=1e6)
    state2 = D.grow_adam_state(state, g, g2)
    # update must typecheck against the grown params
    fake_grads = jax.tree.map(jnp.ones_like, g2)
    updates, _ = opt.update(fake_grads, state2, g2)
    assert jax.tree.leaves(updates)[0].shape[0] == 13
