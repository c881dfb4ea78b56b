"""DualStyleUNetV2 family: shapes, variants, and the StyleGAN2 latent API
(ref: network/styleunet/dual_styleunet_v2.py:634,903,1186)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.styleunet_v2 import DualStyleUNetV2

KW = dict(inp_size=64, inp_ch=3, out_ch=3, out_size=64, style_dim=64,
          n_mlp=2, middle_size=8, channel_max=32)


def _build(mode, c_dim=0):
    net = DualStyleUNetV2(mode=mode, c_dim=c_dim, **KW)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


@pytest.mark.parametrize("mode", ["base", "add_dwt", "wo_dwt"])
def test_forward_shapes(mode):
    net, params = _build(mode)
    x = jnp.ones((2, 64, 64, 3))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    img, lat = net.apply(params, [z], x, randomize_noise=False)
    # all modes emit [front, back] concat; wavelet modes at out_size after
    # the final iwt, wo_dwt directly in pixel space
    assert img.shape == (2, 64, 64, 6)
    assert lat is None
    img2, lat2 = net.apply(params, [z], x, randomize_noise=False,
                           return_latents=True)
    assert lat2.shape == (2, net.n_latent, 64)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)


def test_style_mixing_and_truncation():
    net, params = _build("base")
    x = jnp.ones((1, 64, 64, 3))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    z1, z2 = jax.random.normal(k1, (1, 64)), jax.random.normal(k2, (1, 64))
    a, _ = net.apply(params, [z1], x, randomize_noise=False)
    b, _ = net.apply(params, [z2], x, randomize_noise=False)
    mixed, lat = net.apply(params, [z1, z2], x, inject_index=3,
                           randomize_noise=False, return_latents=True)
    assert mixed.shape == a.shape
    # mixing actually uses both latents
    w1, w2 = net.get_latent(params, z1), net.get_latent(params, z2)
    np.testing.assert_allclose(np.asarray(lat[:, 0]), np.asarray(w1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat[:, -1]), np.asarray(w2),
                               atol=1e-5)

    # truncation toward the mean latent: truncation=0 -> pure mean
    mean = net.mean_latent(params, 16, k3)
    t0, lat0 = net.apply(params, [z1], x, truncation=0.0,
                         truncation_latent=mean, randomize_noise=False,
                         return_latents=True)
    np.testing.assert_allclose(np.asarray(lat0[:, 0]),
                               np.asarray(mean), atol=1e-5)

    # input_is_latent skips the mapping MLP
    c, latw = net.apply(params, [w1], x, input_is_latent=True,
                        randomize_noise=False, return_latents=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)


def test_c_dim_conditioning():
    net, params = _build("base", c_dim=8)
    x = jnp.ones((1, 64, 64, 3))
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 64))
    c1 = jnp.zeros((1, 8))
    c2 = jnp.ones((1, 8))
    a, _ = net.apply(params, [z], x, cond=c1, randomize_noise=False)
    b, _ = net.apply(params, [z], x, cond=c2, randomize_noise=False)
    assert a.shape == (1, 64, 64, 6)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-6  # conditioning has effect


def test_noise_modes_and_grads():
    net, params = _build("base")
    # noise_weight inits to 0 (same as the reference) — give the injection
    # a visible gain so the randomize_noise path is observable
    for branch in ("convs1", "convs2"):
        for conv in params[branch]:
            conv["noise_weight"] = jnp.ones(())
    x = jnp.ones((1, 64, 64, 3))
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 64))
    r1, _ = net.apply(params, [z], x, randomize_noise=True,
                      rng=jax.random.PRNGKey(5))
    r2, _ = net.apply(params, [z], x, randomize_noise=True,
                      rng=jax.random.PRNGKey(6))
    assert float(jnp.max(jnp.abs(r1 - r2))) > 1e-8  # noise differs
    nz = net.make_noise(zero_noise=True)
    r3, _ = net.apply(params, [z], x, noise=nz)
    assert jnp.all(jnp.isfinite(r3))

    g = jax.grad(lambda p: jnp.sum(
        net.apply(p, [z], x, randomize_noise=False)[0] ** 2))(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
