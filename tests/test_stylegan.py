"""StyleGenerator: shapes, latent API, and a generator<->discriminator GAN
wiring smoke test (ref: network/styleunet/stylegan.py:148-331)."""

import numpy as np

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.discriminator import Discriminator
from animatablegaussians_tpu.models.stylegan import StyleGenerator
from animatablegaussians_tpu.training import losses as L


def test_generator_shapes_and_latents():
    g = StyleGenerator(size=64, style_dim=64, n_mlp=2, channel_max=32)
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    img, lat = g.apply(p, [z], randomize_noise=False)
    assert img.shape == (2, 64, 64, 3)
    assert lat is None
    img2, lat2 = g.apply(p, [z], randomize_noise=False, return_latents=True)
    assert lat2.shape == (2, g.n_latent, 64)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)

    # mixing + truncation + W+ input
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    mixed, lat3 = g.apply(p, [z, z2], inject_index=2, randomize_noise=False,
                          return_latents=True)
    w1, w2 = g.get_latent(p, z), g.get_latent(p, z2)
    np.testing.assert_allclose(np.asarray(lat3[:, 0]), np.asarray(w1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat3[:, -1]), np.asarray(w2),
                               atol=1e-5)
    mean = g.mean_latent(p, 8, jax.random.PRNGKey(3))
    t, lt = g.apply(p, [z], truncation=0.0, truncation_latent=mean,
                    randomize_noise=False, return_latents=True)
    np.testing.assert_allclose(
        np.asarray(lt[:, 0]),
        np.broadcast_to(np.asarray(mean), lt[:, 0].shape), atol=1e-5)
    wplus = jnp.repeat(w1[:, None], g.n_latent, axis=1)
    c, _ = g.apply(p, [wplus], input_is_latent=True, randomize_noise=False)
    np.testing.assert_allclose(np.asarray(c), np.asarray(img), atol=1e-5)


def test_gan_training_smoke():
    """One G step + one D step through the StyleGAN losses decrease nothing
    catastrophically: finite losses, nonzero grads both ways."""
    g = StyleGenerator(size=32, style_dim=32, n_mlp=1, channel_max=16)
    d = Discriminator(size=32, img_channel=3, channel_max=16)
    gp = g.init(jax.random.PRNGKey(0))
    dp = d.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    real = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))

    def g_loss(gp):
        fake, _ = g.apply(gp, [z], randomize_noise=False)
        return L.g_nonsaturating_loss(d.apply(dp, fake))

    gl, ggrad = jax.value_and_grad(g_loss)(gp)
    assert np.isfinite(float(gl))
    gn = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(ggrad))
    assert gn > 0

    fake, _ = g.apply(gp, [z], randomize_noise=False)

    def d_loss(dp):
        return L.d_logistic_loss(d.apply(dp, real), d.apply(dp, fake))

    dl, dgrad = jax.value_and_grad(d_loss)(dp)
    assert np.isfinite(float(dl))
    dn = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(dgrad))
    assert dn > 0
