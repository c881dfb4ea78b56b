"""StyleGAN2 discriminator: shapes, stddev feature, pose projection, and a
GAN-loss smoke step (ref: network/styleunet/dual_styleunet.py:473-567)."""

import numpy as np

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.discriminator import Discriminator
from animatablegaussians_tpu.training import losses as L


def test_logit_shapes_and_grads():
    d = Discriminator(size=64, img_channel=6, channel_max=32)
    p = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 6))
    out = d.apply(p, x)
    assert out.shape == (4, 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    g = jax.grad(lambda pp: jnp.sum(d.apply(pp, x) ** 2))(p)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_minibatch_stddev_distinguishes_variance():
    """A batch with zero variance puts ~0 in the stddev channel; a noisy
    batch puts a visibly positive value — the logits must differ."""
    d = Discriminator(size=32, img_channel=3, channel_max=16)
    p = d.init(jax.random.PRNGKey(0))
    same = jnp.ones((4, 32, 32, 3))
    noisy = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    o1, o2 = d.apply(p, same), d.apply(p, noisy)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6


def test_pose_projection_head():
    d = Discriminator(size=32, img_channel=3, c_dim=10, channel_max=16)
    p = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    pose1 = jnp.zeros((2, 10)).at[:, 0].set(1.0)
    pose2 = jnp.zeros((2, 10)).at[:, 5].set(1.0)
    o1 = d.apply(p, x, flat_pose=pose1)
    o2 = d.apply(p, x, flat_pose=pose2)
    assert o1.shape == (2, 1)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-8


def test_gan_smoke_step():
    """d_logistic_loss + g_nonsaturating_loss + R1 through the D are finite
    and produce nonzero grads (the GAN surface the reference defines)."""
    d = Discriminator(size=32, img_channel=3, channel_max=16)
    p = d.init(jax.random.PRNGKey(0))
    real = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    fake = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))

    def d_loss(pp):
        return L.d_logistic_loss(d.apply(pp, real), d.apply(pp, fake))

    loss, g = jax.value_and_grad(d_loss)(p)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert gn > 0

    r1 = L.d_r1_loss(lambda img: d.apply(p, img), real)
    assert np.isfinite(float(r1))

    gl = L.g_nonsaturating_loss(d.apply(p, fake))
    assert np.isfinite(float(gl))
