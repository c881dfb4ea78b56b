"""feature2d: grid sampling math vs a numpy oracle, triplane/UV fields,
conv stacks (ref: utils/feature2d.py:9-183)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models.feature2d import (ConvStack,
                                                      TriPlaneFeature,
                                                      UNet5, UVFeature,
                                                      grid_sample2d,
                                                      triplane_sample)


def _np_grid_sample(image, p2d):
    """Numpy oracle: bilinear, align_corners=True, border clamp (the
    reference's hand-written grid_sample, feature2d.py:91-141)."""
    B, H, W, C = image.shape
    out = np.zeros(p2d.shape[:-1] + (C,), np.float32)
    for b in range(B):
        for n in range(p2d.shape[1]):
            x = (p2d[b, n, 0] + 1) / 2 * (W - 1)
            y = (p2d[b, n, 1] + 1) / 2 * (H - 1)
            x0, y0 = np.floor(x), np.floor(y)
            wx1, wy1 = x - x0, y - y0
            for dx, dy, w in ((0, 0, (1 - wx1) * (1 - wy1)),
                              (1, 0, wx1 * (1 - wy1)),
                              (0, 1, (1 - wx1) * wy1),
                              (1, 1, wx1 * wy1)):
                xi = int(np.clip(x0 + dx, 0, W - 1))
                yi = int(np.clip(y0 + dy, 0, H - 1))
                out[b, n] += w * image[b, yi, xi]
    return out


def test_grid_sample_matches_oracle():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, (2, 20, 2)).astype(np.float32)  # inc. OOB
    got = np.asarray(grid_sample2d(jnp.asarray(img), jnp.asarray(pts)))
    want = _np_grid_sample(img, pts)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_grads_flow_to_points_and_image():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 5, 2)), jnp.float32)
    gi = jax.grad(lambda im: jnp.sum(grid_sample2d(im, pts) ** 2))(img)
    gp = jax.grad(lambda pp: jnp.sum(grid_sample2d(img, pp) ** 2))(pts)
    assert float(jnp.sum(jnp.abs(gi))) > 0
    assert float(jnp.sum(jnp.abs(gp))) > 0


def test_triplane_and_uv_features():
    tp = TriPlaneFeature(feat_dim=6, feat_size=16)
    p = tp.init(jax.random.PRNGKey(0))
    fmap = tp.apply(p, batch=2)
    assert fmap.shape == (2, 16, 16, 18)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (2, 11, 3),
                             minval=-1, maxval=1)
    feat = triplane_sample(xyz, fmap)
    assert feat.shape == (2, 11, 18)

    uv = UVFeature(feat_dim=6, feat_size=16)
    pu = uv.init(jax.random.PRNGKey(2))
    f = UVFeature.sample_feat(xyz[..., :2], uv.apply(pu, 2))
    assert f.shape == (2, 11, 6)


@pytest.mark.parametrize("k", [3, 5])
def test_conv_stack_shapes(k):
    cs = ConvStack(4, 8, hid_dim=6, kernel_size=k, layer_num=3,
                   use_relu=True)
    p = cs.init(jax.random.PRNGKey(0))
    y = cs.apply(p, jnp.ones((1, 16, 16, 4)))
    assert y.shape == (1, 16, 16, 8)


def test_unet5_shapes_and_grads():
    net = UNet5(in_c=3, out_c=5, nf=4)
    p = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y = net.apply(p, x)
    assert y.shape == (2, 32, 32, 5)
    g = jax.grad(lambda pp: jnp.sum(net.apply(pp, x) ** 2))(p)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
