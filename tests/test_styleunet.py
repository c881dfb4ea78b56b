"""StyleUNet layer parity vs torch-implemented StyleGAN2 formulas, plus
full-net smoke tests on a small configuration."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from animatablegaussians_tpu.models import styleunet as su


def to_torch_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def from_torch_nchw(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


def test_equal_linear_matches_formula():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 16)).astype(np.float32)  # (in, out)
    b = rng.standard_normal(16).astype(np.float32)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    lr_mul = 0.01
    p = dict(weight=jnp.asarray(w), bias=jnp.asarray(b))
    got = np.asarray(su.equal_linear(p, jnp.asarray(x), lr_mul=lr_mul))
    want = x @ (w * (1 / math.sqrt(8)) * lr_mul) + b * lr_mul
    np.testing.assert_allclose(got, want, atol=1e-5)

    got_act = np.asarray(su.equal_linear(p, jnp.asarray(x), lr_mul=lr_mul,
                                         activation=True))
    pre = x @ (w * (1 / math.sqrt(8)) * lr_mul) + b * lr_mul
    want_act = np.where(pre >= 0, pre, pre * 0.2) * math.sqrt(2.0)
    np.testing.assert_allclose(got_act, want_act, atol=1e-5)


def test_modulated_conv_matches_torch():
    rng = np.random.default_rng(1)
    B, H, Cin, Cout, k, sd = 2, 12, 6, 5, 3, 7
    w = rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    mod_w = rng.standard_normal((sd, Cin)).astype(np.float32)
    mod_b = rng.standard_normal(Cin).astype(np.float32)
    x = rng.standard_normal((B, H, H, Cin)).astype(np.float32)
    style = rng.standard_normal((B, sd)).astype(np.float32)

    p = dict(weight=jnp.asarray(w),
             modulation=dict(weight=jnp.asarray(mod_w),
                             bias=jnp.asarray(mod_b)))
    got = np.asarray(su.modulated_conv2d(p, jnp.asarray(x),
                                         jnp.asarray(style)))

    # torch oracle (ref semantics: style-scale weight, demod, conv same pad)
    s = style @ (mod_w / math.sqrt(sd)) + mod_b                  # (B, Cin)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())        # (out,in,k,k)
    scale = 1 / math.sqrt(Cin * k * k)
    outs = []
    for bi in range(B):
        wb = scale * wt * torch.from_numpy(s[bi])[None, :, None, None]
        demod = torch.rsqrt((wb ** 2).sum([1, 2, 3]) + 1e-8)
        wb = wb * demod[:, None, None, None]
        xi = to_torch_nchw(x[bi:bi + 1])
        outs.append(tF.conv2d(xi, wb, padding=k // 2))
    want = from_torch_nchw(torch.cat(outs))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(2)
    B, H, Cin, Cout, k = 1, 8, 4, 6, 3
    x = rng.standard_normal((B, H, H, Cin)).astype(np.float32)
    w = rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    got = np.asarray(su.conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                         stride=2))
    # torch: weight (in, out, k, k)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1).copy())
    want = from_torch_nchw(tF.conv_transpose2d(to_torch_nchw(x), wt, stride=2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_layer_downsample_matches_torch():
    rng = np.random.default_rng(3)
    B, H, Cin, Cout, k = 1, 16, 3, 8, 3
    x = rng.standard_normal((B, H, H, Cin)).astype(np.float32)
    w = rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)
    p = dict(conv=dict(weight=jnp.asarray(w)), act_bias=jnp.asarray(b))
    got = np.asarray(su.conv_layer(p, jnp.asarray(x), k, downsample_=True))

    # oracle: blur (upfirdn pad ((p+1)//2, p//2), p = 4-2 + k-1) -> conv s2
    from test_upfirdn2d import upfirdn2d_np
    from animatablegaussians_tpu.ops.upfirdn2d import make_kernel
    pd = (4 - 2) + (k - 1)
    blurred = upfirdn2d_np(x.astype(np.float64), make_kernel([1, 3, 3, 1]),
                           pad=((pd + 1) // 2, pd // 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1).copy()).double()
    scale = 1 / math.sqrt(Cin * k * k)
    conv = tF.conv2d(torch.from_numpy(
        blurred.transpose(0, 3, 1, 2).copy()), wt * scale, stride=2)
    pre = from_torch_nchw(conv.float()) + b
    want = np.where(pre >= 0, pre, 0.2 * pre) * math.sqrt(2.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.fixture(scope="module")
def small_net():
    net = su.DualStyleUNet(inp_size=64, inp_ch=3, out_ch=4, out_size=128,
                           style_dim=32, n_mlp=2)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def test_dual_styleunet_forward(small_net):
    net, params = small_net
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    style = jnp.ones((1, 32)) / jnp.sqrt(32.0)
    out = net.apply(params, style, x)
    assert out.shape == (1, 128, 128, 8)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic with fixed noise
    out2 = net.apply(params, style, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_dual_styleunet_viewdir_injection(small_net):
    net, params = small_net
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    style = jnp.ones((1, 32)) / jnp.sqrt(32.0)
    out0 = net.apply(params, style, x)
    # stage i==8 exists when there are >= 5 decoder stages; for out 128
    # (stages 16..128 => 4 stages) injection is a no-op at i==8 -> guard
    n_stages = len(net.dec_stages)
    vf_ch = 16
    vf = 10.0 * jnp.ones((1, 8, 8, vf_ch))
    if n_stages * 2 > 8:
        out1 = net.apply(params, style, x, view_feature1=vf)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_dual_styleunet_grads(small_net):
    net, params = small_net
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    style = jnp.ones((1, 32)) / jnp.sqrt(32.0)

    def loss(p):
        return jnp.mean(net.apply(p, style, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # styled conv weights receive gradient
    gw = np.asarray(g["convs1"][0]["conv"]["weight"])
    assert np.abs(gw).max() > 0


def test_conv_mmgrad_matches_autodiff():
    """The matmul-lowered weight/input gradients (set_conv_mmgrad) must
    match plain jax.grad through the stock conv for every (stride-1)
    padding used in the nets."""
    import numpy as np
    from animatablegaussians_tpu.models import styleunet as su

    rng = np.random.default_rng(0)
    for k, pad in ((3, 1), (1, 0), (3, 0)):
        x = jnp.asarray(rng.normal(size=(2, 10, 12, 5)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, 5, 7)).astype(np.float32))
        probe = jnp.asarray(rng.normal(
            size=(2, 10 - k + 1 + 2 * pad, 12 - k + 1 + 2 * pad,
                  7)).astype(np.float32))

        def loss(x, w):
            return jnp.sum(su.conv2d(x, w, padding=pad) * probe)

        gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w)
        su.set_conv_mmgrad(True)
        try:
            gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w)
        finally:
            su.set_conv_mmgrad(False)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                   rtol=1e-5, atol=1e-4)
