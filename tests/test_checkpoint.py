"""Checkpoint tests: native npz round trip, rotation/resume precedence, and
torch-layout import mapping."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_npz_roundtrip(tmp_path):
    from animatablegaussians_tpu.training import checkpoint as ck

    state = dict(a=jnp.arange(6.0).reshape(2, 3),
                 nested=dict(b=[jnp.ones(4), jnp.zeros((2, 2))]),
                 step=jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckpt")
    ck.save_checkpoint(d, state, extra=dict(epoch=3))
    loaded, meta = ck.load_checkpoint(d, jax.tree.map(jnp.zeros_like, state))
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotation_and_resume(tmp_path):
    from animatablegaussians_tpu.training import checkpoint as ck

    base = str(tmp_path)
    for i in (100, 200, 300):
        os.makedirs(os.path.join(base, f"batch_{i}"))
    ck.rotate_checkpoints(base)
    left = sorted(d for d in os.listdir(base) if d.startswith("batch"))
    assert left == ["batch_300"]

    d, with_opt = ck.resolve_resume_dir(base, prev_ckpt=None)
    assert d is None
    os.makedirs(os.path.join(base, "epoch_latest"))
    d, with_opt = ck.resolve_resume_dir(base)
    assert d.endswith("epoch_latest") and with_opt


def _torch_layout_from_params(params, net, prefix):
    """Inverse of import_dual_styleunet: our pytree -> torch-style keys."""
    sd = {}

    def put_lin(k, p):
        sd[f"{prefix}.{k}.weight"] = np.asarray(p["weight"]).T
        sd[f"{prefix}.{k}.bias"] = np.asarray(p["bias"])

    for i, p in enumerate(params["style"]):
        put_lin(f"style.{i + 1}", p)

    def put_conv_layer(k, p, downsample):
        ci = 1 if downsample else 0
        sd[f"{prefix}.{k}.{ci}.weight"] = np.asarray(
            p["conv"]["weight"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.{k}.{ci + 1}.bias"] = np.asarray(p["act_bias"])

    put_conv_layer("conv_in", params["conv_in"], True)
    for i, p in enumerate(params["from_rgbs"]):
        put_conv_layer(f"from_rgbs.{i}.conv", p["conv"], False)
    for i, p in enumerate(params["cond_convs"]):
        put_conv_layer(f"cond_convs.{i}.conv1", p["conv1"], False)
        put_conv_layer(f"cond_convs.{i}.conv2", p["conv2"], True)
    for i, p in enumerate(params["comb_convs"]):
        put_conv_layer(f"comb_convs.{i}", p, False)

    def put_styled(k, p):
        sd[f"{prefix}.{k}.conv.weight"] = np.asarray(
            p["conv"]["weight"]).transpose(3, 2, 0, 1)[None]
        put_lin(f"{k}.conv.modulation", p["conv"]["modulation"])
        sd[f"{prefix}.{k}.noise.weight"] = np.asarray(
            p["noise_weight"]).reshape(1)
        sd[f"{prefix}.{k}.activate.bias"] = np.asarray(p["act_bias"])

    def put_rgb(k, p):
        sd[f"{prefix}.{k}.conv.weight"] = np.asarray(
            p["conv"]["weight"]).transpose(3, 2, 0, 1)[None]
        put_lin(f"{k}.conv.modulation", p["conv"]["modulation"])
        sd[f"{prefix}.{k}.bias"] = np.asarray(p["bias"]).reshape(1, -1, 1, 1)

    for b in ("1", "2"):
        for i, p in enumerate(params[f"convs{b}"]):
            put_styled(f"convs{b}.{i}", p)
        for i, p in enumerate(params[f"to_rgbs{b}"]):
            put_rgb(f"to_rgbs{b}.{i}", p)
    for i, nz in enumerate(params["noises"]):
        sd[f"{prefix}.noises.noise_{i}"] = np.asarray(nz).transpose(0, 3, 1, 2)
    return sd


def test_torch_import_roundtrip():
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.training.checkpoint import \
        import_dual_styleunet

    net = su.DualStyleUNet(inp_size=64, inp_ch=3, out_ch=4, out_size=128,
                           style_dim=32, n_mlp=2)
    params = net.init(jax.random.PRNGKey(0))
    sd = _torch_layout_from_params(params, net, "color_net")
    imported = import_dual_styleunet(sd, "color_net", net)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(p) for p in path): leaf for path, leaf in
              jax.tree_util.tree_flatten_with_path(imported)[0]}
    for path, leaf in flat_a:
        key = tuple(str(p) for p in path)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[key]), atol=0,
                                   err_msg=str(key))

    # imported params drive the network identically
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    style = jnp.ones((1, 32)) / jnp.sqrt(32.0)
    np.testing.assert_array_equal(
        np.asarray(net.apply(params, style, x)),
        np.asarray(net.apply(imported, style, x)))
