"""LPIPS torch-weight import: synthetic torchvision-format vgg16 features
state dict + LPIPS lin heads -> our param layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def test_load_torch_weights(tmp_path):
    from animatablegaussians_tpu.training import lpips as lp

    rng = np.random.default_rng(0)
    vgg_sd = {}
    in_ch = 3
    torch_idx = 0
    for c in lp._VGG16_CFG:
        if c == "M":
            torch_idx += 1
            continue
        vgg_sd[f"features.{torch_idx}.weight"] = torch.from_numpy(
            rng.standard_normal((c, in_ch, 3, 3)).astype(np.float32))
        vgg_sd[f"features.{torch_idx}.bias"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32))
        in_ch = c
        torch_idx += 2
    lin_sd = {}
    for i, c in enumerate(lp._LIN_CHANNELS):
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32))

    vp = str(tmp_path / "vgg16.pth")
    lpth = str(tmp_path / "lin.pth")
    torch.save(vgg_sd, vp)
    torch.save(lin_sd, lpth)

    params = lp.load_torch_weights(vp, lpth)
    assert len(params["convs"]) == 13
    assert params["convs"][0]["weight"].shape == (3, 3, 3, 64)
    assert params["lins"][0].shape == (64,)
    # metric evaluates and is zero on identical inputs
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    d = lp.lpips(params, x, x)
    assert abs(float(d[0])) < 1e-6


REF_LIN = "/root/reference/network/lpips/weights/v0.1/vgg.pth"


@pytest.mark.skipif(not __import__("os").path.exists(REF_LIN),
                    reason="reference repo not mounted")
def test_load_real_reference_lin_heads(tmp_path):
    """Load the ACTUAL vendored LPIPS lin-head file
    (ref: network/lpips/weights/v0.1/vgg.pth, consumed at
    network/lpips/lpips.py model_path) through load_torch_weights. The vgg16
    backbone weights are not vendored in this image, so the backbone half
    stays synthetic — the lin heads are the reference-specific part."""
    from animatablegaussians_tpu.training import lpips as lp

    rng = np.random.default_rng(0)
    vgg_sd = {}
    in_ch = 3
    torch_idx = 0
    for c in lp._VGG16_CFG:
        if c == "M":
            torch_idx += 1
            continue
        vgg_sd[f"features.{torch_idx}.weight"] = torch.from_numpy(
            rng.standard_normal((c, in_ch, 3, 3)).astype(np.float32))
        vgg_sd[f"features.{torch_idx}.bias"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32))
        in_ch = c
        torch_idx += 2
    vp = str(tmp_path / "vgg16.pth")
    torch.save(vgg_sd, vp)

    params = lp.load_torch_weights(vp, REF_LIN)
    # lin heads must be the real ones: non-negative, correct widths, and not
    # all equal (a real trained head has spread)
    ref_sd = torch.load(REF_LIN, map_location="cpu")
    for i, c in enumerate(lp._LIN_CHANNELS):
        lin = np.asarray(params["lins"][i])
        assert lin.shape == (c,)
        assert (lin >= 0).all()
        np.testing.assert_allclose(
            lin, ref_sd[f"lin{i}.model.1.weight"].numpy().reshape(c))
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    d0 = lp.lpips(params, x, x)
    d1 = lp.lpips(params, x, y)
    assert abs(float(d0[0])) < 1e-6 and float(d1[0]) > 0
