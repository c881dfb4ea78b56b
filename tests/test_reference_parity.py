"""Parity against the ACTUAL reference torch code at /root/reference.

These tests import the reference implementation (torch CPU — the CUDA
extension imports are stubbed; both reference ops have CPU fallbacks,
ref: network/styleunet/fused_act.py:118, upfirdn2d.py:177-181) and compare:

  * smplx.lbs.lbs (ref: smplx/lbs.py:152-252) — vertices, joints, and the
    per-joint affine mats A on synthetic model tensors;
  * network.styleunet.dual_styleunet.DualStyleUNet — a full forward with
    random torch weights exported through our torch-checkpoint importer.

This is the only ground truth available in this environment for the
"<= 0.1 dB PSNR delta with imported torch checkpoints" target.

Skipped automatically when /root/reference is absent (public CI).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference packages with the CUDA extension modules stubbed
    (never called on the CPU paths)."""
    for name in ("fused", "upfirdn2d"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, REF)
    try:
        import smplx as ref_smplx  # noqa: F401
        from network.styleunet import dual_styleunet as ref_dsu
        yield ref_smplx, ref_dsu
    finally:
        sys.path.remove(REF)


def test_lbs_matches_reference(ref_modules):
    """verts/joints/A vs smplx/lbs.py:152-252 (return_affine_mat=True)."""
    ref_smplx, _ = ref_modules
    from animatablegaussians_tpu.models.smplx.lbs import lbs as our_lbs
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, V, J, NB = 2, 80, 24, 10
    parents = np.zeros(J, np.int64)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)

    v_template = rng.standard_normal((V, 3)).astype(np.float32)
    shapedirs = 0.03 * rng.standard_normal((V, 3, NB)).astype(np.float32)
    posedirs_t = 0.01 * rng.standard_normal(
        ((J - 1) * 9, V * 3)).astype(np.float32)          # torch layout (P, V*3)
    J_regressor = rng.random((J, V)).astype(np.float32)
    J_regressor /= J_regressor.sum(1, keepdims=True)
    weights = rng.random((V, J)).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)

    betas = 0.5 * rng.standard_normal((B, NB)).astype(np.float32)
    pose = 0.4 * rng.standard_normal((B, J * 3)).astype(np.float32)

    t = lambda a: torch.from_numpy(np.asarray(a))
    with torch.no_grad():
        rv, rj, ra = ref_smplx.lbs.lbs(
            t(betas), t(pose), t(v_template)[None].expand(B, -1, -1),
            t(shapedirs), t(posedirs_t), t(J_regressor), t(parents),
            t(weights), pose2rot=True, return_affine_mat=True)

    ov, oj, oa = our_lbs(
        jnp.asarray(betas), jnp.asarray(pose), jnp.asarray(v_template),
        jnp.asarray(shapedirs), jnp.asarray(posedirs_t),
        jnp.asarray(J_regressor), jnp.asarray(parents),
        jnp.asarray(weights))

    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oa), ra.numpy(), atol=2e-5)


def test_dual_styleunet_matches_reference(ref_modules):
    """Full-net forward agreement with random torch weights exported through
    import_dual_styleunet (ref: network/styleunet/dual_styleunet.py:636-906,
    fixed noise, single constant style)."""
    _, ref_dsu = ref_modules
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.training.checkpoint import \
        import_dual_styleunet
    import jax.numpy as jnp

    torch.manual_seed(0)
    kw = dict(inp_size=64, inp_ch=3, out_ch=3, out_size=64,
              style_dim=64, n_mlp=2)
    ref_net = ref_dsu.DualStyleUNet(**kw).eval()

    sd = {f"net.{k}": v.detach().numpy()
          for k, v in ref_net.state_dict().items()}

    our_net = su.DualStyleUNet(**kw)
    params = import_dual_styleunet(sd, "net", our_net)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)  # NHWC
    style = (np.ones((1, 64)) / np.sqrt(64)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_net(
            [torch.from_numpy(style)],
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            randomize_noise=False)[0]
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)          # NHWC, 2*out_ch

    old_prec = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_out = np.asarray(our_net.apply(params, jnp.asarray(style),
                                           jnp.asarray(x)))
    finally:
        su.set_conv_precision(old_prec)

    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4,
                               err_msg="DualStyleUNet forward diverges from "
                                       "the torch reference")


def test_dual_styleunet_viewdir_injection_matches_reference(ref_modules):
    """view_feature add at the i==8 feature level must match
    (ref: dual_styleunet.py:881-883,900-902). The decoder only reaches
    i==8 at its 5th stage AND only uses the injected features if a 6th
    stage follows (the add lands after the last to_rgb otherwise), i.e.
    out_size = 1024 — exactly the production config
    (ref: network/avatar.py:34-36). Smaller out_sizes make injection a
    silent no-op: the round-2 version of this test used out_size=256 and
    was vacuous. channel_multiplier=1 keeps the 1024^2 net CPU-affordable."""
    _, ref_dsu = ref_modules
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.training.checkpoint import \
        import_dual_styleunet
    import jax.numpy as jnp

    torch.manual_seed(1)
    kw = dict(inp_size=64, inp_ch=3, out_ch=2, out_size=1024,
              style_dim=32, n_mlp=2, channel_multiplier=1)
    ref_net = ref_dsu.DualStyleUNet(**kw).eval()
    sd = {f"net.{k}": v.detach().numpy()
          for k, v in ref_net.state_dict().items()}
    our_net = su.DualStyleUNet(**kw)
    params = import_dual_styleunet(sd, "net", our_net)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    style = rng.standard_normal((1, 32)).astype(np.float32)
    # view features at an arbitrary resolution; both impls resize to the
    # i==8 feature map bilinearly. channel count must match the i==8
    # stage width (channels[256] = 64 * multiplier).
    vf1 = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    vf2 = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    # guard against the vacuous-regression: injection must CHANGE the
    # output at this configuration
    with torch.no_grad():
        base_out = ref_net([torch.from_numpy(style)],
                           torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           randomize_noise=False)[0]
        inj_out = ref_net([torch.from_numpy(style)],
                          torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          randomize_noise=False,
                          view_feature1=torch.from_numpy(
                              vf1.transpose(0, 3, 1, 2)),
                          view_feature2=torch.from_numpy(
                              vf2.transpose(0, 3, 1, 2)))[0]
    assert (base_out - inj_out).abs().max().item() > 1e-3

    with torch.no_grad():
        ref_out = ref_net(
            [torch.from_numpy(style)],
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            randomize_noise=False,
            view_feature1=torch.from_numpy(vf1.transpose(0, 3, 1, 2)),
            view_feature2=torch.from_numpy(vf2.transpose(0, 3, 1, 2)))[0]
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    old_prec = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_out = np.asarray(our_net.apply(
            params, jnp.asarray(style), jnp.asarray(x),
            view_feature1=jnp.asarray(vf1), view_feature2=jnp.asarray(vf2)))
    finally:
        su.set_conv_precision(old_prec)

    np.testing.assert_allclose(our_out, ref_out, atol=5e-4)


@pytest.mark.parametrize("mode,ref_cls", [
    ("base", "DualStyleUNet"),
    ("add_dwt", "DualStyleUNet_add_dwt"),
    ("wo_dwt", "DualStyleUNet_wo_dwt"),
])
def test_dual_styleunet_v2_matches_reference(ref_modules, mode, ref_cls):
    """All three v2 variants vs the actual torch classes
    (ref: network/styleunet/dual_styleunet_v2.py:634,903,1186) with random
    torch weights exported through import_dual_styleunet_v2: fixed noise,
    c_dim conditioning, style mixing with explicit inject_index, and
    truncation toward a fixed latent."""
    del ref_modules  # stubs + sys.path fixture ran
    sys.path.insert(0, REF)
    try:
        from network.styleunet import dual_styleunet_v2 as ref_v2
    finally:
        sys.path.remove(REF)
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.models.styleunet_v2 import DualStyleUNetV2
    from animatablegaussians_tpu.training.checkpoint import \
        import_dual_styleunet_v2
    import jax.numpy as jnp

    torch.manual_seed(3)
    c_dim = 16
    kw = dict(inp_size=64, inp_ch=3, out_ch=3, out_size=64,
              style_dim=32, n_mlp=2, c_dim=c_dim)
    ref_net = getattr(ref_v2, ref_cls)(**kw).eval()
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}

    our_net = DualStyleUNetV2(mode=mode, **kw)
    params = import_dual_styleunet_v2(sd, "", our_net)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    z1 = rng.standard_normal((2, 32)).astype(np.float32)
    z2 = rng.standard_normal((2, 32)).astype(np.float32)
    cond = rng.standard_normal((2, c_dim)).astype(np.float32)
    trunc_lat = rng.standard_normal((1, 32)).astype(np.float32)
    inject_index = 2

    t = torch.from_numpy
    with torch.no_grad():
        ref_out, ref_lat = ref_net(
            [t(z1), t(z2)], t(x.transpose(0, 3, 1, 2)), cond=t(cond),
            randomize_noise=False, inject_index=inject_index,
            truncation=0.7, truncation_latent=t(trunc_lat),
            return_latents=True)
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    old = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_out, our_lat = our_net.apply(
            params, [jnp.asarray(z1), jnp.asarray(z2)], jnp.asarray(x),
            cond=jnp.asarray(cond), randomize_noise=False,
            inject_index=inject_index, truncation=0.7,
            truncation_latent=jnp.asarray(trunc_lat), return_latents=True)
    finally:
        su.set_conv_precision(old)

    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(our_lat), ref_lat.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=2e-4,
                               err_msg=f"DualStyleUNetV2[{mode}] diverges "
                                       "from the torch reference")


def test_swgan_unet_matches_reference(ref_modules):
    """Single-decoder StyleUNet ``SWGAN_unet``
    (ref: network/styleunet/styleunet.py:634-860) vs our SWGANUnet under
    imported random torch weights: fixed noise, style mixing with explicit
    inject_index."""
    del ref_modules
    sys.path.insert(0, REF)
    try:
        from network.styleunet import styleunet as ref_su
    finally:
        sys.path.remove(REF)
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.models.styleunet_v2 import SWGANUnet
    from animatablegaussians_tpu.training.checkpoint import import_swgan_unet
    import jax.numpy as jnp

    torch.manual_seed(5)
    kw = dict(inp_size=64, inp_ch=3, out_ch=3, out_size=64,
              style_dim=32, n_mlp=2)
    ref_net = ref_su.SWGAN_unet(**kw).eval()
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}

    our_net = SWGANUnet(**kw)
    params = import_swgan_unet(sd, "", our_net)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    z1 = rng.standard_normal((2, 32)).astype(np.float32)
    z2 = rng.standard_normal((2, 32)).astype(np.float32)
    inject_index = 3

    t = torch.from_numpy
    with torch.no_grad():
        ref_out, ref_lat = ref_net(
            [t(z1), t(z2)], t(x.transpose(0, 3, 1, 2)),
            randomize_noise=False, inject_index=inject_index,
            return_latents=True)
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    old = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_out, our_lat = our_net.apply(
            params, [jnp.asarray(z1), jnp.asarray(z2)], jnp.asarray(x),
            randomize_noise=False, inject_index=inject_index,
            return_latents=True)
    finally:
        su.set_conv_precision(old)

    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(our_lat), ref_lat.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=2e-4,
                               err_msg="SWGAN_unet diverges from the torch "
                                       "reference")


def test_discriminator_matches_reference(ref_modules):
    """Logit agreement with the reference StyleGAN2 Discriminator
    (ref: network/styleunet/dual_styleunet.py:473-567) under imported
    random torch weights — covers the wavelet FromRGB pyramid, the fused
    wavelet downsampling, minibatch stddev, and the final head."""
    _, ref_dsu = ref_modules
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.models.discriminator import Discriminator
    from animatablegaussians_tpu.training.checkpoint import \
        import_discriminator
    import jax.numpy as jnp

    torch.manual_seed(1)
    ref_d = ref_dsu.Discriminator(size=64, img_channel=3).eval()
    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}

    our_d = Discriminator(size=64, img_channel=3)
    params = import_discriminator(sd, "", our_d)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_d(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    old = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_out = np.asarray(our_d.apply(params, jnp.asarray(x)))
    finally:
        su.set_conv_precision(old)

    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4,
                               err_msg="Discriminator diverges from the "
                                       "torch reference")


def test_style_generator_matches_reference(ref_modules):
    """Image agreement with the reference StyleGenerator
    (ref: network/styleunet/stylegan.py:148-331) under imported random
    torch weights (fixed noise, single style)."""
    del ref_modules  # ensures the stubs + sys.path fixture ran
    sys.path.insert(0, REF)
    try:
        from network.styleunet import stylegan as ref_sg
    finally:
        sys.path.remove(REF)
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.models.stylegan import StyleGenerator
    from animatablegaussians_tpu.training.checkpoint import \
        import_style_generator
    import jax.numpy as jnp

    torch.manual_seed(2)
    ref_g = ref_sg.StyleGenerator(size=64, style_dim=64, n_mlp=2,
                                  out_ch=3).eval()
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}

    our_g = StyleGenerator(size=64, style_dim=64, n_mlp=2, out_ch=3)
    params = import_style_generator(sd, "", our_g)

    z = np.random.default_rng(3).standard_normal((2, 64)).astype(np.float32)
    with torch.no_grad():
        ref_img = ref_g([torch.from_numpy(z)],
                        randomize_noise=False)[0].numpy()
    ref_img = ref_img.transpose(0, 2, 3, 1)

    old = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        our_img, _ = our_g.apply(params, [jnp.asarray(z)],
                                 randomize_noise=False)
        our_img = np.asarray(our_img)
    finally:
        su.set_conv_precision(old)

    assert our_img.shape == ref_img.shape
    np.testing.assert_allclose(our_img, ref_img, atol=2e-4,
                               err_msg="StyleGenerator diverges from the "
                                       "torch reference")


def test_vertex_joint_selector_matches_reference(ref_modules):
    """Extra landmark joints (nose/eyes/ears, feet, finger tips) appended
    after the LBS joints vs smplx/vertex_joint_selector.py, on both a
    synthetic small-index table and the real 'smplx' table."""
    ref_smplx, _ = ref_modules
    from animatablegaussians_tpu.models.smplx import (VERTEX_IDS,
                                                      extra_joints_indices)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for vids, V in [({k: int(v) for k, v in
                      zip(VERTEX_IDS["smplx"],
                          rng.integers(0, 60, len(VERTEX_IDS["smplx"])))},
                     60),
                    (VERTEX_IDS["smplx"], 10475)]:
        verts = rng.standard_normal((2, V, 3)).astype(np.float32)
        joints = rng.standard_normal((2, 55, 3)).astype(np.float32)
        sel = ref_smplx.vertex_joint_selector.VertexJointSelector(
            vertex_ids=vids)
        with torch.no_grad():
            want = sel(torch.from_numpy(verts),
                       torch.from_numpy(joints)).numpy()
        idxs = extra_joints_indices(vids)
        got = np.concatenate([joints, verts[:, idxs]], axis=1)
        np.testing.assert_allclose(got, want, atol=0)
        assert got.shape[1] == 55 + 21


def test_face_landmarks_match_reference(ref_modules):
    """Static + dynamic-contour face landmarks vs smplx/lbs.py
    vertices2landmarks / find_dynamic_lmk_idx_and_bcoords on a synthetic
    mesh, LUT, and neck chain."""
    ref_smplx, _ = ref_modules
    from animatablegaussians_tpu.models.smplx import (
        find_dynamic_lmk_idx_and_bcoords, vertices2landmarks)
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    B, V, F, L, LD, J = 3, 90, 50, 12, 17, 55
    verts = rng.standard_normal((B, V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int64)
    lmk_f = rng.integers(0, F, (L,)).astype(np.int64)
    lmk_b = rng.random((L, 3)).astype(np.float32)
    dyn_f = rng.integers(0, F, (79, LD)).astype(np.int64)
    dyn_b = rng.random((79, LD, 3)).astype(np.float32)
    # poses spanning positive/negative/extreme neck rotations (the LUT's
    # three index regimes)
    pose = np.zeros((B, J * 3), np.float32)
    pose[0, 12 * 3 + 1] = 0.4    # neck +y
    pose[1, 12 * 3 + 1] = -0.9   # neck -y
    pose[2, 9 * 3 + 1] = -2.2    # spine3 extreme (< -39 deg regime)
    neck_chain = [12, 9, 6, 3, 0]

    t = torch.from_numpy
    with torch.no_grad():
        want_df, want_db = ref_smplx.lbs.find_dynamic_lmk_idx_and_bcoords(
            t(verts), t(pose), t(dyn_f), t(dyn_b),
            torch.tensor(neck_chain, dtype=torch.long))
        lf = t(lmk_f)[None].expand(B, -1)
        lb = t(lmk_b)[None].expand(B, -1, -1)
        lf = torch.cat([lf, want_df], 1)
        lb = torch.cat([lb, want_db], 1)
        want = ref_smplx.lbs.vertices2landmarks(
            t(verts), t(faces), lf.contiguous(), lb).numpy()

    got_df, got_db = find_dynamic_lmk_idx_and_bcoords(
        jnp.asarray(pose), jnp.asarray(dyn_f), jnp.asarray(dyn_b),
        neck_chain)
    np.testing.assert_array_equal(np.asarray(got_df), want_df.numpy())
    np.testing.assert_allclose(np.asarray(got_db), want_db.numpy(),
                               atol=1e-6)
    gf = jnp.concatenate([jnp.broadcast_to(jnp.asarray(lmk_f)[None],
                                           (B, L)), got_df], axis=1)
    gb = jnp.concatenate([jnp.broadcast_to(jnp.asarray(lmk_b)[None],
                                           (B, L, 3)), got_db], axis=1)
    got = vertices2landmarks(jnp.asarray(verts), faces, gf, gb)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_smplh_forward_matches_reference(ref_modules):
    """Full SMPL+H forward (PCA hands, pose mean, extra joints) vs the
    reference SMPLH class fed the same synthetic data_struct
    (ref: smplx/body_models.py:502-755)."""
    ref_smplx, _ = ref_modules
    from animatablegaussians_tpu.models.smplx import SMPLH, SMPLXData
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    V, J, NB = 120, 52, 10
    parents = np.zeros(J, np.int64)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    kintree = np.stack([parents.copy(), np.arange(J)])
    kintree[0, 0] = -1
    struct_kw = dict(
        v_template=rng.standard_normal((V, 3)).astype(np.float32),
        shapedirs=0.03 * rng.standard_normal((V, 3, NB)).astype(np.float32),
        posedirs=0.01 * rng.standard_normal(
            (V, 3, (J - 1) * 9)).astype(np.float32),
        J_regressor=(lambda w: w / w.sum(1, keepdims=True))(
            rng.random((J, V)).astype(np.float32)),
        weights=(lambda w: w / w.sum(1, keepdims=True))(
            rng.random((V, J)).astype(np.float32)),
        hands_componentsl=rng.standard_normal((6, 45)).astype(np.float32),
        hands_componentsr=rng.standard_normal((6, 45)).astype(np.float32),
        hands_meanl=0.1 * rng.standard_normal(45).astype(np.float32),
        hands_meanr=0.1 * rng.standard_normal(45).astype(np.float32),
        kintree_table=kintree,
        f=rng.integers(0, V, (60, 3)).astype(np.int64),
    )
    vids = {k: int(v) for k, v in
            zip(["nose", "reye", "leye", "rear", "lear", "rthumb", "rindex",
                 "rmiddle", "rring", "rpinky", "lthumb", "lindex", "lmiddle",
                 "lring", "lpinky", "LBigToe", "LSmallToe", "LHeel",
                 "RBigToe", "RSmallToe", "RHeel"],
                rng.integers(0, V, 21))}
    Struct = ref_smplx.utils.Struct
    ref_model = ref_smplx.SMPLH(
        model_path="/nonexistent", data_struct=Struct(**struct_kw),
        vertex_ids=vids, use_pca=True, num_pca_comps=6,
        flat_hand_mean=False, batch_size=2)

    betas = 0.4 * rng.standard_normal((2, NB)).astype(np.float32)
    go = 0.3 * rng.standard_normal((2, 3)).astype(np.float32)
    body = 0.2 * rng.standard_normal((2, 63)).astype(np.float32)
    lh = 0.5 * rng.standard_normal((2, 6)).astype(np.float32)
    rh = 0.5 * rng.standard_normal((2, 6)).astype(np.float32)
    transl = rng.standard_normal((2, 3)).astype(np.float32)
    t = torch.from_numpy
    with torch.no_grad():
        want = ref_model(betas=t(betas), global_orient=t(go),
                         body_pose=t(body), left_hand_pose=t(lh),
                         right_hand_pose=t(rh), transl=t(transl))

    parents2 = parents.copy()
    data = SMPLXData(
        v_template=jnp.asarray(struct_kw["v_template"]),
        shapedirs=jnp.asarray(struct_kw["shapedirs"]),
        expr_dirs=jnp.zeros((V, 3, 0), jnp.float32),
        posedirs=jnp.asarray(
            struct_kw["posedirs"].reshape(V * 3, -1).T),
        J_regressor=jnp.asarray(struct_kw["J_regressor"]),
        lbs_weights=jnp.asarray(struct_kw["weights"]),
        left_hand_components=jnp.asarray(struct_kw["hands_componentsl"]),
        right_hand_components=jnp.asarray(struct_kw["hands_componentsr"]),
        left_hand_mean=jnp.asarray(struct_kw["hands_meanl"]),
        right_hand_mean=jnp.asarray(struct_kw["hands_meanr"]),
        parents=parents2, faces=struct_kw["f"])
    ours = SMPLH(data, num_pca_comps=6, use_pca=True, flat_hand_mean=False,
                 vertex_ids=vids)
    got = ours(jnp.asarray(betas), jnp.asarray(go), jnp.asarray(body),
               jnp.asarray(lh), jnp.asarray(rh), transl=jnp.asarray(transl))

    np.testing.assert_allclose(np.asarray(got["vertices"]),
                               want.vertices.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["joints"]),
                               want.joints.numpy(), atol=2e-5)
    assert got["joints"].shape == (2, 52 + 21, 3)
