"""Composed end-to-end parity: pose map -> Gaussian attributes -> image.

Round-2 proved the pieces match the torch reference individually (lbs,
DualStyleUNet, importers); this composes them: the REFERENCE AvatarNet
forward formulas (ref: network/avatar.py:84-124, 161-239) are assembled on
CPU from the actual torch DualStyleUNet heads plus an independent
numpy implementation of the glue (masked-texel select, 0.05 offset scale,
activation offsets, per-point LBS, quaternion transport), and the final
Gaussian attribute sets + rendered images are compared. The splat uses the
same blend_ref-semantics renderer on both sides, so any drift in the CNN
composition or the glue shows up as an attribute/PSNR failure.

Skipped when /root/reference is absent.
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
def ref_dsu():
    for name in ("fused", "upfirdn2d"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, REF)
    try:
        from network.styleunet import dual_styleunet
        yield dual_styleunet
    finally:
        sys.path.remove(REF)


def quat_to_mat_np(q):
    """wxyz unit quats (N, 4) -> (N, 3, 3); standard formula (the
    pytorch3d.transforms.quaternion_to_matrix convention the reference
    uses at network/avatar.py:87)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


def mat_to_quat_np(m):
    """(N, 3, 3) -> wxyz quats (sign-ambiguous; rotation downstream is
    sign-invariant)."""
    out = np.zeros((m.shape[0], 4), m.dtype)
    t = np.trace(m, axis1=1, axis2=2)
    for i in range(m.shape[0]):
        R = m[i]
        if t[i] > 0:
            s = np.sqrt(t[i] + 1.0) * 2
            out[i] = [0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s]
        else:
            j = np.argmax(np.diag(R))
            k, l = (j + 1) % 3, (j + 2) % 3
            s = np.sqrt(max(R[j, j] - R[k, k] - R[l, l] + 1.0, 1e-12)) * 2
            q = np.zeros(4)
            q[1 + j] = 0.25 * s
            q[0] = (R[l, k] - R[k, l]) / s
            q[1 + k] = (R[k, j] + R[j, k]) / s
            q[1 + l] = (R[l, j] + R[j, l]) / s
            out[i] = q
    return out


def test_composed_pose_map_to_image_parity(ref_dsu):
    """Full pose-map -> image path vs a torch+numpy assembly of the
    reference formulas; Gaussian attributes must agree tightly and the
    rendered images to >= 50 dB PSNR."""
    import jax
    import jax.numpy as jnp
    from animatablegaussians_tpu.models import styleunet as su
    from animatablegaussians_tpu.models.avatar import AvatarNet
    from animatablegaussians_tpu.ops.rasterize import (RasterizeConfig,
                                                       render)
    from animatablegaussians_tpu.training.checkpoint import \
        import_dual_styleunet
    from animatablegaussians_tpu.utils import synthetic

    map_h = 64
    img_w, img_h = 96, 128
    n_joints = 8
    pos, nml, lbs = synthetic.make_cano_map(map_h=map_h, n_joints=n_joints)
    items_np = synthetic.make_items(n_joints=n_joints, img_w=img_w,
                                    img_h=img_h, cano_pos_map=pos,
                                    angle=0.05)

    cfg = RasterizeConfig(backend="ref", k_max=128, max_dup=16,
                          max_active_tiles=0)
    net = AvatarNet(dict(with_viewdirs=False), pos, lbs,
                    raster_config=cfg)
    params = net.init(jax.random.PRNGKey(0))

    # the three ACTUAL torch reference heads, weights imported into ours
    torch.manual_seed(7)
    kw = dict(inp_size=map_h // 2, inp_ch=3, out_size=map_h,
              style_dim=512, n_mlp=2)
    ref_nets = {}
    for name, out_ch in (("position_net", 3), ("other_net", 8),
                         ("color_net", 3)):
        ref_net = ref_dsu.DualStyleUNet(out_ch=out_ch, **kw).eval()
        sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        params[name] = import_dual_styleunet(sd, "", net.__dict__[name])
        ref_nets[name] = ref_net

    # ---- torch+numpy assembly of the reference forward ----------------
    mask = np.asarray(net.cano_smpl_mask)
    style = (np.ones((1, 512)) / np.sqrt(512)).astype(np.float32)
    pose_map = items_np["smpl_pos_map"][..., :3].astype(np.float32)

    def run_head(name, out_ch):
        # ref: network/avatar.py:95-99 (split front/back, cat along width)
        with torch.no_grad():
            out, _ = ref_nets[name](
                [torch.from_numpy(style)],
                torch.from_numpy(pose_map.transpose(2, 0, 1))[None],
                randomize_noise=False)
        front, back = out[:, :out_ch], out[:, out_ch:]
        m = torch.cat([front, back], 3)[0].permute(1, 2, 0).numpy()
        return m[mask]                                     # (N, out_ch)

    # our point set is block-packed (padded); the torch-side assembly works
    # in the reference's exact-masked-texel order == our valid rows
    vmask = np.asarray(net.valid_np)
    g = params["cano_gaussian"]
    xyz = np.asarray(g.get_xyz)[vmask]
    delta = run_head("position_net", 3)
    cano_pts = 0.05 * delta + xyz                          # avatar.py:98-101
    others = run_head("other_net", 8)                      # avatar.py:106-116
    opacity = 1.0 / (1.0 + np.exp(
        -(others[:, 0:1] + np.asarray(g.opacity)[vmask])))
    scales = np.exp(others[:, 1:4] + np.asarray(g.scaling)[vmask])
    rot_raw = others[:, 4:8] + np.asarray(g.rotation)[vmask]
    rotations = rot_raw / np.linalg.norm(rot_raw, axis=1, keepdims=True)
    colors = run_head("color_net", 3)

    # LBS + quaternion transport (ref: avatar.py:84-91)
    mats = items_np["cano2live_jnt_mats"]
    pt_mats = np.einsum("nj,jxy->nxy", np.asarray(lbs), mats)
    live_pts = (np.einsum("nxy,ny->nx", pt_mats[:, :3, :3], cano_pts)
                + pt_mats[:, :3, 3])
    rot_mats = np.einsum("nxy,nyz->nxz", pt_mats[:, :3, :3],
                         quat_to_mat_np(rotations))
    live_quats = mat_to_quat_np(rot_mats)

    # ---- our full path ------------------------------------------------
    old = su.CONV_PRECISION
    su.set_conv_precision("highest")
    try:
        items = {k: jnp.asarray(v) for k, v in items_np.items()}
        out = net.render(params, items, bg_color=(0.0, 0.0, 0.0),
                         img_w=img_w, img_h=img_h)
        pg = out["posed_gaussians"]

        np.testing.assert_allclose(np.asarray(pg["positions"])[vmask],
                                   live_pts, atol=5e-5)
        np.testing.assert_allclose(np.asarray(pg["opacity"])[vmask], opacity,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(pg["scales"])[vmask], scales,
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pg["colors"])[vmask], colors,
                                   atol=2e-4)
        q_ours = np.asarray(pg["rotations"])[vmask]
        qdiff = np.minimum(np.abs(q_ours - live_quats).max(1),
                           np.abs(q_ours + live_quats).max(1))
        assert qdiff.max() < 5e-4

        # reference-side image: same blend_ref renderer on the torch-side
        # attribute set (isolates CNN+glue drift, not splat numerics)
        ref_out = render(
            jnp.asarray(live_pts), jnp.asarray(scales),
            jnp.asarray(live_quats), jnp.asarray(opacity.reshape(-1)),
            jnp.asarray(colors), jnp.zeros((3,), jnp.float32),
            items["extr"], items["intr"], img_w, img_h, config=cfg)
    finally:
        su.set_conv_precision(old)

    ours = np.asarray(out["rgb_map"])
    theirs = np.asarray(ref_out["render"])
    assert np.isfinite(ours).all() and np.isfinite(theirs).all()
    mse = float(np.mean((ours - theirs) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    # some pixels must actually be covered for the comparison to mean much
    assert float(np.asarray(out["mask_map"]).max()) > 0.1
    assert psnr >= 50.0, f"composed pose-map->image PSNR {psnr:.2f} dB < 50"
