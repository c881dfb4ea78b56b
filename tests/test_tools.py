"""Preprocessing tools: software mesh rasterizer, pos-map baking, weight
volume construction."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_mesh_renderer_ortho_triangle():
    from animatablegaussians_tpu.utils.mesh_renderer import Renderer
    # big triangle covering image center, attr = position
    verts = np.array([[-0.8, -0.8, 1.0], [0.8, -0.8, 1.0], [0.0, 0.8, 1.0]],
                     np.float32)
    attrs = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    r = Renderer(64, 64, shader_name="vertex_attribute")
    r.set_model(verts, attrs)
    r.set_camera(np.eye(4, dtype=np.float32))
    img = r.render()
    assert img.shape == (64, 64, 3)
    # center pixel is inside, attributes sum to ~1 (barycentric partition)
    c = img[32, 32]
    assert c.sum() > 0.9
    # corners outside the triangle stay background
    assert img[0, 0].sum() == 0 and img[0, 63].sum() == 0


def test_mesh_renderer_zbuffer_orders_triangles():
    from animatablegaussians_tpu.utils.mesh_renderer import Renderer
    # two stacked triangles: nearer one (smaller z) must win
    vs = np.array([
        [-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0],   # far
        [-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0],   # near
    ], np.float32)
    attrs = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
    r = Renderer(32, 32)
    r.set_model(vs, attrs)
    r.set_camera(np.eye(4, dtype=np.float32))
    img = r.render()
    c = img[16, 16]
    assert c[1] > 0.9 and c[0] < 0.1  # near (green) wins


def test_bake_cano_maps_roundtrip():
    from animatablegaussians_tpu.tools.gen_pos_maps import bake_cano_maps
    from tests.test_template import _uv_sphere
    verts, faces = _uv_sphere(n_theta=12, n_phi=16, r=0.4)
    pos_map, nml_map = bake_cano_maps(verts, faces, map_size=128)
    assert pos_map.shape == (128, 256, 3)
    mask = np.linalg.norm(pos_map, axis=-1) > 0
    assert mask.sum() > 500
    # baked positions lie on the sphere
    pts = pos_map[mask]
    d = np.abs(np.linalg.norm(pts - verts.mean(0), axis=1) - 0.4)
    assert np.median(d) < 0.02
    # normals are unit-ish where present
    nrm = nml_map[mask]
    ln = np.linalg.norm(nrm, axis=1)
    assert np.median(np.abs(ln - 1)) < 0.1


def test_build_weight_volume_small():
    from animatablegaussians_tpu.tools.gen_weight_volume import \
        build_weight_volume
    from tests.test_template import _uv_sphere
    verts, faces = _uv_sphere(n_theta=8, n_phi=10, r=0.4)
    J = 6
    rng = np.random.default_rng(0)
    lbs = rng.random((verts.shape[0], J)).astype(np.float32)
    lbs /= lbs.sum(1, keepdims=True)
    data = build_weight_volume(verts, faces, verts, faces, lbs, res=16,
                               n_surface=2000)
    assert data["diff_weight_volume"].shape == (16, 16, 16, J)
    s = data["diff_weight_volume"].sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)
    assert data["sdf_volume"].shape == (16, 16, 16)
    # center is inside (negative by our outward-normal sign), corner outside
    assert data["sdf_volume"][8, 8, 8] < 0 < data["sdf_volume"][0, 0, 0]
    assert data["ori_weight_volume"].shape == (16, 16, 16, J)
