"""Point/mesh geometry ops: nearest face + barycentric weights, ray/SMPL
near-far bounds, LBS blending-weight queries, forward skinning.

TPU-native replacements for the reference's CUDA ``posevocab_custom_ops``
(ref: utils/posevocab_custom_ops/point_mesh.cu, nearest_face_kernel.cu,
near_far_smpl_kernel.cu; python wrappers utils/posevocab_custom_ops/
nearest_face.py:18-61, near_far_smpl.py:18-27) and of
``utils/smpl_util.py:10-84``. Instead of one thread per query point, each op
is a chunked dense (chunk x faces/verts) distance computation — O(N*M) but
regular, fully vectorized VPU work with static shapes; at SMPL-X sizes
(10.5k verts / 20.9k faces / <=500k queries) this is bandwidth-trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def closest_point_triangle(p, a, b, c):
    """Closest point on triangle (a,b,c) to p; fully branchless (Ericson,
    Real-Time Collision Detection §5.1.5 formulated with jnp.where).

    All args broadcastable (..., 3). Returns (closest (..., 3),
    (u, v, w) barycentric of the *clamped* point).
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-12
    # interior barycentric
    denom = jnp.maximum(va + vb + vc, eps)
    v_in = vb / denom
    w_in = vc / denom

    # edge AB region
    v_ab = d1 / jnp.maximum(d1 - d3, eps)
    # edge AC region
    w_ac = d2 / jnp.maximum(d2 - d6, eps)
    # edge BC region
    w_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps)

    # region predicates (evaluated in order, first true wins)
    r_a = (d1 <= 0) & (d2 <= 0)                       # vertex A
    r_b = (d3 >= 0) & (d4 <= d3)                      # vertex B
    r_c = (d6 >= 0) & (d5 <= d6)                      # vertex C
    r_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)          # edge AB
    r_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)          # edge AC
    r_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)  # edge BC

    zeros = jnp.zeros_like(v_in)
    ones = jnp.ones_like(v_in)

    def pick(pred, val_v, val_w, cur_v, cur_w, done):
        take = pred & ~done
        return (jnp.where(take, val_v, cur_v),
                jnp.where(take, val_w, cur_w),
                done | pred)

    v, w, done = pick(r_a, zeros, zeros, v_in, w_in, jnp.zeros_like(r_a))
    v, w, done = pick(r_b, ones, zeros, v, w, done)
    v, w, done = pick(r_c, zeros, ones, v, w, done)
    v, w, done = pick(r_ab, v_ab, zeros, v, w, done)
    v, w, done = pick(r_ac, zeros, w_ac, v, w, done)
    v, w, done = pick(r_bc, 1.0 - w_bc, w_bc, v, w, done)

    u = 1.0 - v - w
    closest = a + v[..., None] * ab + w[..., None] * ac
    return closest, jnp.stack([u, v, w], axis=-1)


@partial(jax.jit, static_argnames=("chunk",))
def nearest_face(points: jnp.ndarray, verts: jnp.ndarray, faces: jnp.ndarray,
                 chunk: int = 1024):
    """For each query point: distance (not squared), nearest face index, and
    barycentric weights of the closest surface point (the extended
    PointFaceDistance the reference builds in CUDA; ref:
    utils/posevocab_custom_ops/nearest_face.py:30-61, point_mesh.h:41-73).

    points (N, 3), verts (V, 3), faces (F, 3) int -> ((N,), (N,), (N, 3)).
    """
    tri = verts[faces]                       # (F, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]

    N = points.shape[0]
    pad = (-N) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def one_chunk(p):                        # (chunk, 3)
        closest, bary = closest_point_triangle(
            p[:, None, :], a[None], b[None], c[None])   # (chunk, F, 3)
        d2 = jnp.sum((closest - p[:, None, :]) ** 2, -1)  # (chunk, F)
        idx = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
        bmin = jnp.take_along_axis(bary, idx[:, None, None], axis=1)[:, 0]
        return jnp.sqrt(dmin), idx.astype(jnp.int32), bmin

    d, i, bc = jax.lax.map(one_chunk, pts.reshape(-1, chunk, 3))
    return (d.reshape(-1)[:N], i.reshape(-1)[:N], bc.reshape(-1, 3)[:N])


def barycentric_interpolate(vert_attrs: jnp.ndarray, faces: jnp.ndarray,
                            face_ids: jnp.ndarray, bary: jnp.ndarray):
    """(V, C) attrs + (N,) face ids + (N, 3) barycentric -> (N, C)
    (ref: utils/geo_util.py:26-36)."""
    tri_attrs = vert_attrs[faces[face_ids]]            # (N, 3, C)
    return jnp.sum(tri_attrs * bary[..., None], axis=1)


@partial(jax.jit, static_argnames=("chunk",))
def near_far_smpl(verts: jnp.ndarray, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, radius: float = 0.1,
                  chunk: int = 2048):
    """Per-ray near/far as the union of vertex spheres of radius r
    (ref: utils/posevocab_custom_ops/near_far_smpl.py:18-27,
    near_far_smpl_kernel.cu). rays_d assumed normalized.

    Returns (near (R,), far (R,), hit (R,) bool)."""
    R = rays_o.shape[0]
    pad = (-R) % chunk
    o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)

    def one_chunk(args):
        oo, dd = args                                 # (chunk, 3)
        oc = verts[None] - oo[:, None]                # (chunk, V, 3)
        b = jnp.sum(oc * dd[:, None], -1)             # (chunk, V)
        c = jnp.sum(oc * oc, -1) - radius ** 2
        disc = b * b - c
        valid = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = jnp.where(valid, b - sq, jnp.inf)
        t1 = jnp.where(valid, b + sq, -jnp.inf)
        near = jnp.min(t0, axis=1)
        far = jnp.max(t1, axis=1)
        hit = jnp.any(valid, axis=1)
        near = jnp.maximum(near, 0.0)
        return near, far, hit

    near, far, hit = jax.lax.map(
        one_chunk, (o.reshape(-1, chunk, 3), d.reshape(-1, chunk, 3)))
    return near.reshape(-1)[:R], far.reshape(-1)[:R], hit.reshape(-1)[:R]


def calc_blending_weight(query_pts: jnp.ndarray, smpl_v: jnp.ndarray,
                         smpl_f: jnp.ndarray, smpl_lbs: jnp.ndarray,
                         near_thres: float = 0.08, method: str = "NN"):
    """LBS weights for arbitrary points from the SMPL surface: nearest
    vertex or barycentric-on-nearest-face (ref: utils/smpl_util.py:10-55).
    Unbatched; vmap for batches. Returns (weights (N, J), near_flag (N,))."""
    if method == "NN":
        d2 = jnp.sum((query_pts[:, None] - smpl_v[None]) ** 2, -1)
        idx = jnp.argmin(d2, axis=1)
        w = smpl_lbs[idx]
        near = jnp.take_along_axis(d2, idx[:, None], 1)[:, 0] < near_thres ** 2
    else:
        dist, fidx, bary = nearest_face(query_pts, smpl_v, smpl_f)
        w = barycentric_interpolate(smpl_lbs, smpl_f, fidx, bary)
        near = dist < near_thres
    return w, near


def skinning(points: jnp.ndarray, lbs: jnp.ndarray, jnt_mats: jnp.ndarray,
             return_pt_mats: bool = False):
    """Forward LBS: blend per-joint affines, apply (ref:
    utils/smpl_util.py:58-73). points (N, 3), lbs (N, J), mats (J, 4, 4)."""
    pt_mats = jnp.einsum("nj,jxy->nxy", lbs, jnt_mats)
    out = (jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3], points)
           + pt_mats[:, :3, 3])
    if return_pt_mats:
        return out, pt_mats
    return out


def skinning_normal(normals: jnp.ndarray, lbs: jnp.ndarray,
                    jnt_mats: jnp.ndarray):
    """(ref: utils/smpl_util.py:76-81)."""
    pt_mats = jnp.einsum("nj,jxy->nxy", lbs, jnt_mats)
    return jnp.einsum("nxy,ny->nx", pt_mats[:, :3, :3], normals)
