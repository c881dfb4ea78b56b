"""Pallas TPU kernels for per-tile front-to-back Gaussian alpha compositing.

Replaces the CUDA render kernels (ref: cuda_rasterizer/forward.cu:261-381,
backward.cu:414-601) with a TPU-native *matrix formulation*:

  * grid = tiles; each grid step blends one 16x16-pixel tile (P=256 pixels);
  * the per-tile Gaussian list is consumed in depth order in K-blocks of 128,
    giving (P, 128) matrices that map directly onto VPU (8,128) vregs;
  * transmittance is a cumulative product along the Gaussian (lane) axis,
    computed in log space with a log-step lane scan — no sequential pixel
    loop, no atomics;
  * the backward pass recomputes the forward quantities (rematerialization —
    cheaper than saving (P, K) state to HBM) and reduces per-Gaussian
    gradients over the pixel (sublane) axis; the scatter back to the global
    Gaussian arrays is the VJP of the XLA gather that built the tile lists.

Early-termination semantics match the reference exactly (see blend_ref.py);
whole K-blocks are skipped via predication once every pixel in the tile is
saturated (T < 1e-4) — the TPU analogue of the per-pixel `done` flag.

Gradient note: like jax.grad of the reference math (and unlike the CUDA
backward, which ignores it), the alpha clamp at 0.99 gates the gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_ref import ALPHA_CLAMP, ALPHA_MIN, T_EPS

KB = 128  # gaussians per block (lane dimension)


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (tests exercise the same code path)."""
    return jax.default_backend() != "tpu"


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the last (lane) axis via log-step
    shifted adds (7 steps for 128 lanes)."""
    lanes = x.shape[-1]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < lanes:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane_idx >= s, shifted, 0.0)
        s *= 2
    return x


def _cumprod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along the lane axis (same log-step scan,
    multiplicative — exact, no exp/log round trips)."""
    lanes = x.shape[-1]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < lanes:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = x * jnp.where(lane_idx >= s, shifted, 1.0)
        s *= 2
    return x


def _pixel_coords(t, grid_x: int, tile: int, P: int):
    """Global pixel coords for tile t as (P, 1) f32 columns."""
    ox = (t % grid_x) * tile
    oy = (t // grid_x) * tile
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxx = (ox + p % tile).astype(jnp.float32)
    pxy = (oy + p // tile).astype(jnp.float32)
    return pxx, pxy


def _block_geometry(data_ref, kb, count, pxx, pxy):
    """Shared fwd/bwd per-block math -> dict of (P, KB) matrices."""
    sl = slice(kb * KB, (kb + 1) * KB)
    row = lambda i: data_ref[0, i, sl].reshape(1, KB)
    x, y = row(0), row(1)
    ca, cb, cc = row(2), row(3), row(4)
    op = row(5)
    r, g, b, d = row(6), row(7), row(8), row(9)

    dx = x - pxx                       # (P, KB)
    dy = y - pxy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = op * G
    alpha = jnp.minimum(ALPHA_CLAMP, alpha_raw)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1) + kb * KB
    use = (kidx < count) & (alpha >= ALPHA_MIN) & (power <= 0.0)
    alpha = jnp.where(use, alpha, 0.0)
    return dict(x=x, y=y, ca=ca, cb=cb, cc=cc, op=op, r=r, g=g, b=b, d=d,
                dx=dx, dy=dy, G=G, alpha_raw=alpha_raw, alpha=alpha, use=use)


def _transmittance(alpha, t_carry):
    """(pinc, pexc, contrib) from alphas and carry-in transmittance."""
    pinc = t_carry * _cumprod_lanes(1.0 - alpha)
    pexc = pinc / (1.0 - alpha)
    contrib = (alpha > 0.0) & (pinc >= T_EPS)
    return pinc, pexc, contrib


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(count_ref, ids_ref, data_ref, out_ref, *, grid_x, tile,
                nblocks):
    P = tile * tile
    t = pl.program_id(0)
    # global tile id (active-tile compaction reorders rows; ids restore the
    # pixel-space position), scalar-prefetched in SMEM
    pxx, pxy = _pixel_coords(ids_ref[t], grid_x, tile, P)
    count = count_ref[t]  # scalar-prefetched (T,) counts in SMEM

    out_ref[0] = jnp.zeros((P, 8), jnp.float32)
    out_ref[0, :, 4] = jnp.ones((P,), jnp.float32)

    for kb in range(nblocks):
        @pl.when((kb * KB < count) &
                 (jnp.max(out_ref[0, :, 4]) >= T_EPS))
        def _():
            geo = _block_geometry(data_ref, kb, count, pxx, pxy)
            t_carry = out_ref[0, :, 4:5]
            pinc, pexc, contrib = _transmittance(geo["alpha"], t_carry)
            w = jnp.where(contrib, geo["alpha"] * pexc, 0.0)

            ksum = lambda m: jnp.sum(m, axis=1, keepdims=True)   # (P, 1)
            out_ref[0, :, 0:1] += ksum(w * geo["r"])
            out_ref[0, :, 1:2] += ksum(w * geo["g"])
            out_ref[0, :, 2:3] += ksum(w * geo["b"])
            out_ref[0, :, 3:4] += ksum(w * geo["d"])
            t_new = jnp.min(jnp.where(contrib, pinc, t_carry), axis=1)
            out_ref[0, :, 4] = t_new


def _fwd_pallas(tile_data, tile_count, tile_ids, grid_x: int, tile: int):
    T, _, K = tile_data.shape
    assert K % KB == 0, f"k_max must be a multiple of {KB}"
    P = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 16, K), lambda t, c, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda t, c, i: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_fwd_kernel, grid_x=grid_x, tile=tile, nblocks=K // KB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        interpret=_interpret(),
    )(tile_count.astype(jnp.int32), tile_ids.astype(jnp.int32), tile_data)


# ---------------------------------------------------------------------------
# Backward (recompute)
# ---------------------------------------------------------------------------

def _bwd_kernel(count_ref, ids_ref, data_ref, res_ref, cot_ref, grad_ref,
                carry_ref, *, grid_x, tile, nblocks):
    P = tile * tile
    t = pl.program_id(0)
    pxx, pxy = _pixel_coords(ids_ref[t], grid_x, tile, P)
    count = count_ref[t]  # scalar-prefetched (T,) counts in SMEM

    grad_ref[0] = jnp.zeros_like(grad_ref[0])
    # carry cols: [T, prefix_r, prefix_g, prefix_b, prefix_d, ...]
    carry_ref[:] = jnp.zeros((P, 8), jnp.float32)
    carry_ref[:, 0] = jnp.ones((P,), jnp.float32)

    # per-pixel totals and cotangents, (P, 1) columns
    col = lambda ref, i: ref[0, :, i:i + 1]
    ctot = [col(res_ref, i) for i in range(4)]       # r g b d totals
    tfin = col(res_ref, 4)
    gout = [col(cot_ref, i) for i in range(4)]       # gr gg gb gd
    gT = col(cot_ref, 4)

    for kb in range(nblocks):
        @pl.when((kb * KB < count) & (jnp.max(carry_ref[:, 0]) >= T_EPS))
        def _():
            geo = _block_geometry(data_ref, kb, count, pxx, pxy)
            alpha = geo["alpha"]
            t_carry = carry_ref[:, 0:1]
            pinc, pexc, contrib = _transmittance(alpha, t_carry)
            w = jnp.where(contrib, alpha * pexc, 0.0)
            one_minus = 1.0 - alpha

            chans = [geo["r"], geo["g"], geo["b"], geo["d"]]
            # inclusive prefix of contributions per channel
            direct = jnp.zeros_like(alpha)
            suffix_dot = jnp.zeros_like(alpha)
            new_prefix = []
            for i, ck in enumerate(chans):
                wc = w * ck
                pr = carry_ref[:, 1 + i:2 + i] + _cumsum_lanes(wc)
                suffix = ctot[i] - pr                 # sum over j > k
                direct += ck * gout[i]
                suffix_dot += suffix * gout[i]
                new_prefix.append(pr[:, KB - 1])

            galpha = (pexc * direct
                      - suffix_dot / one_minus
                      - gT * tfin / one_minus)
            galpha = jnp.where(contrib, galpha, 0.0)
            # clamp gate (jax.grad semantics; see module docstring)
            galpha = jnp.where(geo["alpha_raw"] >= ALPHA_CLAMP, 0.0, galpha)

            gop_mat = galpha * geo["G"]
            gpower = galpha * geo["op"] * geo["G"]
            gdx = -gpower * (geo["ca"] * geo["dx"] + geo["cb"] * geo["dy"])
            gdy = -gpower * (geo["cc"] * geo["dy"] + geo["cb"] * geo["dx"])

            sl = slice(kb * KB, (kb + 1) * KB)
            psum = lambda m: jnp.sum(m, axis=0)       # (KB,)
            grad_ref[0, 0, sl] = psum(gdx)
            grad_ref[0, 1, sl] = psum(gdy)
            grad_ref[0, 2, sl] = psum(-0.5 * geo["dx"] * geo["dx"] * gpower)
            grad_ref[0, 3, sl] = psum(-geo["dx"] * geo["dy"] * gpower)
            grad_ref[0, 4, sl] = psum(-0.5 * geo["dy"] * geo["dy"] * gpower)
            grad_ref[0, 5, sl] = psum(gop_mat)
            grad_ref[0, 6, sl] = psum(w * gout[0])
            grad_ref[0, 7, sl] = psum(w * gout[1])
            grad_ref[0, 8, sl] = psum(w * gout[2])
            grad_ref[0, 9, sl] = psum(w * gout[3])

            carry_ref[:, 0] = jnp.min(jnp.where(contrib, pinc, t_carry),
                                      axis=1)
            for i in range(4):
                carry_ref[:, 1 + i] = new_prefix[i]


def _bwd_pallas(tile_data, tile_count, tile_ids, out, cot, grid_x: int,
                tile: int):
    T, _, K = tile_data.shape
    P = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 16, K), lambda t, c, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, c, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, c, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, K), lambda t, c, i: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, 8), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_bwd_kernel, grid_x=grid_x, tile=tile, nblocks=K // KB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 16, K), jnp.float32),
        interpret=_interpret(),
    )(tile_count.astype(jnp.int32), tile_ids.astype(jnp.int32), tile_data,
      out, cot)


# ---------------------------------------------------------------------------
# Ragged (chunked) kernels: grid = kb-pair chunks (kb = m*128), blend state
# carried across consecutive chunks of the same tile via output-block
# revisiting (same accumulate-on-first-iteration pattern as a matmul K
# loop). This removes the per-tile k_max cap entirely — within-tile pairs
# are never dropped, matching the CUDA flat pair list (ref:
# rasterizer_impl.cu:278-309) — and shrinks the gather/scatter volume from
# A*K_max slots to the kb-padded true pair count.
# ---------------------------------------------------------------------------


def _fwd_chunk_kernel(n_ref, tid_ref, first_ref, arow_ref, data_ref,
                      out_ref, *, grid_x, tile, nblocks):
    P = tile * tile
    c = pl.program_id(0)
    pxx, pxy = _pixel_coords(tid_ref[c], grid_x, tile, P)
    count = n_ref[c]

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[0] = jnp.zeros((P, 8), jnp.float32)
        out_ref[0, :, 4] = jnp.ones((P,), jnp.float32)

    for kb in range(nblocks):
        @pl.when((kb * KB < count) &
                 (jnp.max(out_ref[0, :, 4]) >= T_EPS))
        def _():
            geo = _block_geometry(data_ref, kb, count, pxx, pxy)
            t_carry = out_ref[0, :, 4:5]
            pinc, pexc, contrib = _transmittance(geo["alpha"], t_carry)
            w = jnp.where(contrib, geo["alpha"] * pexc, 0.0)

            ksum = lambda m: jnp.sum(m, axis=1, keepdims=True)   # (P, 1)
            out_ref[0, :, 0:1] += ksum(w * geo["r"])
            out_ref[0, :, 1:2] += ksum(w * geo["g"])
            out_ref[0, :, 2:3] += ksum(w * geo["b"])
            out_ref[0, :, 3:4] += ksum(w * geo["d"])
            out_ref[0, :, 4] = jnp.min(jnp.where(contrib, pinc, t_carry),
                                       axis=1)


def _fwd_chunks_pallas(chunk_data, chunk_n, chunk_tid, chunk_first,
                       chunk_arow, n_rows: int, grid_x: int, tile: int):
    C, _, K = chunk_data.shape
    assert K % KB == 0, f"chunk width must be a multiple of {KB}"
    P = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 16, K), lambda c, n, t, f, a: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda c, n, t, f, a: (a[c], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_fwd_chunk_kernel, grid_x=grid_x, tile=tile,
                nblocks=K // KB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, P, 8), jnp.float32),
        interpret=_interpret(),
    )(chunk_n.astype(jnp.int32), chunk_tid.astype(jnp.int32),
      chunk_first.astype(jnp.int32), chunk_arow.astype(jnp.int32),
      chunk_data)


def _bwd_chunk_kernel(n_ref, tid_ref, first_ref, arow_ref, data_ref,
                      res_ref, cot_ref, grad_ref, carry_ref, *, grid_x,
                      tile, nblocks):
    P = tile * tile
    c = pl.program_id(0)
    pxx, pxy = _pixel_coords(tid_ref[c], grid_x, tile, P)

    grad_ref[0] = jnp.zeros_like(grad_ref[0])

    @pl.when(first_ref[c] == 1)
    def _():
        carry_ref[:] = jnp.zeros((P, 8), jnp.float32)
        carry_ref[:, 0] = jnp.ones((P,), jnp.float32)

    col = lambda ref, i: ref[0, :, i:i + 1]
    ctot = [col(res_ref, i) for i in range(4)]       # r g b d totals
    tfin = col(res_ref, 4)
    gout = [col(cot_ref, i) for i in range(4)]       # gr gg gb gd
    gT = col(cot_ref, 4)

    count = n_ref[c]
    for kb in range(nblocks):
        @pl.when((kb * KB < count) & (jnp.max(carry_ref[:, 0]) >= T_EPS))
        def _():
            geo = _block_geometry(data_ref, kb, count, pxx, pxy)
            alpha = geo["alpha"]
            t_carry = carry_ref[:, 0:1]
            pinc, pexc, contrib = _transmittance(alpha, t_carry)
            w = jnp.where(contrib, alpha * pexc, 0.0)
            one_minus = 1.0 - alpha

            chans = [geo["r"], geo["g"], geo["b"], geo["d"]]
            direct = jnp.zeros_like(alpha)
            suffix_dot = jnp.zeros_like(alpha)
            new_prefix = []
            for i, ck in enumerate(chans):
                wc = w * ck
                pr = carry_ref[:, 1 + i:2 + i] + _cumsum_lanes(wc)
                suffix = ctot[i] - pr                 # sum over j > k
                direct += ck * gout[i]
                suffix_dot += suffix * gout[i]
                new_prefix.append(pr[:, KB - 1])

            galpha = (pexc * direct
                      - suffix_dot / one_minus
                      - gT * tfin / one_minus)
            galpha = jnp.where(contrib, galpha, 0.0)
            galpha = jnp.where(geo["alpha_raw"] >= ALPHA_CLAMP, 0.0, galpha)

            gop_mat = galpha * geo["G"]
            gpower = galpha * geo["op"] * geo["G"]
            gdx = -gpower * (geo["ca"] * geo["dx"] + geo["cb"] * geo["dy"])
            gdy = -gpower * (geo["cc"] * geo["dy"] + geo["cb"] * geo["dx"])

            sl = slice(kb * KB, (kb + 1) * KB)
            psum = lambda m: jnp.sum(m, axis=0)       # (KB,)
            grad_ref[0, 0, sl] = psum(gdx)
            grad_ref[0, 1, sl] = psum(gdy)
            grad_ref[0, 2, sl] = psum(-0.5 * geo["dx"] * geo["dx"] * gpower)
            grad_ref[0, 3, sl] = psum(-geo["dx"] * geo["dy"] * gpower)
            grad_ref[0, 4, sl] = psum(-0.5 * geo["dy"] * geo["dy"] * gpower)
            grad_ref[0, 5, sl] = psum(gop_mat)
            grad_ref[0, 6, sl] = psum(w * gout[0])
            grad_ref[0, 7, sl] = psum(w * gout[1])
            grad_ref[0, 8, sl] = psum(w * gout[2])
            grad_ref[0, 9, sl] = psum(w * gout[3])

            carry_ref[:, 0] = jnp.min(jnp.where(contrib, pinc, t_carry),
                                      axis=1)
            for i in range(4):
                carry_ref[:, 1 + i] = new_prefix[i]


def _bwd_chunks_pallas(chunk_data, chunk_n, chunk_tid, chunk_first,
                       chunk_arow, out, cot, grid_x: int, tile: int):
    C, _, K = chunk_data.shape
    assert K % KB == 0, f"chunk width must be a multiple of {KB}"
    P = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 16, K), lambda c, n, t, f, a: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda c, n, t, f, a: (a[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda c, n, t, f, a: (a[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, K), lambda c, n, t, f, a: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, 8), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_bwd_chunk_kernel, grid_x=grid_x, tile=tile,
                nblocks=K // KB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, 16, K), jnp.float32),
        interpret=_interpret(),
    )(chunk_n.astype(jnp.int32), chunk_tid.astype(jnp.int32),
      chunk_first.astype(jnp.int32), chunk_arow.astype(jnp.int32),
      chunk_data, out, cot)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def blend_chunks(chunk_data, chunk_n, chunk_tid, chunk_first, chunk_arow,
                 n_rows: int, grid_x: int, tile: int = 16):
    """(C, 16, kb) chunked tile data (kb = m*128) -> (n_rows, P, 8) blended
    [r, g, b, depth, T_final, 0, 0, 0] per active tile. Rows whose tile got
    no chunk (empty tiles inside the active list) are UNDEFINED — callers
    mask them with tile_count > 0."""
    return _fwd_chunks_pallas(chunk_data, chunk_n, chunk_tid, chunk_first,
                              chunk_arow, n_rows, grid_x, tile)


def _blend_chunks_fwd(chunk_data, chunk_n, chunk_tid, chunk_first,
                      chunk_arow, n_rows, grid_x, tile):
    out = _fwd_chunks_pallas(chunk_data, chunk_n, chunk_tid, chunk_first,
                             chunk_arow, n_rows, grid_x, tile)
    return out, (chunk_data, chunk_n, chunk_tid, chunk_first, chunk_arow,
                 out)


def _blend_chunks_bwd(n_rows, grid_x, tile, residuals, cot):
    (chunk_data, chunk_n, chunk_tid, chunk_first, chunk_arow,
     out) = residuals
    gdata = _bwd_chunks_pallas(chunk_data, chunk_n, chunk_tid, chunk_first,
                               chunk_arow, out, cot, grid_x, tile)
    f0 = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return (gdata, f0(chunk_n), f0(chunk_tid), f0(chunk_first),
            f0(chunk_arow))


blend_chunks.defvjp(_blend_chunks_fwd, _blend_chunks_bwd)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blend_tiles(tile_data, tile_count, tile_ids, grid_x: int,
                tile: int = 16):
    """(T, 16, K) packed tile data + (T,) counts + (T,) global tile ids ->
    (T, P, 8) blended [r, g, b, depth, T_final, 0, 0, 0] per pixel."""
    return _fwd_pallas(tile_data, tile_count, tile_ids, grid_x, tile)


def _blend_fwd(tile_data, tile_count, tile_ids, grid_x, tile):
    out = _fwd_pallas(tile_data, tile_count, tile_ids, grid_x, tile)
    return out, (tile_data, tile_count, tile_ids, out)


def _blend_bwd(grid_x, tile, residuals, cot):
    tile_data, tile_count, tile_ids, out = residuals
    gdata = _bwd_pallas(tile_data, tile_count, tile_ids, out, cot,
                        grid_x, tile)
    gcount = jnp.zeros(tile_count.shape, jax.dtypes.float0)
    gids = jnp.zeros(tile_ids.shape, jax.dtypes.float0)
    return gdata, gcount, gids


blend_tiles.defvjp(_blend_fwd, _blend_bwd)
