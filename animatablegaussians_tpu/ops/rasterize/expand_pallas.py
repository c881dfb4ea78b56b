"""Pallas pair-expansion kernel: per-slot (key, depth, gid, payload) WITHOUT
per-pair HBM indexing.

XLA's binning pipeline pays the TPU's ~35 ns/index gather floor twice per
frame: _segment_owner (slot -> owning Gaussian, ~8 ms) plus the packed
owner-row gather (~38-45 ms at 1.3M slots; see BASELINE.md round-4
micro-study — no XLA primitive mix beats it). This kernel exploits the one
structural fact XLA cannot: each Gaussian's pair slots are CONTIGUOUS, so
expansion is a strictly sequential stream of small dynamic-offset VMEM
writes, never a random gather.

Design (sequential TPU grid over blocks of BN raw-order Gaussians):
  * every block's output region is padded to a multiple of 8 slots (Mosaic
    requires dim-0 element offsets divisible by the sublane tiling), so
    block b owns window [astart[b], astart[b] + W), W = BN * max_dup, with
    astart = exclusive cumsum of the 8-aligned block pair totals
    (scalar-prefetched). The <= 7 alignment-gap slots per block are written
    as sentinel rows (key = T, gid = N, depth = +inf) BEFORE the real rows,
    so they sort to the tail exactly like XLA's own pad slots.
  * the kernel builds all BN * max_dup candidate entries vectorized on the
    VPU, then a fori_loop copies each Gaussian's (max_dup, 16) tile to its
    in-window offset. A Gaussian's excess lanes (cnt < max_dup) are
    overwritten by the NEXT Gaussian's tile (its offset starts exactly at
    cnt), so only the block's tail past the sentinel gap carries garbage...
  * ...and that tail is overwritten by the NEXT grid step: window b+1
    starts at astart[b] + len8_b and is fully (re)written; TPU grid steps
    execute and write back in order, so the final writer of every true
    slot is its owner. Only slots >= astart[G-1] + len8[G-1] (the global
    tail) keep garbage; the caller masks them with one range compare.
  * the output is padded to n_slots + W rows so clamped windows stay in
    bounds; the caller slices [:n_slots].

After the (tile, depth) sort the result is IDENTICAL to the XLA owner-
gather route: the sentinel gap slots sink past every real pair just like
XLA's own invalid slots, and searchsorted starts/counts never see them.

Cost: one (BN, 16) VMEM block in, one (W, 16) block out per step; write
amplification is W / mean(block total) (bounded by max_dup / mean cnt),
but the writes are sequential VMEM->HBM streams, not per-index scatters.

Input columns (AOS rows, int32 bit-patterns): [rx0, ry0, width>=1, cnt,
depth_bits, payload_bits x P (<= 10), offs] -> 16 lanes; column 15 MUST be
the exclusive cumsum of cnt (the kernel derives in-window offsets from it —
Mosaic has no cumsum primitive, and XLA computes offs regardless for the
window starts). Output columns: [key, depth_bits, gid, payload_bits x P,
zero pad].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 16  # output row width (key, depth, gid, payload x P, pad)
_INF_BITS = 0x7F800000  # f32 +inf bit pattern (depth sort key sentinel)


def _expand_kernel(starts_ref, pk_ref, out_ref, cand_ref, lcum_ref, *, bn,
                   max_dup, grid_x, t_sentinel, n_total):
    b = pl.program_id(0)
    rx0 = pk_ref[:, 0]                                 # (BN,)
    ry0 = pk_ref[:, 1]
    w = pk_ref[:, 2]
    cnt = pk_ref[:, 3]
    depth = pk_ref[:, 4]
    # in-window offsets: column 15 carries the global exclusive cumsum
    # (Mosaic has no cumsum primitive; XLA computes offs anyway)
    lcum = pk_ref[:, 15] - pk_ref[0, 15]               # (BN,)

    d = jax.lax.broadcasted_iota(jnp.int32, (bn, max_dup), 1)
    live = d < cnt[:, None]
    ty = ry0[:, None] + d // w[:, None]
    tx = rx0[:, None] + d % w[:, None]
    key = jnp.where(live, ty * grid_x + tx, t_sentinel)
    gid_row = b * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, max_dup), 0)
    gid = jnp.where(live, gid_row, n_total)
    cols = [key, jnp.broadcast_to(depth[:, None], (bn, max_dup)), gid]
    for c in range(5, pk_ref.shape[1] - 1):
        cols.append(jnp.broadcast_to(pk_ref[:, c][:, None], (bn, max_dup)))
    while len(cols) < LANES:
        cols.append(jnp.zeros((bn, max_dup), jnp.int32))
    cand = jnp.stack(cols[:LANES], axis=-1)            # (BN, max_dup, 16)
    cand_ref[:, :] = cand.reshape(bn * max_dup, LANES)
    lcum_ref[:, :] = lcum[:, None]

    # sentinel tile FIRST: covers the <= 7 alignment-gap rows after the
    # block's true total; real rows written below overwrite its overlap
    total = lcum_ref[bn - 1, 0] + pk_ref[bn - 1, 3]
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    sent = jnp.where(ci == 0, t_sentinel,
                     jnp.where(ci == 1, _INF_BITS,
                               jnp.where(ci == 2, n_total, 0)))
    out_ref[pl.ds(jnp.minimum(total, bn * max_dup - 8), 8), :] = sent

    def body(r, _):
        out_ref[pl.ds(lcum_ref[r, 0], max_dup), :] = (
            cand_ref[pl.ds(r * max_dup, max_dup), :])
        return 0

    jax.lax.fori_loop(0, bn, body, 0)
    # NOTE: rows [total + gap, W) keep stale/garbage values on purpose —
    # the next grid step's window starts there and rewrites them (see
    # module doc).


@functools.partial(jax.jit, static_argnames=("grid_x", "grid_y", "max_dup",
                                             "bn", "n_slots", "interpret"))
def expand_pairs_pallas(pk: jnp.ndarray, offs: jnp.ndarray, *, grid_x: int,
                        grid_y: int, max_dup: int, n_slots: int,
                        bn: int = 512, interpret: bool = False):
    """pk (N, 16) int32 rows [rx0, ry0, width>=1, cnt, depth_bits,
    payload_bits..., offs] (see module doc; pk[:, 15] must equal
    offs[:N]); offs (N+1,) exclusive cumsum of cnt. Returns (slots, valid_n)
    where slots is (n_slots + W, 16) int32 — caller slices [:n_slots] and
    masks rows >= valid_n (the written-region end, <= 8-aligned padded
    total) — rows beyond it are stale garbage, rows in alignment gaps are
    already valid sentinels (key == grid_x * grid_y)."""
    n, c = pk.shape
    assert c == LANES and n % bn == 0, (pk.shape, bn)
    assert n_slots % 8 == 0, n_slots
    w_out = bn * max_dup
    g = n // bn
    t_sentinel = grid_x * grid_y
    # 8-aligned block output starts (Mosaic window-offset divisibility)
    block_ends = offs[bn::bn]                          # (G,) via offs[k*BN]
    block_begs = offs[:n:bn]
    len8 = ((block_ends - block_begs + 7) // 8) * 8
    astart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(len8).astype(jnp.int32)])
    valid_n = jnp.minimum(astart[g], n_slots)
    block_starts = jnp.minimum(astart[:g], n_slots).astype(jnp.int32)

    kernel = functools.partial(
        _expand_kernel, bn=bn, max_dup=max_dup, grid_x=grid_x,
        t_sentinel=t_sentinel, n_total=n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[pl.BlockSpec((bn, LANES), lambda b, starts: (b, 0))],
            out_specs=pl.BlockSpec(
                (pl.Element(w_out), LANES),
                # starts[] entries are 8-aligned by construction (len8
                # cumsum, n_slots % 8 == 0) but Mosaic's divisibility
                # prover cannot see through a prefetched scalar — assert
                # the alignment explicitly or native lowering fails with
                # "couldn't prove that tiling (8) divides index".
                lambda b, starts: (pl.multiple_of(starts[b], 8), 0)),
            scratch_shapes=[pltpu.VMEM((bn * max_dup, LANES), jnp.int32),
                            pltpu.VMEM((bn, 1), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_slots + w_out, LANES), jnp.int32),
        interpret=interpret,
    )(block_starts, pk)
    return out, valid_n
