"""Tile binning with static shapes.

The CUDA reference uses a data-dependent global radix sort over
(tileID | depth-bits) keys (ref: rasterizer_impl.cu:70-138, 278-309). XLA has
no dynamic-length sort, so the TPU design is:

  1. argsort the N Gaussians by view depth once (N keys, not N*dup);
  2. emit up to MAX_DUP (gaussian, tile) entries per Gaussian in depth order
     (static cap; overflow is counted and reported);
  3. one *stable* single-key sort by tile id — stability preserves the global
     depth order within each tile, reproducing the reference's
     (tile, depth)-lexicographic order;
  4. per-tile ranges via searchsorted, then a static-K gather of per-tile
     Gaussian index lists (cap K_MAX, truncating the most distant Gaussians —
     consistent with front-to-back early termination).

Everything is integer bookkeeping: no gradients flow through binning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


_EXPAND_BACKEND = "xla"  # "auto" | "pallas" | "xla"


def set_expand_backend(mode: str):
    """Pair-expansion backend: "xla" = _segment_owner + packed owner-row
    gather (per-index bound, ~45 ms at bench scale); "pallas" = sequential
    streaming expansion kernel (expand_pallas.py) that exploits slot
    contiguity — no per-pair indexing. "auto" picks pallas on TPU (raw
    Gaussian order only; the depth-presorted path keeps XLA)."""
    global _EXPAND_BACKEND
    assert mode in ("auto", "pallas", "xla"), mode
    _EXPAND_BACKEND = mode


def _use_pallas_expand(presort_depth: bool, n_payload: int) -> bool:
    if presort_depth or n_payload > 10:
        return False
    if _EXPAND_BACKEND == "auto":
        return jax.default_backend() == "tpu"
    return _EXPAND_BACKEND == "pallas"


class RaggedBins(NamedTuple):
    """Flat chunked pair layout (ragged mode, n_chunks > 0): each tile's
    depth-ordered Gaussian list is padded to a multiple of the blend
    kernel's KB=128 lanes and laid out contiguously; the Pallas kernels
    walk 128-pair chunks and carry blend state across chunks of the same
    tile. No per-tile k_max cap exists in this mode — within-tile pairs are
    never dropped (parity with the CUDA flat pair list,
    ref: rasterizer_impl.cu:278-309); only the rect cap (max_dup), the
    active-tile cap and the global chunk budget can drop, all counted."""
    chunk_gid: jnp.ndarray    # (C, KB) int32 gaussian ids (pad -> N, any)
    chunk_n: jnp.ndarray      # (C,) int32 valid entries in chunk [0, KB]
    chunk_arow: jnp.ndarray   # (C,) int32 output row (active-tile index)
    chunk_tid: jnp.ndarray    # (C,) int32 global tile id (pixel coords)
    chunk_first: jnp.ndarray  # (C,) int32 1 iff first chunk of its tile
    tile_ids: jnp.ndarray     # (A,) int32 active-tile global ids
    tile_count: jnp.ndarray   # (A,) int32 true per-tile pair counts
    n_overflow: jnp.ndarray   # () int32 dropped pairs (rect/A/chunk budget)
    n_pairs: jnp.ndarray      # () int32 true total pairs before caps
    order: jnp.ndarray        # (N,) int32 depth order


class TileBins(NamedTuple):
    tile_gid: jnp.ndarray     # (A, K_MAX) int32 gaussian indices, depth order
    tile_count: jnp.ndarray   # (A,) int32 number of valid entries (capped)
    tile_ids: jnp.ndarray     # (A,) int32 tile indices the rows refer to
    n_overflow: jnp.ndarray   # () int32: dropped (gaussian,tile) pairs
                              # (rect cap + per-tile cap + inactive tiles)
    n_pairs: jnp.ndarray      # () int32: TRUE total (gaussian, tile) pairs
                              # before any cap (the reference's num_rendered,
                              # rasterizer_impl.cu:281-286)
    order: jnp.ndarray        # (N,) int32 depth order: rank -> gaussian id
    # compressed-backward bookkeeping (see api._gather_tiles_compressed):
    # maps each of the S=max_pairs sorted pair slots to its slot in the
    # padded (A, K_MAX) gather layout and to its gaussian id, so the
    # gradient scatter-add runs over S real pairs instead of A*K_MAX
    # padded slots (~5x less volume at bench scale).
    pair_slot: jnp.ndarray    # (S,) int32 rank*K_MAX + k, A*K_MAX if dead
    pair_gid: jnp.ndarray     # (S,) int32 gaussian id, N if dead


def tile_rect(means2d, radii, grid_x: int, grid_y: int, tile: int):
    """Tile-rect bounds per Gaussian (ref: auxiliary.h getRect)."""
    x, y = means2d[:, 0], means2d[:, 1]
    r = radii.astype(means2d.dtype)
    rx0 = jnp.clip(jnp.floor((x - r) / tile), 0, grid_x).astype(jnp.int32)
    ry0 = jnp.clip(jnp.floor((y - r) / tile), 0, grid_y).astype(jnp.int32)
    rx1 = jnp.clip(jnp.floor((x + r + tile - 1) / tile), 0, grid_x).astype(jnp.int32)
    ry1 = jnp.clip(jnp.floor((y + r + tile - 1) / tile), 0, grid_y).astype(jnp.int32)
    return rx0, ry0, rx1, ry1


def _segment_owner(offsets, n_seg: int, n_slots: int):
    """Owner segment of each flat slot: ``owner[s] = i`` iff
    ``offsets[i] <= s < offsets[i+1]`` (segments with zero length never own).

    scatter-max of the segment index at each segment start + a cummax —
    O(S) elementwise. The naive ``searchsorted(offsets, s)`` lowers to a
    log2(n_seg)-step gather loop over all S slots (measured ~216 ms at
    S=2.1M/log=12 in the round-3 ragged bench; this is ~8 ms)."""
    length = offsets[1:] - offsets[:-1]                        # (n_seg,)
    start = offsets[:n_seg]
    tgt = jnp.where((length > 0) & (start < n_slots), start, n_slots)
    head = jnp.zeros((n_slots,), jnp.int32).at[tgt].max(
        jnp.arange(1, n_seg + 1, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(head) - 1           # (S,), -1 before first start


def _expand_pairs(means2d, depths, radii, valid, grid_x: int, grid_y: int,
                  tile: int, max_dup: int, max_pairs: int, payload=None,
                  presort_depth: bool = False):
    """Pipeline steps 1-3: compact pair expansion -> (tile, depth)
    two-key stable sort over ONLY ``max_pairs`` slots. Returns
    (sorted_key, sorted_gid, starts, counts, build_overflow, n_pairs,
    order[, sorted_payload]).

    The round-2 layout materialized (N, max_dup) duplication arrays and
    sorted N*max_dup entries (17M at bench scale, 173 ms) although only
    ~1M pairs were real. Here each Gaussian's pairs are laid out
    contiguously via an exclusive cumsum of its tile count, slots find
    their owner with _segment_owner, and the sort covers max_pairs slots
    (autosize sizes it at ~1.5x the true pair count).

    Two expansion orders produce the SAME sorted pair list when nothing
    overflows (equality-tested):
      * default (presort_depth=False): expansion in raw Gaussian order;
        depth rides the owner gather as a second sort key. Skips the N-key
        depth argsort and the (N, 4+P) reorder gather entirely (both
        per-index bound). The CUDA reference sorts (tile | depth-bits)
        keys exactly like this (ref: rasterizer_impl.cu:70-138, 278-309).
      * presort_depth=True: argsort Gaussians by depth first, expand in
        depth order, and let a ONE-key stable tile sort preserve the
        depth order. Slower, but a pair-budget overrun drops the
        FARTHEST Gaussians' pairs, whereas raw order drops the
        highest-INDEX ones — only observable while overflowing, a state
        the trainer discards and self-heals anyway (training/driver.py).

    ``payload`` (N, P) f32: per-Gaussian data that RIDES the pipeline —
    carried through the per-slot owner gather (bitcast-packed with the int
    fields: one row gather, per-INDEX cost is flat in width), and sorted as
    extra payload operands (measured flat in payload count on v5e). The
    sorted payload lands CONTIGUOUSLY per tile, so downstream consumers
    slice kb-blocks instead of paying a per-pair row gather (~38 ms at
    bench scale — the round-5 render headline win)."""
    T = grid_x * grid_y
    N = means2d.shape[0]
    S = max_pairs

    # Binning is pure integer bookkeeping — no gradients flow through it
    # (the reference's binning is CUDA bookkeeping too). Without this, the
    # means2d gather below drags a useless 524k scatter into the backward.
    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)
    P = 0 if payload is None else payload.shape[1]
    if P:
        payload = jax.lax.stop_gradient(payload)

    depth_f = jnp.where(valid, depths, jnp.inf).astype(jnp.float32)
    if presort_depth:
        # 1. Depth order over Gaussians (invalid sink to the back), then
        # one packed reorder gather instead of three (per-index cost
        # dominates TPU gathers — 3x 524k-row gathers were ~15 ms).
        order = jnp.argsort(depth_f).astype(jnp.int32)        # (N,)
        parts = [means2d, radii.astype(means2d.dtype)[:, None],
                 valid.astype(means2d.dtype)[:, None]]
        if P:
            parts.append(payload)
        packed = jnp.concatenate(parts, axis=1)               # (N, 4[+P])
        packed = packed[order]
        xy = packed[:, :2]
        r = packed[:, 2].astype(jnp.int32)
        v = packed[:, 3] > 0.5
        pay = packed[:, 4:4 + P]
    else:
        # raw Gaussian order: no argsort, no reorder gather — depth rides
        # the owner gather below as the sort's second key instead
        order = jnp.arange(N, dtype=jnp.int32)
        xy, r, v, pay = means2d, radii, valid, payload
    rx0, ry0, rx1, ry1 = tile_rect(xy, r, grid_x, grid_y, tile)
    width = rx1 - rx0
    ntiles = width * (ry1 - ry0)
    ntiles = jnp.where(v, ntiles, 0)
    rect_overflow = jnp.sum(jnp.maximum(ntiles - max_dup, 0))
    ntiles_c = jnp.minimum(ntiles, max_dup)

    # 2. Compact expansion: gaussian i owns slots [offs[i], offs[i+1]).
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(ntiles_c).astype(jnp.int32)])
    total = offs[N]

    if _use_pallas_expand(presort_depth, P):
        # Streaming Pallas expansion: each Gaussian's pair slots are
        # CONTIGUOUS, so expansion is sequential VMEM->HBM block writes —
        # no per-pair gather at all (the XLA route below pays ~35 ns/index
        # twice: _segment_owner + the packed owner-row gather; see
        # expand_pallas.py module doc).
        from .expand_pallas import expand_pairs_pallas, LANES as _EL
        bn = 512 if N >= 512 else max(8, ((N + 7) // 8) * 8)
        n_pad = -(-N // bn) * bn
        s8 = ((S + 7) // 8) * 8
        pk = jnp.zeros((n_pad, _EL), jnp.int32)
        pk = pk.at[:N, 0].set(rx0).at[:N, 1].set(ry0)
        pk = pk.at[:, 2].set(1).at[:N, 2].set(jnp.maximum(width, 1))
        pk = pk.at[:N, 3].set(ntiles_c)
        pk = pk.at[:N, 4].set(
            jax.lax.bitcast_convert_type(depth_f, jnp.int32))
        if P:
            pk = pk.at[:N, 5:5 + P].set(
                jax.lax.bitcast_convert_type(pay, jnp.int32))
        offs_pad = jnp.concatenate(
            [offs, jnp.full((n_pad - N,), total, jnp.int32)])
        pk = pk.at[:, _EL - 1].set(offs_pad[:n_pad])
        out, valid_n = expand_pairs_pallas(
            pk, offs_pad, grid_x=grid_x, grid_y=grid_y,
            max_dup=max_dup, n_slots=s8, bn=bn,
            interpret=jax.default_backend() != "tpu")
        out = out[:S]
        s_idx = jnp.arange(S, dtype=jnp.int32)
        tail = s_idx >= valid_n                       # stale garbage rows
        key = jnp.where(tail, T, out[:, 0])
        slot_depth = jnp.where(
            tail, jnp.inf,
            jax.lax.bitcast_convert_type(out[:, 1], jnp.float32))
        gid = jnp.where(tail, N, out[:, 2])
        slot_payload = jax.lax.bitcast_convert_type(
            out[:, 3:3 + P], jnp.float32) if P else out[:, 3:3]
        ops = (key, slot_depth, gid) + tuple(slot_payload[:, i]
                                             for i in range(P))
        res = jax.lax.sort(ops, num_keys=2, is_stable=True)
        sorted_key, sorted_gid = res[0], res[2]
        starts = jnp.searchsorted(
            sorted_key, jnp.arange(T + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        counts = starts[1:] - starts[:-1]
        pair_overflow = jnp.maximum(total - S, 0)
        out_t = (sorted_key, sorted_gid, starts, counts,
                 rect_overflow + pair_overflow, jnp.sum(ntiles), order)
        if P:
            out_t += (jnp.stack(res[3:], axis=1),)
        return out_t

    s_idx = jnp.arange(S, dtype=jnp.int32)
    g = _segment_owner(offs, N, S)                             # (S,)
    g_c = jnp.clip(g, 0, N - 1)
    slot_valid = s_idx < total
    # one packed int32 row gather for the per-slot fields (offs values can
    # exceed 2^24, so no f32 packing — the f32 depth/payload columns ride
    # along bitcast INTO the int32 domain: int-bit-patterns-as-f32 would be
    # denormals (any int < 2^23) and the TPU flushes those to zero inside
    # the fused gather chain, measured; f32-bits-as-int32 is inert)
    cols = [jnp.stack([rx0, ry0, jnp.maximum(width, 1), offs[:N], order],
                      axis=1)]                                 # (N, 5) i32
    if not presort_depth:
        cols.append(jax.lax.bitcast_convert_type(
            depth_f, jnp.int32)[:, None])                      # (N, 1)
    if P:
        cols.append(jax.lax.bitcast_convert_type(pay, jnp.int32))
    pk_all = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    pkg_all = pk_all[g_c]                                      # (S, 5+1+P)
    pkg = pkg_all[:, :5]
    f32s = jax.lax.bitcast_convert_type(pkg_all[:, 5:], jnp.float32)
    if not presort_depth:
        slot_depth = jnp.where(slot_valid, f32s[:, 0], jnp.inf)
        slot_payload = jnp.where(slot_valid[:, None], f32s[:, 1:], 0.0)
    else:
        slot_payload = jnp.where(slot_valid[:, None], f32s, 0.0)
    j = s_idx - pkg[:, 3]
    w_g = pkg[:, 2]
    ty = pkg[:, 1] + j // w_g
    tx = pkg[:, 0] + j % w_g
    key = jnp.where(slot_valid, ty * grid_x + tx, T).astype(jnp.int32)
    gid = jnp.where(slot_valid, pkg[:, 4], N).astype(jnp.int32)

    # 3. Stable (tile[, depth]) sort; the payload columns ride as extra
    # sort operands (measured flat in operand count). With depth-ordered
    # slots one stable key preserves depth within tiles; in raw order
    # depth is the explicit second key — both yield the reference's
    # (tile, depth)-lexicographic pair list (rasterizer_impl.cu:70-138),
    # with identical tie-breaks (ties sort by Gaussian index either way).
    if presort_depth:
        ops = (key, gid) + tuple(slot_payload[:, i] for i in range(P))
        res = jax.lax.sort(ops, num_keys=1, is_stable=True)
        sorted_key, sorted_gid = res[0], res[1]
        pay0 = 2
    else:
        ops = (key, slot_depth, gid) + tuple(slot_payload[:, i]
                                             for i in range(P))
        res = jax.lax.sort(ops, num_keys=2, is_stable=True)
        sorted_key, sorted_gid = res[0], res[2]
        pay0 = 3

    starts = jnp.searchsorted(sorted_key, jnp.arange(T + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]                          # (T,)
    pair_overflow = jnp.maximum(total - S, 0)
    out = (sorted_key, sorted_gid, starts, counts,
           rect_overflow + pair_overflow, jnp.sum(ntiles), order)
    if P:
        out += (jnp.stack(res[pay0:], axis=1),)                # (S, P)
    return out


def _resolve_max_pairs(max_pairs: int, n: int, max_dup: int) -> int:
    """0 = legacy capacity (N * max_dup); autosize passes an exact budget."""
    return max_pairs if max_pairs > 0 else n * max_dup


def _block_gather(x: jnp.ndarray, starts: jnp.ndarray, kb: int):
    """(S,) x, (C,) starts -> (C, kb) contiguous blocks x[starts[c]:+kb].

    One gather of C block slices instead of C*kb single elements: XLA's TPU
    gather pays per INDEX (~40 ns each measured), so fetching the chunk
    layout element-wise was 54 ms at 1.28M slots; C=10k block indices is
    <1 ms. Callers pad x so starts+kb stays in bounds."""
    return jax.lax.gather(
        x, starts[:, None],
        jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
        slice_sizes=(kb,),
        mode=jax.lax.GatherScatterMode.CLIP)


def bin_gaussians(
    means2d: jnp.ndarray,      # (N, 2)
    depths: jnp.ndarray,       # (N,)
    radii: jnp.ndarray,        # (N,) int32
    valid: jnp.ndarray,        # (N,) bool
    img_w: int,
    img_h: int,
    tile: int = 16,
    max_dup: int = 16,
    k_max: int = 512,
    max_active_tiles: int = 0,
    max_pairs: int = 0,
    presort_depth: bool = False,
) -> TileBins:
    grid_x = -(-img_w // tile)
    grid_y = -(-img_h // tile)
    T = grid_x * grid_y
    N = means2d.shape[0]
    S = _resolve_max_pairs(max_pairs, N, max_dup)

    (sorted_key, sorted_gid, starts, counts, build_overflow, n_pairs,
     order) = _expand_pairs(means2d, depths, radii, valid, grid_x, grid_y,
                            tile, max_dup, S, presort_depth=presort_depth)

    # 4. Ranges, active-tile compaction, then static-K lists for ONLY the
    # active tiles (the reference's grid covers every tile but empty tiles
    # exit renderCUDA immediately, rasterizer_impl.cu; here inactive tiles
    # must not occupy static shape — and building lists for them costs a
    # 3M-element gather, measured ~22 ms at full scale).
    tile_overflow = jnp.sum(jnp.maximum(counts - k_max, 0))
    counts_c = jnp.minimum(counts, k_max)

    A = min(max_active_tiles or T, T)
    if A < T:
        counts_a, tile_ids = jax.lax.top_k(counts_c, A)
        # entries in tiles beyond the cap are dropped: count them
        tile_overflow = tile_overflow + (jnp.sum(counts_c)
                                         - jnp.sum(counts_a))
        starts_a = starts[tile_ids]
    else:
        counts_a = counts_c
        tile_ids = jnp.arange(T, dtype=jnp.int32)
        starts_a = starts[:T]

    idx = starts_a[:, None] + jnp.arange(k_max, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(idx, S - 1)
    tile_gid = sorted_gid[idx]                                  # (A, K)

    # Compressed-backward map: pair slot s (tile sorted_key[s], within-tile
    # index k = s - starts[tile]) lives at padded slot rank*k_max + k. One
    # packed (T+1, 2) gather resolves rank and start per slot.
    if A < T:
        rank_of_tile = jnp.full((T + 1,), -1, jnp.int32).at[tile_ids].set(
            jnp.arange(A, dtype=jnp.int32))
    else:
        rank_of_tile = jnp.concatenate(
            [jnp.arange(T, dtype=jnp.int32),
             jnp.full((1,), -1, jnp.int32)])
    tpk = jnp.stack([rank_of_tile, starts], axis=1)            # (T+1, 2)
    tpg = tpk[jnp.minimum(sorted_key, T)]                      # (S, 2)
    rank, start = tpg[:, 0], tpg[:, 1]
    k = jnp.arange(S, dtype=jnp.int32) - start
    live = (rank >= 0) & (k < k_max) & (sorted_gid < N)
    pair_slot = jnp.where(live, rank * k_max + k, A * k_max)
    pair_gid = jnp.where(live, sorted_gid, N)

    return TileBins(tile_gid=tile_gid, tile_count=counts_a,
                    tile_ids=tile_ids,
                    n_overflow=(build_overflow
                                + tile_overflow).astype(jnp.int32),
                    n_pairs=n_pairs.astype(jnp.int32),
                    order=order,
                    pair_slot=pair_slot, pair_gid=pair_gid)


def bin_gaussians_ragged(
    means2d: jnp.ndarray,      # (N, 2)
    depths: jnp.ndarray,       # (N,)
    radii: jnp.ndarray,        # (N,) int32
    valid: jnp.ndarray,        # (N,) bool
    img_w: int,
    img_h: int,
    tile: int = 16,
    max_dup: int = 16,
    n_chunks: int = 4096,
    kb: int = 128,
    max_active_tiles: int = 0,
    max_pairs: int = 0,
    payload=None,
    presort_depth: bool = False,
):
    """Flat chunked binning (see RaggedBins). Each active tile's pair list
    occupies ceil(count/kb) consecutive kb-wide chunks; within-tile pairs
    are never capped. Pad slots point at gaussian id N (callers append a
    zero sentinel row).

    With ``payload`` (N, P) f32 the per-Gaussian data rides the tile sort
    (see _expand_pairs) and the return value becomes
    ``(bins, chunk_payload)`` with chunk_payload (C, 16, kb) laid out
    exactly like the blend kernels' input (P <= 16 live channels, zero pad;
    lanes >= chunk_n zeroed) — equal to ``rows_sentinel[chunk_gid]``
    swapaxes'd, but built from contiguous kb-slices of the sorted payload
    instead of a per-pair row gather (per-INDEX cost ~35 ns on v5e: the
    gather was ~38 ms at bench scale, the slices ~1 ms)."""
    grid_x = -(-img_w // tile)
    grid_y = -(-img_h // tile)
    T = grid_x * grid_y
    N = means2d.shape[0]
    S_pairs = _resolve_max_pairs(max_pairs, N, max_dup)

    res = _expand_pairs(means2d, depths, radii, valid, grid_x, grid_y,
                        tile, max_dup, S_pairs, payload=payload,
                        presort_depth=presort_depth)
    (sorted_key, sorted_gid, starts, counts, build_overflow, n_pairs,
     order) = res[:7]
    sorted_payload = res[7] if payload is not None else None

    A = min(max_active_tiles or T, T)
    if A < T:
        counts_a, tile_ids = jax.lax.top_k(counts, A)
        a_overflow = jnp.sum(counts) - jnp.sum(counts_a)
        starts_a = starts[tile_ids]
    else:
        counts_a = counts
        tile_ids = jnp.arange(T, dtype=jnp.int32)
        starts_a = starts[:T]
        a_overflow = jnp.zeros((), counts.dtype)

    # Chunked layout, computed at CHUNK granularity (C = n_chunks rows),
    # never per pair slot: tile pair-lists are kb-aligned, so every layout
    # quantity (owner tile, first-chunk flag, valid count, source offset
    # into the sorted pair list) is constant within a chunk, and the pair
    # ids themselves are a CONTIGUOUS kb-slice of sorted_gid (stable tile
    # sort lays each tile's pairs out consecutively in depth order). The
    # per-slot formulation of this block cost ~105 ms of the bench render
    # (a 42 ns/index element gather over 1.28M slots plus S-sized
    # selects); this one is ~1 ms.
    padded_c = -(-counts_a // kb)                              # (A,) chunks
    offs_c = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(padded_c).astype(jnp.int32)])
    c_idx = jnp.arange(n_chunks, dtype=jnp.int32)
    arow = _segment_owner(offs_c, A, n_chunks)                 # (C,)
    in_range = (arow >= 0) & (c_idx < offs_c[A])
    chunk_arow = jnp.clip(arow, 0, A - 1)
    pk = jnp.stack([offs_c[:A], starts_a, counts_a, tile_ids], axis=1)
    pkc = pk[chunk_arow]                                       # (C, 4)
    k0 = (c_idx - pkc[:, 0]) * kb           # chunk's pair offset in its tile
    chunk_first = ((pkc[:, 0] == c_idx) & in_range).astype(jnp.int32)
    chunk_n = jnp.clip(pkc[:, 2] - k0, 0, kb)
    chunk_n = jnp.where(in_range, chunk_n, 0).astype(jnp.int32)
    chunk_tid = pkc[:, 3].astype(jnp.int32)

    # contiguous kb-block gather out of the sorted pair list (pad chunks
    # point at the sentinel tail; lanes beyond chunk_n masked to N below).
    # Invariant: for in-range chunks, starts_a[arow] + counts_a[arow]
    # <= S_pairs by construction (starts/counts come from searchsorted over
    # the S_pairs-slot sorted key array), so the min() clamp below is dead
    # code for valid lanes — it only guards pad chunks, whose lanes the
    # chunk_n mask zeroes anyway.
    src0 = jnp.where(in_range, jnp.minimum(pkc[:, 1] + k0, S_pairs),
                     S_pairs)
    gid_pad = jnp.concatenate(
        [sorted_gid, jnp.full((kb,), N, jnp.int32)])
    raw = _block_gather(gid_pad, src0, kb)                     # (C, kb)
    lane = jnp.arange(kb, dtype=jnp.int32)[None, :]
    gid = jnp.where(lane < chunk_n[:, None], raw, N)

    # pairs in tiles (or tile tails) beyond the chunk budget
    chunk_overflow = jnp.sum(counts_a) - jnp.sum(chunk_n)

    bins = RaggedBins(
        chunk_gid=gid,
        chunk_n=chunk_n, chunk_arow=chunk_arow, chunk_tid=chunk_tid,
        chunk_first=chunk_first,
        tile_ids=tile_ids, tile_count=counts_a,
        n_overflow=(build_overflow + a_overflow
                    + chunk_overflow).astype(jnp.int32),
        n_pairs=n_pairs.astype(jnp.int32),
        order=order)
    if sorted_payload is None:
        return bins

    # contiguous kb-block slices of the sorted payload -> (C, kb, P); same
    # CLIP-padded sentinel tail handling as the gid gather above
    Pch = sorted_payload.shape[1]
    sp = jnp.concatenate(
        [sorted_payload, jnp.zeros((kb, Pch), sorted_payload.dtype)], axis=0)
    blocks = jax.lax.gather(
        sp, src0[:, None],
        jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
        slice_sizes=(kb, Pch),
        mode=jax.lax.GatherScatterMode.CLIP)                   # (C, kb, P)
    blocks = jnp.where((lane < chunk_n[:, None])[..., None], blocks, 0.0)
    chunk_payload = jnp.swapaxes(blocks, 1, 2)                 # (C, P, kb)
    if Pch < 16:
        chunk_payload = jnp.pad(chunk_payload,
                                ((0, 0), (0, 16 - Pch), (0, 0)))
    return bins, chunk_payload
