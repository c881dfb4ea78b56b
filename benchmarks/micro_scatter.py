"""Microbenchmark: candidate gradient routes for the splat tile-gather VJP.

The backward of the per-tile row gather must reduce (T, C, K) tile-layout
gradients into (N, C) per-Gaussian gradients — the op the CUDA reference
does with atomicAdd from every pixel (ref: backward.cu:555-598). Candidates:

  a. XLA scatter-add over all T*K tile slots (round-1 route, ~335 ms)
  b. scatter-add over only the top-A active tiles (compaction)
  c. per-channel 1-D gathers through the inverted sort permutation
  d. payload sort calibration (stable int-key sort with f32 payloads)
  e. Pallas windowed one-hot matmul scatter (MXU)

Run on the real TPU: python benchmarks/micro_scatter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import animatablegaussians_tpu  # noqa: F401  (path setup)
    from animatablegaussians_tpu.ops.rasterize.binning import bin_gaussians

    N = 518_400
    IMG_W, IMG_H = 1500, 2048
    TILE, D, K = 16, 16, 256
    gx, gy = -(-IMG_W // TILE), -(-IMG_H // TILE)
    T = gx * gy
    C = 10

    rng = np.random.RandomState(0)
    # body-like: gaussians in a central band covering ~35% of the frame
    xy = np.stack([
        rng.uniform(0.25 * IMG_W, 0.75 * IMG_W, N),
        rng.uniform(0.1 * IMG_H, 0.9 * IMG_H, N),
    ], 1).astype(np.float32)
    depths = rng.uniform(1.0, 3.0, N).astype(np.float32)
    radii = rng.gamma(2.0, 2.0, N).astype(np.float32) + 1.0  # ~3-6 px

    bins = jax.jit(lambda m, d, r: bin_gaussians(
        m, d, r.astype(jnp.int32), jnp.ones((N,), bool), IMG_W, IMG_H,
        tile=TILE, max_dup=D, k_max=K))(xy, depths, radii)
    jax.block_until_ready(bins)
    counts = np.asarray(bins.tile_count)
    print(f"T={T} active_tiles={(counts > 0).sum()} "
          f"sum_counts={counts.sum()} max_count={counts.max()} "
          f"overflow={int(bins.n_overflow)}")

    g = jnp.asarray(rng.randn(T, C, K).astype(np.float32))
    tile_gid = bins.tile_gid

    # --- a. full XLA scatter-add --------------------------------------
    @jax.jit
    def scatter_full(g, tile_gid):
        live = jnp.swapaxes(g, 1, 2).reshape(-1, C)
        return jnp.zeros((N, C), jnp.float32).at[tile_gid.reshape(-1)].add(live)
    print(f"a. scatter full T*K={T*K}:      {timeit(scatter_full, g, tile_gid)*1e3:8.2f} ms")

    # --- b. compacted scatter over top-A tiles ------------------------
    for A in (2048, 4096):
        @jax.jit
        def scatter_compact(g, tile_gid, tc, A=A):
            _, top = jax.lax.top_k(tc, A)
            ga = jnp.swapaxes(g[top], 1, 2).reshape(-1, C)
            gid = tile_gid[top].reshape(-1)
            return jnp.zeros((N, C), jnp.float32).at[gid].add(ga)
        print(f"b. scatter top-{A} (A*K={A*K}):  "
              f"{timeit(scatter_compact, g, tile_gid, bins.tile_count)*1e3:8.2f} ms")

    # --- c. per-channel 1-D gathers through the inverse permutation ----
    ND = N * D
    s_idx = jnp.arange(ND, dtype=jnp.int32)
    t_of_p = jnp.minimum(bins.sorted_key, T - 1)
    k_of_p = s_idx - bins.starts[jnp.minimum(bins.sorted_key, T)]
    validp = (bins.sorted_key < T) & (k_of_p < K)
    tk = jnp.where(validp, t_of_p * K + jnp.minimum(k_of_p, K - 1), 0)
    inv_pos = jnp.zeros((ND,), jnp.int32).at[bins.sorted_src].set(
        s_idx, unique_indices=True)
    tk_flat = tk[inv_pos]            # entry e -> flat (t*K+k) source
    valid_flat = validp[inv_pos]
    inv_order = jnp.zeros((N,), jnp.int32).at[bins.order].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True)

    @jax.jit
    def gather_1d(g, tk_flat, valid_flat, inv_order):
        out = []
        for c in range(C):
            v = g[:, c, :].reshape(-1)[tk_flat]
            v = jnp.where(valid_flat, v, 0.0)
            out.append(v.reshape(N, D).sum(1))
        per_rank = jnp.stack(out, 1)
        return per_rank[inv_order]
    print(f"c. 1-D gathers x{C} (ND={ND}):  "
          f"{timeit(gather_1d, g, tk_flat, valid_flat, inv_order)*1e3:8.2f} ms")

    # --- c2. row gather (C-padded rows) --------------------------------
    @jax.jit
    def gather_rows(g, tk_flat, valid_flat, inv_order):
        flat = jnp.swapaxes(g, 1, 2).reshape(T * K, C)
        v = jnp.where(valid_flat[:, None], flat[tk_flat], 0.0)
        per_rank = v.reshape(N, D, C).sum(1)
        return per_rank[inv_order]
    print(f"c2. row gather (ND={ND}):       "
          f"{timeit(gather_rows, g, tk_flat, valid_flat, inv_order)*1e3:8.2f} ms")

    # --- d. payload sort calibration -----------------------------------
    key = bins.sorted_src
    pay = jnp.asarray(rng.randn(ND).astype(np.float32))

    @jax.jit
    def sort1(key, pay):
        return jax.lax.sort((key, pay), num_keys=1, is_stable=True)
    print(f"d. sort 1 f32 payload (ND):     {timeit(sort1, key, pay)*1e3:8.2f} ms")

    @jax.jit
    def sort4(key, pay):
        return jax.lax.sort((key, pay, pay, pay, pay), num_keys=1,
                            is_stable=True)
    print(f"d. sort 4 f32 payloads (ND):    {timeit(sort4, key, pay)*1e3:8.2f} ms")

    # int-only 3-operand (round-1 binning sort shape) for reference
    @jax.jit
    def sort_int3(key):
        s = jnp.arange(ND, dtype=jnp.int32)
        return jax.lax.sort((key, s, s), num_keys=1, is_stable=True)
    print(f"d. sort 2 int payloads (ND):    {timeit(sort_int3, key)*1e3:8.2f} ms")

    # --- e. cumsum + segment boundaries sanity (cheap int ops) ---------
    @jax.jit
    def seg(pay):
        return pay.reshape(N, D).sum(1)
    print(f"e. dup segment-sum only:        {timeit(seg, pay)*1e3:8.2f} ms")


if __name__ == "__main__":
    import sys as _s
    if "--set" not in _s.argv:
        main()


def main2():
    """Round-2 candidates: unique scatter-set routes."""
    import animatablegaussians_tpu  # noqa: F401
    from animatablegaussians_tpu.ops.rasterize.binning import bin_gaussians

    N = 518_400
    IMG_W, IMG_H = 1500, 2048
    TILE, D, K = 16, 16, 256
    gx, gy = -(-IMG_W // TILE), -(-IMG_H // TILE)
    T = gx * gy
    ND = N * D

    rng = np.random.RandomState(0)
    xy = np.stack([
        rng.uniform(0.25 * IMG_W, 0.75 * IMG_W, N),
        rng.uniform(0.1 * IMG_H, 0.9 * IMG_H, N),
    ], 1).astype(np.float32)
    depths = rng.uniform(1.0, 3.0, N).astype(np.float32)
    radii = rng.gamma(2.0, 2.0, N).astype(np.float32) + 1.0

    bins = jax.jit(lambda m, d, r: bin_gaussians(
        m, d, r.astype(jnp.int32), jnp.ones((N,), bool), IMG_W, IMG_H,
        tile=TILE, max_dup=D, k_max=K))(xy, depths, radii)
    jax.block_until_ready(bins)

    # per-slot entry index e = sorted_src[starts[t] + k]; invalid -> ND
    @jax.jit
    def slot_entry(bins):
        karange = jnp.arange(K, dtype=jnp.int32)[None, :]
        p = bins.starts[:T, None] + karange                    # (T, K)
        valid = karange < bins.tile_count[:, None]
        e = bins.sorted_src[jnp.minimum(p, ND - 1)]
        return jnp.where(valid, e, ND)
    e_slot = slot_entry(bins)
    jax.block_until_ready(e_slot)
    inv_order = jnp.zeros((N,), jnp.int32).at[bins.order].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True)

    for C in (8, 10, 16):
        g = jnp.asarray(rng.randn(T, C, K).astype(np.float32))

        @jax.jit
        def set_route(g, e_slot, inv_order, C=C):
            flat = jnp.swapaxes(g, 1, 2).reshape(T * K, C)
            ge = jnp.zeros((ND, C), jnp.float32).at[e_slot.reshape(-1)].set(
                flat, unique_indices=True, mode="drop")
            per_rank = ge.reshape(N, D, C).sum(1)
            return jnp.zeros((N, C), jnp.float32).at[bins.order].set(
                per_rank, unique_indices=True)
        print(f"f. set-route C={C}:             "
              f"{timeit(set_route, g, e_slot, inv_order)*1e3:8.2f} ms")

    C = 16
    g = jnp.asarray(rng.randn(T, C, K).astype(np.float32))

    # unique scatter-ADD (does XLA hit the fast path?)
    @jax.jit
    def add_unique(g, e_slot):
        flat = jnp.swapaxes(g, 1, 2).reshape(T * K, C)
        ge = jnp.zeros((ND, C), jnp.float32).at[e_slot.reshape(-1)].add(
            flat, unique_indices=True, mode="drop")
        return ge.reshape(N, D, C).sum(1)
    print(f"g. add-route unique C={C}:      {timeit(add_unique, g, e_slot)*1e3:8.2f} ms")

    # compacted set-route: top-A tiles only
    for A in (2048, 4096):
        @jax.jit
        def set_compact(g, e_slot, tc, A=A):
            _, top = jax.lax.top_k(tc, A)
            flat = jnp.swapaxes(g[top], 1, 2).reshape(A * K, C)
            e = e_slot[top].reshape(-1)
            ge = jnp.zeros((ND, C), jnp.float32).at[e].set(
                flat, unique_indices=True, mode="drop")
            per_rank = ge.reshape(N, D, C).sum(1)
            return jnp.zeros((N, C), jnp.float32).at[bins.order].set(
                per_rank, unique_indices=True)
        print(f"h. set-route top-{A} C={C}:    "
              f"{timeit(set_compact, g, e_slot, bins.tile_count)*1e3:8.2f} ms")


if __name__ == "__main__":
    main2()
