"""Round-4 microbenchmark: candidate routes for the RAGGED splat VJP.

The ragged backward currently scatter-adds C*KB = 1.28M slot rows padded to
``scatter_pad`` lanes into an (N+1, pad) accumulator (api.py _gt_bwd) — the
step trace attributes ~100 ms to it, and the forward chunk-row gather
(rows[chunk_gid], 1.28M indices) another ~47 ms. Both look per-INDEX bound,
so this calibrates index-count/row-width scaling and the building blocks of
alternative routes (payload sorts, cumsum+boundary reduction, window
scatters) at the exact bench-scale shapes.

Run on the real TPU:  python benchmarks/micro_scatter_r4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    # block_until_ready returns early on the axon backend — use the
    # host-scalar barrier (see utils/profiling.host_sync)
    from animatablegaussians_tpu.utils.profiling import host_sync
    for _ in range(warmup):
        host_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        host_sync(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 531_520
    S = 1_600_000          # ~max_pairs at bench scale
    CKB = 1_277_952        # n_chunks * KB = 9984 * 128
    KB = 128

    rng = np.random.RandomState(0)
    gid = jnp.asarray(rng.randint(0, N, CKB).astype(np.int32))
    g16 = jnp.asarray(rng.randn(CKB, 16).astype(np.float32))

    # --- scatter-add row width sweep (the current _gt_bwd route) -------
    for pad in (16, 32, 64, 128):
        @jax.jit
        def sc(g, gid, pad=pad):
            up = jnp.concatenate(
                [g[:, :10], jnp.zeros((g.shape[0], pad - 10), g.dtype)], 1) \
                if pad > 10 else g[:, :pad]
            return jnp.zeros((N + 1, pad), jnp.float32).at[gid].add(up)
        print(f"scatter-add {CKB} idx, pad={pad:3d}: {timeit(sc, g16, gid):8.2f} ms")

    # --- flat 1-D gather / row gather at S ------------------------------
    idx = jnp.asarray(rng.randint(0, CKB, S).astype(np.int32))
    flat = g16[:, 0]

    @jax.jit
    def g1d(flat, idx):
        return flat[idx]
    print(f"1-D gather S={S}:              {timeit(g1d, flat, idx):8.2f} ms")

    @jax.jit
    def grow(g, idx):
        return g[idx]
    print(f"row gather S={S} x16:          {timeit(grow, g16, idx):8.2f} ms")

    # --- payload sort: key + m f32 payloads at S ------------------------
    key = jnp.asarray(rng.randint(0, N, S).astype(np.int32))
    pay = jnp.asarray(rng.randn(S).astype(np.float32))
    for m in (1, 2, 4, 10):
        @jax.jit
        def srt(key, pay, m=m):
            return jax.lax.sort((key,) + (pay,) * m, num_keys=1,
                                is_stable=True)
        print(f"sort S={S} +{m:2d} f32 payloads:  {timeit(srt, key, pay):8.2f} ms")

    # --- cumsum of (S, 16) f32 ------------------------------------------
    gS = jnp.asarray(rng.randn(S, 16).astype(np.float32))

    @jax.jit
    def cs(g):
        return jnp.cumsum(g, axis=0)
    print(f"cumsum (S,16):                 {timeit(cs, gS):8.2f} ms")

    # --- scatter-add with N indices (boundary reduction step) -----------
    gidN = jnp.asarray(rng.randint(0, N, N).astype(np.int32))
    gN = jnp.asarray(rng.randn(N, 16).astype(np.float32))
    for pad in (16, 128):
        @jax.jit
        def scN(g, gid, pad=pad):
            up = jnp.concatenate(
                [g, jnp.zeros((g.shape[0], pad - 16), g.dtype)], 1) \
                if pad > 16 else g
            return jnp.zeros((N + 1, pad), jnp.float32).at[gid].add(up)
        print(f"scatter-add {N} idx, pad={pad:3d}: {timeit(scN, gN, gidN):8.2f} ms")

    # --- window (block) scatter-add: C kb-wide windows into (S,) --------
    C = CKB // KB
    starts = jnp.asarray(
        (rng.randint(0, (S - KB) // KB, C) * KB).astype(np.int32))
    upd = jnp.asarray(rng.randn(C, KB, 16).astype(np.float32))

    @jax.jit
    def wsc(upd, starts):
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
            operand_batching_dims=(), scatter_indices_batching_dims=())
        return jax.lax.scatter_add(
            jnp.zeros((S, 16), jnp.float32), starts[:, None], upd, dn,
            mode=jax.lax.GatherScatterMode.CLIP)
    print(f"window scatter-add C={C} x(128,16): {timeit(wsc, upd, starts):8.2f} ms")

    # --- gather with SORTED (monotone) indices (does XLA exploit it?) ---
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def grow_sorted(g, idx):
        return g[idx]
    print(f"row gather sorted idx S={S}:   {timeit(grow_sorted, g16, idx_sorted):8.2f} ms")

    # --- unique scatter-SET at CKB (set vs add fast path) ----------------
    perm = jnp.asarray(rng.permutation(max(CKB, N + 1))[:CKB].astype(np.int32))

    @jax.jit
    def scset(g, gid):
        return jnp.zeros((max(CKB, N + 1), 16), jnp.float32).at[gid].set(
            g, unique_indices=True, mode="drop")
    print(f"scatter-SET unique {CKB} x16:  {timeit(scset, g16, perm):8.2f} ms")


if __name__ == "__main__":
    main()
