"""On-hardware rasterizer correctness gate (< 1 min on the chip).

CI runs every Pallas kernel in interpreter mode (tests/conftest.py pins the
CPU backend), so a Mosaic lowering bug on the real TPU would only ever be
seen by benchmarks that check finiteness, not values. This gate runs the
small-scale equality suite ON THE CURRENT BACKEND's native kernels:

  * rect pallas blend fwd == pure-XLA reference blend (exact math oracle,
    ops/rasterize/blend_ref.py, itself oracle-tested on CPU);
  * ragged chunked pallas fwd == reference (multi-chunk tiles exercised);
  * backward: pallas grads (rect + ragged) == jax.grad of the reference
    blend for means/scales/quats/opacity/colors.

Run it before capturing any official benchmark number:
    python -m animatablegaussians_tpu.tools.verify_tpu   (or bench.py --check)
Exit code 0 = all equalities hold on this backend.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

W, H = 64, 48


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    means = rng.uniform([-0.8, -0.6, 2.0], [0.8, 0.6, 4.0],
                        (n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extr = np.eye(4, dtype=np.float32)
    intr = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                    np.float32)
    return tuple(jnp.asarray(a)
                 for a in (means, scales, q, opac, colors, extr, intr))


def _render(args, cfg, bg):
    from animatablegaussians_tpu.ops.rasterize import render
    means, scales, q, opac, colors, extr, intr = args
    return render(means, scales, q, opac, colors, jnp.asarray(bg),
                  extr, intr, W, H, config=cfg)


def _grads(args, cfg, bg):
    tgt = jnp.asarray(np.linspace(0, 1, H * W * 3).reshape(H, W, 3),
                      jnp.float32)

    def loss(means, scales, q, opac, colors):
        out = _render((means, scales, q, opac, colors, args[5], args[6]),
                      cfg, bg)
        return (jnp.sum((out["render"] - tgt) ** 2)
                + jnp.sum(out["depth"] * 0.01) + jnp.sum(out["mask"] * 0.02))

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])


def main() -> int:
    from animatablegaussians_tpu.ops.rasterize import RasterizeConfig

    backend = jax.default_backend()
    print(f"verify_tpu: backend={backend} device={jax.devices()[0]}",
          file=sys.stderr)
    if backend != "tpu":
        print("verify_tpu: NOT on TPU — pallas runs in interpreter mode; "
              "this validates semantics, not the hardware lowering",
              file=sys.stderr)

    failures = []

    def check(name, got, want, atol, rtol=0.0):
        got, want = np.asarray(got), np.asarray(want)
        err = np.abs(got - want) - (atol + rtol * np.abs(want))
        if np.any(err > 0) or not np.isfinite(got).all():
            failures.append(f"{name}: max_abs_err="
                            f"{np.abs(got - want).max():.3e}")
            print(f"  FAIL {name}", file=sys.stderr)
        else:
            print(f"  ok   {name}", file=sys.stderr)

    # dense scene: multi-chunk tiles (cross-chunk carry on the chip)
    args = _scene(400, 7)
    bg = np.array([0.2, 0.0, 0.4], np.float32)
    cfg_ref = RasterizeConfig(backend="ref", k_max=512, max_dup=16)
    cfg_pal = RasterizeConfig(backend="pallas", k_max=512, max_dup=16)
    cfg_rag = RasterizeConfig(backend="pallas", max_dup=16, n_chunks=64)
    out_ref = _render(args, cfg_ref, bg)
    for tag, cfg in [("rect", cfg_pal), ("ragged", cfg_rag)]:
        out = _render(args, cfg, bg)
        if int(out["n_overflow"]) != 0:
            failures.append(f"{tag}: n_overflow={int(out['n_overflow'])}")
        for k in ("render", "depth", "mask"):
            check(f"fwd/{tag}/{k}", out[k], out_ref[k], atol=1e-5)

    # gradients on a lighter scene (ref autodiff is the oracle)
    args_g = _scene(60, 5)
    bg_g = np.array([0.3, 0.1, 0.0], np.float32)
    g_ref = _grads(args_g, RasterizeConfig(backend="ref", k_max=256,
                                           max_dup=16), bg_g)
    for tag, cfg in [
            ("rect", RasterizeConfig(backend="pallas", k_max=256,
                                     max_dup=16)),
            ("ragged", RasterizeConfig(backend="pallas", max_dup=16,
                                       n_chunks=48))]:
        g = _grads(args_g, cfg, bg_g)
        for a, b, name in zip(g, g_ref,
                              ("means", "scales", "quats", "opac", "colors")):
            check(f"bwd/{tag}/{name}", a, b, atol=1e-4, rtol=1e-3)

    # pair expansion: the streaming Pallas kernel's correctness rests on
    # Mosaic's sequential-grid write-back ordering (overlapping output
    # windows, see ops/rasterize/expand_pallas.py) — interpret-mode CI only
    # simulates that; this checks the native lowering bit-for-bit.
    from animatablegaussians_tpu.ops.rasterize import binning as B
    rng = np.random.default_rng(3)
    n = 600
    means2d = jnp.asarray(rng.uniform(-10, 140, (n, 2)), jnp.float32)
    depths = jnp.asarray(rng.choice(np.linspace(0.5, 5.0, 40), n),
                         jnp.float32)
    radii = jnp.asarray(rng.integers(0, 30, (n,)), jnp.int32)
    valid = jnp.asarray(rng.random(n) > 0.2)
    payload = jnp.asarray(rng.standard_normal((n, 10)), jnp.float32)
    kw = dict(img_w=128, img_h=96, tile=16, max_dup=32, max_pairs=8192,
              max_active_tiles=48, n_chunks=256, payload=payload)
    out = {}
    for mode in ("xla", "pallas"):
        B.set_expand_backend(mode)
        try:
            out[mode] = B.bin_gaussians_ragged(
                means2d, depths, radii, valid, **kw)
        finally:
            B.set_expand_backend("xla")
    (ba, pa), (bb, pb) = out["xla"], out["pallas"]
    if int(ba.n_overflow) != 0:
        failures.append(f"expand: fixture overflowed ({int(ba.n_overflow)})")
    for f in ("chunk_gid", "chunk_n", "chunk_arow", "chunk_tid",
              "chunk_first", "tile_ids", "tile_count", "n_overflow",
              "n_pairs"):
        check(f"expand/pallas/{f}", getattr(bb, f), getattr(ba, f), atol=0)
    check("expand/pallas/payload", pb, pa, atol=0)

    if failures:
        print("verify_tpu: FAILED\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print("verify_tpu: PASS (pallas == reference blend fwd+bwd rect+ragged, "
          "+ streaming pair expansion)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
