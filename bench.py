"""Benchmark: avatar training step throughput + render FPS at reference scale.

Measures full train-step it/sec (3x DualStyleUNet 512->1024 fwd+bwd, LBS
skinning, Pallas tile splat fwd+bwd at the AvatarReX image size, LPIPS 512^2,
adam update) on synthetic fixtures — the shapes match the reference hot loop
(ref: main_avatar.py:166-264, SURVEY.md §3.1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``python bench.py --fps`` instead benchmarks inference (novel-pose render,
no grads) and prints a render-FPS JSON line.

Baseline derivation (the reference publishes no wall-clock numbers,
BASELINE.md): the A100 estimate is FLOPs-derived from the hot loop —
  * one DualStyleUNet fwd (inp 512^2, out 1024^2, reference channel
    schedule) is ~212 GFLOP of conv work; a train step runs 3 nets
    forward+backward (~3x fwd FLOPs) = ~1.9 TFLOP;
  * LPIPS VGG16 at 512^2 fwd+input-grad ~0.24 TFLOP;
  * CUDA splat fwd+bwd at 518k Gaussians / 1500x2048 ~30 ms (published
    3DGS-class training kernels on A100), plus ~15 ms torch eager batch-1
    host overhead (DataLoader, python dispatch);
  * torch eager batch-1 conv utilization on mixed 16..512-channel stages:
    ~10% of A100 TF32 peak (156 TF/s) = 15.6 TF/s effective.
  => step time ~ (2.15e12 / 15.6e12) + 0.045 s ~ 0.18 s -> ~5.5 it/s; with
  7-15% utilization the range is 4.1-6.9. We pin 5.0 it/s as the baseline
  (midpoint, rounded) until a real A100 run of the torch reference exists.
"""

from __future__ import annotations

import json
import sys
import time

# FLOPs-derived A100 estimate for the torch reference train step (see
# module docstring for the derivation; replaces the round-1 bare guess).
A100_BASELINE_IT_S = 5.0
# Render path: no backward, no LPIPS -> CNN 0.64 TF + splat fwd ~10 ms
# + host overhead ~10 ms => ~(0.64/15.6) + 0.02 ~ 0.06 s -> ~16 FPS.
A100_BASELINE_RENDER_FPS = 16.0

MAP_H = 1024           # canonical map 1024x2048 -> CNN in 512^2, out 1024^2
IMG_W, IMG_H = 1500, 2048  # AvatarReX camera resolution
WARMUP = 2
ITERS = 10

RASTER_KW = dict(k_max=256, max_dup=16, max_active_tiles=6144,
                 scatter_pad=128, chunk_kb=256)


def _zero_head_outputs(params, names=("position_net", "other_net")):
    """Zero the ToRGB conv weights of the given heads so their outputs are
    exactly 0 (biases are already zero at init). The benched conv FLOPs and
    memory traffic are unchanged — only the *values* change — but the
    Gaussian attributes collapse to exactly the ``create_from_pcd`` init
    (KNN scales, opacity 0.1, identity rotations; ref:
    gaussians/gaussian_model.py:156-183), the distribution the 5k-iter
    pretrain regresses the CNN onto (ref: main_avatar.py:126-164). This is
    the honest trained-scale splat workload; the round-2 fixture's random
    CNN deltas in log-scale space blew radii up and overflowed the caps."""
    import jax.numpy as jnp

    for name in names:
        for branch in ("to_rgbs1", "to_rgbs2"):
            for p in params[name][branch]:
                p["conv"]["weight"] = jnp.zeros_like(p["conv"]["weight"])
    return params


def _setup():
    from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    # throughput run: bf16 MXU passes for convs (parity paths pin HIGHEST).
    # --bf16 additionally keeps activations bf16 between layers; --mmgrad
    # lowers stride-1 conv weight gradients as shifted matmuls (both
    # measured one at a time in BASELINE.md's round-4 ablation table).
    from animatablegaussians_tpu.models import styleunet as su
    su.set_conv_precision("bf16" if "--bf16" in sys.argv else "default")
    if "--mmgrad" in sys.argv:
        su.set_conv_mmgrad(True)
    # --pexpand: streaming Pallas pair expansion instead of the XLA
    # owner-gather (binning.set_expand_backend; ablation in BASELINE.md)
    if "--pexpand" in sys.argv:
        from animatablegaussians_tpu.ops.rasterize import binning as _B
        _B.set_expand_backend("pallas")

    import __graft_entry__ as ge
    from animatablegaussians_tpu.ops.rasterize import autosize as az
    from animatablegaussians_tpu.utils import synthetic
    net, params, _ = ge._build_avatar(
        # remat off by default: after the wavelet-chain fusion the B=1
        # full-scale step fits HBM without rematerializing the decoders,
        # and skipping the recompute is worth ~3% (1.886 -> 1.944 it/s
        # measured). --remat turns it back on (needed to fit the batched
        # step's B-fold decoder activations at --batch >= 4).
        map_h=MAP_H, img=IMG_W, raster_kw=RASTER_KW,
        remat="--remat" in sys.argv)
    params = _zero_head_outputs(params)
    pos, _, _ = synthetic.make_cano_map(map_h=MAP_H)
    items_np = synthetic.make_items(img_w=IMG_W, img_h=IMG_H,
                                    cano_pos_map=pos)
    # two-pass cap sizing on the fixture (count pass -> static caps), the
    # same path the trainer runs at init (training/driver.py:81-84).
    # Layout auto-picks by padded slot count (autosize.pick_caps) — at this
    # scale that is the flat ragged chunked layout (no per-tile cap), which
    # is ~12x faster than rect (0.178 -> 2.1 it/s measured on v5e).
    # --rect / --ragged force a layout.
    ragged = (False if "--rect" in sys.argv
              else True if "--ragged" in sys.argv else None)
    cfg = az.autosize_for_avatar(net, [items_np], IMG_W, IMG_H,
                                 ragged=ragged)
    net.raster_config = cfg
    print(f"autosized caps: k_max={cfg.k_max} max_dup={cfg.max_dup} "
          f"active_tiles={cfg.max_active_tiles} n_chunks={cfg.n_chunks}",
          file=sys.stderr)
    return net, params, items_np


def bench_train():
    import jax
    import jax.numpy as jnp
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random

    net, params, items_np = _setup()

    optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
    state = at.TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))
    lpips_params = init_random(jax.random.PRNGKey(7))

    # --scan N: N steps per dispatch via lax.scan — amortizes per-execute
    # dispatch overhead; math identical to the host loop (equality test:
    # tests/test_training.py::test_train_scan_matches_host_loop).
    scan_n = 0
    if "--scan" in sys.argv:
        i = sys.argv.index("--scan")
        scan_n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8

    kw = dict(loss_weight=dict(l1=1.0, lpips=0.1, offset=0.005),
              lpips_params=lpips_params, patch_size=512,
              img_w=IMG_W, img_h=IMG_H)
    items = {k: jnp.asarray(v) for k, v in items_np.items()}
    rng = jax.random.PRNGKey(0)

    # --batch B: per-chip batch-B step (batched CNN heads + LPIPS, lax.map
    # splat tail, mean grads == B DP devices; avatar_trainer.
    # make_train_step_batched). Aggregate it/s = B items / step.
    batch_n = 0
    if "--batch" in sys.argv:
        i = sys.argv.index("--batch")
        batch_n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 4
    if batch_n:
        from animatablegaussians_tpu.utils import synthetic
        pos, _, _ = synthetic.make_cano_map(map_h=MAP_H)
        batch = synthetic.batch_items(
            [synthetic.make_items(img_w=IMG_W, img_h=IMG_H, seed=i,
                                  cano_pos_map=pos)
             for i in range(batch_n)])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        step = at.make_train_step_batched(net, optimizer, **kw)
        for i in range(WARMUP):
            rngs = jax.random.split(jax.random.fold_in(rng, i), batch_n)
            state, terms = step(state, batch, rngs)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for i in range(ITERS):
            rngs = jax.random.split(jax.random.fold_in(rng, 100 + i),
                                    batch_n)
            state, terms = step(state, batch, rngs)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        it_s = ITERS * batch_n / dt
        n_overflow = int(terms["n_overflow"])
        print(f"batch={batch_n}: {ITERS / dt:.3f} steps/s -> {it_s:.3f} "
              f"items/s; n_overflow={n_overflow}", file=sys.stderr)
        assert n_overflow == 0, (
            f"binning caps dropped {n_overflow} pairs — autosizing failed")
        print(json.dumps({
            "metric": "avatar_train_step",
            "value": round(it_s, 3),
            "unit": "it/s",
            "vs_baseline": round(it_s / A100_BASELINE_IT_S, 3),
        }))
        return

    if scan_n:
        scan = at.make_train_scan(
            at.make_train_step(net, optimizer, jit=False, **kw))
        keys = jax.random.split(rng, scan_n)
        for _ in range(WARMUP):
            state, terms = scan(state, items, keys)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, terms = scan(state, items, keys)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        terms = {k: v[-1] for k, v in terms.items()}
        it_s = ITERS * scan_n / dt
    else:
        step = at.make_train_step(net, optimizer, **kw)
        for i in range(WARMUP):
            state, terms = step(state, items, jax.random.fold_in(rng, i))
        jax.block_until_ready(state.params)

        t0 = time.perf_counter()
        for i in range(ITERS):
            state, terms = step(state, items,
                                jax.random.fold_in(rng, 100 + i))
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        it_s = ITERS / dt
    # binning-cap diagnostic (stderr; stdout carries only the JSON line):
    # (gaussian, tile) pairs dropped by the static caps this step. With the
    # create_from_pcd fixture + two-pass autosized caps this must be 0 —
    # never-drop parity with the CUDA reference's dynamic buffer sizing
    # (ref: cuda_rasterizer/rasterizer_impl.cu:278-309).
    n_overflow = int(terms["n_overflow"])
    print(f"n_overflow={n_overflow} (of {net.n_points} gaussians, "
          f"n_pairs={int(terms.get('n_pairs', -1))})", file=sys.stderr)
    assert n_overflow == 0, (
        f"binning caps dropped {n_overflow} pairs — autosizing failed")
    print(json.dumps({
        "metric": "avatar_train_step",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": round(it_s / A100_BASELINE_IT_S, 3),
    }))


def bench_fps():
    """Novel-pose inference: pose map -> 3x CNN -> skin -> splat, no grads
    (the ref test path, main_avatar.py:525-776; north-star 'render FPS').

    Headline metric is animation-sequence THROUGHPUT: F frames rendered per
    dispatch via ``AvatarNet.render_sequence`` (lax.map), the shape
    testing/animate.py actually runs for its non-moving view settings. The
    per-frame-dispatch latency FPS is also measured and printed to stderr.
    ``--frames N`` overrides F (default 8); ``--single`` makes the
    single-frame latency number the headline instead."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    net, params, items_np = _setup()
    items = {k: jnp.asarray(v) for k, v in items_np.items()}
    bg = jnp.ones((3,), jnp.float32)

    F = (int(sys.argv[sys.argv.index("--frames") + 1])
         if "--frames" in sys.argv else 8)

    @jax.jit
    def render(params, items):
        out = net.render(params, items, bg_color=bg,
                         img_w=IMG_W, img_h=IMG_H)
        return out["rgb_map"], out["mask_map"]

    @jax.jit
    def render_seq(params, items_seq):
        out = net.render_sequence(params, items_seq, bg_color=bg,
                                  img_w=IMG_W, img_h=IMG_H)
        return out["rgb_map"], out["mask_map"]

    # F distinct frames: jitter the camera per frame so no two scan
    # iterations see identical operands (real animation = new pose + view
    # per frame; pose-map synthesis is host-side dataset work in both this
    # repo and the reference)
    rng = np.random.RandomState(0)
    seq_np = {}
    for k, v in items_np.items():
        v = np.asarray(v)
        seq_np[k] = np.broadcast_to(v, (F,) + v.shape).copy()
    for f in range(F):
        seq_np["extr"][f, :3, 3] += 0.01 * rng.randn(3)
    items_seq = {k: jnp.asarray(v) for k, v in seq_np.items()}

    for _ in range(WARMUP):
        jax.block_until_ready(render(params, items))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(render(params, items))
    lat_fps = ITERS / (time.perf_counter() - t0)
    print(f"single-frame-dispatch latency: {lat_fps:.3f} fps",
          file=sys.stderr)

    seq_iters = max(1, ITERS // F)
    jax.block_until_ready(render_seq(params, items_seq))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(seq_iters):
        jax.block_until_ready(render_seq(params, items_seq))
    seq_fps = seq_iters * F / (time.perf_counter() - t0)
    print(f"sequence throughput ({F} frames/dispatch): {seq_fps:.3f} fps",
          file=sys.stderr)

    fps = lat_fps if "--single" in sys.argv else seq_fps
    print(json.dumps({
        "metric": "avatar_render",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / A100_BASELINE_RENDER_FPS, 3),
    }))


def bench_overfit():
    """On-chip learning evidence at the BENCHED configuration (bf16 MXU
    passes, ragged layout, Mosaic kernels, full AvatarReX shapes): overfit
    one fixed frame whose GT comes from a perturbed copy of the net, and
    report the masked-PSNR trajectory. The CPU variant runs at 64^2 in CI
    (tests/test_training.py::test_main_loss_pipeline_overfits_one_frame);
    this is the same pipeline where the official numbers are measured —
    kernel-value gates prove values, this proves training DYNAMICS on the
    hardware. ``--steps N`` (default 300)."""
    import jax
    import jax.numpy as jnp
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random

    net, params, items_np = _setup()
    items = {k: jnp.asarray(v) for k, v in items_np.items()}

    steps = (int(sys.argv[sys.argv.index("--steps") + 1])
             if "--steps" in sys.argv else 300)

    # GT target: perturb the COLOR net broadly plus the (zeroed) position
    # ToRGB weights slightly — visibly different colors + small geometry
    # offsets, while the other-net stays zeroed so scales/opacities keep
    # the create_from_pcd distribution the caps were autosized for.
    rng = jax.random.PRNGKey(11)
    leaves, treedef = jax.tree.flatten(params["color_net"])
    keys = jax.random.split(rng, len(leaves))
    noisy = [l + 0.05 * jax.random.normal(k, l.shape) if l.ndim >= 2 else l
             for l, k in zip(leaves, keys)]
    params_gt = dict(params, color_net=jax.tree.unflatten(treedef, noisy))
    pos_rgbs = []
    kpos = jax.random.PRNGKey(13)
    for p in (params["position_net"]["to_rgbs1"]
              + params["position_net"]["to_rgbs2"]):
        kpos, sub = jax.random.split(kpos)
        w = p["conv"]["weight"]
        pos_rgbs.append(0.02 * jax.random.normal(sub, w.shape))
    pgt_pos = jax.tree.map(lambda x: x, params["position_net"])
    for p, w in zip(pgt_pos["to_rgbs1"] + pgt_pos["to_rgbs2"], pos_rgbs):
        p["conv"]["weight"] = w
    params_gt["position_net"] = pgt_pos

    bg = jnp.ones((3,), jnp.float32)
    render = jax.jit(lambda p: net.render(p, items, bg_color=bg,
                                          img_w=IMG_W, img_h=IMG_H))
    gt = render(params_gt)
    items = dict(items, color_img=gt["rgb_map"],
                 mask_img=(gt["mask_map"] > 0.5).astype(jnp.float32))
    mask3 = items["mask_img"][..., None]

    @jax.jit
    def psnr_of(p):
        out = net.render(p, items, bg_color=bg, img_w=IMG_W, img_h=IMG_H)
        mse = (((out["rgb_map"] - items["color_img"]) ** 2) * mask3).sum() \
            / jnp.maximum(mask3.sum() * 3, 1.0)
        return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))

    optimizer = at.make_optimizer(lr_init=1e-3, iter_num=800_000)
    state = at.TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))
    step = at.make_train_step(
        net, optimizer,
        loss_weight=dict(l1=1.0, mask=0.5, lpips=0.05, offset=0.005),
        lpips_params=init_random(jax.random.PRNGKey(7)),
        patch_size=512, img_w=IMG_W, img_h=IMG_H)

    psnr0 = float(psnr_of(state.params))
    traj = [(0, psnr0)]
    key = jax.random.PRNGKey(5)
    t0 = time.perf_counter()
    for i in range(steps):
        state, terms = step(state, items, jax.random.fold_in(key, i))
        if (i + 1) % max(steps // 6, 1) == 0 or i + 1 == steps:
            traj.append((i + 1, float(psnr_of(state.params))))
            print(f"overfit step {i + 1}: masked PSNR "
                  f"{traj[-1][1]:.2f} dB "
                  f"(n_overflow={int(terms['n_overflow'])})",
                  file=sys.stderr)
    dt = time.perf_counter() - t0
    psnr1 = traj[-1][1]
    print(f"overfit: {psnr0:.2f} -> {psnr1:.2f} dB over {steps} steps "
          f"({steps / dt:.2f} it/s incl. eval)", file=sys.stderr)
    assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)
    print(json.dumps({
        "metric": "avatar_overfit_psnr_gain",
        "value": round(psnr1 - psnr0, 2),
        "unit": "dB",
        "vs_baseline": 1.0,
    }))


def bench_dp():
    """Data-parallel step: aggregate it/s over the visible mesh plus the
    measured per-step DP overhead (pmean + shard_map plumbing + input
    resharding) vs a single-device step at IDENTICAL shapes. On the one
    real TPU chip the mesh degenerates to 1 device (overhead only); on the
    8-virtual-CPU CI mesh it includes the real collective. Feeds the
    BASELINE.md v5p-8 extrapolation with a measured number instead of an
    assumption."""
    import __graft_entry__ as ge
    ge._honor_cpu_request()  # JAX_PLATFORMS=cpu is pinned to axon otherwise
    import jax
    import jax.numpy as jnp

    from animatablegaussians_tpu.parallel import (make_dp_train_step,
                                                  make_mesh, shard_batch)
    from animatablegaussians_tpu.parallel.data_parallel import replicate
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random
    from animatablegaussians_tpu.utils import synthetic
    from animatablegaussians_tpu.utils.jax_cache import \
        enable_compilation_cache
    from animatablegaussians_tpu.models import styleunet as su

    enable_compilation_cache()
    su.set_conv_precision("default")
    n = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:  # full bench scale
        map_h, img_w, img_h, ch = MAP_H, IMG_W, IMG_H, 512
        raster_kw, patch, iters = RASTER_KW, 512, ITERS
    else:       # virtual-CPU mesh: small shapes, the overhead is the point
        map_h, img_w, img_h, ch = 128, 128, 128, 64
        raster_kw, patch, iters = dict(k_max=128, max_dup=8), 64, 3

    net, params, _ = ge._build_avatar(map_h=map_h, img=img_w,
                                      raster_kw=raster_kw, channel_max=ch,
                                      remat=False)
    pos, _, _ = synthetic.make_cano_map(map_h=map_h)
    optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
    lpips_params = init_random(jax.random.PRNGKey(7))
    lw = dict(l1=1.0, lpips=0.1, offset=0.005)
    kw = dict(loss_weight=lw, lpips_params=lpips_params, patch_size=patch,
              img_w=img_w, img_h=img_h)

    # single-device reference step at identical shapes
    step1 = at.make_train_step(net, optimizer, donate=False, **kw)
    items1_np = synthetic.make_items(img_w=img_w, img_h=img_h, seed=0,
                                     cano_pos_map=pos)
    items1 = {k: jnp.asarray(v) for k, v in items1_np.items()}
    state1 = at.TrainState(params, optimizer.init(params),
                           jnp.zeros((), jnp.int32))
    rng = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        state1, _ = step1(state1, items1, jax.random.fold_in(rng, i))
    jax.block_until_ready(state1.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state1, _ = step1(state1, items1, jax.random.fold_in(rng, 99 + i))
    jax.block_until_ready(state1.params)
    t_single = (time.perf_counter() - t0) / iters

    # DP step over the full visible mesh; --scan N composes scan_steps
    # inside the shard_map body (one dispatch per N steps x n devices,
    # parallel.make_dp_train_scan — the v5p-8 production configuration)
    scan_n = 0
    if "--scan" in sys.argv:
        i = sys.argv.index("--scan")
        scan_n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8
    step_ax = at.make_train_step(net, optimizer, axis_name="data", **kw)
    mesh = make_mesh(n)
    batch = synthetic.batch_items(
        [synthetic.make_items(img_w=img_w, img_h=img_h, seed=i,
                              cano_pos_map=pos) for i in range(n)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = replicate(mesh, at.TrainState(params, optimizer.init(params),
                                          jnp.zeros((), jnp.int32)))
    if scan_n:
        from animatablegaussians_tpu.parallel import make_dp_train_scan
        dp_step = make_dp_train_scan(step_ax, mesh)
        batch = shard_batch(mesh, {
            k: jnp.broadcast_to(v[:, None], (n, scan_n) + v.shape[1:])
            for k, v in batch.items()})
        rngs = shard_batch(mesh, jax.random.split(
            jax.random.PRNGKey(3), n * scan_n).reshape(n, scan_n, -1))
    else:
        dp_step = make_dp_train_step(step_ax, mesh)
        batch = shard_batch(mesh, batch)
        rngs = shard_batch(mesh, jax.random.split(jax.random.PRNGKey(3), n))

    for _ in range(WARMUP):
        state, terms = dp_step(state, batch, rngs)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, terms = dp_step(state, batch, rngs)
    jax.block_until_ready(state.params)
    t_dp = (time.perf_counter() - t0) / iters / max(scan_n, 1)

    aggregate = n / t_dp
    print(f"dp: mesh={n}x{jax.default_backend()} step {t_dp * 1e3:.1f} ms "
          f"(single-device {t_single * 1e3:.1f} ms) -> DP overhead "
          f"{(t_dp - t_single) * 1e3:.1f} ms/step "
          f"({(t_dp / t_single - 1) * 100:.1f}%), aggregate "
          f"{aggregate:.3f} it/s", file=sys.stderr)
    print(json.dumps({
        "metric": "avatar_train_step_dp_aggregate",
        "value": round(aggregate, 3),
        "unit": "it/s",
        "vs_baseline": round(aggregate / A100_BASELINE_IT_S, 3),
    }))


if __name__ == "__main__":
    if "--check" in sys.argv:
        # on-hardware correctness gate: pallas == reference blend (fwd+bwd,
        # rect+ragged) with the CURRENT backend's native kernels — run it
        # before capturing any official number (CI only exercises the
        # kernels in interpreter mode, tests/conftest.py). The gate compiles
        # ~20 small programs; without the persistent cache each run pays
        # axon's slow compiler again (~11 min cold vs ~1 min warm measured).
        from animatablegaussians_tpu.utils.jax_cache import \
            enable_compilation_cache
        enable_compilation_cache()
        from animatablegaussians_tpu.tools.verify_tpu import main as check
        sys.exit(check())
    if "--fps" in sys.argv:
        bench_fps()
    elif "--dp" in sys.argv:
        bench_dp()
    elif "--overfit" in sys.argv:
        bench_overfit()
    else:
        bench_train()
