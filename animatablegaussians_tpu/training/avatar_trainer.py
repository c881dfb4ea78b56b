"""Avatar training: pretrain + main-phase steps as pure jitted functions.

Functional re-design of the reference trainer (ref: main_avatar.py:37-442):

  * cosine LR with 5% floor over ``iter_num`` steps (ref: main_avatar.py:61-68)
    via an optax schedule;
  * pretrain phase regresses the three CNN heads to the static canonical
    Gaussians with L1 (ref: main_avatar.py:126-164);
  * main phase: random background color, boundary-band masking, L1 + mask +
    LPIPS(512-crop) + offset losses (ref: main_avatar.py:174-246);
  * ``finetune_color`` freezes the position net (ref: main_avatar.py:190-196)
    — implemented as an optax.masked zero-update, keeping one compiled step;
  * the random-patch-after-300k LPIPS crop switch is a traced lax.cond on
    iter_idx (no recompilation at the 300k boundary).

Everything here is a pure function of (state, items, rng) so the same step
runs single-chip or sharded over a mesh (see parallel/data_parallel.py).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from animatablegaussians_tpu.training import losses as L
from animatablegaussians_tpu.training.lpips import lpips as lpips_fn

# material-overflow threshold: dropped (gaussian, tile) pairs as a fraction
# of the frame's true pair count above which a step's gradients count as
# cropped — the step is discarded and the driver re-autosizes (never-drop
# parity with the CUDA reference, rasterizer_impl.cu:281-286)
OVERFLOW_TOL = 0.001


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    iter_idx: jnp.ndarray  # () int32


def cosine_lr(lr_init: float, iter_num: int, alpha: float = 0.05):
    """lr(t) = lr_init * ((cos(pi t/T) + 1)/2 * (1-alpha) + alpha)
    (ref: main_avatar.py:61-68)."""
    def sched(step):
        progress = jnp.minimum(step.astype(jnp.float32) / iter_num, 1.0)
        factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return lr_init * factor
    return sched


def make_optimizer(lr_init: float = 5e-4, iter_num: int = 800_000,
                   finetune_color: bool = False,
                   freeze_labels: Optional[Callable] = None):
    """Adam with the cosine schedule. ``finetune_color`` masks updates to the
    position net (ref: main_avatar.py:190-196). ``freeze_labels`` overrides
    the default param->trainable mapping."""
    adam = optax.adam(learning_rate=cosine_lr(lr_init, iter_num))
    if not finetune_color:
        return adam
    # NOTE: optax.masked passes masked-out grads through as raw updates;
    # multi_transform with set_to_zero is the correct "freeze" semantics.
    if freeze_labels is None:
        def freeze_labels(params):
            return {k: ("freeze" if k == "position_net" else "train")
                    for k in params}
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, freeze_labels)


# ---------------------------------------------------------------------------
# Pretrain phase (ref: main_avatar.py:126-164)
# ---------------------------------------------------------------------------

def make_pretrain_step(avatar_net, optimizer):
    # block-packing pad points (avatar_net.valid_f == 0) carry garbage CNN
    # texels; the regression targets only exist at real masked texels
    vm = avatar_net.valid_f[:, None]
    inv_n = 1.0 / float(avatar_net.n_valid)

    def masked_l1(a, b):
        return (jnp.abs(a - jax.lax.stop_gradient(b)) * vm).sum() \
            * (inv_n / a.shape[-1])

    def loss_fn(params, pose_map):
        g = params["cano_gaussian"]
        positions = avatar_net.get_positions(params, pose_map)
        opacity, scales, rotations = avatar_net.get_others(params, pose_map)
        lp = masked_l1(positions, g.get_xyz)
        lo = masked_l1(opacity, g.get_opacity)
        ls = masked_l1(scales, g.get_scaling)
        lr_ = masked_l1(rotations, g.get_rotation)
        total = lp + lo + ls + lr_
        return total, dict(position=lp, opacity=lo, scale=ls, rotation=lr_,
                           total_loss=total)

    @jax.jit
    def step(state: TrainState, pose_map):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pose_map)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.iter_idx + 1), aux

    return step


# ---------------------------------------------------------------------------
# Main phase (ref: main_avatar.py:166-264)
# ---------------------------------------------------------------------------

def compute_losses(avatar_net, params, items, rng, iter_idx, *,
                   loss_weight: dict, lpips_params=None,
                   random_bg_color: bool = True, patch_size: int = 512,
                   random_patch_after: int = 300_000,
                   img_w: Optional[int] = None, img_h: Optional[int] = None):
    """One example's total loss + per-term diagnostics."""
    rng_bg, rng_net, rng_crop = jax.random.split(rng, 3)
    if random_bg_color:
        bg = jax.random.uniform(rng_bg, (3,))
    else:
        bg = jnp.ones((3,), jnp.float32)

    out = avatar_net.render(params, items, bg_color=bg, training=True,
                            rng=rng_net, img_w=img_w, img_h=img_h)
    image = out["rgb_map"]                               # (H, W, 3)
    offset = out["offset"]

    mask = items["mask_img"].astype(jnp.float32)         # (H, W)
    # boundary band excluded from every pixel loss (ref: main_avatar.py:185-189)
    bnd = 1.0 - items["boundary_mask_img"].astype(jnp.float32)
    gt = jnp.where(mask[..., None] > 0.5, items["color_img"],
                   bg[None, None, :])
    image = image * bnd[..., None] + (1.0 - bnd[..., None]) * bg
    gt = gt * bnd[..., None] + (1.0 - bnd[..., None]) * bg

    total = 0.0
    terms = {}

    w_l1 = float(loss_weight.get("l1", 0.0))
    if w_l1 > 0:
        l1 = jnp.abs(image - gt).mean()
        total += w_l1 * l1
        terms["l1_loss"] = l1

    w_mask = float(loss_weight.get("mask", 0.0))
    if w_mask > 0:
        ml = jnp.abs(out["mask_map"] * bnd - mask * bnd).mean()
        total += w_mask * ml
        terms["mask_loss"] = ml

    w_ssim = float(loss_weight.get("ssim", 0.0))
    if w_ssim > 0:  # actor08-style config (ref: configs/actor08/avatar.yaml)
        sl = L.ssim_loss(image, gt)
        total += w_ssim * sl
        terms["ssim_loss"] = sl

    w_lp = float(loss_weight.get("lpips", 0.0))
    if w_lp > 0 and lpips_params is None:
        # never skip silently: a run without the perceptual term trains a
        # visibly different model (ref trains with LPIPS every iteration,
        # main_avatar.py:229-236)
        raise RuntimeError("loss_weight.lpips > 0 but lpips_params is None "
                           "— pass weights or resolve them via "
                           "training.lpips.resolve_lpips_params")
    if w_lp > 0:
        def crop(use_random):
            r = rng_crop if use_random else None
            img_c, gt_c = L.crop_to_mask([image, gt], mask, patch_size, rng=r)
            return img_c, gt_c
        img_c, gt_c = jax.lax.cond(
            iter_idx >= random_patch_after,
            lambda: crop(True), lambda: crop(False))
        lp = lpips_fn(lpips_params, img_c[None], gt_c[None],
                      normalize=True).mean()
        total += w_lp * lp
        terms["lpips_loss"] = lp

    # offset penalty is always on (ref: main_avatar.py:238-241)
    ol = L.offset_loss(offset)
    total += float(loss_weight.get("offset", 0.0)) * ol
    terms["offset_loss"] = ol
    terms["total_loss"] = total
    # diagnostics: (gaussian, tile) pairs dropped by the static binning caps
    # (the CUDA reference sizes its buffers dynamically and never drops,
    # rasterizer_impl.cu:281-286 — nonzero here means caps need raising)
    if "n_overflow" in out:
        terms["n_overflow"] = jax.lax.stop_gradient(
            out["n_overflow"]).astype(jnp.float32)
        terms["n_pairs"] = jax.lax.stop_gradient(
            out["n_pairs"]).astype(jnp.float32)
    return total, terms


def compute_losses_batched(avatar_net, params, batch, rngs, iter_idx, *,
                           loss_weight: dict, lpips_params=None,
                           random_bg_color: bool = True,
                           patch_size: int = 512,
                           random_patch_after: int = 300_000,
                           img_w: Optional[int] = None,
                           img_h: Optional[int] = None):
    """Mean loss over a per-chip batch of B examples (leading (B,) axis on
    every ``batch`` leaf; ``rngs`` is (B, 2) keys — item b uses rngs[b]
    exactly as the single step uses its rng, so B=1 reproduces
    compute_losses bit-for-bit).

    The throughput design transplants ``AvatarNet.render_sequence``'s
    batching (models/avatar.py) to the TRAIN path: the constant style makes
    the three DualStyleUNet heads' modulated weights item-invariant, so the
    B pose maps run as ONE batch-B conv stack forward AND backward (batch-1
    convs at these shapes reach only a few % MXU utilization, BASELINE.md);
    LPIPS runs once on the B stacked crops; only the per-item splat tail
    (binning shapes are per-frame) runs under lax.map. The mean over B
    matches the data-parallel pmean semantics exactly — a per-chip batch of
    B is B more DP devices (parallel/data_parallel.py), and the reference's
    own accumulation is serial batch-1 (ref: main_avatar.py:166-264,
    configs/avatarrex_zzr/avatar.yaml:47 batch_size 1)."""
    if avatar_net.random_style:
        raise NotImplementedError(
            "random_style breaks the shared-weight head batching — "
            "use the batch-1 step")
    B = rngs.shape[0]
    r3 = jax.vmap(lambda k: jax.random.split(k, 3))(rngs)   # (B, 3, 2)
    rng_bg, rng_net, rng_crop = r3[:, 0], r3[:, 1], r3[:, 2]
    if random_bg_color:
        bg = jax.vmap(lambda k: jax.random.uniform(k, (3,)))(rng_bg)
    else:
        bg = jnp.ones((B, 3), jnp.float32)

    pose_maps = batch["smpl_pos_map"][..., :3]              # (B, S, S, 3)
    if avatar_net.with_viewdirs:
        # render() splits its rng once more before the viewdir jitter
        # (models/avatar.py render) — replicate for B=1 bit-exactness
        vd_rng = jax.vmap(lambda k: jax.random.split(k)[1])(rng_net)
        vd_items = {k: batch[k] for k in ("cano2live_jnt_mats", "extr")}
        vmaps = jax.vmap(avatar_net._viewdir_half_map)(vd_items, vd_rng)
        front_vd, back_vd = avatar_net._encode_viewdirs(params, vmaps)
    else:
        front_vd = back_vd = None

    pos_out, other_out, color_out = avatar_net._head_outputs(
        params, pose_maps, front_vd, back_vd, None)

    w_l1 = float(loss_weight.get("l1", 0.0))
    w_mask = float(loss_weight.get("mask", 0.0))
    w_ssim = float(loss_weight.get("ssim", 0.0))
    w_lp = float(loss_weight.get("lpips", 0.0))
    if w_lp > 0 and lpips_params is None:
        raise RuntimeError("loss_weight.lpips > 0 but lpips_params is None")

    def body(xs):
        items, po, oo, co, bgf, kc = xs
        out = avatar_net._finish_render(params, items, po[None], oo[None],
                                        co[None], bgf, img_w, img_h, None,
                                        training=True)
        image = out["rgb_map"]
        mask = items["mask_img"].astype(jnp.float32)
        bnd = 1.0 - items["boundary_mask_img"].astype(jnp.float32)
        gt = jnp.where(mask[..., None] > 0.5, items["color_img"],
                       bgf[None, None, :])
        image = image * bnd[..., None] + (1.0 - bnd[..., None]) * bgf
        gt = gt * bnd[..., None] + (1.0 - bnd[..., None]) * bgf

        terms = {}
        if w_l1 > 0:
            terms["l1_loss"] = jnp.abs(image - gt).mean()
        if w_mask > 0:
            terms["mask_loss"] = jnp.abs(out["mask_map"] * bnd
                                         - mask * bnd).mean()
        if w_ssim > 0:
            terms["ssim_loss"] = L.ssim_loss(image, gt)
        terms["offset_loss"] = L.offset_loss(out["offset"])
        terms["n_overflow"] = jax.lax.stop_gradient(
            out["n_overflow"]).astype(jnp.float32)
        terms["n_pairs"] = jax.lax.stop_gradient(
            out["n_pairs"]).astype(jnp.float32)

        crops = ()
        if w_lp > 0:
            def crop(use_random):
                r = kc if use_random else None
                return tuple(L.crop_to_mask([image, gt], mask, patch_size,
                                            rng=r))
            crops = jax.lax.cond(iter_idx >= random_patch_after,
                                 lambda: crop(True), lambda: crop(False))
        return terms, crops

    # checkpoint the per-item splat tail: lax.map STACKS each item's saved
    # bwd residuals, and the full-res (1500, 2048, 3) image intermediates
    # pad 16x on the 3-channel minor dim in TPU tiled layout — a B=4 stack
    # of them alone is ~2.3 GB of pure padding (compile-reported). Saving
    # only the body inputs and recomputing the splat forward in the
    # backward (~60 ms/item) is what makes B > 1 fit HBM at all. The
    # "binned" save-list keeps the binning products (chunk data + chunk
    # bookkeeping, ~185 MB/item at bench caps — tagged in
    # ops/rasterize/api._splat_chunks_impl) so the recompute re-runs only
    # the cheap preprocess/skin/blend tail, not the pair expansion +
    # 1.6M-slot tile sort that dominates the splat forward.
    terms_b, crops = jax.lax.map(
        jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names("binned")),
        (batch, pos_out, other_out, color_out, bg, rng_crop))

    terms = {k: v.mean() for k, v in terms_b.items()
             if k not in ("n_overflow", "n_pairs")}
    # overflow accounting sums over the batch (the discard threshold is a
    # fraction of total true pairs, matching the single step's semantics)
    terms["n_overflow"] = terms_b["n_overflow"].sum()
    terms["n_pairs"] = terms_b["n_pairs"].sum()

    total = 0.0
    if w_l1 > 0:
        total += w_l1 * terms["l1_loss"]
    if w_mask > 0:
        total += w_mask * terms["mask_loss"]
    if w_ssim > 0:
        total += w_ssim * terms["ssim_loss"]
    if w_lp > 0:
        img_c, gt_c = crops                                  # (B, p, p, 3)
        lp = lpips_fn(lpips_params, img_c, gt_c, normalize=True).mean()
        total += w_lp * lp
        terms["lpips_loss"] = lp
    total += float(loss_weight.get("offset", 0.0)) * terms["offset_loss"]
    terms["total_loss"] = total
    return total, terms


def make_train_step_batched(avatar_net, optimizer, *, loss_weight: dict,
                            lpips_params=None, random_bg_color: bool = True,
                            patch_size: int = 512,
                            random_patch_after: int = 300_000,
                            donate: bool = True,
                            axis_name: Optional[str] = None,
                            img_w: Optional[int] = None,
                            img_h: Optional[int] = None, jit: bool = True):
    """make_train_step over a per-chip batch: ``step(state, batch, rngs)``
    where every ``batch`` leaf has a leading (B,) axis and ``rngs`` is
    (B, 2). One optimizer update per call on the MEAN gradient over B —
    identical semantics to B data-parallel devices (and composes with DP:
    with ``axis_name`` the batch-mean grads are further pmean-ed across the
    mesh, giving global batch B * n_devices)."""

    def loss_fn(params, batch, rngs, iter_idx):
        return compute_losses_batched(
            avatar_net, params, batch, rngs, iter_idx,
            loss_weight=loss_weight, lpips_params=lpips_params,
            random_bg_color=random_bg_color, patch_size=patch_size,
            random_patch_after=random_patch_after, img_w=img_w, img_h=img_h)

    def step(state: TrainState, batch, rngs):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rngs, state.iter_idx)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            terms = jax.lax.pmean(terms, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.iter_idx + 1)
        if "n_overflow" in terms:
            bad = terms["n_overflow"] > OVERFLOW_TOL * terms["n_pairs"]
            new_state = jax.tree.map(
                lambda new, old: jnp.where(bad, old, new), new_state, state)
        return new_state, terms

    if axis_name is not None or not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step(avatar_net, optimizer, *, loss_weight: dict,
                    lpips_params=None, random_bg_color: bool = True,
                    patch_size: int = 512, random_patch_after: int = 300_000,
                    donate: bool = True, axis_name: Optional[str] = None,
                    img_w: Optional[int] = None, img_h: Optional[int] = None,
                    jit: bool = True):
    """Build the jitted single-example train step. With ``axis_name`` the
    gradients are pmean-ed across that mesh axis before the update (the
    data-parallel path; the reference has no equivalent, SURVEY.md §2.9).
    ``jit=False`` returns the raw step for callers that compose it further
    (e.g. make_train_scan)."""

    def loss_fn(params, items, rng, iter_idx):
        return compute_losses(
            avatar_net, params, items, rng, iter_idx,
            loss_weight=loss_weight, lpips_params=lpips_params,
            random_bg_color=random_bg_color, patch_size=patch_size,
            random_patch_after=random_patch_after, img_w=img_w, img_h=img_h)

    def step(state: TrainState, items, rng):
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, items, rng, state.iter_idx)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            terms = jax.lax.pmean(terms, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.iter_idx + 1)
        if "n_overflow" in terms:
            # Never train on cropped gradients: if the static binning caps
            # materially overflowed (the CUDA reference can't, it sizes
            # buffers per frame — rasterizer_impl.cu:278-309), discard the
            # whole update (params, adam moments, iter) so the driver can
            # re-autosize, recompile, and re-run this item losslessly
            # (training/driver.py overflow self-healing). Never taken in
            # normal operation — autosize covers the workload with margin.
            bad = terms["n_overflow"] > OVERFLOW_TOL * terms["n_pairs"]
            new_state = jax.tree.map(
                lambda new, old: jnp.where(bad, old, new), new_state, state)
        return new_state, terms

    if axis_name is not None or not jit:
        return step  # caller wraps in shard_map/jit/scan
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_scan(step_fn):
    """Sequential train steps as ONE compiled program via lax.scan (same
    items every step; rngs (n, 2) carries one key per step). Identical math
    to calling the step in a host loop — iter_idx lives in TrainState so
    schedules and the random-patch switch advance normally — but the host
    dispatches once per n steps, which matters when per-execute dispatch
    overhead is material (axon remote-execute round trips measured at the
    ms scale). ``step_fn`` must be the raw step (make_train_step(...,
    jit=False)). Returns terms stacked along a leading (n,) axis."""
    def multi(state, items, rngs):
        def body(s, k):
            return step_fn(s, items, k)
        return jax.lax.scan(body, state, rngs)
    return jax.jit(multi, donate_argnums=(0,))


def make_train_scan_batched(step_fn):
    """make_train_scan where each step consumes its OWN example: every leaf
    of ``batch`` carries a leading (n,) loader-batch axis and step i trains
    on slice i with rngs[i] — the production multi-step path
    (training/driver.py scan_steps). Same equality guarantee as
    make_train_scan (tests/test_training.py)."""
    def multi(state, batch, rngs):
        def body(s, xk):
            items, k = xk
            return step_fn(s, items, k)
        return jax.lax.scan(body, state, (batch, rngs))
    return jax.jit(multi, donate_argnums=(0,))
