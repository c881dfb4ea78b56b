"""Quickstart: render a synthetic avatar end-to-end on whatever device JAX
has (TPU if available), and optionally take a few training steps.

    python examples/synthetic_demo.py [--train] [--out demo.png]

No capture data needed: builds a toy canonical body (utils/synthetic.py),
runs pose map -> 3x DualStyleUNet -> LBS skinning -> Pallas tile splat,
and writes a [render | alpha] panel.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="demo.png")
    ap.add_argument("--train", action="store_true",
                    help="also run 5 training steps and report losses")
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from animatablegaussians_tpu.utils.jax_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as ge

    print(f"# devices: {jax.devices()}")
    net, params, items_np = ge._build_avatar(map_h=128, img=args.size)
    items = {k: jnp.asarray(v) for k, v in items_np.items()}

    out = net.render(params, items, bg_color=(1.0, 1.0, 1.0),
                     img_w=args.size, img_h=args.size)
    rgb = np.clip(np.asarray(out["rgb_map"]), 0, 1)
    mask = np.clip(np.asarray(out["mask_map"]), 0, 1)
    print(f"# alpha coverage: {(mask > 0.5).mean():.3f}")

    import imageio.v2 as imageio
    panel = np.concatenate([rgb, np.repeat(mask[..., None], 3, -1)], axis=1)
    imageio.imwrite(args.out, (panel * 255).astype(np.uint8))
    print(f"# wrote {args.out}")

    if args.train:
        from animatablegaussians_tpu.training import avatar_trainer as at
        opt = at.make_optimizer(5e-4, 1000)
        state = at.TrainState(params, opt.init(params),
                              jnp.zeros((), jnp.int32))
        step = at.make_train_step(
            net, opt, loss_weight=dict(l1=1.0, mask=0.1, offset=0.005),
            img_w=args.size, img_h=args.size, donate=False)
        rng = jax.random.PRNGKey(0)
        for i in range(5):
            state, terms = step(state, items, rng)
            print(f"# step {i}: loss {float(terms['total_loss']):.4f}")


if __name__ == "__main__":
    main()
