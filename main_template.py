"""CLI entry point: template (SDF NeRF) geometry training.

Same interface as the reference (ref: main_template.py:146-162):

    python main_template.py -c configs/avatarrex_zzr/template.yaml
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config_path", type=str, required=True)
    ap.add_argument("--max_iters", type=int, default=150_000)
    args = ap.parse_args()

    np.random.seed(31359)

    import jax
    import jax.numpy as jnp

    from animatablegaussians_tpu.config import load_config
    from animatablegaussians_tpu.data import get_dataset_class
    from animatablegaussians_tpu.models.template import TemplateNet
    from animatablegaussians_tpu.models.volume import CanoBlendWeightVolume
    from animatablegaussians_tpu.training import template_trainer as tt
    from animatablegaussians_tpu.training import checkpoint as ck
    from animatablegaussians_tpu.utils.jax_cache import \
        enable_compilation_cache

    enable_compilation_cache()
    opt = load_config(args.config_path).to_dict()
    data_dir = opt["train"]["data"]["data_dir"]

    ds_cls = get_dataset_class(opt["train"].get(
        "dataset", "MvRgbDatasetAvatarReX"))
    dataset = ds_cls(**opt["train"]["data"], mode="nerf")

    volume = CanoBlendWeightVolume(
        os.path.join(data_dir, "cano_weight_volume.npz"))
    net = TemplateNet(opt.get("model", {}), volume)
    params = net.init(jax.random.PRNGKey(31359))

    optimizer = tt.make_template_optimizer(
        opt["train"]["lr"]["network"],
        finetune_hand=opt["train"].get("finetune_hand", False))
    state = tt.TemplateTrainState(params, optimizer.init(params),
                                  jnp.zeros((), jnp.int32))
    step = tt.make_template_train_step(
        net, optimizer, loss_weight=opt["train"]["loss_weight"],
        depth_guided=opt["train"].get("depth_guided_sampling"))

    net_ckpt_dir = opt["train"].get("net_ckpt_dir", "./results_template")
    os.makedirs(net_ckpt_dir, exist_ok=True)
    rng = jax.random.PRNGKey(31359)

    it = 0
    smpl_lbs = jnp.asarray(dataset.smpl_model.data.lbs_weights)
    while it < args.max_iters:
        for i in range(len(dataset)):
            item = dataset[i]
            items = {k: jnp.asarray(v) for k, v in item["nerf_random"].items()}
            items.update(
                cano2live_jnt_mats=jnp.asarray(item["cano2live_jnt_mats"]),
                live_smpl_v=jnp.asarray(item["live_smpl_v"]),
                smpl_faces=jnp.asarray(item["smpl_faces"]),
                smpl_lbs=smpl_lbs,
                cano_smpl_center=jnp.asarray(item["cano_smpl_center"]),
                dist=jnp.asarray(item["nerf_random"]["dist"]))
            rng, k = jax.random.split(rng)
            state, terms = step(state, items, k)
            it = int(state.iter_idx)
            if it % 50 == 0:
                msg = ", ".join(f"{k}: {float(v):.4f}"
                                for k, v in terms.items())
                print(f"Iter {it}: {msg}")
            if it % 10_000 == 0:
                ck.save_checkpoint(
                    os.path.join(net_ckpt_dir, "epoch_latest"), state,
                    extra=dict(iter_idx=it))
            if it >= args.max_iters:
                break

    # final geometry export (ref: main_template.py:96-101)
    item = dataset.getitem(0, training=False)
    items = {k: jnp.asarray(v) for k, v in item.items()
             if isinstance(v, np.ndarray)}
    items["smpl_lbs"] = smpl_lbs
    verts, faces, normals = tt.test_geometry(
        net, state.params, items, space="cano", testing_res=(256, 256, 128))
    tt.save_mesh_as_ply(os.path.join(data_dir, "template.ply"),
                        verts, faces, normals)
    print(f"# Exported template to {os.path.join(data_dir, 'template.ply')}")


if __name__ == "__main__":
    main()
