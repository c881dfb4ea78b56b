"""CLI entry point: avatar training / testing.

Same interface as the reference driver (ref: main_avatar.py:816-841):

    python main_avatar.py -c configs/avatarrex_zzr/avatar.yaml -m train
    python main_avatar.py -c configs/avatarrex_zzr/avatar.yaml -m test
"""

import argparse

import numpy as np

from animatablegaussians_tpu.config import load_config
from animatablegaussians_tpu.utils.jax_cache import enable_compilation_cache


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("-m", "--mode", type=str, default="train",
                        choices=["train", "test"])
    args = parser.parse_args()

    np.random.seed(31359)  # ref: main_avatar.py:817-818
    enable_compilation_cache()

    opt = load_config(args.config_path).to_dict()
    opt["mode"] = args.mode

    from animatablegaussians_tpu.training.driver import AvatarTrainer
    trainer = AvatarTrainer(opt)
    if args.mode == "train":
        from animatablegaussians_tpu.training import checkpoint as ck
        resume_dir, with_opt = ck.resolve_resume_dir(
            trainer.net_ckpt_dir,
            prev_ckpt=opt["train"].get("prev_ckpt"),
            pretrained_dir=opt["train"].get("pretrained_dir"))
        if resume_dir is None:
            trainer.pretrain()
        else:
            trainer.load_ckpt(resume_dir, load_optm=with_opt)
        trainer.train()
    else:
        from animatablegaussians_tpu.testing.animate import run_test
        run_test(trainer, opt)


if __name__ == "__main__":
    main()
