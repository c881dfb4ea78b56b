"""Generic training loop: dataset iteration, logging, checkpoint cadence.

Functional counterpart of the reference BaseTrainer (ref: base_trainer.py:
22-258). The torch version owns mutable nets/optimizer dicts and calls
.backward()/.step(); here the subclass (or caller) supplies a pure jitted
``step_fn(state, items, rng) -> (state, loss_terms)`` and this class owns
only the host-side orchestration: epochs, shuffled prefetching, TensorBoard
+ loss.txt scalars with running-mean smoothing, per-epoch/batch checkpoint
cadence and resume.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Callable, Optional, Sequence

import numpy as np
import yaml

import jax

from animatablegaussians_tpu.training import checkpoint as ck


class BaseTrainer:
    def __init__(self, opt: dict, step_fn: Callable, state,
                 dataset, items_fn: Optional[Callable] = None,
                 mini_test_fn: Optional[Callable] = None,
                 seed: int = 31359):
        self.opt = opt
        self.step_fn = step_fn
        self.state = state
        self.dataset = dataset
        self.items_fn = items_fn or (lambda item: item)
        self.mini_test_fn = mini_test_fn
        self.loss_weight = opt["train"]["loss_weight"]
        self.net_ckpt_dir = opt["train"].get("net_ckpt_dir", "./results")
        self.ckpt_interval = opt["train"].get(
            "ckpt_interval", dict(epoch=10, batch=50_000))
        self.eval_interval = opt["train"].get("eval_interval", 1000)
        self.log_interval = 10
        self.iter_idx = 0
        self.epoch_idx = 0
        self.rng = jax.random.PRNGKey(seed)

    # -- checkpoint plumbing (ref: base_trainer.py:38-71) -----------------
    def save_ckpt(self, path: str):
        ck.save_checkpoint(path, self.state,
                           extra=dict(iter_idx=self.iter_idx,
                                      epoch_idx=self.epoch_idx))

    def load_ckpt(self, path: str):
        self.state, meta = ck.load_checkpoint(path, self.state)
        self.iter_idx = int(meta.get("iter_idx", 0))
        self.epoch_idx = int(meta.get("epoch_idx", 0))
        return self.epoch_idx

    # -- main loop (ref: base_trainer.py:131-247) --------------------------
    def train(self, iter_num: int = 10**9, num_epochs: int = 10**9,
              batch_size: int = 1, num_threads: int = 8):
        from animatablegaussians_tpu.data.loader import PrefetchLoader

        os.makedirs(self.net_ckpt_dir, exist_ok=True)
        with open(os.path.join(self.net_ckpt_dir, "config_bk.yaml"),
                  "w") as fp:
            yaml.dump(self.opt, fp)
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(os.path.join(
                self.net_ckpt_dir,
                datetime.now().strftime("%Y_%m_%d_%H_%M_%S")))
        except Exception:
            writer = None
        loss_txt = open(os.path.join(self.net_ckpt_dir, "loss.txt"), "a")

        loader = PrefetchLoader(self.dataset, batch_size=batch_size,
                                shuffle=True, num_threads=num_threads)
        smooth: dict = {}
        t0 = time.time()
        while self.iter_idx < iter_num and self.epoch_idx < num_epochs:
            self.epoch_idx += 1
            for batch in loader:
                item = {k: v[0] for k, v in batch.items()} \
                    if batch_size == 1 else batch
                items = self.items_fn(item)
                self.rng, k = jax.random.split(self.rng)
                self.state, terms = self.step_fn(self.state, items, k)
                self.iter_idx += 1

                if self.iter_idx % self.log_interval == 0:
                    terms = {k2: float(v) for k2, v in terms.items()}
                    for k2, v in terms.items():
                        smooth[k2] = smooth.get(k2, v) * 0.9 + v * 0.1
                        if writer:
                            writer.add_scalar(f"losses/{k2}", smooth[k2],
                                              self.iter_idx)
                    msg = (f"Epoch {self.epoch_idx} iter {self.iter_idx} "
                           f"({time.time() - t0:.1f}s): "
                           + ", ".join(f"{k2}: {v:.4f}"
                                       for k2, v in smooth.items()))
                    print(msg)
                    loss_txt.write(msg + "\n")
                    loss_txt.flush()

                if (self.mini_test_fn is not None
                        and self.iter_idx % self.eval_interval == 0):
                    self.mini_test_fn(self)
                if self.iter_idx % self.ckpt_interval["batch"] == 0:
                    self.save_ckpt(os.path.join(
                        self.net_ckpt_dir, f"batch_{self.iter_idx}"))
                    ck.rotate_checkpoints(self.net_ckpt_dir)
                if self.iter_idx >= iter_num:
                    break
            if self.epoch_idx % self.ckpt_interval.get("epoch", 10) == 0:
                self.save_ckpt(os.path.join(self.net_ckpt_dir,
                                            f"epoch_{self.epoch_idx}"))
            self.save_ckpt(os.path.join(self.net_ckpt_dir, "epoch_latest"))
        loss_txt.close()
