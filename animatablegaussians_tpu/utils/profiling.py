"""Structured tracing/profiling utilities.

The reference only has commented-out cuda-event timers
(ref: main_avatar.py:167-172, 248-262; base_trainer.py:225-227). Here
tracing is a first-class utility: per-stage wall timers that block on device
completion, plus jax.profiler trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates per-stage wall times; `block=True` waits for device work
    (the TPU analogue of cudaEventSynchronize timing)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None, block: bool = True):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            val = out.get("result", result)
            if block and val is not None:
                jax.block_until_ready(val)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]:.3f}s, "
                         f"mean {self.totals[k] / max(n, 1) * 1e3:.2f}ms "
                         f"over {n} calls")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/agt_trace"):
    """jax.profiler capture around a code region (open with xprof/TB)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2,
            **kw) -> float:
    """Steady-state seconds/call of a jitted fn (blocks each call)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
