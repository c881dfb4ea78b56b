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


def host_sync(result) -> float:
    """Force a device->host scalar read — the only reliable completion
    barrier on backends whose block_until_ready can return early (observed
    on the axon TPU backend: graphs measuring 300+ ms wall returned from
    block_until_ready in ~0.03 ms)."""
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(result)
    return float(jnp.sum(leaves[0]))


def time_fn_synced(fn, *args, iters: int = 10, warmup: int = 2,
                   **kw) -> float:
    """`time_fn` with a host-scalar barrier instead of block_until_ready."""
    for _ in range(warmup):
        host_sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    host_sync(out)
    return (time.perf_counter() - t0) / iters


def trace_report(trace_dir: str, jitted_fn=None, fn_args=(),
                 top: int = 25) -> str:
    """Aggregate a jax.profiler trace into a per-op report, mapping XLA
    fusion names to source lines via the compiled HLO metadata.

    Usage:
        with trace("/tmp/t") as d:
            for _ in range(3): host_sync(step(...))
        print(trace_report(d, step, (state, items, rng)))

    Anonymous `fusion.N` entries get resolved through
    ``jitted_fn.lower(*fn_args).compile().as_text()`` when provided (a
    cache hit if the fn already ran).
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        return "no trace files found"
    with gzip.open(files[-1]) as f:
        tr = json.load(f)

    meta = {}
    if jitted_fn is not None:
        hlo = jitted_fn.lower(*fn_args).compile().as_text()
        for m in re.finditer(
                r'%([\w.-]+) = [^\n]*metadata=\{([^}]*)\}', hlo):
            meta[m.group(1)] = m.group(2)

    agg = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if any(s in name for s in ("fusion", "copy", "sort", "scatter",
                                   "gather", "convolution", "custom-call",
                                   "dynamic", "reduce", "dot")):
            agg[name] += e.get("dur", 0)

    lines = []
    for name, dur in agg.most_common(top):
        md = meta.get(name, "")
        src = ""
        m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', md)
        if m:
            src = f"{m.group(1).split('/')[-1]}:{m.group(2)}"
        op = re.search(r'op_name="([^"]*)"', md)
        opn = op.group(1)[-60:] if op else ""
        lines.append(f"{dur / 1e3:9.2f} ms  {name[:36]:36s} {src:28s} {opn}")
    return "\n".join(lines)
