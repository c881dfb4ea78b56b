"""Aggregate an existing jax.profiler trace by source file, and dump the
HLO definition of named fusions (for the unattributed heavy hitters).

Usage: python benchmarks/trace_agg.py /tmp/step_trace [fusion.11 ...]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def main():
    trace_dir = sys.argv[1]
    want = [a for a in sys.argv[2:]]

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)

    # rebuild the step to get HLO metadata (compilation-cache hit)
    sys.path.insert(0, ".")
    import jax.numpy as jnp
    import bench
    from animatablegaussians_tpu.training import avatar_trainer as at
    from animatablegaussians_tpu.training.lpips import init_random
    import jax

    net, params, items_np = bench._setup()
    items = {k: jnp.asarray(v) for k, v in items_np.items()}
    optimizer = at.make_optimizer(lr_init=5e-4, iter_num=800_000)
    state = at.TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))
    lpips_params = init_random(jax.random.PRNGKey(7))
    step = at.make_train_step(
        net, optimizer, loss_weight=dict(l1=1.0, lpips=0.1, offset=0.005),
        lpips_params=lpips_params, patch_size=512,
        img_w=bench.IMG_W, img_h=bench.IMG_H)
    hlo = step.lower(state, items, jax.random.PRNGKey(0)).compile().as_text()

    # name -> source file of the fusion root
    meta = {}
    for m in re.finditer(r'%([\w.-]+) = [^\n]*metadata=\{([^}]*)\}', hlo):
        meta[m.group(1)] = m.group(2)

    by_file = collections.Counter()
    by_name = collections.Counter()
    total = 0
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # device lanes only: skip python/host threads by requiring an XLA-ish
        # name
        if not re.match(r"^[\w.-]+$", name):
            continue
        if name.startswith(("Thread", "process", "Steal")):
            continue
        dur = e["dur"]
        md = meta.get(name)
        src = "?"
        if md:
            m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', md)
            if m:
                src = f"{m.group(1).split('/')[-1]}:{m.group(2)}"
        by_file[src] += dur
        by_name[name] += dur
        total += dur

    print(f"total device time {total / 1e3 / 3:.1f} ms/step (3 steps)")
    for src, dur in by_file.most_common(40):
        print(f"{dur / 3e3:9.2f} ms/step  {src}")

    for w in want:
        print(f"\n==== {w} definition ====")
        m = re.search(rf'%{re.escape(w)} =.*?(?=\n  %|\n\}})', hlo,
                      re.DOTALL)
        if m:
            print(m.group(0)[:4000])
        # also the fused computation body if present
        m2 = re.search(rf'%fused_computation[^\n]*{re.escape(w)}[^\n]*\n',
                       hlo)


if __name__ == "__main__":
    main()
