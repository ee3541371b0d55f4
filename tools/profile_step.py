#!/usr/bin/env python
"""Profile the flagship SimCLR train step on device and print a per-op
breakdown (device times from a jax.profiler trace — wall timing through the
tunnel dedupes identical executions and lies; see PERF.md measurement rules).

Usage: python tools/profile_step.py [--steps 3]   (runs on the default
backend — the real TPU under axon, CPU with MAAI_PLATFORM=cpu)
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(steps: int, batch: int, fixations: int, canvas: int, arch: str):
    import jax
    import jax.numpy as jnp

    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train

    cfg = retina.RetinaConfig(canvas_size=canvas) if canvas >= 640 else \
        retina.RetinaConfig(canvas_size=canvas, crop_sizes=(40, 24, 10, 30),
                            supersample=2)
    # honor the bench's variant knobs so profiles compare apples-to-apples
    norm_kind = os.environ.get("BENCH_NORM", "bn")
    stat_fusion = os.environ.get("BENCH_STATS") or None
    model = SimCLRModule(arch=arch, axis_name=None, norm_kind=norm_kind,
                         dtype=jnp.bfloat16, stat_fusion=stat_fusion)
    sched = schedule.simclr_learning_rate(0.01, batch, 1_281_167, batch, 10, 190)
    tx = optimizers.get_optimizer("adam", sched)
    rng = jax.random.PRNGKey(0)
    sample = jnp.ones((2, cfg.glimpse_size, cfg.glimpse_size, cfg.num_channels))
    state = simclr_train.create_train_state(model, tx, rng, sample)
    unroll = simclr_train.unroll_from_env(
        os.environ.get("BENCH_UNROLL"),
        on_tpu=jax.default_backend() == "tpu")
    step = simclr_train.make_train_step(model, None, cfg, fixations, 0.05,
                                        unroll=unroll)

    images = jax.random.randint(rng, (batch, canvas, canvas, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)
    keys = jax.device_get(jax.random.split(rng, steps + 1))
    state, m = step(state, images, keys[0])
    jax.block_until_ready(m["losses"])

    trace_dir = "/tmp/maai_profile"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        state, m = step(state, images, keys[i + 1])
    jax.block_until_ready(m["losses"])
    jax.profiler.stop_trace()
    return trace_dir


def summarize(trace_dir: str, steps: int, top: int = 40):
    import re

    # shared parser (device-pid detection + parent-span filtering):
    # utils.profiling.device_leaf_ops, also used by tools/bn_stat_bench.py
    from multimodal_active_ai_tpu.utils.profiling import device_leaf_ops

    try:
        leaf_ops = device_leaf_ops(trace_dir)
    except RuntimeError as exc:
        print(exc)
        return
    suffix = re.compile(r"[.\d]+$")
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for name, dur in leaf_ops:
        by_op[name] += dur
        by_cat[suffix.sub("", name) or name] += dur
        counts[suffix.sub("", name) or name] += 1
        total += dur
    print(f"device leaf-op total: {total / 1e3 / steps:.3f} ms/step "
          f"over {steps} steps")
    print("--- by category (suffix-stripped) ---")
    for name, dur in sorted(by_cat.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3 / steps:9.3f} ms/step  {100 * dur / total:5.1f}%  "
              f"n={counts[name]:5d}  {name[:90]}")
    print("--- top individual ops ---")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3 / steps:9.3f} ms/step  {100 * dur / total:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--fixations", type=int, default=10)
    ap.add_argument("--canvas", type=int, default=640)
    ap.add_argument("--arch", default="ResNet50")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--summarize", default=None, metavar="TRACE_DIR",
                    help="skip running: summarize an existing trace (e.g. "
                         "one captured by bench.py with BENCH_TRACE=<dir> "
                         "for the captions/rls/probe modes)")
    args = ap.parse_args()
    if args.summarize:
        summarize(args.summarize, args.steps, args.top)
        return
    trace_dir = run(args.steps, args.batch, args.fixations, args.canvas,
                    args.arch)
    summarize(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
