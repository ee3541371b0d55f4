#!/usr/bin/env python
"""Micro-benchmark: BatchNorm statistic reductions at the flagship step's
hot shapes — XLA's mean/var formulation vs the one-pass Pallas kernel
(``ops/pallas_bn.py``).

Measurement method (PERF.md rules for the remote-tunneled TPU): host wall
timing cannot resolve sub-ms kernels here — per-call dispatch through the
tunnel costs ~14 ms, which is why the first version of this tool printed
nonsense. On TPU each (shape, form) is instead run under its own
``jax.profiler.trace`` over a cycle of PRE-GENERATED DISTINCT inputs (the
backend dedupes identical executions) and the per-iteration DEVICE time is
the sum of leaf-op durations on the device pid. On CPU (no tunnel) plain
wall timing is kept.

Usage: python tools/bn_stat_bench.py [--iters 10] [--distinct 4]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from time import perf_counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the surgery ResNet-50 BN shapes at batch 128 (N = B*H*W, C), with the
# per-step pass multiplicity (fwd stat passes per fixation; layer1 has 3
# bottlenecks x {64,64,256}, etc.)
SHAPES = [
    (128 * 30 * 30, 64),     # stem + layer1 1x1/3x3 outputs
    (128 * 30 * 30, 256),    # layer1 expansions
    (128 * 15 * 15, 128),    # layer2 narrow
    (128 * 15 * 15, 512),    # layer2 expansions
    (128 * 8 * 8, 256),      # layer3 narrow
    (128 * 8 * 8, 1024),     # layer3 expansions
    (128 * 4 * 4, 512),      # layer4 narrow
    (128 * 4 * 4, 2048),     # layer4 expansions
]

def _trace_device_us(trace_dir: str) -> float:
    """Sum leaf-op durations (us) on device pids of the newest trace under
    ``trace_dir`` (shared parser: ``utils.profiling.device_leaf_ops``)."""
    from multimodal_active_ai_tpu.utils.profiling import device_leaf_ops

    return sum(dur for _name, dur in device_leaf_ops(trace_dir))


def main():
    import jax

    # the TPU platform plugin overrides the JAX_PLATFORMS env var; honor an
    # explicit CPU request through jax.config (same dance as bench.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from multimodal_active_ai_tpu.ops import pallas_bn

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--distinct", type=int, default=4,
                    help="distinct pre-generated inputs cycled per timing")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    @jax.jit
    def xla_stats(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=0)
        var = jnp.mean(xf * xf, axis=0) - mean * mean
        return mean, var

    @jax.jit
    def flax_form(x):
        # what nn.BatchNorm lowers to (promote + two reductions)
        xf = x.astype(jnp.float32)
        return jnp.mean(xf, 0), jnp.var(xf, 0)

    def pallas_stats(x):
        return pallas_bn.batch_mean_var(x, interpret=interpret)

    pallas_stats = jax.jit(pallas_stats)

    def device_ms(fn, inputs) -> float:
        """Per-iteration device (TPU) or wall (CPU) time in ms."""
        out = fn(inputs[0])
        jax.block_until_ready(out)
        if not on_tpu:
            t0 = perf_counter()
            for i in range(args.iters):
                out = fn(inputs[i % len(inputs)])
            jax.block_until_ready(out)
            return (perf_counter() - t0) / args.iters * 1e3
        trace_dir = "/tmp/maai_bn_stat_trace"
        shutil.rmtree(trace_dir, ignore_errors=True)
        jax.profiler.start_trace(trace_dir)
        for i in range(args.iters):
            out = fn(inputs[i % len(inputs)])
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        return _trace_device_us(trace_dir) / args.iters / 1e3

    rng = jax.random.PRNGKey(0)
    unit = "device ms" if on_tpu else "wall ms"
    print(f"{'shape':>18} {'bytes':>8} | {'xla ' + unit:>12} {'GB/s':>6} | "
          f"{'pallas':>9} {'GB/s':>6} | speedup")
    tot_x = tot_p = 0.0
    for n, c in SHAPES:
        nbytes = n * c * (2 if dt == jnp.bfloat16 else 4)
        keys = jax.random.split(rng, args.distinct)
        inputs = [jax.random.normal(k, (n, c), jnp.float32).astype(dt)
                  for k in keys]
        jax.block_until_ready(inputs)

        tx = device_ms(xla_stats, inputs)
        tp = device_ms(pallas_stats, inputs)
        gx, gp = nbytes / (tx * 1e-3) / 1e9, nbytes / (tp * 1e-3) / 1e9
        tot_x += tx
        tot_p += tp
        print(f"{n:>10}x{c:<7} {nbytes/1e6:7.1f}M | {tx:12.3f} {gx:6.0f} | "
              f"{tp:9.3f} {gp:6.0f} | {tx/max(tp, 1e-9):5.2f}x")
    print(f"total per pass: xla {tot_x:.3f} ms  pallas {tot_p:.3f} ms  "
          f"({tot_x/max(tot_p, 1e-9):.2f}x)  [{unit}]")


if __name__ == "__main__":
    main()
