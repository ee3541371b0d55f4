#!/usr/bin/env python
"""Micro-benchmark: BatchNorm statistic reductions at the flagship step's
hot shapes — XLA's mean/var formulation vs the one-pass Pallas kernel
(``ops/pallas_bn.py``).

Per PERF.md measurement rules: every timed call gets a DIFFERENT input (the
axon backend dedupes identical executions), and device time is confirmed
with a profiler trace when ``--trace`` is set.

Usage: python tools/bn_stat_bench.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
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


def main():
    import jax

    # the TPU platform plugin overrides the JAX_PLATFORMS env var; honor an
    # explicit CPU request through jax.config (same dance as bench.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from multimodal_active_ai_tpu.ops import pallas_bn

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    interpret = jax.default_backend() != "tpu"

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

    rng = jax.random.PRNGKey(0)
    print(f"{'shape':>18} {'bytes':>8} | {'xla ms':>8} {'GB/s':>6} | "
          f"{'pallas ms':>9} {'GB/s':>6} | speedup")
    tot_x = tot_p = 0.0
    for n, c in SHAPES:
        nbytes = n * c * (2 if dt == jnp.bfloat16 else 4)
        # distinct inputs per iteration: add a per-iter scalar (cheap,
        # fused) so the backend cannot dedupe
        base = jax.random.normal(rng, (n, c), jnp.float32).astype(dt)
        deltas = jax.device_get(jax.random.normal(rng, (args.iters + 3,)))

        def timed(fn):
            out = fn(base)
            jax.block_until_ready(out)
            t0 = perf_counter()
            for i in range(args.iters):
                out = fn(base + jnp.asarray(deltas[i], dt))
            jax.block_until_ready(out)
            return (perf_counter() - t0) / args.iters

        # the add itself costs a pass; time it alone and subtract
        @jax.jit
        def add_only(x, d):
            return x + d

        t_add = None
        out = add_only(base, jnp.asarray(deltas[-1], dt))
        jax.block_until_ready(out)
        t0 = perf_counter()
        for i in range(args.iters):
            out = add_only(base, jnp.asarray(deltas[i], dt))
        jax.block_until_ready(out)
        t_add = (perf_counter() - t0) / args.iters

        tx = max(timed(lambda x: xla_stats(x)) - t_add, 1e-9)
        tp = max(timed(lambda x: pallas_stats(x)) - t_add, 1e-9)
        gx, gp = nbytes / tx / 1e9, nbytes / tp / 1e9
        tot_x += tx
        tot_p += tp
        print(f"{n:>10}x{c:<7} {nbytes/1e6:7.1f}M | {tx*1e3:8.3f} {gx:6.0f} | "
              f"{tp*1e3:9.3f} {gp:6.0f} | {tx/tp:5.2f}x")
    print(f"total: xla {tot_x*1e3:.2f} ms  pallas {tot_p*1e3:.2f} ms  "
          f"({tot_x/tot_p:.2f}x)   [add-pass baseline subtracted]")


if __name__ == "__main__":
    main()
