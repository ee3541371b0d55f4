#!/usr/bin/env python
"""Benchmark: fused aug + ResNet-50 SimCLR train step throughput.

Measures the flagship path — device-resident uint8 batches through the fused
retina (RRC/rotate/grid-mask/noise/flip/color-twist/4-scale pyramid), SimCLR
ResNet-50 forward, cross-replica NT-Xent, backward, Adam update — as one
jitted step, and reports images/sec/chip, where one "image" is one
aug+fwd+bwd view processed (the BASELINE.md metric; each fixation of the
reference's inner loop is one such view per source image,
``Contrastive_Learning.py:641-700``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 8000 (the BASELINE.json v5e target).
"""

from __future__ import annotations

import json
import os
import sys
from time import perf_counter

import jax
import jax.numpy as jnp


def main():
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.parallel.mesh import DATA_AXIS, create_mesh
    from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train
    from jax.sharding import NamedSharding, PartitionSpec as P

    on_tpu = jax.devices()[0].platform == "tpu"
    n_dev = len(jax.devices())
    # on a single device the explicit-sharding jit is pure overhead; plain
    # jit compiles the identical program (BENCH_FORCE_MESH=1 to override)
    use_mesh = n_dev > 1 or os.environ.get("BENCH_FORCE_MESH")
    mesh = create_mesh() if use_mesh else None
    donate = not os.environ.get("BENCH_NO_DONATE")

    # bench configuration: per-chip batch, flagship encoder
    batch_per_chip = int(os.environ.get("BENCH_BATCH", "128" if on_tpu else "4"))
    num_fixations = int(os.environ.get("BENCH_FIXATIONS", "10" if on_tpu else "2"))
    canvas = int(os.environ.get("BENCH_CANVAS", "640" if on_tpu else "64"))
    arch = os.environ.get("BENCH_ARCH", "ResNet50" if on_tpu else "ResNet18")
    steps = int(os.environ.get("BENCH_STEPS", "10" if on_tpu else "2"))

    cfg = retina.RetinaConfig(canvas_size=canvas) if canvas >= 640 else \
        retina.RetinaConfig(canvas_size=canvas, crop_sizes=(40, 24, 10, 30),
                            supersample=2)
    # plain BatchNorm under GSPMD computes global-batch statistics
    # (SyncBatchNorm semantics); no axis_name — no shard_map
    model = SimCLRModule(arch=arch, axis_name=None, norm_kind="bn",
                         dtype=jnp.bfloat16)
    global_batch = batch_per_chip * (mesh.shape[DATA_AXIS] if mesh else 1)
    sched = schedule.simclr_learning_rate(0.01, global_batch, 1_281_167,
                                          batch_per_chip, 10, 190)
    # the reference driver's default optimizer (Contrastive_Learning.py:138)
    opt_name = os.environ.get("BENCH_OPT", "adam")
    tx = optimizers.get_optimizer(opt_name, sched)
    rng = jax.random.PRNGKey(0)
    sample = jnp.ones((2, cfg.glimpse_size, cfg.glimpse_size, cfg.num_channels))
    state = simclr_train.create_train_state(model, tx, rng, sample)
    step = simclr_train.make_train_step(model, mesh, cfg, num_fixations, 0.05,
                                        donate=donate)

    images = jax.random.randint(rng, (global_batch, canvas, canvas, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)
    if mesh is not None:
        images = jax.device_put(images, NamedSharding(mesh, P(DATA_AXIS)))
    # per-step keys as HOST numpy: indexing a device array per step
    # (keys[i] / fold_in(rng, i)) embeds the index as a constant and
    # triggers a fresh tiny-program compile every step — hundreds of ms
    # of host stall per step on a remote-tunneled device
    step_keys = jax.device_get(jax.random.split(rng, steps + 1))

    # warmup / compile
    state, m = step(state, images, step_keys[0])
    jax.block_until_ready(m["losses"])

    t0 = perf_counter()
    for i in range(steps):
        state, m = step(state, images, step_keys[i + 1])
    jax.block_until_ready(m["losses"])
    dt = perf_counter() - t0

    # one "image" = one aug+fwd+bwd view: num_fixations views per source image
    views = steps * num_fixations * global_batch
    img_s = views / dt
    img_s_chip = img_s / n_dev
    print(json.dumps({
        "metric": "simclr_resnet50_aug_fwd_bwd_images_per_sec_per_chip"
        if arch == "ResNet50" else
        f"simclr_{arch.lower()}_aug_fwd_bwd_images_per_sec_per_chip",
        "value": round(img_s_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s_chip / 8000.0, 4),
    }))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# devices={n_dev} global_batch={global_batch} "
              f"fixations={num_fixations} canvas={canvas} arch={arch} "
              f"steps={steps} wall={dt:.3f}s total_img/s={img_s:.1f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
