#!/usr/bin/env python
"""Decisive diagnostic for the queue7/queue8 RLS cue-task negative results.

Both TPU attempts (PARITY.md "RLS learned-saccade question on hardware")
pinned CE at ln(4) on the location-cued corpus, while the pre-queue8 CPU
diagnostic — which trained FROM INIT — showed CE falling under all-random
fixations. The one variable the two settings did not share is the
pretrained frozen backbone (`load_backbone_into_detr`: stem+layer1 frozen,
FrozenBatchNorm everywhere, lr_backbone=1e-5 on layer2-4). This script
isolates it: the SAME production `make_rls_train_step` on the SAME corpus,
all-random fixations (eps=1), two arms:

  arm A  pretrained-frozen  (the queue8 TPU configuration)
  arm B  from-init          (the configuration the CPU diagnostic used)

If B's CE falls while A's stays flat, the backbone is the diagnosis and
attempt 3 should train from init / raise lr_backbone / pretrain on the
cued corpus.

Usage (CPU):
  JAX_PLATFORMS=cpu python tools/rls_cue_diag.py BACKBONE DATA \
      [--steps 40] [--batch 16] [--canvas-cache DIR]

Reference context: DETR_Image_Classification_RLS.py:688-788 (the rollout /
update loop whose step implementation this exercises).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the TPU platform plugin overrides the JAX_PLATFORMS env var (it left the
# first run of this script blocked in a mixed platform state); honor an
# explicit cpu request the way tools/bn_stat_bench.py does
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def run_arm(name, cfg, load_backbone, steps):
    from contrastive_learning import build_reader
    from detr_image_classification import load_backbone_into_detr
    from multimodal_active_ai_tpu.models import build_dqn
    from multimodal_active_ai_tpu.models import detr as detr_models
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.parallel.mesh import (
        DATA_AXIS, create_mesh, make_global_array, per_process_batch)
    from multimodal_active_ai_tpu.train import detr_train, rls_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState
    from multimodal_active_ai_tpu.utils.rng import epoch_key_stream

    mesh = create_mesh()
    global_batch, local_batch = per_process_batch(cfg.batch_size, mesh)
    retina_cfg = retina.RetinaConfig(canvas_size=cfg.canvas_size)
    model, criterion = detr_models.build(cfg, num_classes=cfg.num_classes,
                                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(cfg.seed)
    g = jnp.ones((2, cfg.num_fixations, retina_cfg.glimpse_size,
                  retina_cfg.glimpse_size, retina_cfg.num_channels))
    s = jnp.full((2, cfg.num_fixations, 2), 0.5)
    variables = model.init(rng, g, s)
    if load_backbone:
        variables, _ = load_backbone_into_detr(variables, cfg.backbone_path)

    dqn = build_dqn(arch=cfg.dqn, num_of_actions=cfg.num_of_actions,
                    norm_kind="bn", axis_name=None, dtype=jnp.float32)
    glimpse_sample = jnp.ones((2, retina_cfg.glimpse_size,
                               retina_cfg.glimpse_size,
                               retina_cfg.num_channels))
    dqn_vars = dqn.init(jax.random.fold_in(rng, 1), glimpse_sample,
                        train=False)

    reader = build_reader(cfg, "train", 0, 1, batch_size=local_batch)
    if hasattr(reader, "shuffle"):
        reader.shuffle = True
    tx = detr_train.make_detr_optimizer(
        variables["params"], cfg.lr, cfg.lr_backbone, cfg.weight_decay,
        cfg.clip_max_norm, cfg.lr_drop, len(reader),
        pretrained_backbone=load_backbone)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))
    # eps pinned to 1.0: every fixation random — the exploration-phase
    # regime both TPU attempts spent their first epochs in
    train_step = rls_train.make_rls_train_step(
        model, criterion, dqn, mesh, retina_cfg, cfg.num_fixations,
        cfg.num_of_actions, 1.0, 1.0, cfg.eps_decay)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    dqn_variables = {"params": dqn_vars["params"],
                     "batch_stats": dqn_vars.get("batch_stats", {})}

    print(f"== arm {name}: backbone={'pretrained' if load_backbone else 'from-init'}"
          f" b={global_batch} steps={steps} ==", flush=True)
    losses, rewards = [], []
    step = 0
    epoch = 0
    while step < steps:
        keys = epoch_key_stream(rng, epoch, len(reader) + 1)
        for i, (images, labels) in enumerate(iter(reader)):
            state, m, _, _ = train_step(
                state, dqn_variables, make_global_array(images, sharding),
                make_global_array(labels, sharding), keys[i],
                jnp.asarray(0, jnp.int32))
            losses.append(float(jax.device_get(m["loss_ce"])))
            rewards.append(float(jax.device_get(m["reward_mean"])))
            step += 1
            if step % 4 == 0:
                k = min(4, len(losses))
                print(f"  [{name}] step {step:3d} CE {np.mean(losses[-k:]):.4f}"
                      f" reward {np.mean(rewards[-k:]):.3f}", flush=True)
            if step >= steps:
                break
        reader.reset()
        epoch += 1
    first = float(np.mean(losses[:4]))
    last = float(np.mean(losses[-4:]))
    print(f"== arm {name} done: CE {first:.4f} -> {last:.4f}"
          f" (delta {last - first:+.4f}), reward {np.mean(rewards[-8:]):.3f} ==",
          flush=True)
    return first, last


def main(argv=None):
    from multimodal_active_ai_tpu.config import RLSConfig, parse_into

    argv = list(sys.argv[1:] if argv is None else argv)
    steps = 40
    if "--steps" in argv:
        i = argv.index("--steps")
        steps = int(argv[i + 1])
        del argv[i:i + 2]
    # --arm from-init is the time-bounded TPU mode: queue8 itself already
    # proved the pretrained arm flat at 500 updates on this exact task, so
    # the from-init arm is the only new information and each arm costs
    # ~10 min of fresh-process compile through the tunnel
    arm = "both"
    if "--arm" in argv:
        i = argv.index("--arm")
        arm = argv[i + 1]
        assert arm in ("both", "pretrained", "from-init"), arm
        del argv[i:i + 2]
    cfg = parse_into(RLSConfig, argv + [
        "--dataset", "imagenet", "--backbone", "ResNet18",
        "--num-classes", "4", "-f", "3", "--lr", "5e-4", "--gamma", "0.0",
        "--num-of-actions", "10"], prog="rls_cue_diag")
    a = (run_arm("A/pretrained", cfg, True, steps)
         if arm in ("both", "pretrained") else None)
    b = (run_arm("B/from-init", cfg, False, steps)
         if arm in ("both", "from-init") else None)
    if a:
        print(f"VERDICT: pretrained CE delta {a[1] - a[0]:+.4f}")
    if b:
        print(f"VERDICT: from-init CE delta {b[1] - b[0]:+.4f}")
    if a and b:
        if b[1] - b[0] < -0.05 and a[1] - a[0] > -0.05:
            print("VERDICT: backbone confirmed — from-init learns, "
                  "pretrained-frozen does not")
        elif a[1] - a[0] < -0.05:
            print("VERDICT: pretrained arm learns here — backbone NOT the "
                  "explanation; look at batch size / step count / curriculum")
        else:
            print("VERDICT: neither arm learns at this budget — rerun with "
                  "more steps or bigger batch before concluding")
    elif b:
        # single-arm mode: queue8 (500 updates, flat) is the pretrained arm.
        # The decisive signal is CE BELOW the uniform-prior floor ln(C) —
        # a from-init delta alone includes the trivial collapse from random
        # init to the prior (the first TPU run of this arm fell 3.68 → 1.43
        # vs floor 1.386: descending, but not yet evidence of learning).
        floor = float(np.log(cfg.num_classes))
        if b[1] < floor - 0.05:
            print(f"VERDICT: backbone confirmed — from-init crosses below "
                  f"the ln({cfg.num_classes})={floor:.3f} floor where "
                  f"queue8's pretrained-frozen run stayed flat")
        else:
            print(f"VERDICT: from-init reached {b[1]:.4f} vs floor "
                  f"{floor:.3f} — descended to the prior but not below it; "
                  f"inconclusive at this step budget, rerun longer "
                  f"(queue9 leg 1 is the 500-update version)")


if __name__ == "__main__":
    main()
