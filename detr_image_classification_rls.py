#!/usr/bin/env python
"""DETR + reinforcement-learned saccades (RLS) driver (TPU-native).

Entry-point rebuild of reference ``DETR_Image_Classification_RLS.py``
(885 LoC): trains the DETR classifier while a DQN learns the saccade policy
— ε-greedy glimpse selection over ``num_fixs ∈ [2, F-1]`` fixations
(``:688,694``), one replay transition per sample (the final consecutive
glimpse pair, ``:757-769``) rewarded by top-1 correctness, 70%-probability
DQN Bellman updates per batch, and target-network sync every
``target_update_freq`` epochs (``:590-592``). ``--dense-replay`` switches
to pushing every consecutive pair (documented divergence).

Improvements over the reference (documented divergences): the RLS reference
has no validation loop and a dead/buggy DQN resume path (undefined
``policy_model`` names, ``:459-461``); this driver validates every epoch
with BOTH all-random saccades (``##Top-1``) and greedy policy rollouts
(``##Policy Top-1``) through the same rollout machinery with shared keys —
a paired, same-glimpse-budget measurement of whether the learned saccades
help (see ``rls_train.make_policy_eval_step``) — and has working DQN
checkpointing.
"""

from __future__ import annotations

import os
from time import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from contrastive_learning import build_reader
from detr_image_classification import load_backbone_into_detr
from multimodal_active_ai_tpu.config import RLSConfig, parse_into
from multimodal_active_ai_tpu.models import build_dqn
from multimodal_active_ai_tpu.models import detr as detr_models
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    local_batch_rows,
    make_global_array,
    per_process_batch,
)
from multimodal_active_ai_tpu.rl import ReplayMemory
from multimodal_active_ai_tpu.train import detr_train, rls_train
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils import checkpoint as ckpt
from multimodal_active_ai_tpu.utils.meters import AverageMeter, speed_line
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream


def main(argv=None):
    cfg = parse_into(RLSConfig, argv, prog="DETR_Image_Classification_RLS")
    initialize_distributed(verbose=cfg.verbose)
    mesh = (create_hybrid_mesh(verbose=cfg.verbose) if cfg.multislice
            else create_mesh())
    global_batch, local_batch = per_process_batch(cfg.batch_size, mesh)

    retina_cfg = retina.RetinaConfig(canvas_size=cfg.canvas_size)
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    model, criterion = detr_models.build(cfg, num_classes=cfg.num_classes,
                                         dtype=dtype)
    rng = jax.random.PRNGKey(cfg.seed)
    g = jnp.ones((2, cfg.num_fixations, retina_cfg.glimpse_size,
                  retina_cfg.glimpse_size, retina_cfg.num_channels))
    s = jnp.full((2, cfg.num_fixations, 2), 0.5)
    variables = model.init(rng, g, s)
    variables, pretrained = load_backbone_into_detr(variables, cfg.backbone_path)

    # policy + target DQNs (RLS :417-427)
    dqn = build_dqn(arch=cfg.dqn, num_of_actions=cfg.num_of_actions,
                    norm_kind="bn", axis_name=None, dtype=dtype)
    glimpse_sample = jnp.ones((2, retina_cfg.glimpse_size,
                               retina_cfg.glimpse_size,
                               retina_cfg.num_channels))
    dqn_vars = dqn.init(jax.random.fold_in(rng, 1), glimpse_sample, train=False)
    import optax

    dqn_tx = optax.rmsprop(cfg.lr)  # RMSprop, RLS :445
    policy_state = TrainState.create(apply_fn=dqn.apply,
                                     params=dqn_vars["params"], tx=dqn_tx,
                                     batch_stats=dqn_vars.get("batch_stats", {}))
    target_vars = rls_train.sync_target(policy_state)

    memory = ReplayMemory(
        cfg.replay_memory_capacity,
        state_shape=(retina_cfg.glimpse_size, retina_cfg.glimpse_size,
                     retina_cfg.num_channels),
        seed=cfg.seed)

    train_reader = build_reader(cfg, "train", jax.process_index(),
                                jax.process_count(), batch_size=local_batch)
    val_reader = build_reader(cfg, "val", jax.process_index(),
                              jax.process_count(), batch_size=local_batch)
    if hasattr(train_reader, "shuffle"):
        train_reader.shuffle = True
    steps_per_epoch = len(train_reader)

    tx = detr_train.make_detr_optimizer(
        variables["params"], cfg.lr, cfg.lr_backbone, cfg.weight_decay,
        cfg.clip_max_norm, cfg.lr_drop, steps_per_epoch,
        pretrained_backbone=pretrained)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=tx, batch_stats=variables.get("batch_stats", {}))

    train_step = rls_train.make_rls_train_step(
        model, criterion, dqn, mesh, retina_cfg, cfg.num_fixations,
        cfg.num_of_actions, cfg.eps_start, cfg.eps_end, cfg.eps_decay)
    dqn_update = rls_train.make_dqn_update_step(
        dqn, cfg.num_of_actions, cfg.gamma, mesh)
    # -dqnb is the GLOBAL Bellman batch: each process samples its share
    # from its own replay memory; GSPMD averages the gradient so policy
    # nets stay identical across processes (unlike the reference's
    # silently-diverging unwrapped-DDP DQNs, RLS :429-442)
    n_data = mesh.shape[DATA_AXIS]
    if cfg.dqn_batch_size % jax.process_count() != 0 or \
            cfg.dqn_batch_size % n_data != 0:
        raise ValueError(
            f"-dqnb {cfg.dqn_batch_size} must divide by both "
            f"{jax.process_count()} processes and the {n_data}-way data "
            f"axis it is sharded over")
    dqn_local_batch = cfg.dqn_batch_size // jax.process_count()
    # the random-saccade control uses the SAME rollout machinery and
    # num_fixs distribution as the policy eval (greedy=False), so the
    # ##Policy Top-1 vs ##Top-1 pair is a same-budget paired comparison —
    # see make_policy_eval_step's docstring
    eval_step = rls_train.make_policy_eval_step(
        model, criterion, dqn, mesh, retina_cfg, cfg.num_fixations,
        cfg.num_of_actions, greedy=False)
    policy_eval_step = rls_train.make_policy_eval_step(
        model, criterion, dqn, mesh, retina_cfg, cfg.num_fixations,
        cfg.num_of_actions)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    ckpt_file = os.path.join(cfg.checkpoint_dir, "detr_classifier_checkpoint.msgpack")
    best_file = os.path.join(cfg.checkpoint_dir, "detr_classifier_model_best.msgpack")
    dqn_file = os.path.join(cfg.checkpoint_dir, "dqn_checkpoint.msgpack")
    best_prec1 = 0.0
    start_epoch = cfg.start_epoch
    if cfg.resume and os.path.isfile(cfg.resume):
        payload = ckpt.load_checkpoint(cfg.resume)
        state = state.replace(
            params=ckpt.restore_like(state.params, payload["state_dict"]["params"]),
            batch_stats=ckpt.restore_like(state.batch_stats,
                                          payload["state_dict"]["batch_stats"]),
            opt_state=ckpt.restore_like(state.opt_state, payload["optimizer"]),
            step=int(payload.get("step", 0)))
        start_epoch = int(payload["epoch"])
        best_prec1 = float(payload["best_prec1"])
        print(f"=> resumed from '{cfg.resume}' (epoch {start_epoch})")
    elif cfg.resume:
        print(f"=> no checkpoint found at '{cfg.resume}'")
    if cfg.dqn_resume and os.path.isfile(cfg.dqn_resume):
        payload = ckpt.load_checkpoint(cfg.dqn_resume)
        policy_state = policy_state.replace(
            params=ckpt.restore_like(policy_state.params,
                                     payload["policy_state_dict"]),
            batch_stats=ckpt.restore_like(
                policy_state.batch_stats,
                payload.get("policy_batch_stats", policy_state.batch_stats)),
            step=int(payload.get("step", 0)))
        target_vars = {"params": ckpt.restore_like(
            policy_state.params, payload["target_state_dict"]),
            "batch_stats": ckpt.restore_like(
                policy_state.batch_stats,
                payload.get("target_batch_stats", policy_state.batch_stats))}
        print(f"=> resumed DQN from '{cfg.dqn_resume}'")

    def put(x):
        return make_global_array(x, batch_sharding)

    host_rng = np.random.RandomState(cfg.seed)
    total_time = AverageMeter()
    for epoch in range(start_epoch, cfg.epochs):
        batch_time, losses, dqn_losses = AverageMeter(), AverageMeter(), AverageMeter()
        end = time()
        step_keys = epoch_key_stream(rng, epoch, len(train_reader) + 1)
        val_keys = epoch_key_stream(rng, 90_000 + epoch, len(val_reader) + 1)
        epoch_dev = jnp.asarray(epoch, jnp.int32)
        for i, (images, labels) in enumerate(iter(train_reader)):
            dqn_variables = {"params": policy_state.params,
                             "batch_stats": policy_state.batch_stats}
            state, m, rollout, reward = train_step(
                state, dqn_variables, put(images), put(labels),
                step_keys[i], epoch_dev)

            # host-side replay push. Each process keeps ITS shard's rows
            # (the per-rank replay of the reference). Reference semantics
            # (default): ONE transition per sample — the final consecutive
            # pair (g_{nf-2}, a_{nf-1}, g_{nf-1}, r), RLS :757-769 indexes
            # num_fixs-2 -> num_fixs-1 only. --dense-replay pushes every
            # consecutive pair instead (documented divergence: richer
            # replay from the same rollout, all pairs sharing the final
            # reward).
            glimpses = local_batch_rows(rollout.glimpses)
            saccades = local_batch_rows(rollout.saccades)
            mask = local_batch_rows(rollout.mask)
            rew = local_batch_rows(reward)
            if cfg.dense_replay:
                for j in range(1, glimpses.shape[1]):
                    valid = ~mask[:, j]
                    if valid.any():
                        memory.push(glimpses[valid, j - 1],
                                    saccades[valid, j],
                                    glimpses[valid, j], rew[valid])
            else:
                # num_fixs is one scalar draw shared by the whole batch
                nf = int(glimpses.shape[1] - mask[0].sum())
                memory.push(glimpses[:, nf - 2], saccades[:, nf - 1],
                            glimpses[:, nf - 1], rew)

            # 70%-probability DQN optimization per batch (RLS :776-788);
            # the shared-seed host_rng replaces the reference's rank-0 MPI
            # bcast of the coin, and replay sizes march in lockstep (same
            # per-step push counts), so every process takes the same branch
            if len(memory) >= dqn_local_batch and host_rng.uniform() < 0.7:
                tr = memory.sample(dqn_local_batch)
                policy_state, dqn_loss = dqn_update(
                    policy_state, target_vars,
                    (put(tr.state), put(tr.action),
                     put(tr.next_state), put(tr.reward)))
                dqn_losses.update(float(jax.device_get(dqn_loss)))

            if cfg.test and i > 10:
                break
            if i % cfg.print_freq == 0:
                losses.update(float(jax.device_get(m["loss_ce"])), global_batch)
                jax.block_until_ready(state.params)
                batch_time.update((time() - end) / cfg.print_freq)
                end = time()
                if jax.process_index() == 0:
                    print(speed_line(epoch, i, steps_per_epoch, batch_time,
                                     losses, global_batch)
                          + f"\tDQN-Loss {dqn_losses.avg:.6f}"
                          + f"\tReward {float(jax.device_get(m['reward_mean'])):.3f}")
        train_reader.reset()
        total_time.update(batch_time.avg)

        # target-net sync every target_update_freq epochs (RLS :590-592)
        if (epoch + 1) % cfg.target_update_freq == 0:
            target_vars = rls_train.sync_target(policy_state)

        # validation (the reference RLS has none): a random-saccade control
        # and a greedy-policy rollout pass over the same batches with the
        # same keys — a paired, same-glimpse-budget measurement of whether
        # the LEARNED saccades help classification
        top1, top5 = AverageMeter(), AverageMeter()
        ptop1, ptop5 = AverageMeter(), AverageMeter()
        dqn_variables = {"params": policy_state.params,
                         "batch_stats": policy_state.batch_stats}
        for i, (images, labels) in enumerate(iter(val_reader)):
            im, lb = put(images), put(labels)
            m = jax.device_get(eval_step(state, dqn_variables, im, lb,
                                         val_keys[i]))
            pm = jax.device_get(policy_eval_step(state, dqn_variables, im,
                                                 lb, val_keys[i]))
            top1.update(float(m["top1"]) * 100, global_batch)
            top5.update(float(m["top5"]) * 100, global_batch)
            ptop1.update(float(pm["top1"]) * 100, global_batch)
            ptop5.update(float(pm["top5"]) * 100, global_batch)
            if cfg.test and i > 10:
                break
        val_reader.reset()
        prec1, prec5 = top1.avg, top5.avg

        if jax.process_index() == 0:
            is_best = prec1 > best_prec1
            best_prec1 = max(prec1, best_prec1)
            ckpt.save_checkpoint({
                "epoch": epoch + 1,
                "step": int(state.step),
                "state_dict": {"params": jax.device_get(state.params),
                               "batch_stats": jax.device_get(state.batch_stats)},
                "best_prec1": best_prec1,
                "optimizer": jax.device_get(state.opt_state),
            }, is_best, filename=ckpt_file, best_filename=best_file)
            ckpt.save_checkpoint({
                "epoch": epoch + 1,
                "step": int(policy_state.step),
                "policy_state_dict": jax.device_get(policy_state.params),
                "policy_batch_stats": jax.device_get(policy_state.batch_stats),
                "target_state_dict": jax.device_get(target_vars["params"]),
                "target_batch_stats": jax.device_get(target_vars["batch_stats"]),
            }, False, filename=dqn_file, best_filename=dqn_file + ".best")
            print(f"##Top-1 {prec1}\n##Top-5 {prec5}\n"
                  f"##Policy Top-1 {ptop1.avg}\n##Policy Top-5 {ptop5.avg}\n"
                  f"##Best Top-1 saved {best_prec1}\n"
                  f"##Perf {global_batch / total_time.avg if total_time.avg else float('nan')}")
        if cfg.test:
            break
    return state, policy_state


def cli() -> int:
    """Console entry point (pyproject [project.scripts]): discard main's
    returned train state so the process exits 0 on success."""
    main()
    return 0


if __name__ == "__main__":
    main()
