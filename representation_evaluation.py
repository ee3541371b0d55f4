#!/usr/bin/env python
"""Linear-probe representation evaluation driver (TPU-native).

Entry-point rebuild of reference ``Representation_Evaluation.py`` (851 LoC):
loads a pretrained SimCLR checkpoint (this framework's msgpack or the
reference's ``.pth.tar`` — the projector is stripped either way,
``Representation_Evaluation.py:405-422``), freezes the encoder, trains a
logistic-regression head on features of ``num_fixations`` concatenated
random glimpses, and reports top-1/top-5.
"""

from __future__ import annotations

import os
from time import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from contrastive_learning import build_reader
from multimodal_active_ai_tpu.config import EvalConfig, parse_into
from multimodal_active_ai_tpu.models import LogisticRegression, SimCLRModule
from multimodal_active_ai_tpu.models.resnet import encoder_feature_dim
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    make_global_array,
    per_process_batch,
)
from multimodal_active_ai_tpu.train import eval_probe, optimizers, schedule
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils import checkpoint as ckpt
from multimodal_active_ai_tpu.utils.meters import AverageMeter, speed_line
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream, host_key_stream


def load_pretrained_encoder(model, cfg, rng, glimpse_sample):
    """Load the SimCLR checkpoint and return encoder variables.

    Accepts both this framework's msgpack checkpoints and reference
    ``.pth.tar`` files — the cross-stage contract of
    ``Representation_Evaluation.py:405-422`` (load state_dict, ``g`` becomes
    Identity; here downstream consumers simply call ``features()`` which
    bypasses ``g``).
    """
    variables = model.init(rng, glimpse_sample, train=False)
    path = cfg.model
    if not path or not os.path.isfile(path):
        print(f"=> no checkpoint found at '{path}' (using random init)")
        return variables
    print(f"=> loading checkpoint '{path}'")
    if path.endswith((".pth.tar", ".pth", ".pt")):
        params, batch_stats = ckpt.import_torch_checkpoint(
            path, variables["params"], variables["batch_stats"])
    else:
        payload = ckpt.load_checkpoint(path)
        sd = payload["state_dict"]
        from multimodal_active_ai_tpu.models.conv_bn import (
            convert_stat_fusion_variables, is_fused_layout)

        want = is_fused_layout(variables["params"])
        if is_fused_layout(sd["params"]) != want:
            # checkpoints trained with --stat-fusion carry the fused
            # Bottleneck layout; convert to this model's layout on load
            print("=> converting checkpoint stat-fusion layout")
            sd = convert_stat_fusion_variables(
                {"params": sd["params"],
                 "batch_stats": sd["batch_stats"]}, to_fused=want)
        params = ckpt.restore_like(variables["params"], sd["params"])
        batch_stats = ckpt.restore_like(variables["batch_stats"],
                                        sd["batch_stats"])
    print(f"=> loaded pretrained model '{path}'")
    return {"params": params, "batch_stats": batch_stats}


def main(argv=None):
    cfg = parse_into(EvalConfig, argv, prog="Representation_Evaluation")
    initialize_distributed(verbose=cfg.verbose)
    mesh = (create_hybrid_mesh(verbose=cfg.verbose) if cfg.multislice
            else create_mesh())
    global_batch, local_batch = per_process_batch(cfg.batch_size, mesh)

    retina_cfg = retina.RetinaConfig(canvas_size=cfg.canvas_size)
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    encoder = SimCLRModule(arch=cfg.arch, axis_name=None, norm_kind="bn",
                           dtype=dtype)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.ones((2, retina_cfg.glimpse_size, retina_cfg.glimpse_size,
                       retina_cfg.num_channels))
    enc_variables = load_pretrained_encoder(encoder, cfg, rng, sample)

    # classifier: LogisticRegression(C*4*4*num_fixations, num_classes)
    # (Representation_Evaluation.py:427-439; unknown types raise like :437)
    if cfg.classifier not in ("logistic_regression", ""):
        raise Exception(f"error: Unknown classifier {cfg.classifier}")
    feat_dim = encoder_feature_dim(cfg.arch) * 4 * 4 * cfg.num_fixations
    probe = LogisticRegression(num_classes=cfg.num_classes)

    train_reader = build_reader(cfg, "train", jax.process_index(),
                                jax.process_count(), batch_size=local_batch)
    val_reader = build_reader(cfg, "val", jax.process_index(),
                              jax.process_count(), batch_size=local_batch)
    num_examples = getattr(train_reader, "shard_size", None) or getattr(
        train_reader, "num_examples", len(train_reader) * local_batch)

    sched = schedule.simclr_learning_rate(
        cfg.lr, global_batch, num_examples=num_examples,
        batch_size=local_batch, warmup_epochs=cfg.warmup_epochs,
        train_epochs=cfg.epochs, scaling=cfg.lrs)
    tx = optimizers.get_optimizer(cfg.optimizer, sched, cfg.momentum,
                                  cfg.weight_decay)
    probe_vars = probe.init(rng, jnp.ones((2, feat_dim)))
    probe_state = TrainState.create(apply_fn=probe.apply,
                                    params=probe_vars["params"], tx=tx,
                                    batch_stats={})

    train_step = eval_probe.make_probe_train_step(
        encoder, probe, mesh, retina_cfg, cfg.num_fixations)
    eval_step = eval_probe.make_probe_eval_step(
        encoder, probe, mesh, retina_cfg, cfg.num_fixations)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    ckpt_file = os.path.join(cfg.checkpoint_dir, "classifier_checkpoint.msgpack")
    best_file = os.path.join(cfg.checkpoint_dir, "classifier_model_best.msgpack")
    best_prec1 = 0.0
    start_epoch = cfg.start_epoch
    if cfg.resume and os.path.isfile(cfg.resume) and \
            cfg.resume.endswith((".pth.tar", ".pth", ".pt")):
        # reference-trained probe head (classifier_checkpoint.pth.tar,
        # Representation_Evaluation.py:528-533)
        import torch

        payload = torch.load(cfg.resume, map_location="cpu")
        start_epoch = int(payload.get("epoch", 0))
        best_prec1 = float(payload.get("best_prec1", 0.0))
        # resume the LR schedule where the checkpoint left off: optax keeps
        # its step counters (int scalars) inside opt_state, so advance them
        # to the checkpoint's global step. The torch Adam moments are NOT
        # importable into optax and restart — documented divergence (the
        # reference restores them, Representation_Evaluation.py:468-486).
        step0 = start_epoch * len(train_reader)
        opt_state = jax.tree.map(
            lambda x: jnp.asarray(step0, x.dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer)
            and jnp.ndim(x) == 0 else x,
            probe_state.opt_state)
        probe_state = probe_state.replace(
            params=ckpt.import_torch_classifier_state_dict(
                payload.get("state_dict", payload),
                jax.device_get(probe_state.params), cfg.num_fixations),
            opt_state=opt_state, step=step0)
        print(f"=> imported reference classifier '{cfg.resume}' "
              f"(epoch {start_epoch}; optimizer moments restart)")
    elif cfg.resume and os.path.isfile(cfg.resume):
        payload = ckpt.load_checkpoint(cfg.resume)
        probe_state = probe_state.replace(
            params=ckpt.restore_like(probe_state.params,
                                     payload["state_dict"]),
            opt_state=ckpt.restore_like(probe_state.opt_state,
                                        payload["optimizer"]),
            step=int(payload.get("step", 0)))
        start_epoch = int(payload["epoch"])
        best_prec1 = float(payload["best_prec1"])
        print(f"=> resumed classifier from '{cfg.resume}' (epoch {start_epoch})")
    elif cfg.resume:
        print(f"=> no checkpoint found at '{cfg.resume}'")

    def put(x):
        return make_global_array(x, batch_sharding)

    def run_validation(epoch_key):
        top1, top5 = AverageMeter(), AverageMeter()
        vkeys = host_key_stream(epoch_key, len(val_reader) + 1)
        for i, (images, labels) in enumerate(iter(val_reader)):
            m = jax.device_get(eval_step(probe_state, enc_variables,
                                         put(images), put(labels),
                                         vkeys[i]))
            top1.update(float(m["top1"]) * 100, global_batch)
            top5.update(float(m["top5"]) * 100, global_batch)
            if cfg.test and i > 10:
                break
        val_reader.reset()
        return top1.avg, top5.avg

    if cfg.evaluate:
        prec1, prec5 = run_validation(jax.random.fold_in(rng, 999))
        print(f"##Top-1 {prec1}\n##Top-5 {prec5}")
        return prec1, prec5

    total_time = AverageMeter()
    epoch = start_epoch - 1
    for epoch in range(start_epoch, cfg.epochs):
        batch_time, losses = AverageMeter(), AverageMeter()
        end = time()
        step_keys = epoch_key_stream(rng, epoch, len(train_reader) + 1)
        nbatches = len(train_reader)
        for i, (images, labels) in enumerate(iter(train_reader)):
            probe_state, m = train_step(probe_state, enc_variables,
                                        put(images), put(labels),
                                        step_keys[i])
            if cfg.test and i > 10:
                break
            if i % cfg.print_freq == 0:
                losses.update(float(jax.device_get(m["loss"])), global_batch)
                jax.block_until_ready(probe_state.params)
                batch_time.update((time() - end) / cfg.print_freq)
                end = time()
                if jax.process_index() == 0:
                    print(speed_line(epoch, i, nbatches, batch_time, losses,
                                     global_batch))
        train_reader.reset()
        total_time.update(batch_time.avg)

        prec1, prec5 = run_validation(jax.random.fold_in(rng, 50_000 + epoch))
        if jax.process_index() == 0:
            is_best = prec1 > best_prec1
            best_prec1 = max(prec1, best_prec1)
            ckpt.save_checkpoint({
                "epoch": epoch + 1,
                "step": int(probe_state.step),
                "state_dict": jax.device_get(probe_state.params),
                "best_prec1": best_prec1,
                "optimizer": jax.device_get(probe_state.opt_state),
            }, is_best, filename=ckpt_file, best_filename=best_file)
            print(f"##Top-1 {prec1}\n##Top-5 {prec5}\n##Best Top-1 saved "
                  f"{best_prec1}\n##Perf {global_batch / total_time.avg if total_time.avg else float('nan')}")
        if cfg.test:
            break

    if cfg.export_torch and jax.process_index() == 0:
        # reference classifier_checkpoint.pth.tar layout
        # (Representation_Evaluation.py:528-533, MLR 'linear' naming)
        sd = ckpt.export_torch_classifier_state_dict(
            jax.device_get(probe_state.params), cfg.num_fixations)
        ckpt.save_torch_checkpoint(sd, cfg.export_torch, epoch=epoch + 1,
                                   best_prec1=best_prec1)
        print(f"=> exported reference-layout checkpoint to '{cfg.export_torch}'")
    return probe_state


def cli() -> int:
    """Console entry point (pyproject [project.scripts]): discard main's
    returned train state so the process exits 0 on success."""
    main()
    return 0


if __name__ == "__main__":
    main()
