#!/usr/bin/env python
"""SimCLR-with-saccades pretraining driver (TPU-native).

Entry-point rebuild of reference ``Contrastive_Learning.py`` (945 LoC): same
CLI (``python contrastive_learning.py DATA --arch ResNet50 -b 256 -f 10 …``),
same epoch/validate/checkpoint/logging structure — but the per-batch work is
one jitted ``lax.scan`` over fixations on a device mesh instead of the
host-driven DALI↔torch↔NCCL ping-pong (see
:mod:`multimodal_active_ai_tpu.train.simclr_train`).

Batch-size semantics: ``-b`` is the per-data-shard batch (the reference's
per-rank batch); the global batch is ``b × data-axis size`` and the NT-Xent
negatives span the global batch via the on-ICI all-gather, exactly as the
reference's cross-replica concat (``SimCLR/Objective.py:102-114``).
"""

from __future__ import annotations

import math
import os
import sys
from time import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_active_ai_tpu.config import ContrastiveConfig, parse_into
from multimodal_active_ai_tpu.data import (
    HostLoader,
    SyntheticReader,
    list_coco_images,
    list_image_folder,
)
from contextlib import closing

from multimodal_active_ai_tpu.data.prefetch import device_prefetch
from multimodal_active_ai_tpu.models import SimCLRModule
from multimodal_active_ai_tpu.models.conv_bn import (
    convert_stat_fusion_variables,
    is_fused_layout,
)
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    make_global_array,
    per_process_batch,
)
from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train
from multimodal_active_ai_tpu.utils import checkpoint as ckpt
from multimodal_active_ai_tpu.utils.meters import AverageMeter, perf_line, speed_line
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream


def build_reader(cfg: ContrastiveConfig, split: str, shard_id: int, num_shards: int,
                 batch_size: int | None = None):
    """Reader pipes (pipe1/pipe3 equivalents, ``Contrastive_Learning.py:289-409``).

    ``batch_size`` is this process's share of the global batch
    (``global_batch / process_count``); it defaults to ``cfg.batch_size``
    only for single-shard callers.
    """
    bs = batch_size or cfg.batch_size
    if cfg.dataset == "synthetic":
        n = cfg.num_examples or 64 * bs
        if split != "train":
            n = max(n // 10, bs)
        # decorrelate shards: each process must contribute DISTINCT rows of
        # the global batch, like the file readers' contiguous catalog shards
        # labels must live in the classifier's range: DETR/RLS/probe configs
        # carry num_classes (defaulting it to 1000 here fed 1000-way labels
        # to e.g. a --num-classes 4 criterion -> NaN cross-entropy)
        return SyntheticReader(bs, cfg.canvas_size, num_examples=n,
                               num_classes=getattr(cfg, "num_classes", 1000),
                               seed=cfg.seed + (0 if split == "train" else 1)
                               + 7919 * shard_id)
    if cfg.dataset == "mscoco":
        sub = "train2014" if split == "train" else "val2014"
        file_root = os.path.join(cfg.data, "MSCOCO", "cocoapi", "images", sub)
        ann = os.path.join(cfg.data, "MSCOCO", "cocoapi", "annotations",
                           f"instances_{sub}.json")
        if not os.path.isdir(file_root):
            file_root = cfg.data
            ann = None
        files = list_coco_images(file_root, ann)
        labels = None
    else:  # imagenet
        sub = "train" if split == "train" else "val"
        file_root = os.path.join(cfg.data, "ImageNet", "ILSVRC", "Data", "CLS-LOC", sub)
        if not os.path.isdir(file_root):
            file_root = os.path.join(cfg.data, sub) if os.path.isdir(
                os.path.join(cfg.data, sub)) else cfg.data
        files, labels, _ = list_image_folder(file_root)
    return HostLoader(files, labels, batch_size=bs,
                      canvas_size=cfg.canvas_size, shard_id=shard_id,
                      num_shards=num_shards, seed=cfg.seed,
                      num_threads=cfg.workers,
                      cache_dir=getattr(cfg, "canvas_cache", "") or None)


def main(argv=None):
    cfg = parse_into(ContrastiveConfig, argv, prog="Contrastive_Learning")
    if not cfg.data and cfg.dataset != "synthetic":
        raise Exception("error: No data set provided")

    initialize_distributed(verbose=cfg.verbose)
    mesh = (create_hybrid_mesh(verbose=cfg.verbose) if cfg.multislice
            else create_mesh())
    global_batch, local_batch = per_process_batch(cfg.batch_size, mesh)
    proc_shard, num_proc_shards = jax.process_index(), jax.process_count()
    if cfg.verbose:
        print(f"mesh: {dict(mesh.shape)}, global batch {global_batch} "
              f"({local_batch}/process), process {proc_shard}/{num_proc_shards}")

    retina_cfg = retina.RetinaConfig(
        canvas_size=cfg.canvas_size,
        color_aug_prob=cfg.color_augmentation,
        grid_mask_prob=cfg.grid_mask_augmentation,
        gaussian_noise_prob=cfg.gaussian_noise_augmentation,
        brightness=cfg.brightness, contrast=cfg.contrast, hue=cfg.hue,
        saturation=cfg.saturation)

    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    # plain BatchNorm under GSPMD = global-batch stats = SyncBN semantics.
    # --stat-fusion folds the 1x1 convs' BN-statistic production into the
    # convs themselves (models/conv_bn.py; checkpoints use the fused layout,
    # downstream loaders auto-convert).
    if cfg.stat_fusion == "pallas" and jax.device_count() > 1:
        # same policy as the retina's use_pallas gate (ops/retina.py:406):
        # a pallas_call inside a GSPMD-sharded program is not partitioned
        raise SystemExit("--stat-fusion pallas is single-device only; "
                         "use --stat-fusion gram on multi-device meshes")
    model = SimCLRModule(arch=cfg.arch, axis_name=None,
                         norm_kind="bn", dtype=dtype,
                         stat_fusion=cfg.stat_fusion or None)

    # readers (pipe1 = train, pipe3 = val); this process loads its share of
    # the global batch every step (its contiguous catalog shard)
    train_reader = build_reader(cfg, "train", proc_shard, num_proc_shards,
                                batch_size=local_batch)
    val_reader = build_reader(cfg, "val", proc_shard, num_proc_shards,
                              batch_size=local_batch)
    num_examples = getattr(train_reader, "shard_size", None) or (
        train_reader.num_examples if hasattr(train_reader, "num_examples")
        else len(train_reader) * local_batch)

    # num_examples/local_batch = true optimizer steps per epoch; the LR is
    # linear-scaled by the global batch actually trained (Model_Util.py:11-28)
    sched = schedule.simclr_learning_rate(
        cfg.lr, global_batch, num_examples=num_examples,
        batch_size=local_batch, warmup_epochs=cfg.warmup_epochs,
        train_epochs=cfg.epochs, scaling=cfg.lrs)
    tx = optimizers.get_optimizer(cfg.optimizer, sched, cfg.momentum,
                                  cfg.weight_decay)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.ones((2, retina_cfg.glimpse_size, retina_cfg.glimpse_size,
                       retina_cfg.num_channels))
    state = simclr_train.create_train_state(model, tx, rng, sample)

    unroll = (None if cfg.unroll_fixations == 0
              else True if cfg.unroll_fixations < 0
              else cfg.unroll_fixations)
    train_step = simclr_train.make_train_step(
        model, mesh, retina_cfg, cfg.num_fixations, cfg.temperature,
        unroll=unroll)
    eval_step = simclr_train.make_eval_step(model, mesh, retina_cfg, cfg.temperature)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    best_prec1 = 0.0
    total_time = AverageMeter()
    loss_history: list = []
    top1_acc_history: list = []
    top5_acc_history: list = []
    start_epoch = cfg.start_epoch

    ckpt_file = os.path.join(cfg.checkpoint_dir, "checkpoint.msgpack")
    best_file = os.path.join(cfg.checkpoint_dir, "model_best.msgpack")

    if cfg.resume:
        if os.path.isfile(cfg.resume):
            print(f"=> loading checkpoint '{cfg.resume}'")
            payload = ckpt.load_checkpoint(cfg.resume)
            sd = payload["state_dict"]
            # key off the model's ACTUAL layout, not the flag: BasicBlock
            # archs (R18/34) ignore stat_fusion and stay unfused
            want_fused = is_fused_layout(state.params)
            if is_fused_layout(sd["params"]) != want_fused:
                # cross-layout resume: weights/stats convert losslessly;
                # the optimizer moments' tree is layout-shaped, so exact
                # optimizer resume is only possible within one layout
                print("=> checkpoint layout differs from --stat-fusion; "
                      "converting weights (optimizer state starts fresh)")
                sd = convert_stat_fusion_variables(
                    {"params": sd["params"],
                     "batch_stats": sd["batch_stats"]}, to_fused=want_fused)
                opt_state = state.opt_state
            else:
                opt_state = ckpt.restore_like(state.opt_state,
                                              payload["optimizer"])
            state = state.replace(
                params=ckpt.restore_like(state.params, sd["params"]),
                batch_stats=ckpt.restore_like(state.batch_stats,
                                              sd["batch_stats"]),
                opt_state=opt_state,
                step=int(payload["step"]))
            start_epoch = int(payload["epoch"])
            best_prec1 = float(payload["best_prec1"])
            loss_history = list(np.atleast_1d(payload["loss_history"]))
            top1_acc_history = list(np.atleast_1d(payload["top1_acc_history"]))
            top5_acc_history = list(np.atleast_1d(payload["top5_acc_history"]))
            total_time.load_state_dict(payload["total_time"])
            print(f"=> loaded checkpoint '{cfg.resume}' (epoch {start_epoch})")
            print(f"Model best precision saved was {best_prec1}")
        else:
            print(f"=> no checkpoint found at '{cfg.resume}'")

    if cfg.plot_training_history:
        # fixed rebuild of the reference's broken plot path
        # (Model_Util.plot_training_stats vs plot_features_stats name bug)
        from multimodal_active_ai_tpu.utils.plotting import plot_training_stats

        out = plot_training_stats(
            loss_history, top1_acc_history, top5_acc_history,
            out_path=os.path.join(cfg.checkpoint_dir, "training_history.png"))
        if out:
            print(f"training history figure written to {out}")
        print("loss_history:", loss_history)
        print("top1_acc_history:", top1_acc_history)
        print("top5_acc_history:", top5_acc_history)
        hours = int(total_time.sum / 3600)
        minutes = int((total_time.sum % 3600) / 60)
        seconds = int((total_time.sum % 3600) % 60)
        print(f"The total training time was {hours} hours {minutes} minutes "
              f"and {seconds} seconds")
        return

    def put(images):
        return make_global_array(images, batch_sharding)

    saver = ckpt.AsyncCheckpointer()
    epoch = start_epoch - 1
    for epoch in range(start_epoch, cfg.epochs):
        # ---- train (reference train(), Contrastive_Learning.py:577-740) ----
        batch_time = AverageMeter()
        losses = AverageMeter()
        nbatches = len(train_reader)
        end = time()
        step_keys = epoch_key_stream(rng, epoch, nbatches + 1)
        val_keys = epoch_key_stream(rng, 10_000 + epoch, len(val_reader) + 1)
        last_loss = None
        # transfer of batch N+1 overlaps the device step on batch N
        # (DALI prefetch_queue_depth role; --device-prefetch 0 disables)
        # closing(): an early exit (-t break) must shut the transfer thread
        # down, or it keeps consuming train_reader and issuing device_puts
        # concurrently with the validation loop below
        with closing(device_prefetch(iter(train_reader),
                                     lambda b: put(b[0]),
                                     depth=cfg.device_prefetch)) as dev_batches:
            for i, images_dev in enumerate(dev_batches):
                state, metrics = train_step(state, images_dev, step_keys[i])
                last_loss = metrics["losses"]
                if cfg.test and i > 10:
                    break
                if i % cfg.print_freq == 0:
                    loss_val = float(jax.device_get(last_loss)[-1])
                    losses.update(loss_val, global_batch)
                    jax.block_until_ready(state.params)
                    batch_time.update((time() - end) / cfg.print_freq)
                    end = time()
                    if jax.process_index() == 0:
                        print(speed_line(epoch, i, nbatches, batch_time,
                                         losses, global_batch))
        loss_history.append(losses.avg)
        total_time.update(batch_time.avg)
        if cfg.verbose and hasattr(train_reader, "stats_line"):
            print(train_reader.stats_line())
        train_reader.reset()

        # ---- validate (reference validate(), :751-904) ----
        # -t still validates and checkpoints within the single epoch (the
        # reference breaks before validate, Contrastive_Learning.py:510-511;
        # we keep the smoke path exercising validate/save/resume end to end)
        top1 = AverageMeter()
        top5 = AverageMeter()
        for i, (images, _labels) in enumerate(iter(val_reader)):
            m = eval_step(state, put(images), val_keys[i])
            m = jax.device_get(m)
            top1.update(float(m["top1"]), global_batch)
            top5.update(float(m["top5"]), global_batch)
            if cfg.test and i > 10:
                break
        val_reader.reset()
        prec1, prec5 = top1.avg, top5.avg
        top1_acc_history.append(prec1)
        top5_acc_history.append(prec5)

        if jax.process_index() == 0:
            print(f"From validation we have prec1 is {prec1} while best_prec1 "
                  f"is {best_prec1}")
            is_best = prec1 > best_prec1
            best_prec1 = max(prec1, best_prec1)
            # non-blocking: serialization + write happen on a background
            # thread while the next epoch trains (the reference blocks the
            # epoch boundary on torch.save, Contrastive_Learning.py:517-530)
            saver.save({
                "epoch": epoch + 1,
                "step": int(state.step),
                "state_dict": {"params": jax.device_get(state.params),
                               "batch_stats": jax.device_get(state.batch_stats)},
                "best_prec1": best_prec1,
                "optimizer": jax.device_get(state.opt_state),
                "loss_history": np.asarray(loss_history, np.float64),
                "top1_acc_history": np.asarray(top1_acc_history, np.float64),
                "top5_acc_history": np.asarray(top5_acc_history, np.float64),
                "total_time": total_time.state_dict(),
            }, is_best, filename=ckpt_file, best_filename=best_file)
            print(perf_line(prec1, prec5, best_prec1, global_batch, total_time.avg))
        if cfg.test:
            break
    saver.wait()   # the last epoch's save must be on disk before we return

    if cfg.export_torch and jax.process_index() == 0:
        # the export half of the checkpoint contract: a model pretrained
        # here becomes consumable by the reference stack
        # (Representation_Evaluation.py:405-422 loads this layout)
        ex = {"params": jax.device_get(state.params),
              "batch_stats": jax.device_get(state.batch_stats)}
        if cfg.stat_fusion:
            # the torch contract speaks the unfused layout
            ex = convert_stat_fusion_variables(ex, to_fused=False)
        sd = ckpt.export_torch_simclr_state_dict(
            ex["params"], ex["batch_stats"])
        ckpt.save_torch_checkpoint(
            sd, cfg.export_torch, epoch=epoch + 1, best_prec1=best_prec1,
            extra={"loss_history": [float(x) for x in loss_history],
                   "top1_acc_history": [float(x) for x in top1_acc_history],
                   "top5_acc_history": [float(x) for x in top5_acc_history],
                   "total_time": total_time.sum})
        print(f"=> exported reference-layout checkpoint to '{cfg.export_torch}'")

    return state


def cli() -> int:
    """Console entry point (pyproject [project.scripts]): discard main's
    returned train state so the process exits 0 on success."""
    main()
    return 0


if __name__ == "__main__":
    main()
