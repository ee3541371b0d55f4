#!/usr/bin/env python
"""DETR glimpse-sequence classifier driver (TPU-native).

Entry-point rebuild of reference ``DETR_Image_Classification.py`` (780 LoC):
fine-tunes a DETR-style encoder–decoder over sequences of glimpse features
with *random* saccades, on top of a pretrained (frozen-BN) SimCLR encoder.
CLI: ``python detr_image_classification.py BACKBONE_CKPT DATA …``.
"""

from __future__ import annotations

import os
from time import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from contrastive_learning import build_reader
from multimodal_active_ai_tpu.config import DETRConfig, parse_into
from multimodal_active_ai_tpu.models import detr as detr_models
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    make_global_array,
    per_process_batch,
)
from multimodal_active_ai_tpu.train import detr_train
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils import checkpoint as ckpt
from multimodal_active_ai_tpu.utils.meters import AverageMeter, speed_line
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream, host_key_stream


def load_backbone_into_detr(variables, backbone_path):
    """Load the pretrained SimCLR encoder into the DETR backbone slot.

    Cross-stage contract of ``backbone.py:199-213``: load the SimCLR
    ``state_dict``, keep only ``f`` (the projector is never used by DETR),
    with BN statistics feeding the FrozenBatchNorm buffers.

    Returns ``(variables, loaded)``. ``loaded`` tells the caller whether this
    is a pretrained run — a from-scratch run must NOT apply the reference's
    freeze/lr_backbone param groups (they exist to protect a pretrained
    encoder; on a random init they freeze an untrained stem — queue9
    postmortem, PARITY.md). Pass it to
    ``make_detr_optimizer(pretrained_backbone=...)``.
    """
    if not backbone_path or not os.path.isfile(backbone_path):
        print(f"=> no pretrained backbone found at '{backbone_path}' — "
              f"from-scratch run (full lr on all parameters)")
        if "backbone_f" in variables.get("batch_stats", {}):
            # stats-less FrozenBN on a random init is an identity transform
            # whose weight/bias buffers never train — the queue9 failure mode
            print("=> WARNING: from-scratch run with --backbone-norm frozen: "
                  "FrozenBatchNorm carries init statistics (identity, "
                  "untrainable); strongly consider --backbone-norm group "
                  "for from-scratch training (PARITY.md queue9 postmortem)")
        return variables, False
    if "backbone_f" not in variables.get("batch_stats", {}):
        # GroupNorm backbone (--backbone-norm group): no FrozenBN buffers to
        # fill, and the checkpoint's BN statistics have no slot — refuse the
        # silent mismatch instead of loading weights that then miss their norm
        raise ValueError(
            f"--backbone-norm group cannot load the FrozenBN-layout "
            f"checkpoint '{backbone_path}'; use --backbone-norm frozen for "
            f"pretrained backbones")
    print(f"=> loading pretrained backbone '{backbone_path}'")
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    if backbone_path.endswith((".pth.tar", ".pth", ".pt")):
        import torch

        payload = torch.load(backbone_path, map_location="cpu")
        sd = payload.get("state_dict", payload)
        # map through a throwaway SimCLR tree shaped like ours
        from multimodal_active_ai_tpu.utils.checkpoint import (
            import_torch_simclr_state_dict,
        )

        frozen = _frozen_to_bn_layout(stats["backbone_f"])
        f_params, f_stats = import_torch_simclr_state_dict(
            sd, {"f": params["backbone_f"]}, {"f": frozen})
        params["backbone_f"] = f_params["f"]
        stats["backbone_f"] = _bn_to_frozen_layout(f_params["f"], f_stats["f"], sd)
    else:
        payload = ckpt.load_checkpoint(backbone_path)
        sd = payload["state_dict"]
        from multimodal_active_ai_tpu.models.conv_bn import (
            convert_stat_fusion_variables, is_fused_layout)

        if is_fused_layout(sd["params"]):
            # --stat-fusion checkpoints carry the fused Bottleneck layout;
            # the FrozenBatchNorm backbone speaks the unfused one
            print("=> converting checkpoint stat-fusion layout")
            sd = convert_stat_fusion_variables(
                {"params": sd["params"],
                 "batch_stats": sd["batch_stats"]}, to_fused=False)
        src_params = sd["params"]["f"]
        src_stats = sd["batch_stats"]["f"]
        params["backbone_f"] = ckpt.restore_like(params["backbone_f"], src_params)
        stats["backbone_f"] = _merge_bn_into_frozen(
            stats["backbone_f"], src_params, src_stats)
    print(f"=> loaded pretrained backbone '{backbone_path}'")
    return {"params": params, "batch_stats": stats}, True


def _merge_bn_into_frozen(frozen_stats, bn_params, bn_stats):
    """Fill FrozenBatchNorm buffers {weight,bias,mean,var} from a trained
    sync-BN checkpoint's {scale,bias} params + {mean,var} stats
    (FrozenBatchNorm2d semantics, ``backbone.py:35-70``)."""
    import copy

    out = copy.deepcopy(jax.device_get(frozen_stats))

    def walk(dst, pp, ps):
        for k, v in dst.items():
            if isinstance(v, dict) and {"weight", "bias", "mean", "var"} <= set(v.keys()):
                # find matching BN node: frozen 'FrozenBatchNorm_i' <-> params 'BatchNorm_i'
                bn_key = k.replace("FrozenBatchNorm", "BatchNorm")
                p_node = pp.get(bn_key, pp.get(k, {}))
                s_node = ps.get(bn_key, ps.get(k, {}))
                if "scale" in p_node:
                    v["weight"] = np.asarray(p_node["scale"])
                    v["bias"] = np.asarray(p_node["bias"])
                if "mean" in s_node:
                    v["mean"] = np.asarray(s_node["mean"])
                    v["var"] = np.asarray(s_node["var"])
            elif isinstance(v, dict):
                walk(v, pp.get(k, {}), ps.get(k, {}))

    walk(out, jax.device_get(bn_params), jax.device_get(bn_stats))
    return out


def _frozen_to_bn_layout(frozen_stats):
    """Shape a {mean,var}-only BN-stats template from frozen buffers so the
    torch importer can fill it."""
    import copy

    out = {}
    for k, v in frozen_stats.items():
        if isinstance(v, dict) and {"weight", "bias", "mean", "var"} <= set(v.keys()):
            out[k.replace("FrozenBatchNorm", "BatchNorm")] = {
                "mean": np.asarray(v["mean"]), "var": np.asarray(v["var"])}
        elif isinstance(v, dict):
            out[k] = _frozen_to_bn_layout(v)
    return out


def _bn_to_frozen_layout(f_params, f_stats, sd):
    """Rebuild frozen buffers from imported torch params+stats."""
    out = {}
    for k, v in f_stats.items():
        if isinstance(v, dict) and "mean" in v and not isinstance(v["mean"], dict):
            fk = k.replace("BatchNorm", "FrozenBatchNorm")
            p = f_params.get(k, {})
            out[fk] = {"weight": np.asarray(p.get("scale", np.ones_like(v["mean"]))),
                       "bias": np.asarray(p.get("bias", np.zeros_like(v["mean"]))),
                       "mean": np.asarray(v["mean"]), "var": np.asarray(v["var"])}
        elif isinstance(v, dict):
            out[k] = _bn_to_frozen_layout(f_params.get(k, {}), v, sd)
    return out


def main(argv=None):
    cfg = parse_into(DETRConfig, argv, prog="DETR_Image_Classification")
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

    train_reader = build_reader(cfg, "train", jax.process_index(),
                                jax.process_count(), batch_size=local_batch)
    val_reader = build_reader(cfg, "val", jax.process_index(),
                              jax.process_count(), batch_size=local_batch)
    if hasattr(train_reader, "shuffle"):
        train_reader.shuffle = True  # DETR_Image_Classification.py:263
    steps_per_epoch = len(train_reader)

    tx = detr_train.make_detr_optimizer(
        variables["params"], cfg.lr, cfg.lr_backbone, cfg.weight_decay,
        cfg.clip_max_norm, cfg.lr_drop, steps_per_epoch,
        pretrained_backbone=pretrained)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=tx, batch_stats=variables.get("batch_stats", {}))

    train_step = detr_train.make_detr_train_step(
        model, criterion, mesh, retina_cfg, cfg.num_fixations)
    eval_step = detr_train.make_detr_eval_step(
        model, criterion, mesh, retina_cfg, cfg.num_fixations)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    ckpt_file = os.path.join(cfg.checkpoint_dir, "detr_classifier_checkpoint.msgpack")
    best_file = os.path.join(cfg.checkpoint_dir, "detr_classifier_model_best.msgpack")
    best_prec1 = 0.0
    start_epoch = cfg.start_epoch
    if cfg.resume and os.path.isfile(cfg.resume) and \
            cfg.resume.endswith((".pth.tar", ".pth", ".pt")):
        # reference-trained DETR head (detr_classifier_checkpoint.pth.tar,
        # DETR_Image_Classification.py:463-468)
        p, s, payload = ckpt.import_torch_detr_checkpoint(
            cfg.resume, jax.device_get(state.params),
            jax.device_get(state.batch_stats), nheads=cfg.nheads)
        state = state.replace(params=p, batch_stats=s)
        start_epoch = int(payload.get("epoch", 0))
        best_prec1 = float(payload.get("best_prec1", 0.0))
        print(f"=> imported reference DETR checkpoint '{cfg.resume}' "
              f"(epoch {start_epoch})")
    elif cfg.resume and os.path.isfile(cfg.resume):
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

    def put(x):
        return make_global_array(x, batch_sharding)

    def run_validation(epoch_key):
        top1, top5 = AverageMeter(), AverageMeter()
        vkeys = host_key_stream(epoch_key, len(val_reader) + 1)
        for i, (images, labels) in enumerate(iter(val_reader)):
            m = jax.device_get(eval_step(state, put(images), put(labels),
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
        for i, (images, labels) in enumerate(iter(train_reader)):
            state, m = train_step(state, put(images), put(labels),
                                  step_keys[i])
            if cfg.test and i > 10:
                break
            if i % cfg.print_freq == 0:
                losses.update(float(jax.device_get(m["loss_ce"])), global_batch)
                jax.block_until_ready(state.params)
                batch_time.update((time() - end) / cfg.print_freq)
                end = time()
                if jax.process_index() == 0:
                    print(speed_line(epoch, i, steps_per_epoch, batch_time,
                                     losses, global_batch))
        train_reader.reset()
        total_time.update(batch_time.avg)

        prec1, prec5 = run_validation(jax.random.fold_in(rng, 70_000 + epoch))
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
            print(f"##Top-1 {prec1}\n##Top-5 {prec5}\n##Best Top-1 saved "
                  f"{best_prec1}\n##Perf {global_batch / total_time.avg if total_time.avg else float('nan')}")
        if cfg.test:
            break

    if cfg.export_torch and jax.process_index() == 0:
        # reference detr_classifier_checkpoint.pth.tar layout
        # (DETR_Image_Classification.py:463-468, detr_CLA module names)
        sd = ckpt.export_torch_detr_state_dict(
            jax.device_get(state.params), jax.device_get(state.batch_stats))
        ckpt.save_torch_checkpoint(sd, cfg.export_torch, epoch=epoch + 1,
                                   best_prec1=best_prec1)
        print(f"=> exported reference-layout checkpoint to '{cfg.export_torch}'")
    return state


def cli() -> int:
    """Console entry point (pyproject [project.scripts]): discard main's
    returned train state so the process exits 0 on success."""
    main()
    return 0


if __name__ == "__main__":
    main()
