"""DETR classifier fine-tuning: glimpse-sequence collection + train/eval steps.

Rebuild of reference ``DETR_Image_Classification.py:538-763``: per batch, a
random number of fixations ``num_fixs ∈ [1, F]`` is drawn, glimpses are
collected at random saccade coordinates through the labeled retina, and the
DETR head is trained with AdamW under separate backbone/head learning rates
(``:385-394``), StepLR drop (``:395``) and global-norm gradient clipping
(``:607-608``). Validation averages logits over queries (``:725``).

TPU-native: the variable-length saccade sequence becomes a static ``F`` with
a pad mask (jit-compatible NestedTensor), collection + forward + backward is
one jitted step, and the frozen backbone layers are frozen through an
``optax.multi_transform`` zero-update partition instead of
``requires_grad_(False)`` (``backbone.py:78-80``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import data_parallel_jit
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


def detr_param_labels(params: dict) -> dict:
    """Partition params: 'head' (transformer & projections, lr), 'backbone'
    (layer2-4 of the encoder, lr_backbone), 'frozen' (stem + layer1, no
    grad) — the ``BackboneBase`` freezing rule (``backbone.py:78-80``) plus
    the AdamW param groups (``DETR_Image_Classification.py:385-394``)."""

    def label(path, _leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "backbone_f":
            if any(str(k).startswith(("layer2", "layer3", "layer4")) for k in keys):
                return "backbone"
            return "frozen"
        return "head"

    return jax.tree_util.tree_map_with_path(label, params)


def make_detr_optimizer(params, lr, lr_backbone, weight_decay, clip_max_norm,
                        lr_drop_epochs: int, steps_per_epoch: int,
                        pretrained_backbone: bool = True):
    """AdamW param groups + StepLR(γ=0.1 @ lr_drop) + grad clip.

    ``pretrained_backbone=False`` (a from-scratch run: ``load_backbone_into_detr``
    found no checkpoint) labels EVERY parameter ``head`` — full ``lr``
    everywhere. The reference's freeze rule (``backbone.py:78-80``) and
    lr_backbone group (``DETR_Image_Classification.py:385-394``) exist to
    protect a *pretrained* encoder; applying them to a random init freezes an
    untrained stem at zero lr and pins the whole model at the uniform-prior
    loss floor (round-4 queue9 postmortem, PARITY.md).
    """

    def stepped(base):
        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return base * jnp.power(0.1, epoch // lr_drop_epochs)
        return sched

    if pretrained_backbone:
        labels = detr_param_labels(params)
    else:
        labels = jax.tree_util.tree_map(lambda _: "head", params)
    tx = optax.multi_transform(
        {
            "head": optax.adamw(stepped(lr), weight_decay=weight_decay),
            "backbone": optax.adamw(stepped(lr_backbone), weight_decay=weight_decay),
            "frozen": optax.set_to_zero(),
        },
        labels)
    if clip_max_norm and clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx


def collect_glimpse_sequence(images, key, retina_cfg: retina.RetinaConfig,
                             num_fixations: int, min_fixations: int = 1,
                             saccades: jnp.ndarray | None = None):
    """Collect ``F`` labeled glimpses at random (or given) saccade coords.

    Equivalent of the collection loop ``DETR_Image_Classification.py:560-584``:
    random ``num_fixs ∈ [min, F]`` becomes a pad mask over a static F.
    Returns (glimpses (B,F,g,g,12), saccades (B,F,2), mask (B,F) True=pad).
    """
    batch = images.shape[0]
    src = images.shape[1]
    k_n, k_s = jax.random.split(key)
    num_fixs = jax.random.randint(k_n, (), min_fixations, num_fixations + 1)
    keys = jax.random.split(k_s, num_fixations)

    def fix_for(k):
        if saccades is None:
            return jax.random.uniform(k, (batch, 2))
        return saccades

    if retina_cfg.mode == "matmul":
        # one retina invocation for ALL F fixations (view-major F·B param
        # stack): no lax.map/scan stacking copies, one sampler-kernel
        # launch — the same formulation extract_features uses (profiled
        # rationale there)
        pyramid = retina.build_pyramid(images, retina_cfg)
        fixs = [fix_for(k) for k in keys]
        per_view = [
            # retina fixation is (y, x); saccade coords are stored (x, y)
            retina.sample_labeled_params(k, batch, src, fix_yx=f[:, ::-1])
            for k, f in zip(keys, fixs)]
        params = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *per_view)
        g = retina.apply_retina_views(pyramid, params, keys, retina_cfg,
                                      photometric=False)
        glimpses = g.reshape(num_fixations, batch, *g.shape[1:])
        sacc = jnp.stack(fixs)                    # (F, B, 2)
    else:
        outs = []
        for k in keys:
            f = fix_for(k)
            p = retina.sample_labeled_params(k, batch, src,
                                             fix_yx=f[:, ::-1])
            outs.append((retina.apply_retina(images, p, k, retina_cfg,
                                             photometric=False), f))
        glimpses = jnp.stack([g for g, _ in outs])
        sacc = jnp.stack([f for _, f in outs])
    glimpses = jnp.moveaxis(glimpses, 0, 1)       # (B, F, g, g, 12)
    sacc = jnp.moveaxis(sacc, 0, 1)               # (B, F, 2)
    mask = jnp.arange(num_fixations)[None, :] >= num_fixs
    mask = jnp.broadcast_to(mask, (batch, num_fixations))
    return glimpses, sacc, mask


def make_detr_train_step(model, criterion, mesh,
                         retina_cfg: retina.RetinaConfig, num_fixations: int):
    """``train_classifier`` equivalent (``DETR_Image_Classification.py:538-654``).

    GSPMD data parallelism: the step is written for the global batch and
    jitted with the batch args sharded (see ``parallel.mesh.data_parallel_jit``).
    """

    def step(state: TrainState, images, labels, key):
        k_collect, k_drop = jax.random.split(key)
        glimpses, saccades, mask = collect_glimpse_sequence(
            images, k_collect, retina_cfg, num_fixations)
        glimpses = jax.lax.stop_gradient(glimpses)

        def loss_fn(params):
            out = model.apply({"params": params,
                               "batch_stats": state.batch_stats},
                              glimpses, saccades, mask, train=True,
                              rngs={"dropout": k_drop})
            losses = criterion(out["pred_logits"], labels)
            return losses["loss_ce"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss_ce": loss, "class_error": losses["class_error"]}

    return data_parallel_jit(step, mesh, batch_args=(1, 2),
                             donate_argnums=(0,), num_outputs=2)


def make_detr_eval_step(model, criterion, mesh,
                        retina_cfg: retina.RetinaConfig, num_fixations: int):
    """``val_classifier`` equivalent: query-mean logits → top-1/top-5
    (``DETR_Image_Classification.py:669-763``)."""

    def step(state: TrainState, images, labels, key):
        glimpses, saccades, mask = collect_glimpse_sequence(
            images, key, retina_cfg, num_fixations)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          glimpses, saccades, mask, train=False)
        logits = jnp.mean(out["pred_logits"], axis=1)  # mean over queries :725
        losses = criterion(out["pred_logits"], labels)
        top1 = top_k_accuracy(logits, labels, 1)
        top5 = top_k_accuracy(logits, labels, 5)
        return {"loss_ce": losses["loss_ce"], "top1": top1, "top5": top5}

    return data_parallel_jit(step, mesh, batch_args=(1, 2))
