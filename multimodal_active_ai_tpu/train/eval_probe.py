"""Representation evaluation: frozen encoder + linear probe.

Rebuild of reference ``Representation_Evaluation.py`` (851 LoC): the
pretrained SimCLR checkpoint is loaded, the projector replaced by Identity
(``:405-422``), the encoder frozen (eval mode + no_grad feature extraction,
``:603-654``), features of ``num_fixations`` random glimpses are
concatenated (``C·4·4·F`` dims, ``:430-433``) and a logistic-regression head
is trained with cross-entropy, reporting top-1/top-5.

TPU-native: feature extraction over fixations is a ``lax.scan`` of labeled
retina passes fused into the probe's train step; everything is one jit per
batch instead of F pipeline runs + F forwards.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import DATA_AXIS
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


def extract_features(encoder_model, enc_variables, images, key,
                     retina_cfg: retina.RetinaConfig, num_fixations: int):
    """Concatenated frozen features of ``num_fixations`` random glimpses.

    Equivalent of the feature-collection loop at
    ``Representation_Evaluation.py:622-654`` (labeled retina: random
    fixation, zero rotation; encoder in eval mode). Returns (B, F·C·16).
    """
    batch = images.shape[0]
    src = images.shape[1]
    keys = jax.random.split(key, num_fixations)

    def one_fixation(k):
        p = retina.sample_labeled_params(k, batch, src)
        glimpses = retina.apply_retina(images, p, k, retina_cfg,
                                       photometric=False)
        feats = encoder_model.apply(enc_variables, glimpses, train=False,
                                    method=type(encoder_model).features)
        return feats.reshape(batch, -1)

    feats = jax.lax.map(one_fixation, keys)         # (F, B, C*16)
    return jnp.transpose(feats, (1, 0, 2)).reshape(batch, -1)


def _softmax_ce(logits, labels):
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=-1))


def make_probe_train_step(encoder_model, probe_model, mesh,
                          retina_cfg: retina.RetinaConfig, num_fixations: int,
                          axis_name: str | None = DATA_AXIS):
    """``train_classifier`` equivalent (``Representation_Evaluation.py:598-712``)."""

    def step(probe_state: TrainState, enc_variables, images, labels, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        feats = extract_features(encoder_model, enc_variables, images, key,
                                 retina_cfg, num_fixations)
        feats = jax.lax.stop_gradient(feats)

        def loss_fn(params):
            logits = probe_model.apply({"params": params}, feats)
            return _softmax_ce(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            probe_state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        probe_state = probe_state.apply_gradients(grads=grads)
        return probe_state, {"loss": loss}

    if mesh is None or axis_name is None:
        return jax.jit(step, donate_argnums=(0,))
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_probe_eval_step(encoder_model, probe_model, mesh,
                         retina_cfg: retina.RetinaConfig, num_fixations: int,
                         axis_name: str | None = DATA_AXIS):
    """``val_classifier`` equivalent (``Representation_Evaluation.py:729-833``)."""

    def step(probe_state: TrainState, enc_variables, images, labels, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        feats = extract_features(encoder_model, enc_variables, images, key,
                                 retina_cfg, num_fixations)
        logits = probe_model.apply({"params": probe_state.params}, feats)
        loss = _softmax_ce(logits, labels)
        top1 = top_k_accuracy(logits, labels, 1)
        top5 = top_k_accuracy(logits, labels, 5)
        if axis_name is not None:
            loss, top1, top5 = jax.lax.pmean((loss, top1, top5), axis_name)
        return {"loss": loss, "top1": top1, "top5": top5}

    if mesh is None or axis_name is None:
        return jax.jit(step)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)
