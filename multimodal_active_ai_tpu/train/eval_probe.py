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
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import data_parallel_jit
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


def extract_features(encoder_model, enc_variables, images, key,
                     retina_cfg: retina.RetinaConfig, num_fixations: int):
    """Concatenated frozen features of ``num_fixations`` random glimpses.

    Equivalent of the feature-collection loop at
    ``Representation_Evaluation.py:622-654`` (labeled retina: random
    fixation, zero rotation; encoder in eval mode). Returns (B, F·C·16).

    TPU-first formulation: all F fixations run as ONE retina invocation
    over the view-major ``(F·B)`` parameter stack
    (:func:`retina.apply_retina_views`) and ONE ``F·B``-batch encoder
    forward — the encoder is frozen (eval mode), so batching across the
    fixation axis is exact. The earlier ``lax.map`` (scan) formulation
    spent 24.8% of the caption-probe step in carry/stacking copies
    (810 copies/10 steps profiled on TPU — PERF.md round 5); this form has
    no scan and feeds the MXU ``F×`` larger convolutions.
    """
    batch = images.shape[0]
    src = images.shape[1]
    keys = jax.random.split(key, num_fixations)

    if retina_cfg.mode == "matmul":
        pyramid = retina.build_pyramid(images, retina_cfg)
        per_view = [retina.sample_labeled_params(k, batch, src) for k in keys]
        params = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *per_view)
        glimpses = retina.apply_retina_views(pyramid, params, keys,
                                             retina_cfg, photometric=False)
        feats = encoder_model.apply(enc_variables, glimpses, train=False,
                                    method=type(encoder_model).features)
        feats = feats.reshape(num_fixations, batch, -1)   # view-major stack
    else:
        def one_fixation(k):
            p = retina.sample_labeled_params(k, batch, src)
            g = retina.apply_retina(images, p, k, retina_cfg,
                                    photometric=False)
            f = encoder_model.apply(enc_variables, g, train=False,
                                    method=type(encoder_model).features)
            return f.reshape(batch, -1)

        feats = jnp.stack([one_fixation(k) for k in keys])   # (F, B, C*16)
    return jnp.transpose(feats, (1, 0, 2)).reshape(batch, -1)


def _softmax_ce(logits, labels):
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=-1))


def make_probe_train_step(encoder_model, probe_model, mesh,
                          retina_cfg: retina.RetinaConfig, num_fixations: int):
    """``train_classifier`` equivalent (``Representation_Evaluation.py:598-712``).

    GSPMD data parallelism (see ``parallel.mesh.data_parallel_jit``)."""

    def step(probe_state: TrainState, enc_variables, images, labels, key):
        feats = extract_features(encoder_model, enc_variables, images, key,
                                 retina_cfg, num_fixations)
        feats = jax.lax.stop_gradient(feats)

        def loss_fn(params):
            logits = probe_model.apply({"params": params}, feats)
            return _softmax_ce(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            probe_state.params)
        probe_state = probe_state.apply_gradients(grads=grads)
        return probe_state, {"loss": loss}

    return data_parallel_jit(step, mesh, batch_args=(2, 3),
                             donate_argnums=(0,), num_outputs=2)


def make_probe_eval_step(encoder_model, probe_model, mesh,
                         retina_cfg: retina.RetinaConfig, num_fixations: int):
    """``val_classifier`` equivalent (``Representation_Evaluation.py:729-833``)."""

    def step(probe_state: TrainState, enc_variables, images, labels, key):
        feats = extract_features(encoder_model, enc_variables, images, key,
                                 retina_cfg, num_fixations)
        logits = probe_model.apply({"params": probe_state.params}, feats)
        loss = _softmax_ce(logits, labels)
        top1 = top_k_accuracy(logits, labels, 1)
        top5 = top_k_accuracy(logits, labels, 5)
        return {"loss": loss, "top1": top1, "top5": top5}

    return data_parallel_jit(step, mesh, batch_args=(2, 3))
