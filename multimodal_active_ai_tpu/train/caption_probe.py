"""Multimodal COCO-Captions probe: image–text contrastive evaluation.

Productionizes the reference's multimodal aspiration (prototype notebooks
``COCO Captions Test-checkpoint.ipynb`` — caption loading/pairing — and
``Reinforced Transformer-checkpoint.ipynb`` — glimpse/sentence transformers)
at probe scope: a frozen SimCLR encoder embeds foveated glimpse stacks, a
text tower embeds captions, and the two are aligned with the symmetric
InfoNCE objective — which is exactly the framework's NT-Xent
(:func:`multimodal_active_ai_tpu.objectives.ntxent.contrastive_loss`) with
view-1 = image and view-2 = caption. Reported metrics are image→text and
text→image retrieval top-1/top-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from multimodal_active_ai_tpu.objectives.ntxent import contrastive_loss
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import data_parallel_jit
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


def image_tower(encoder_model, enc_variables, image_head_params, head_model,
                images, key, retina_cfg, num_fixations: int):
    """Frozen glimpse features of F fixations → projection head → embedding."""
    from multimodal_active_ai_tpu.train.eval_probe import extract_features

    feats = extract_features(encoder_model, enc_variables, images, key,
                             retina_cfg, num_fixations)
    return head_model.apply({"params": image_head_params},
                            jax.lax.stop_gradient(feats))


def make_caption_probe_train_step(encoder_model, head_model, text_model, mesh,
                                  retina_cfg: retina.RetinaConfig,
                                  num_fixations: int, temperature: float = 0.05):
    """One step: both towers forward, symmetric InfoNCE, update the image
    head + text tower (encoder stays frozen). GSPMD data parallelism."""

    def step(state: TrainState, enc_variables, images, tokens, key):
        k_img, k_drop = jax.random.split(key)

        def loss_fn(params):
            img_emb = image_tower(encoder_model, enc_variables,
                                  params["image_head"], head_model, images,
                                  k_img, retina_cfg, num_fixations)
            txt_emb = text_model.apply({"params": params["text"]}, tokens,
                                       train=True, rngs={"dropout": k_drop})
            # full differentiable gather: both towers receive gradient
            loss, logits_it, labels = contrastive_loss(
                img_emb, txt_emb, temperature=temperature,
                torch_gather_semantics=False)
            return loss, (logits_it, labels)

        (loss, (logits_it, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return data_parallel_jit(step, mesh, batch_args=(2, 3),
                             donate_argnums=(0,), num_outputs=2)


def make_caption_probe_eval_step(encoder_model, head_model, text_model, mesh,
                                 retina_cfg: retina.RetinaConfig,
                                 num_fixations: int, temperature: float = 0.05):
    """Retrieval metrics: top-1/top-5 in both directions over the global
    batch — the contrastive-accuracy analogue of
    ``Contrastive_Learning.py:867-868`` for the multimodal pairing."""

    def step(state: TrainState, enc_variables, images, tokens, key):
        img_emb = image_tower(encoder_model, enc_variables,
                              state.params["image_head"], head_model, images,
                              key, retina_cfg, num_fixations)
        txt_emb = text_model.apply({"params": state.params["text"]}, tokens,
                                   train=False)
        loss, logits_it, labels = contrastive_loss(
            img_emb, txt_emb, temperature=temperature,
            torch_gather_semantics=False)
        _, logits_ti, _ = contrastive_loss(
            txt_emb, img_emb, temperature=temperature,
            torch_gather_semantics=False)
        return {
            "loss": loss,
            "i2t_top1": top_k_accuracy(logits_it, labels, 1),
            "i2t_top5": top_k_accuracy(logits_it, labels, 5),
            "t2i_top1": top_k_accuracy(logits_ti, labels, 1),
            "t2i_top5": top_k_accuracy(logits_ti, labels, 5),
        }

    return data_parallel_jit(step, mesh, batch_args=(2, 3))
