"""DETR classification criterion over saccade sequences.

Rebuild of reference ``detr_CLA/models/detr.py:73-148`` (``SetCriterion``).
The reference strips DETR's Hungarian matcher down to identity matching
(indices are ``arange(num_queries)``, ``detr.py:130-134``) and keeps only the
cross-entropy ``loss_labels`` term, so here the criterion is a pure function:
every query is supervised with the image label (the driver repeats the label
``num_queries`` times per sample, ``DETR_Image_Classification.py:595-599``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


@dataclass(frozen=True)
class SetCriterion:
    """Identity-matching classification criterion.

    Args mirror ``SetCriterion.__init__`` (``detr.py:76-84``); ``losses`` is
    fixed to ``['labels']`` as in ``build()`` (``detr.py:173``).
    """

    num_queries: int
    num_classes: int

    def __call__(self, pred_logits: jnp.ndarray, labels: jnp.ndarray) -> dict:
        """Compute losses.

        Args:
          pred_logits: ``(B, num_queries, num_classes)`` from the DETR head
            (``detr.py:69``).
          labels: ``(B,)`` integer class labels; identity matching assigns the
            image label to every query (``detr.py:94-97`` with the drivers'
            repeated-label targets).

        Returns dict with ``loss_ce`` (mean CE over B×Q, ``detr.py:99``) and
        ``class_error`` (100 − top-1 accuracy in %, ``detr.py:104``).
        """
        b, q, c = pred_logits.shape
        target_classes = jnp.broadcast_to(labels[:, None], (b, q))
        logprobs = jax.nn.log_softmax(pred_logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, target_classes[..., None], axis=-1)
        loss_ce = jnp.mean(nll)
        flat_logits = pred_logits.reshape(b * q, c)
        flat_targets = target_classes.reshape(b * q)
        class_error = 100.0 - top_k_accuracy(flat_logits, flat_targets, 1) * 100.0
        return {"loss_ce": loss_ce, "class_error": class_error}
