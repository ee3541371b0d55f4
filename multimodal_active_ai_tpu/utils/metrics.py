"""Accuracy metrics (jit-friendly).

Counterpart of reference ``SimCLR/Model_Util.py:104-113`` (``top_k_accuracy``)
and ``detr_CLA/util/misc.py:117-133`` (``accuracy``).
"""

from __future__ import annotations

import jax.numpy as jnp


def top_k_accuracy(preds: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fraction of rows whose target index is within the top-k predictions.

    Matches reference ``Model_Util.py:104-113``: ``target`` may be a class
    index vector ``(N,)`` or a one-hot/soft matrix ``(N, C)`` (argmax taken).
    Returns a scalar in [0, 1].
    """
    if target.ndim == 1:
        b = target
    else:
        b = jnp.argmax(target, axis=1)
    # top-k indices per row: (N, k)
    topk = jnp.argsort(-preds, axis=1)[:, :k]
    correct = jnp.any(topk == b[:, None], axis=1)
    return jnp.sum(correct) / correct.shape[0]


def accuracy_topk(output: jnp.ndarray, target: jnp.ndarray, topk=(1,)):
    """Precision@k in percent, reference ``detr_CLA/util/misc.py:117-133``."""
    res = []
    for k in topk:
        res.append(top_k_accuracy(output, target, k) * 100.0)
    return res
