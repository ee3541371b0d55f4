"""SimCLR NT-Xent contrastive objective, cross-replica over the data axis.

TPU-native rebuild of reference ``SimCLR/Objective.py:17-125``. The math is
identical (L2-normalize, all-gather both views, one-hot labels offset by
``rank * batch``, aa/bb/ab/ba logit blocks with a ``-LARGE_NUM`` self-mask,
soft cross-entropy summed over the two directions); what changes is the
execution model: instead of an NCCL ``dist.all_gather`` called from the host
loop, the gather is a `jax.lax.all_gather` traced inside the jitted train
step, compiled by XLA onto ICI.

Gradient-semantics parity (SURVEY §2.4.3): torch's ``dist.all_gather`` is
non-differentiable, so in the reference gradients flow ONLY through the
left-hand operands of the logit matmuls — and since the driver also detaches
view 1 (``outputs1.data``, ``Contrastive_Learning.py:685``), only the local
``hidden2`` receives gradient. ``torch_gather_semantics=True`` (default)
reproduces this exactly; ``False`` makes the gather differentiable (the
mathematically "full" SimCLR gradient, as in the TF original), exposed as a
documented improvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LARGE_NUM = 1e9  # self-similarity mask value, reference ``Objective.py:6``


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize semantics (``Objective.py:42-43``): x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _softmax_cross_entropy(targets, logits):
    """Soft cross-entropy, reference ``Objective.py:123-125``: mean over rows."""
    logprobs = jax.nn.log_softmax(logits, axis=1)
    return -jnp.sum(targets * logprobs) / logits.shape[0]


def contrastive_loss(hidden1: jnp.ndarray,
                     hidden2: jnp.ndarray,
                     hidden_norm: bool = True,
                     temperature: float = 1.0,
                     axis_name: str | None = None,
                     torch_gather_semantics: bool = True):
    """Compute the NT-Xent loss between two views.

    Args:
      hidden1: ``(B_local, D)`` projections of view 1. The SimCLR driver
        passes these stop-gradded (see ``Contrastive_Learning.py:685``); this
        function does not detach them itself.
      hidden2: ``(B_local, D)`` projections of view 2.
      hidden_norm: L2-normalize before similarity (``Objective.py:41-43``).
      temperature: similarity temperature (``Objective.py:67-74``).
      axis_name: mesh axis to gather negatives over, for use under
        `shard_map`/`pmap` (the explicit-collective formulation). ``None``
        treats the inputs as the full global batch — the GSPMD formulation:
        under ``jit`` with a batch-sharded input, XLA shards these matmuls
        and inserts the ICI collectives itself, which is the production
        path (shard_map compiles far slower code for this program).
      torch_gather_semantics: reproduce torch's non-differentiable
        ``dist.all_gather`` (gradient flows only through the LHS operands).
        With ``axis_name=None`` this emulates the reference's *N-rank
        distributed* gradients on the global batch (RHS operands
        stop-gradded); pass ``False`` for the reference's fully
        differentiable ``world_size == 1`` branch (``Objective.py:59-65``).

        CHANGED: the ``axis_name=None, torch_gather_semantics=True``
        default stop-grads both gathered operands (it used to be fully
        differentiable). This is deliberate — under GSPMD the "global
        batch on one logical device" must carry the N-rank gradient
        semantics for torch parity (pinned by
        ``tests/test_torch_parity.py``) — but external callers relying on
        the old default gradient must now pass
        ``torch_gather_semantics=False`` explicitly.

    Returns:
      ``(loss, logits_ab, labels)`` exactly as ``Objective.py:81``:
      ``loss`` scalar (this replica's contribution), ``logits_ab`` of shape
      ``(B_local, B_global)``, ``labels`` one-hot ``(B_local, 2*B_global)``.
    """
    if hidden_norm:
        hidden1 = _l2_normalize(hidden1, axis=1)
        hidden2 = _l2_normalize(hidden2, axis=1)

    batch_size = hidden1.shape[0]

    if axis_name is not None:
        gather = jax.lax.stop_gradient if torch_gather_semantics else (lambda x: x)
        hidden1_large = jax.lax.all_gather(gather(hidden1), axis_name, tiled=True)
        hidden2_large = jax.lax.all_gather(gather(hidden2), axis_name, tiled=True)
        enlarged_batch_size = hidden1_large.shape[0]
        rank = jax.lax.axis_index(axis_name)
        labels_idx = jnp.arange(batch_size) + rank * batch_size
        labels = jax.nn.one_hot(labels_idx, enlarged_batch_size * 2)
        masks = jax.nn.one_hot(labels_idx, enlarged_batch_size)
    else:
        gather = jax.lax.stop_gradient if torch_gather_semantics else (lambda x: x)
        hidden1_large = gather(hidden1)
        hidden2_large = gather(hidden2)
        labels_idx = jnp.arange(batch_size)
        labels = jax.nn.one_hot(labels_idx, batch_size * 2)
        masks = jax.nn.one_hot(labels_idx, batch_size)

    # Similarity blocks (``Objective.py:67-74``). fp32 accumulation on the MXU.
    def sim(a, b):
        return jnp.dot(a, b.T, preferred_element_type=jnp.float32) / temperature

    logits_aa = sim(hidden1, hidden1_large) - masks * LARGE_NUM
    logits_bb = sim(hidden2, hidden2_large) - masks * LARGE_NUM
    logits_ab = sim(hidden1, hidden2_large)
    logits_ba = sim(hidden2, hidden1_large)

    loss_a = _softmax_cross_entropy(labels, jnp.concatenate([logits_ab, logits_aa], axis=1))
    loss_b = _softmax_cross_entropy(labels, jnp.concatenate([logits_ba, logits_bb], axis=1))
    loss = loss_a + loss_b

    return loss, logits_ab, labels


def naive_ntxent_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float):
    """O(N²) per-pair NT-Xent following SimCLR Algorithm 1 literally.

    Test oracle mirroring the reference's naive module-level implementation
    (``SimCLR/SimCLR.py:36-144``) — but with the paper's normalization
    ``Sum / (2N)`` instead of the reference's precedence bug ``Sum / 2 * N``
    (``SimCLR.py:144``). Returns the mean per-view loss; tests relate it to
    :func:`contrastive_loss` analytically.
    """
    n = z1.shape[0]
    z1 = _l2_normalize(z1, axis=1)
    z2 = _l2_normalize(z2, axis=1)
    # Interleave as the reference does: z[2k] = z2[k], z[2k+1] = z1[k]
    z = jnp.stack([z2, z1], axis=1).reshape(2 * n, -1)
    s = jnp.dot(z, z.T)

    def l(i, j):
        row = jnp.exp(s[i] / temperature)
        denom = jnp.sum(row) - jnp.exp(s[i, i] / temperature)
        return -jnp.log(jnp.exp(s[i, j] / temperature) / denom)

    total = 0.0
    for k in range(n):
        total = total + l(2 * k + 1, 2 * k) + l(2 * k, 2 * k + 1)
    return total / (2 * n)
