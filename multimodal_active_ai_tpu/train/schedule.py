"""Learning-rate schedule: linear/sqrt scaling + linear warmup + cosine decay.

Rebuild of reference ``SimCLR/Model_Util.py:9-60``. The reference recomputes
the LR every step from the optimizer's internal step counter
(``Model_Util.py:11-15``) and writes it into the param groups; here the same
formula is an optax-style ``schedule(step) -> lr`` traced into the train
step, so it compiles into the update instead of a host-side mutation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def scaled_lr(base_learning_rate: float, global_batch_size: int,
              scaling: str = "linear") -> float:
    """``linear``: lr·gbs/256; ``sqrt``: lr·√gbs (``Model_Util.py:20-28``)."""
    if scaling == "linear":
        return base_learning_rate * global_batch_size / 256.0
    if scaling == "sqrt":
        return base_learning_rate * math.sqrt(global_batch_size)
    raise ValueError(f"Unknown learning rate scaling {scaling}")


def simclr_learning_rate(base_learning_rate: float, global_batch_size: int,
                         num_examples: int, batch_size: int,
                         warmup_epochs: int, train_epochs: int,
                         scaling: str = "linear"):
    """Return ``schedule(step)`` matching ``Model_Util.learning_rate_schedule``.

    ``num_examples`` is the per-rank shard size and ``batch_size`` the
    per-rank batch, exactly as the reference computes
    ``warmup_steps = warmup_epochs * num_examples // batch_size``
    (``Model_Util.py:18``) and
    ``total_steps = num_examples * train_epochs // batch_size + 1``
    (``Model_Util.py:58-60``). Note the reference steps the optimizer once
    per *fixation* (``Contrastive_Learning.py:694-699``), so one "epoch" of
    steps is ``num_fixations×`` the warmup denominator — behavior preserved
    by counting optimizer steps the same way.
    """
    lr = scaled_lr(base_learning_rate, global_batch_size, scaling)
    warmup_steps = int(round(warmup_epochs * num_examples // batch_size))
    total_steps = num_examples * train_epochs // batch_size + 1
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step / warmup_steps * lr) if warmup_steps else lr
        t = jnp.minimum(step - warmup_steps, decay_steps)
        cosine = 0.5 * (1 + jnp.cos(jnp.pi * t / decay_steps))
        return jnp.where(step < warmup_steps, warm, lr * cosine)

    return schedule
