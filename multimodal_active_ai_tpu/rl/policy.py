"""ε-greedy saccade-action selection.

Rebuild of reference ``DQN/Training.py:21-68``. The reference draws the
explore/exploit coin on rank 0 and MPI-broadcasts it
(``Training.py:22-28``); here every host folds the same PRNG key, so the
decision agrees across the fleet with zero control-plane traffic (the
general pattern replacing the reference's MPI scalar bcasts, SURVEY §5).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def eps_threshold(epoch: int, eps_start: float, eps_end: float,
                  eps_decay: float) -> float:
    """``eps_end + (eps_start − eps_end)·exp(−epoch / eps_decay)``
    (``Training.py:32-33`` — decayed by *epoch*, not step)."""
    return eps_end + (eps_start - eps_end) * math.exp(-1.0 * epoch / eps_decay)


def select_action_from_policy(apply_fn, variables, states, num_of_actions: int):
    """Greedy action: argmax of each head / num_of_actions
    (``Training.py:57-68``). Returns (B, 2) fractional coords (x, y)."""
    qx, qy = apply_fn(variables, states, train=False)
    fx = jnp.argmax(qx, axis=1).astype(jnp.float32) / num_of_actions
    fy = jnp.argmax(qy, axis=1).astype(jnp.float32) / num_of_actions
    return jnp.stack([fx, fy], axis=1)


def select_random_action(key, batch_size: int):
    """Uniform random fixation (``Training.py:53-54``)."""
    return jax.random.uniform(key, (batch_size, 2))


def select_action(key, apply_fn, variables, states, *, epoch: int,
                  eps_start: float, eps_end: float, eps_decay: float,
                  num_of_actions: int, batch_size: int):
    """ε-greedy (``Training.py:21-49``): one shared coin per call (the whole
    batch explores or exploits together, matching the reference's single
    rank-0 ``random.random()``)."""
    k_coin, k_rand = jax.random.split(key)
    sample = jax.random.uniform(k_coin, ())
    thr = eps_threshold(epoch, eps_start, eps_end, eps_decay)
    greedy = select_action_from_policy(apply_fn, variables, states, num_of_actions)
    random = select_random_action(k_rand, batch_size)
    return jnp.where(sample > thr, greedy, random)
