"""DQN Bellman objective for the saccade policy (Huber loss).

Rebuild of reference ``DQN/Training.py:86-140`` (``optimize_foveator``'s loss
computation) as a pure function: Q(s, a) is the mean of the x/y head values
gathered at the taken action, V(s') is the mean of the per-head maxima from
the target network, and the loss is SmoothL1(Q, r + γ·V') with β=1
(``Training.py:127-129``). The optimizer step (grad clamp ±1 + RMSprop,
``Training.py:132-136``) lives in the RLS trainer.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(x: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """torch ``nn.SmoothL1Loss`` elementwise (beta = 1)."""
    absx = jnp.abs(x)
    return jnp.where(absx < delta, 0.5 * x * x / delta, absx - 0.5 * delta)


def dqn_bellman_loss(policy_qx: jnp.ndarray, policy_qy: jnp.ndarray,
                     target_qx: jnp.ndarray, target_qy: jnp.ndarray,
                     actions: jnp.ndarray, rewards: jnp.ndarray,
                     gamma: float, num_of_actions: int) -> jnp.ndarray:
    """Single-step Bellman Huber loss.

    Args:
      policy_qx/policy_qy: ``(B, num_of_actions)`` policy-net head outputs on
        states (``Training.py:105``).
      target_qx/target_qy: ``(B, num_of_actions)`` target-net head outputs on
        next states (``Training.py:117``); caller should stop-grad or simply
        pass values computed from non-differentiated target params.
      actions: ``(B, 2)`` fractional fixation coords in [0,1) as stored in the
        replay memory; indices recovered as ``(a * num_of_actions).long()``
        (``Training.py:106-109``).
      rewards: ``(B,)`` scalar rewards.
    """
    a_x = (actions[:, 0] * num_of_actions).astype(jnp.int32)
    a_y = (actions[:, 1] * num_of_actions).astype(jnp.int32)
    q_x = jnp.take_along_axis(policy_qx, a_x[:, None], axis=1)[:, 0]
    q_y = jnp.take_along_axis(policy_qy, a_y[:, None], axis=1)[:, 0]
    state_action_values = (q_x + q_y) / 2.0  # mean over heads, Training.py:110-112

    v_x = jnp.max(target_qx, axis=1)
    v_y = jnp.max(target_qy, axis=1)
    next_state_values = (v_x + v_y) / 2.0  # Training.py:118-122

    expected = next_state_values * gamma + rewards  # Training.py:125
    return jnp.mean(huber(state_action_values - expected))
