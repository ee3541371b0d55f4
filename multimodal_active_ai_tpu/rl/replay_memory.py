"""Host-side replay memory for the DQN saccade policy.

Rebuild of reference ``DQN/Replay_Memory.py:16-36`` — a bounded cyclic
buffer of ``(state, action, next_state, reward)`` transitions with uniform
sampling. TPU-native changes: storage is preallocated numpy ring arrays
(fixed shapes, zero-copy ``device_put`` of sampled batches) and pushes are
vectorized over the batch — the reference pushes one python object per batch
element per fixation (``DETR_Image_Classification_RLS.py:751-769``), a
host-side hot spot this design removes. Lives on host so capacity is bound
by RAM, with async handoff of sampled batches to the device.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Transition(NamedTuple):
    """(s, a, s', r), reference ``Replay_Memory.py:16-17``."""

    state: np.ndarray
    action: np.ndarray
    next_state: np.ndarray
    reward: np.ndarray


class ReplayMemory:
    """Uniform-sampling ring buffer (``Replay_Memory.py:23-36``)."""

    def __init__(self, capacity: int, state_shape, action_dim: int = 2,
                 seed: int = 0):
        self.capacity = capacity
        self.state_shape = tuple(state_shape)
        self._states = np.zeros((capacity,) + self.state_shape, np.float32)
        self._actions = np.zeros((capacity, action_dim), np.float32)
        self._next_states = np.zeros((capacity,) + self.state_shape, np.float32)
        self._rewards = np.zeros((capacity,), np.float32)
        self._size = 0
        self._head = 0
        self._rng = np.random.RandomState(seed)

    def push(self, state, action, next_state, reward) -> None:
        """Append a batch of transitions (first axis = batch)."""
        state = np.asarray(state, np.float32)
        n = state.shape[0]
        idx = (self._head + np.arange(n)) % self.capacity
        self._states[idx] = state
        self._actions[idx] = np.asarray(action, np.float32)
        self._next_states[idx] = np.asarray(next_state, np.float32)
        self._rewards[idx] = np.asarray(reward, np.float32)
        self._head = int((self._head + n) % self.capacity)
        self._size = int(min(self._size + n, self.capacity))

    def sample(self, batch_size: int) -> Transition:
        """Uniform random batch without replacement (``Replay_Memory.py:32-33``)."""
        assert self._size >= batch_size
        idx = self._rng.choice(self._size, size=batch_size, replace=False)
        return Transition(self._states[idx], self._actions[idx],
                          self._next_states[idx], self._rewards[idx])

    def __len__(self) -> int:
        return self._size

    def state_dict(self) -> dict:
        return {"states": self._states[:self._size].copy(),
                "actions": self._actions[:self._size].copy(),
                "next_states": self._next_states[:self._size].copy(),
                "rewards": self._rewards[:self._size].copy()}

    def load_state_dict(self, state: dict) -> None:
        n = len(state["rewards"])
        self._states[:n] = state["states"]
        self._actions[:n] = state["actions"]
        self._next_states[:n] = state["next_states"]
        self._rewards[:n] = state["rewards"]
        self._size = n
        self._head = n % self.capacity
