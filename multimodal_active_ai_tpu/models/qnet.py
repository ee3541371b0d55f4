"""DQN saccade policy network: ResNet trunk + x/y action heads.

Rebuild of reference ``DQN/Q_net.py:17-104``: the Q-network shares the
foveated-ResNet trunk architecture with the SimCLR encoder and emits two
independent ``num_of_actions``-way logit vectors (``g_x``, ``g_y``) scoring
quantized fixation coordinates for the next saccade, from a single glimpse
stack ``(B, 30, 30, 12)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.mlp import MLP
from multimodal_active_ai_tpu.models.resnet import build_encoder


class DQN(nn.Module):
    """``(f(x) -> g_x, g_y)``; reference ``Q_net.py:17-40``."""

    arch: str = "ResNet18"
    num_of_actions: int = 100     # --num-of-actions default, RLS driver :214
    hidden_dim: int = 1024        # MLP(C*4*4, 1024, A), Q_net.py:73-76
    norm_kind: str = "sync_bn"
    axis_name: str | None = "data"
    dtype: Any = jnp.float32

    def setup(self):
        self.f = build_encoder(self.arch, norm_kind=self.norm_kind,
                               axis_name=self.axis_name, dtype=self.dtype)
        self.g_x = MLP(self.hidden_dim, self.num_of_actions, dtype=self.dtype)
        self.g_y = MLP(self.hidden_dim, self.num_of_actions, dtype=self.dtype)

    def __call__(self, glimpses, train: bool = True):
        feats = self.f(glimpses, train=train)
        return (self.g_x(feats).astype(jnp.float32),
                self.g_y(feats).astype(jnp.float32))


def build_dqn(arch: str = "ResNet18", num_of_actions: int = 100,
              norm_kind: str = "sync_bn", axis_name: str | None = "data",
              dtype: Any = jnp.float32) -> DQN:
    """Factory mirroring ``Q_net.build_dqn`` (``Q_net.py:45-104``)."""
    return DQN(arch=arch, num_of_actions=num_of_actions, norm_kind=norm_kind,
               axis_name=axis_name, dtype=dtype)
