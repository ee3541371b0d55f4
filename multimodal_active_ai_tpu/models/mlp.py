"""Projection head, linear probe, Identity.

Rebuilds of ``SimCLR/MLP/multilayerPerceptron.py`` (flatten → Linear(in,
hidden) → ReLU → Linear(hidden, out)), ``SimCLR/MLR/
multivariateLogisticRegression.py`` (single Linear), and
``SimCLR/Model_Util.py:122-127`` (Identity, used to strip the projector when
consuming checkpoints downstream).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Flatten → Dense(hidden) → ReLU → Dense(out); reference ``multilayerPerceptron.py:9-22``."""

    hidden_dim: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        return x


class LogisticRegression(nn.Module):
    """Single linear classifier; reference ``multivariateLogisticRegression.py:6-13``."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class Identity(nn.Module):
    """Pass-through; reference ``Model_Util.py:122-127``."""

    @nn.compact
    def __call__(self, x):
        return x
