"""1-D ResNet for signal-domain experiments.

Rebuild of reference ``SimCLR/ResNet/ResNet1d.py:17-159`` (Conv1d variant of
the CIFAR ResNet with a classification head: avg-pool(16) →
Linear(19968·exp → 1024) → Linear(1024 → classes)); exercised by the
reference only in ``ResNet Tests.ipynb`` (shape smoke test on
``(1, 1, 5000)`` input).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.norm import make_norm


class BasicBlock1d(nn.Module):
    planes: int
    stride: int = 1
    norm: Any = None
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        out = nn.Conv(self.planes, (3,), strides=(self.stride,), padding=1,
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes, (3,), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1,),
                        strides=(self.stride,), use_bias=False,
                        dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class Bottleneck1d(nn.Module):
    planes: int
    stride: int = 1
    norm: Any = None
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        out = nn.Conv(self.planes, (1,), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes, (3,), strides=(self.stride,), padding=1,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes * self.expansion, (1,), use_bias=False,
                      dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1,),
                        strides=(self.stride,), use_bias=False,
                        dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class ResNet1d(nn.Module):
    """Input (B, L, 1) → logits (B, num_classes); reference ``ResNet1d.py:81-122``."""

    block: type = BasicBlock1d
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 10
    norm_kind: str = "bn"
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = make_norm(self.norm_kind, axis_name=self.axis_name,
                         dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3,), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(norm(name="bn1", use_running_average=not train)(x))
        for stage, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for b in range(blocks):
                x = self.block(planes=planes, stride=stride if b == 0 else 1,
                               norm=norm, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train=train)
        # avg_pool1d(16) then flatten (ResNet1d.py:116-118)
        x = nn.avg_pool(x, (16,), strides=(16,))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, dtype=self.dtype)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x


def resnet1d_18(**kw):
    return ResNet1d(block=BasicBlock1d, layers=(2, 2, 2, 2), **kw)

def resnet1d_101(**kw):
    return ResNet1d(block=Bottleneck1d, layers=(3, 4, 23, 3), **kw)
