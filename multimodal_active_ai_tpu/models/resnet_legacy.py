"""Legacy CIFAR-style foveated ResNet (15-channel, 3×3 stem).

Rebuild of reference ``SimCLR/ResNet/ResNet.py:17-146`` — the earlier
5-crop/15-channel encoder generation (``crop_measures = 5``, ``:96-98``)
with a 3×3 stride-1 stem and CIFAR-style blocks (stride on conv1 of the
block, 1×1 shortcut). Kept for capability parity: the reference keeps it
importable (commented out of the drivers, ``Contrastive_Learning.py:51``)
and uses it in ``Contrastive Learning.ipynb`` / ``ResNet Tests.ipynb``.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.norm import make_norm
from multimodal_active_ai_tpu.models.resnet import conv_init


class LegacyBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: Any = None
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=conv_init, dtype=self.dtype)(x)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class LegacyBottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: Any = None
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype)(x)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=conv_init, dtype=self.dtype)(out)
        out = nn.relu(norm()(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(out + x)


class LegacyResNet(nn.Module):
    """15-channel (3·5-crop) trunk; no pooling — spatial map out
    (``ResNet.py:92-124``)."""

    block: type = LegacyBasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    crop_measures: int = 5
    norm_kind: str = "sync_bn"
    axis_name: str | None = "data"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = make_norm(self.norm_kind, axis_name=self.axis_name,
                         dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), strides=1, padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm(name="bn1", use_running_average=not train)(x))
        for stage, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for b in range(blocks):
                x = self.block(planes=planes, stride=stride if b == 0 else 1,
                               norm=norm, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train=train)
        return x


def legacy_resnet18(**kw):
    return LegacyResNet(block=LegacyBasicBlock, layers=(2, 2, 2, 2), **kw)

def legacy_resnet34(**kw):
    return LegacyResNet(block=LegacyBasicBlock, layers=(3, 4, 6, 3), **kw)

def legacy_resnet50(**kw):
    return LegacyResNet(block=LegacyBottleneck, layers=(3, 4, 6, 3), **kw)

def legacy_resnet101(**kw):
    return LegacyResNet(block=LegacyBottleneck, layers=(3, 4, 23, 3), **kw)

def legacy_resnet152(**kw):
    return LegacyResNet(block=LegacyBottleneck, layers=(3, 8, 36, 3), **kw)
