"""Foveated ResNet encoder family (flax.linen, NHWC, TPU-native).

Rebuild of reference ``SimCLR/ResNet/resnet.py`` — torchvision ResNet with
the repo's "foveated retina" surgery:

* ``conv1`` takes ``3 * crop_measures`` (= 12) channels with **stride 1**
  (``resnet.py:169``),
* the stem max-pool is disabled (``resnet.py:231``),
* the final avg-pool / fc are removed (``resnet.py:238``, module docstring
  mods 1-2), so a 30×30 glimpse stack yields a ``(B, 4, 4, 512·k)`` feature
  map (30 → 30 → 15 → 8 → 4 through the four stages).

The norm layer is injectable exactly like the reference (``resnet.py:150``):
SyncBatchNorm parity = BatchNorm with ``axis_name='data'`` (stats pmean'd
over the mesh), FrozenBatchNorm for the DETR backbone. Compute dtype is
parameterized (bfloat16 on the MXU by default in training configs); batch
norm statistics accumulate in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.conv_bn import FusedConv1x1BN
from multimodal_active_ai_tpu.models.norm import make_norm

# kaiming_normal(mode=fan_out) — reference init, resnet.py:184-189
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class BasicBlock(nn.Module):
    """Two 3×3 convs + residual; reference ``resnet.py:31-77``."""

    planes: int
    stride: int = 1
    downsample: bool = False
    norm: Callable[..., nn.Module] = None
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=conv_init, dtype=self.dtype)(x)
        out = norm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype)(out)
        out = norm()(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype)(x)
            identity = norm()(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1×1 → 3×3(stride) → 1×1 bottleneck (ResNet v1.5 placement, reference
    ``resnet.py:80-135``); supports ResNeXt groups and wide variants."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm: Callable[..., nn.Module] = None
    dtype: Any = jnp.float32
    expansion: int = 4
    # 'pallas' | 'gram': produce the 1x1 convs' BN statistics with the conv
    # itself (models/conv_bn.py) instead of XLA's separate reduce pass over
    # the activation — the round-3 profile's top line item (PERF.md). The
    # 3x3 conv keeps the injected norm layer.
    stat_fusion: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        norm = functools.partial(self.norm, use_running_average=not train)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        fused = functools.partial(FusedConv1x1BN, impl=self.stat_fusion,
                                  dtype=self.dtype) if self.stat_fusion \
            else None
        identity = x
        if fused:
            out = fused(width)(x, train)
        else:
            out = nn.Conv(width, (1, 1), use_bias=False, kernel_init=conv_init,
                          dtype=self.dtype)(x)
            out = norm()(out)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype)(out)
        out = norm()(out)
        out = nn.relu(out)
        if fused:
            out = fused(self.planes * self.expansion)(out, train)
        else:
            out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                          kernel_init=conv_init, dtype=self.dtype)(out)
            out = norm()(out)
        if self.downsample:
            if fused:
                identity = fused(self.planes * self.expansion,
                                 stride=self.stride)(x, train)
            else:
                identity = nn.Conv(self.planes * self.expansion, (1, 1),
                                   strides=self.stride, use_bias=False,
                                   kernel_init=conv_init, dtype=self.dtype)(x)
                identity = norm()(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Foveated ResNet trunk; reference ``resnet.py:138-243``.

    Output is the raw layer-4 feature map (no pooling, no fc): ``(B, 4, 4,
    512 * expansion)`` for 30×30 inputs.
    """

    block: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    width_per_group: int = 64
    crop_measures: int = 4            # conv1 in-channels = 3 * crop_measures
    norm_kind: str = "sync_bn"
    axis_name: str | None = "data"
    dtype: Any = jnp.float32
    stat_fusion: str | None = None    # 'pallas' | 'gram' (Bottleneck only)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.stat_fusion and self.norm_kind not in ("bn", "sync_bn",
                                                       "bn_fused"):
            raise ValueError(
                f"stat_fusion embeds BatchNorm semantics; incompatible with "
                f"norm_kind={self.norm_kind!r}")
        if self.stat_fusion and self.norm_kind == "sync_bn" and self.axis_name:
            # FusedConv1x1BN has no axis_name plumbing: fusing here would
            # silently mix per-replica 1x1 stats with psum'd 3x3 stats.
            # GSPMD data-parallel programs use norm_kind='bn' (global-batch
            # stats come from the sharded reduction itself).
            raise ValueError(
                "stat_fusion with sync_bn+axis_name would break SyncBN "
                "semantics on the fused layers; use norm_kind='bn' under "
                "GSPMD instead")
        norm = make_norm(self.norm_kind, axis_name=self.axis_name, dtype=self.dtype)
        x = x.astype(self.dtype)
        # stem: 7x7 stride-1 conv on 12 channels, no max-pool (resnet.py:169,231)
        x = nn.Conv(64, (7, 7), strides=1, padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1", use_running_average=not train)(x)
        x = nn.relu(x)

        inplanes = 64
        for stage, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_down = s != 1 or inplanes != planes * self.block.expansion
                kwargs = dict(planes=planes, stride=s, downsample=needs_down,
                              norm=norm, dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")
                if self.block is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.width_per_group,
                                  stat_fusion=self.stat_fusion)
                x = self.block(**kwargs)(x, train=train)
                inplanes = planes * self.block.expansion
        return x


def _factory(block, layers, **defaults):
    def build(**kwargs) -> ResNet:
        merged = {**defaults, **kwargs}
        return ResNet(block=block, layers=layers, **merged)
    return build


# Factories mirror reference resnet.py:256-343. ResNet10 (one BasicBlock
# per stage) is a TPU-framework extension with no reference counterpart:
# a compile-budget arch for CI and the multichip dryrun on virtual CPU
# devices, where ResNet18's conv count dominates wall time.
resnet10 = _factory(BasicBlock, (1, 1, 1, 1))
resnet18 = _factory(BasicBlock, (2, 2, 2, 2))
resnet34 = _factory(BasicBlock, (3, 4, 6, 3))
resnet50 = _factory(Bottleneck, (3, 4, 6, 3))
resnet101 = _factory(Bottleneck, (3, 4, 23, 3))
resnet152 = _factory(Bottleneck, (3, 8, 36, 3))
resnext50_32x4d = _factory(Bottleneck, (3, 4, 6, 3), groups=32, width_per_group=4)
resnext101_32x8d = _factory(Bottleneck, (3, 4, 23, 3), groups=32, width_per_group=8)
wide_resnet50_2 = _factory(Bottleneck, (3, 4, 6, 3), width_per_group=128)
wide_resnet101_2 = _factory(Bottleneck, (3, 4, 23, 3), width_per_group=128)

_ARCHS = {
    "ResNet10": (resnet10, 512),
    "ResNet18": (resnet18, 512),
    "ResNet34": (resnet34, 512),
    "ResNet50": (resnet50, 2048),
    "ResNet101": (resnet101, 2048),
    "ResNet152": (resnet152, 2048),
}


def encoder_feature_dim(arch: str) -> int:
    """Channel count of the encoder output (512 for R18/34, 2048 for R50+),
    used to size projector/probe inputs as ``C*4*4``
    (``Contrastive_Learning.py:262-269``)."""
    return _ARCHS[arch][1]


def build_encoder(arch: str, **kwargs) -> ResNet:
    """Build the encoder by driver architecture name
    (``Contrastive_Learning.py:238-254`` choices)."""
    if arch not in _ARCHS:
        raise ValueError(f"error: Unrecognized {arch} architecture")
    return _ARCHS[arch][0](**kwargs)
