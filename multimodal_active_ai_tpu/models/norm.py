"""Normalization layers with cross-replica statistics.

The reference injects its norm layer into the ResNet family
(``SimCLR/ResNet/resnet.py:150-155``): ``nn.SyncBatchNorm`` during training
(``Contrastive_Learning.py:240-252``) and ``FrozenBatchNorm2d`` in the DETR
backbone (``detr_CLA/models/backbone.py:35-70,151-168``). On TPU, SyncBN's
NCCL all-reduce becomes batch statistics computed with `lax.pmean` over the
``data`` mesh axis — a one-line ``axis_name`` on `flax.linen.BatchNorm`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


def make_norm(kind: str, axis_name: str | None = None,
              dtype: Any = jnp.float32) -> Callable[..., nn.Module]:
    """Return a norm-layer factory, the analogue of the reference's
    ``norm_layer`` argument.

    kinds: ``'sync_bn'`` (BatchNorm with cross-replica stats — SyncBatchNorm
    parity), ``'bn'`` (per-replica BatchNorm), ``'frozen'``
    (FrozenBatchNorm2d parity), ``'group'`` (GroupNorm, offered as the
    BN-free TPU-friendly alternative; divergence from reference documented).
    """
    if kind == "sync_bn":
        return functools.partial(nn.BatchNorm, use_running_average=None,
                                 momentum=0.9, epsilon=1e-5,
                                 axis_name=axis_name, dtype=dtype)
    if kind == "bn":
        return functools.partial(nn.BatchNorm, use_running_average=None,
                                 momentum=0.9, epsilon=1e-5, dtype=dtype)
    if kind == "bn_fused":
        return functools.partial(FusedStatsBatchNorm, use_running_average=None,
                                 momentum=0.9, epsilon=1e-5, dtype=dtype)
    if kind == "frozen":
        return functools.partial(FrozenBatchNorm, dtype=dtype)
    if kind == "group":
        return functools.partial(GroupNormAdapter, num_groups=32, dtype=dtype)
    raise ValueError(f"unknown norm kind {kind!r}")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and fixed affine parameters.

    Parity with ``detr_CLA/models/backbone.py:35-70``: weight/bias/mean/var
    are buffers (stored in the ``batch_stats`` collection so no optimizer
    touches them), and the forward pass is the fused ``x * scale + bias``
    form with eps inside the rsqrt.
    """

    use_running_average: bool | None = None  # accepted for API parity; ignored
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        n = x.shape[-1]
        weight = self.variable("batch_stats", "weight", lambda: jnp.ones((n,)))
        bias = self.variable("batch_stats", "bias", lambda: jnp.zeros((n,)))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((n,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((n,)))
        eps = 1e-5
        scale = weight.value / jnp.sqrt(var.value + eps)
        shift = bias.value - mean.value * scale
        return (x.astype(self.dtype) * scale.astype(self.dtype)
                + shift.astype(self.dtype))


class FusedStatsBatchNorm(nn.Module):
    """BatchNorm whose batch statistics come from the one-pass Pallas kernel
    (:mod:`multimodal_active_ai_tpu.ops.pallas_bn`).

    Numerically ``nn.BatchNorm(momentum=0.9, epsilon=1e-5)`` with fast
    variance — same parameter/state names (``scale``/``bias``,
    ``batch_stats/{mean,var}``), so checkpoints are interchangeable with the
    ``bn`` kind. Built for single-device TPU programs (the bench path):
    the round-3 profile put 36% of step time in XLA's separate stat-reduce
    fusions; the kernel reads each activation tensor once. Outside TPU the
    kernel runs in interpret mode (slow; tests only).
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        import jax

        from multimodal_active_ai_tpu.ops import pallas_bn

        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            interpret = jax.default_backend() != "tpu"
            mean, var = pallas_bn.batch_mean_var(x, interpret=interpret)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class GroupNormAdapter(nn.Module):
    """GroupNorm with the BatchNorm call signature (train flag ignored)."""

    num_groups: int = 32
    use_running_average: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups != 0:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)
