"""1×1 convolution with BatchNorm statistics fused into its epilogue.

Drops into the bottleneck blocks of the foveated ResNet family
(``models/resnet.py``) in place of the ``nn.Conv(1×1) → BatchNorm`` pairs —
the reduce/expand convs and downsample projections of reference
``SimCLR/ResNet/resnet.py:80-135``. Numerically it is that pair:
fast-variance statistics, momentum-0.9 running stats, eps 1e-5, the same
kaiming fan-out kernel init. What changes is *where* the statistics come
from: :mod:`multimodal_active_ai_tpu.ops.pallas_conv_bn` produces
``[Σy, Σy²]`` with the matmul itself (Pallas epilogue — zero extra HBM
traffic) or from the conv input via the gram identity (GSPMD-safe), instead
of XLA's separate reduce pass that re-reads the activation from HBM
(round-3 profile: 36% of step time — PERF.md).

Stats are taken on the exact f32 product rather than the bf16-rounded
``y``; the drift is O(bf16 eps) on quantities BatchNorm is robust to, and
``tests/test_conv_bn.py`` pins f32 equivalence to the unfused graph.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.ops import pallas_conv_bn

# kaiming_normal(mode=fan_out) — reference init, resnet.py:184-189
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                              "truncated_normal")


class FusedConv1x1BN(nn.Module):
    """``BN(x @ w)`` with the batch statistics produced by the conv itself.

    impl: ``'pallas'`` (matmul-epilogue kernel; single-device TPU programs)
    or ``'gram'`` (input-side stats via ``wᵀ(xᵀx)w``; plain matmuls, works
    under GSPMD). Interpret mode is used automatically off-TPU so tests run
    on CPU.
    """

    features: int
    stride: int = 1
    impl: str = "pallas"
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        k = x.shape[-1]
        c = self.features
        kernel = self.param("kernel", _conv_init, (1, 1, k, c), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.stride != 1:
            # a strided 1x1 conv reads every stride-th pixel (SAME padding
            # never pads a 1x1 window)
            x = x[:, ::self.stride, ::self.stride, :]
        lead = x.shape[:-1]
        xd = x.astype(self.dtype).reshape(-1, k)
        wd = kernel.reshape(k, c).astype(self.dtype)

        if not train:
            y = jnp.dot(xd, wd).astype(self.dtype)
            mean, var = ra_mean.value, ra_var.value
        elif self.impl == "gram":
            y, s, sq = pallas_conv_bn.gram_stats(xd, wd)
            mean, var = self._finalize(s, sq, xd.shape[0], ra_mean, ra_var)
        else:
            interpret = jax.default_backend() != "tpu"
            y, s, sq = pallas_conv_bn.conv1x1_stats(xd, wd, interpret)
            mean, var = self._finalize(s, sq, xd.shape[0], ra_mean, ra_var)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (y.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype).reshape(*lead, c)

    def _finalize(self, s, sq, m, ra_mean, ra_var):
        mean = s / m
        var = jnp.maximum(sq / m - mean * mean, 0.0)
        if not self.is_initializing():
            mom = self.momentum
            ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
            ra_var.value = mom * ra_var.value + (1 - mom) * var
        return mean, var
