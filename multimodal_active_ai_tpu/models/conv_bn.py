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
        elif self.impl == "gram" or xd.shape[0] % 8 != 0:
            # the Pallas kernel's row tiles need sublane-aligned M; odd
            # B*H*W products would degrade to tiny tiles (a perf cliff),
            # so fall back to the gram form — same contract, plain matmuls
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


# ---------------------------------------------------------------------------
# Checkpoint-layout conversion. A Bottleneck with stat_fusion folds its three
# Conv(1x1)+BatchNorm pairs into FusedConv1x1BN modules, which renames the
# flax auto-named entries. These converters map the variable collections both
# ways so fused models interoperate with the standard checkpoint contract
# (incl. the reference .pth.tar import/export in utils/checkpoint.py, which
# speaks the unfused layout).
#
# Unfused block:  Conv_0 BN_0 | Conv_1 BN_1 | Conv_2 BN_2 [| Conv_3 BN_3]
# Fused block:    Fused_0     | Conv_0 BN_0 | Fused_1     [| Fused_2]
# ---------------------------------------------------------------------------

_F = "FusedConv1x1BN_{}"
_C, _B = "Conv_{}", "BatchNorm_{}"


def _is_unfused_bottleneck(d: dict) -> bool:
    if not (isinstance(d, dict) and "Conv_2" in d and "Conv_0" in d):
        return False
    # a downsample BasicBlock also has Conv_0..2 — but its Conv_0 is the
    # 3x3; only Bottleneck leads with a 1x1
    k = d["Conv_0"].get("kernel") if isinstance(d["Conv_0"], dict) else None
    return k is not None and getattr(k, "ndim", 0) == 4 \
        and tuple(k.shape[:2]) == (1, 1)


def _is_fused_bottleneck(d: dict) -> bool:
    return isinstance(d, dict) and _F.format(0) in d


def _fuse_block(params: dict, stats: dict):
    down = _C.format(3) in params or _B.format(3) in stats
    fp = {_F.format(0): {"kernel": params[_C.format(0)]["kernel"],
                         **params[_B.format(0)]},
          _C.format(0): params[_C.format(1)],
          _B.format(0): params[_B.format(1)],
          _F.format(1): {"kernel": params[_C.format(2)]["kernel"],
                         **params[_B.format(2)]}}
    fs = {_F.format(0): stats[_B.format(0)],
          _B.format(0): stats[_B.format(1)],
          _F.format(1): stats[_B.format(2)]}
    if down:
        fp[_F.format(2)] = {"kernel": params[_C.format(3)]["kernel"],
                            **params[_B.format(3)]}
        fs[_F.format(2)] = stats[_B.format(3)]
    return fp, fs


def _unfuse_block(params: dict, stats: dict):
    def split(f):
        return ({"kernel": f["kernel"]},
                {"scale": f["scale"], "bias": f["bias"]})

    c0, b0 = split(params[_F.format(0)])
    c2, b2 = split(params[_F.format(1)])
    up = {_C.format(0): c0, _B.format(0): b0,
          _C.format(1): params[_C.format(0)],
          _B.format(1): params[_B.format(0)],
          _C.format(2): c2, _B.format(2): b2}
    us = {_B.format(0): stats[_F.format(0)],
          _B.format(1): stats[_B.format(0)],
          _B.format(2): stats[_F.format(1)]}
    if _F.format(2) in params:
        c3, b3 = split(params[_F.format(2)])
        up[_C.format(3)] = c3
        up[_B.format(3)] = b3
        us[_B.format(3)] = stats[_F.format(2)]
    return up, us


def is_fused_layout(params) -> bool:
    """True if any subtree of ``params`` uses the FusedConv1x1BN layout
    (used by checkpoint consumers to auto-convert on load)."""
    if not isinstance(params, dict):
        return False
    return any(k.startswith("FusedConv1x1BN") or is_fused_layout(v)
               for k, v in params.items())


def convert_stat_fusion_variables(variables: dict, to_fused: bool) -> dict:
    """Map ``{'params', 'batch_stats'}`` between the unfused
    (``Conv->BatchNorm``) and fused (``FusedConv1x1BN``) Bottleneck layouts.
    Non-bottleneck entries (stem, BasicBlock nets, projector/probe heads)
    pass through untouched."""
    probe = _is_unfused_bottleneck if to_fused else _is_fused_bottleneck
    conv = _fuse_block if to_fused else _unfuse_block

    def walk(params, stats):
        out_p, out_s = {}, {}
        for k, v in params.items():
            if probe(v):
                out_p[k], out_s[k] = conv(v, stats.get(k, {}))
            elif isinstance(v, dict):
                out_p[k], out_s[k] = walk(v, stats.get(k, {}))
            else:
                out_p[k] = v
        # batch_stats entries with no params sibling (e.g. frozen BN buffers)
        for k, v in stats.items():
            if k not in out_s and k not in out_p:
                out_s[k] = v
            elif k not in out_s and not isinstance(v, dict):
                out_s[k] = v
        out_s = {k: v for k, v in out_s.items()
                 if not (isinstance(v, dict) and not v)}
        return out_p, out_s

    p, s = walk(variables.get("params", {}), variables.get("batch_stats", {}))
    out = dict(variables)
    out["params"] = p
    out["batch_stats"] = s
    return out
