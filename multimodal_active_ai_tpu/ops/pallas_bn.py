"""Pallas TPU kernel for BatchNorm statistics: one pass, [Σx, Σx²] together.

Round-3 profiling attributed 36% of the flagship SimCLR step's device time
to BatchNorm-statistic reductions (``convert_reduce_fusion`` — PERF.md
round-3 table): 21 forward/backward passes × 53 BN layers of the surgery
ResNet-50, each reading its activation tensor from HBM at well below
bandwidth. This kernel computes the two forward statistics in ONE pass over
the activations — per C-tile, the (2, C) f32 accumulator stays resident in
VMEM while the row-tile grid sweeps the N axis — so the stat pass costs
exactly one HBM read of x, f32 accumulation included.

The op carries a custom VJP (∂Σx/∂x = 1, ∂Σx²/∂x = 2x — elementwise, XLA
fuses it into the BN backward's other elementwise work), so
:class:`~multimodal_active_ai_tpu.models.norm` can drop it into a
BatchNorm that is numerically the reference's ``nn.SyncBatchNorm``
(``Contrastive_Learning.py:240-252``) under GSPMD's global batch.

Used on single-device TPU programs (the bench path); the jnp formulation
remains the default elsewhere — a ``pallas_call`` inside a GSPMD-sharded
program is not partitioned automatically (same policy as the retina's
``use_pallas`` gate, ``ops/retina.py:406``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(n: int, candidates=(1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)) -> int:
    for t in candidates:
        if n % t == 0:
            return t
    return 1


def _sums_kernel(x_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    xf = x_ref[...].astype(jnp.float32)
    s = jnp.sum(xf, axis=0, keepdims=True)           # (1, TC)
    sq = jnp.sum(xf * xf, axis=0, keepdims=True)     # (1, TC)
    out_ref[...] += jnp.concatenate([s, sq], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stat_sums_fwd(x2d: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(2, C) f32 ``[Σx, Σx²]`` over axis 0 of a (N, C) array."""
    n, c = x2d.shape
    tn = _pick_tile(n)
    tc = _pick_tile(c, (512, 256, 128, 64, 32, 16, 8, 4, 2, 1))
    grid = (c // tc, n // tn)      # N innermost: the (2, TC) block revisits
    return pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tn, tc), lambda ci, ni: (ni, ci))],
        out_specs=pl.BlockSpec((2, tc), lambda ci, ni: (0, ci)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def stat_sums(x2d: jnp.ndarray, interpret: bool = False):
    """Differentiable ``(Σx, Σx²)`` over axis 0 of (N, C), f32 accumulation."""
    out = _stat_sums_fwd(x2d, interpret)
    return out[0], out[1]


def _vjp_fwd(x2d, interpret):
    out = _stat_sums_fwd(x2d, interpret)
    return (out[0], out[1]), x2d


def _vjp_bwd(interpret, x2d, g):
    dsum, dsumsq = g
    dx = (dsum[None, :].astype(jnp.float32)
          + 2.0 * x2d.astype(jnp.float32) * dsumsq[None, :].astype(jnp.float32))
    return (dx.astype(x2d.dtype),)


stat_sums.defvjp(_vjp_fwd, _vjp_bwd)


def batch_mean_var(x: jnp.ndarray, interpret: bool = False):
    """(mean, var) over all but the last axis — the BatchNorm statistics,
    fast-variance form (``E[x²] − E[x]²``, matching flax), computed in one
    HBM pass. ``x`` is NHWC (or any (..., C)); reshaping to (N, C) is free
    for a trailing-C layout."""
    c = x.shape[-1]
    n = x.size // c
    s, sq = stat_sums(x.reshape(n, c), interpret)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    return mean, var
