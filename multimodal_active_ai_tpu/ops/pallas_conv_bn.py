"""Fused 1×1-conv + BatchNorm-statistics production (Pallas TPU).

The round-3 profile put 36% of the flagship SimCLR step's device time in
BatchNorm statistic reductions (PERF.md): every BN layer re-reads its
activation tensor from HBM once per forward pass just to compute
``[Σy, Σy²]``. Two thirds of the surgery ResNet-50's BN layers sit behind
1×1 convolutions (the bottleneck reduce/expand convs and the downsample
projections — reference ``SimCLR/ResNet/resnet.py:80-135``), and a 1×1 conv
is exactly a matmul over the flattened pixel axis. This module fuses the
statistics into the matmul's epilogue: per output block the f32 accumulator
is already resident in VMEM, so ``Σy``/``Σy²`` cost zero extra HBM traffic —
the separate stat pass disappears for those layers.

Two implementations with one contract, ``(y, Σy, Σy²) = f(x2d, w)``:

* ``conv1x1_stats`` — the Pallas kernel. Grid ``(nN, nM)`` with the
  pixel-row axis innermost; the ``(2, TN)`` stat accumulator revisits across
  row tiles (same accumulation pattern as ``ops/pallas_bn.py``). Stats are
  taken on the exact f32 product *before* the bf16 cast of ``y`` (same
  convention as the gram form below, so the two implementations agree).
  Single-device TPU programs only (a ``pallas_call`` inside a GSPMD-sharded
  program is not partitioned automatically — the retina's ``use_pallas``
  policy, ``ops/retina.py:406``).
* ``gram_stats`` — pure jnp: ``Σy = colsum(x)·w`` and
  ``Σy² = diag(wᵀ(xᵀx)w)`` read the conv *input* (K channels) instead of its
  output (N channels) — a bandwidth win whenever N > K (the 4× bottleneck
  expansions and every downsample). GSPMD-compatible (plain matmuls), so
  unlike the kernel it also works sharded.

Both carry a custom VJP (``dY = dy + 1⊗dΣy + 2y⊗dΣy²`` folded into the
standard matmul backward), so gradients match the unfused conv+BN graph to
float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(n: int, candidates) -> int:
    for t in candidates:
        if n % t == 0:
            return t
    return 1


def _conv_stats_kernel(x_ref, w_ref, y_ref, stat_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        stat_ref[...] = jnp.zeros_like(stat_ref)

    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.float32)      # (TM, TN) f32
    y_ref[...] = acc.astype(y_ref.dtype)
    s = jnp.sum(acc, axis=0, keepdims=True)                # (1, TN)
    sq = jnp.sum(acc * acc, axis=0, keepdims=True)         # (1, TN)
    stat_ref[...] += jnp.concatenate([s, sq], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv1x1_stats_fwd(x2d, w, interpret: bool = False):
    m, k = x2d.shape
    k2, n = w.shape
    assert k == k2, (x2d.shape, w.shape)
    # VMEM: x(TM,K)+w(K,TN)+y(TM,TN)+acc, double-buffered — keep TM modest
    # when K is large (layer4 1x1s see K=2048).
    tm = _pick_tile(m, (512, 256, 128, 64, 32, 16, 8, 4, 2, 1) if k <= 1024
                    else (256, 128, 64, 32, 16, 8, 4, 2, 1))
    tn = _pick_tile(n, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    grid = (n // tn, m // tm)          # M innermost: stat block revisits
    y, stats = pl.pallas_call(
        _conv_stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tm, k), lambda ni, mi: (mi, 0)),
                  pl.BlockSpec((k, tn), lambda ni, mi: (0, ni))],
        out_specs=[pl.BlockSpec((tm, tn), lambda ni, mi: (mi, ni)),
                   pl.BlockSpec((2, tn), lambda ni, mi: (0, ni))],
        out_shape=[jax.ShapeDtypeStruct((m, n), x2d.dtype),
                   jax.ShapeDtypeStruct((2, n), jnp.float32)],
        interpret=interpret,
    )(x2d, w)
    return y, stats[0], stats[1]


def _stats_bwd_matmuls(x2d, w, y, dy, ds, dsq):
    """Shared VJP: fold the stat cotangents into the product cotangent and
    run the standard matmul backward. ``dΣy²/dy = 2y`` uses the rounded
    ``y`` (the residual the forward already produced) — identical to what
    the unfused BN backward reads."""
    dyt = (dy.astype(jnp.float32)
           + ds[None, :]
           + 2.0 * y.astype(jnp.float32) * dsq[None, :]).astype(x2d.dtype)
    dx = jnp.dot(dyt, w.T, preferred_element_type=jnp.float32).astype(x2d.dtype)
    dw = jnp.dot(x2d.T, dyt, preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1_stats(x2d, w, interpret: bool = False):
    """``(y, Σy, Σy²)`` of ``y = x2d @ w`` in one HBM pass (Pallas).

    x2d: (M, K) activations (pixels flattened); w: (K, N). Stats are f32
    sums over the M axis of the exact f32 product.
    """
    return _conv1x1_stats_fwd(x2d, w, interpret)


def _cs_fwd(x2d, w, interpret):
    y, s, sq = _conv1x1_stats_fwd(x2d, w, interpret)
    return (y, s, sq), (x2d, w, y)


def _cs_bwd(interpret, res, g):
    x2d, w, y = res
    dy, ds, dsq = g
    return _stats_bwd_matmuls(x2d, w, y, dy, ds, dsq)


conv1x1_stats.defvjp(_cs_fwd, _cs_bwd)


def _gram_stats_fwd(x2d, w):
    y = jnp.dot(x2d, w).astype(x2d.dtype)
    xf32 = x2d  # bf16 operands, f32 accumulation on the MXU
    wf = w.astype(jnp.float32)
    colsum = jnp.sum(x2d.astype(jnp.float32), axis=0)        # (K,)
    gram = jnp.dot(xf32.T, xf32,
                   preferred_element_type=jnp.float32)       # (K, K)
    s = colsum @ wf                                          # (N,)
    sq = jnp.sum((gram @ wf) * wf, axis=0)                   # (N,)
    return y, s, sq


@jax.custom_vjp
def gram_stats(x2d, w):
    """``(y, Σy, Σy²)`` with the stats computed from the conv *input*:
    ``Σy = colsum(x)·w``, ``Σy² = diag(wᵀ(xᵀx)w)``. Reads x (K channels/row)
    instead of y (N channels/row); pure matmuls, GSPMD-safe."""
    return _gram_stats_fwd(x2d, w)


def _gs_fwd(x2d, w):
    y, s, sq = _gram_stats_fwd(x2d, w)
    return (y, s, sq), (x2d, w, y)


def _gs_bwd(res, g):
    x2d, w, y = res
    dy, ds, dsq = g
    return _stats_bwd_matmuls(x2d, w, y, dy, ds, dsq)


gram_stats.defvjp(_gs_fwd, _gs_bwd)
