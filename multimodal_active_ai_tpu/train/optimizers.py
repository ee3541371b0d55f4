"""Optimizer construction: sgd / adam / lars.

Rebuild of reference ``SimCLR/Model_Util.py:68-88``. The reference's "lars"
is apex ``LARC`` wrapped around Adam (a layerwise trust-ratio rescale of the
Adam update, ``Model_Util.py:80-83``); here that is
``optax.chain(adam, trust-ratio scaling)`` — the same adaptive-clipping LARC
semantics without the apex dependency.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


def larc_scale(trust_coefficient: float = 0.02, eps: float = 1e-8,
               clip: bool = True) -> optax.GradientTransformation:
    """apex-LARC adaptive trust-ratio transform (clipping mode, the apex
    default used by the reference): per-parameter
    ``ratio = min(1, η·‖p‖ / ‖update‖)`` applied to the inner update."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(u, p):
            if p is None:
                return u
            pn = jnp.linalg.norm(p.astype(jnp.float32))
            un = jnp.linalg.norm(u.astype(jnp.float32))
            ratio = jnp.where(
                (pn > 0) & (un > 0),
                trust_coefficient * pn / (un + eps),
                1.0)
            if clip:
                ratio = jnp.minimum(ratio, 1.0)
            return u * ratio

        import jax
        updates = jax.tree.map(scale, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(name: str, learning_rate: float | Callable, momentum: float = 0.9,
                  weight_decay: float = 1e-4,
                  mu_dtype: jnp.dtype | None = None) -> optax.GradientTransformation:
    """sgd / adam / lars with the reference's hyperparameter wiring
    (``Model_Util.py:68-88``: SGD gets momentum+weight decay, Adam and LARS
    take only the LR).

    ``mu_dtype`` (adam/adamw only) stores the first moment in a reduced
    dtype — the per-fixation optimizer update is pure HBM traffic over
    every parameter/moment leaf (12.3 ms/step profiled, PERF.md round-3),
    and bf16 ``mu`` cuts one of the five full-tree streams in half. Off by
    default: it perturbs update numerics, so it is a measured opt-in
    (``BENCH_ADAM_MU`` on the bench), not the production default.
    """
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum),
        )
    if name == "adam":
        return optax.adam(learning_rate, mu_dtype=mu_dtype)
    if name == "lars":
        # Adam wrapped in LARC, matching apex LARC(Adam) (Model_Util.py:80-83).
        return optax.chain(
            optax.scale_by_adam(),
            larc_scale(),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "adamw":
        # used by the DETR drivers (DETR_Image_Classification.py:385-394)
        return optax.adamw(learning_rate, weight_decay=weight_decay,
                           mu_dtype=mu_dtype)
    if name == "rmsprop":
        # used by the RLS DQN optimizer (DETR_Image_Classification_RLS.py:445)
        return optax.rmsprop(learning_rate)
    raise ValueError(f"Unknown optimizer {name}")
