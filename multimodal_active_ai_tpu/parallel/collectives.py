"""Cross-replica collectives with reference-parity gradient semantics.

The reference's NT-Xent gathers projections from every rank with
``dist.all_gather`` (``SimCLR/Objective.py:102-114``), which in torch is
NOT differentiable — gradients flow only into the *local* contribution. The
training driver additionally detaches view 1 (``outputs1.data``,
``Contrastive_Learning.py:685``). :func:`cross_replica_concat` reproduces the
torch semantics exactly: the gathered tensor is stop-gradded everywhere
except (optionally) the local block, which stays differentiable via a
dynamic-slice splice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_replica_concat(x: jnp.ndarray, axis_name: str | None,
                         differentiable_local: bool = True) -> jnp.ndarray:
    """All-gather ``x`` along ``axis_name``, concatenated on dim 0.

    TPU-native equivalent of ``Objective._cross_replica_concat``
    (``SimCLR/Objective.py:102-114``). Must be called inside `shard_map` /
    `pmap` with a bound ``axis_name``; with ``axis_name=None`` it is the
    identity (single-replica path, ``Objective.py:59-65``).

    If ``differentiable_local`` is True the local shard's block of the result
    carries gradient (matching torch where the *input* to all_gather is the
    local tensor used elsewhere); every remote block is stop-gradded, exactly
    like torch's non-differentiable ``dist.all_gather``.
    """
    if axis_name is None:
        return x
    gathered = jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name, tiled=True)
    if not differentiable_local:
        return gathered
    idx = jax.lax.axis_index(axis_name)
    # Splice the differentiable local block over its gathered (detached) copy.
    return jax.lax.dynamic_update_slice_in_dim(gathered, x, idx * x.shape[0], axis=0)
