"""NT-Xent objective tests: oracle equivalence, cross-replica parity,
stop-gradient semantics (SURVEY §2.4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from multimodal_active_ai_tpu.objectives.ntxent import (
    contrastive_loss,
    naive_ntxent_loss,
)


def _projections(key, n=8, d=16):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (n, d)), jax.random.normal(k2, (n, d)))


def test_matches_naive_oracle(rng):
    """loss == 2 × the per-pair NT-Xent mean of SimCLR Algorithm 1.

    The reference contains the naive O(N²) loop implementation
    (``SimCLR/SimCLR.py:36-144``) which SURVEY §4 designates as the oracle:
    ``loss_a + loss_b`` is twice the mean per-view paper loss.
    """
    h1, h2 = _projections(rng)
    t = 0.3
    loss, _, _ = contrastive_loss(h1, h2, temperature=t)
    oracle = naive_ntxent_loss(h1, h2, t)
    np.testing.assert_allclose(float(loss), 2 * float(oracle), rtol=1e-4)


def test_labels_and_logits_shapes(rng):
    h1, h2 = _projections(rng, n=6)
    loss, logits_ab, labels = contrastive_loss(h1, h2, temperature=0.1)
    assert logits_ab.shape == (6, 6)
    assert labels.shape == (6, 12)
    # positives on the diagonal of ab
    assert (np.argmax(np.asarray(labels), 1) == np.arange(6)).all()


def test_distributed_equals_single_replica(rng, mesh8):
    """8-way sharded loss (all-gathered negatives) == global single-device
    loss — the rebuild of ``Objective.py:51-58`` must make the effective
    contrastive batch global."""
    h1, h2 = _projections(rng, n=16)

    global_loss, _, _ = contrastive_loss(h1, h2, temperature=0.2)

    def shard_fn(a, b):
        loss, _, _ = contrastive_loss(a, b, temperature=0.2, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh8, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False))
    dist_loss = sharded(h1, h2)
    np.testing.assert_allclose(float(dist_loss), float(global_loss), rtol=1e-4)


def test_stop_gradient_parity_torch_semantics(rng, mesh8):
    """With torch gather semantics, d loss/d h1 == 0 when the driver detaches
    view 1, and gradients flow only through the *local* h2 block."""
    h1, h2 = _projections(rng, n=16)

    def loss_local(a, b):
        loss, _, _ = contrastive_loss(jax.lax.stop_gradient(a), b,
                                      temperature=0.2, axis_name="data")
        return jax.lax.pmean(loss, "data")

    def grads(a, b):
        return jax.grad(lambda a, b: loss_local(a, b), argnums=(0, 1))(a, b)

    g = jax.jit(jax.shard_map(grads, mesh=mesh8, in_specs=(P("data"), P("data")),
                              out_specs=P("data"), check_vma=False))
    ga, gb = g(h1, h2)
    np.testing.assert_allclose(np.asarray(ga), 0.0)
    assert np.abs(np.asarray(gb)).max() > 0


def test_differentiable_gather_mode_changes_grads(rng, mesh8):
    h1, h2 = _projections(rng, n=16)

    def make(torch_semantics):
        def f(a, b):
            loss, _, _ = contrastive_loss(
                a, b, temperature=0.2, axis_name="data",
                torch_gather_semantics=torch_semantics)
            return jax.lax.pmean(loss, "data")

        def grads(a, b):
            return jax.grad(f, argnums=1)(a, b)

        return jax.jit(jax.shard_map(grads, mesh=mesh8,
                                     in_specs=(P("data"), P("data")),
                                     out_specs=P("data"), check_vma=False))

    g_torch = make(True)(h1, h2)
    g_full = make(False)(h1, h2)
    assert np.abs(np.asarray(g_torch) - np.asarray(g_full)).max() > 1e-6


def test_temperature_scales_logits(rng):
    h1, h2 = _projections(rng)
    _, l1, _ = contrastive_loss(h1, h2, temperature=1.0)
    _, l2, _ = contrastive_loss(h1, h2, temperature=0.5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1) * 2.0, rtol=1e-5)


def test_hidden_norm_false(rng):
    h1, h2 = _projections(rng)
    loss_n, _, _ = contrastive_loss(h1, h2, hidden_norm=True)
    loss_u, _, _ = contrastive_loss(h1, h2, hidden_norm=False)
    assert float(loss_n) != float(loss_u)
