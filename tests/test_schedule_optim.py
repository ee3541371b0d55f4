"""LR schedule and optimizer tests (reference ``Model_Util.py`` parity)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_active_ai_tpu.train.optimizers import get_optimizer, larc_scale
from multimodal_active_ai_tpu.train.schedule import scaled_lr, simclr_learning_rate


def _reference_lr(step, base_lr, gbs, num_examples, batch_size, warmup_epochs,
                  train_epochs, scaling="linear"):
    """Literal re-expression of ``Model_Util.learning_rate_schedule`` :9-39."""
    warmup_steps = int(round(warmup_epochs * num_examples // batch_size))
    if scaling == "linear":
        lr = base_lr * gbs / 256.0
    else:
        lr = base_lr * math.sqrt(gbs)
    learning_rate = step / warmup_steps * lr if warmup_steps else lr
    total_steps = num_examples * train_epochs // batch_size + 1
    if step >= warmup_steps:
        g = min(step - warmup_steps, total_steps - warmup_steps)
        learning_rate = lr * 0.5 * (1 + math.cos(math.pi * g / (total_steps - warmup_steps)))
    return learning_rate


def test_schedule_matches_reference_formula():
    sched = simclr_learning_rate(0.01, 1024, num_examples=10000, batch_size=128,
                                 warmup_epochs=2, train_epochs=20)
    for step in [0, 1, 50, 156, 157, 200, 1000, 1563, 2000]:
        want = _reference_lr(step, 0.01, 1024, 10000, 128, 2, 20)
        got = float(sched(step))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(step))


def test_scaled_lr():
    assert scaled_lr(0.1, 512, "linear") == 0.1 * 512 / 256
    np.testing.assert_allclose(scaled_lr(0.1, 512, "sqrt"), 0.1 * math.sqrt(512))


def test_sqrt_scaling_schedule():
    sched = simclr_learning_rate(0.05, 256, 1000, 100, 1, 10, scaling="sqrt")
    assert float(sched(5000)) >= 0.0


def _run_optimizer(name):
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = get_optimizer(name, 0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    return optax.apply_updates(params, updates)


def test_optimizers_produce_finite_updates():
    for name in ["sgd", "adam", "lars", "adamw", "rmsprop"]:
        new = _run_optimizer(name)
        for leaf in jax.tree.leaves(new):
            assert np.isfinite(np.asarray(leaf)).all()


def test_adam_bf16_mu_stores_and_updates():
    """mu_dtype=bfloat16 (the BENCH_ADAM_MU lever): the first moment is
    stored bf16 and updates stay close to the f32-moment updates."""
    params = {"w": jnp.ones((64, 64)), "b": jnp.zeros((64,))}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)

    def updates_for(mu_dtype):
        tx = get_optimizer("adam", 0.1, mu_dtype=mu_dtype)
        state = tx.init(params)
        if mu_dtype is not None:
            mus = [l.dtype for l in jax.tree.leaves(state)
                   if hasattr(l, "dtype")]
            assert jnp.bfloat16 in mus
        upd, _ = tx.update(grads, state, params)
        return upd

    u16 = updates_for(jnp.bfloat16)
    u32 = updates_for(None)
    for a, b in zip(jax.tree.leaves(u16), jax.tree.leaves(u32)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.02, atol=1e-6)


def test_larc_trust_ratio_clips():
    """LARC in clipping mode never amplifies an update (ratio <= 1)."""
    tx = larc_scale(trust_coefficient=0.02)
    params = {"w": jnp.ones((8,)) * 100.0}
    updates = {"w": jnp.ones((8,))}
    out, _ = tx.update(updates, tx.init(params), params)
    # ||p|| huge vs ||u||: ratio = min(1, 0.02*282/2.8) -> clipped at 1
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(updates["w"]))
    params2 = {"w": jnp.ones((8,)) * 1e-3}
    out2, _ = tx.update(updates, tx.init(params2), params2)
    assert np.abs(np.asarray(out2["w"])).max() < 1.0  # scaled down


def test_unknown_optimizer_raises():
    import pytest

    with pytest.raises(ValueError):
        get_optimizer("nope", 0.1)
