"""Pallas hat-sampling kernel vs the XLA einsum formulation (interpret mode
on CPU; the compiled kernel runs on real TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.ops import pallas_retina


def _case(key, b=3, m=32, p=20, win=16):
    k1, k2, k3 = jax.random.split(key, 3)
    mip = (jax.random.uniform(k1, (b, m, m * 3)) * 255).astype(jnp.bfloat16)
    # y-origins 8-aligned (the kernel contract; production aligns to 16)
    start = jax.random.randint(k2, (b, 2), 0, m - win, dtype=jnp.int32)
    start = start.at[:, 0].set((start[:, 0] // 8) * 8)
    rel = jax.random.uniform(k3, (b, p, 2)) * (win - 1)
    return mip, rel, start, win


def test_pallas_matches_xla(rng):
    mip, rel, start, win = _case(rng)
    ours = pallas_retina.hat_sample(mip, rel, start, win, interpret=True)
    ref = pallas_retina.hat_sample_xla(mip, rel, start, win)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)


def test_pallas_edge_clamp(rng):
    """Out-of-window coords clamp to the window edge (hat semantics)."""
    mip, rel, start, win = _case(rng, p=8)
    rel = rel.at[:, 0].set(jnp.array([-5.0, -5.0]))          # below window
    rel = rel.at[:, 1].set(jnp.array([win + 9.0, win + 9.0]))  # above window
    ours = pallas_retina.hat_sample(mip, rel, start, win, interpret=True)
    ref = pallas_retina.hat_sample_xla(mip, rel, start, win)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)


def test_pallas_nonmultiple_of_8_rows(rng):
    """P not divisible by 8 exercises the padding path."""
    mip, rel, start, win = _case(rng, p=13)
    ours = pallas_retina.hat_sample(mip, rel, start, win, interpret=True)
    assert ours.shape == (3, 13, 3)
    ref = pallas_retina.hat_sample_xla(mip, rel, start, win)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)
