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


def test_fused_glimpse_sample_matches_composition(rng):
    """glimpse_sample (all levels, one kernel) == per-level hat_sample_xla
    with the scale multipliers applied."""
    ks = jax.random.split(rng, 4)
    b, p = 2, 20
    mips, wins, rels, starts, scales = [], (16, 8), [], [], []
    for li, (m, win) in enumerate([(32, 16), (16, 8)]):
        mips.append((jax.random.uniform(ks[li], (b, m, m * 3)) * 255
                     ).astype(jnp.bfloat16))
        s = jax.random.randint(ks[li + 2], (b, 2), 0, m - win, dtype=jnp.int32)
        starts.append(s.at[:, 0].set((s[:, 0] // 8) * 8))
        rels.append(jax.random.uniform(jax.random.fold_in(rng, li), (b, p, 2))
                    * (win - 1))
        scales.append(jnp.linspace(0.0, 1.0, b * p).reshape(b, p) + 0.1 * li)
    rel = jnp.stack(rels, 1)
    start = jnp.stack(starts, 1)
    scale = jnp.stack(scales, 1)
    msizes = (32, 16)
    fused = pallas_retina.glimpse_sample(tuple(mips), rel[..., 0], rel[..., 1],
                                         start, scale, wins, msizes,
                                         interpret=True)
    ref = pallas_retina.glimpse_sample_xla(tuple(mips), rel[..., 0],
                                           rel[..., 1], start, scale,
                                           wins, msizes)
    assert fused.shape == (b, 6, p)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)


def test_column_window_plan_geometry():
    """Window sizing follows the footprint and refuses unsafe clamps."""
    # default bench config: 640 mip, win 80 -> 256-px window, aligned clamp
    use, wpx, max_sxa = pallas_retina._column_window_plan(80, 640, 1920)
    assert use and wpx == 256 and max_sxa == 384 and max_sxa + wpx >= 640
    # large footprint (win 144, e.g. crop_sizes giving factor-1 crops):
    # needs a 384-px window, still covered on a 640 mip
    use, wpx, max_sxa = pallas_retina._column_window_plan(144, 640, 1920)
    assert use and wpx == 384 and max_sxa + wpx >= 640
    # 576 mip (canvas not a 128 multiple): the aligned clamp cannot cover
    # the tail -> the plan must fall back to full-width streaming
    use, _, _ = pallas_retina._column_window_plan(80, 576, 1728)
    assert not use
    # small mips never window
    use, _, _ = pallas_retina._column_window_plan(16, 32, 128)
    assert not use


def test_column_window_branch_matches_xla(rng):
    """The column-window DMA branch (the production path for every default
    640-canvas run) vs the XLA fallback, with x-origins at a 128 boundary,
    just past one, and at the msize-win tail where the clamp engages."""
    b, p, m, win = 4, 12, 640, 80
    ks = jax.random.split(rng, 3)
    mip = (jax.random.uniform(ks[0], (b, m, m * 3)) * 255).astype(jnp.bfloat16)
    start = jnp.array([[8, 128],            # exactly on a 128 boundary
                       [16, 129],           # just past one (max misalign ~127)
                       [0, m - win],        # tail: clamp to max_sxa engages
                       [24, 300]], jnp.int32)
    rel = jax.random.uniform(ks[1], (b, 1, p, 2)) * (win - 1)
    scale = jnp.ones((b, 1, p))
    fused = pallas_retina.glimpse_sample((mip,), rel[..., 0], rel[..., 1],
                                         start[:, None], scale, (win,), (m,),
                                         interpret=True)
    ref = pallas_retina.glimpse_sample_xla((mip,), rel[..., 0], rel[..., 1],
                                           start[:, None], scale, (win,), (m,))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)


def test_multiview_plan_batch_matches_tiled_xla(rng):
    """A V×B plan batch against B mips (the hoisted-views production path)
    equals per-view sampling: program v*B+i must read source image i."""
    b, v, p, m, win = 3, 2, 10, 32, 16
    ks = jax.random.split(rng, 3)
    mip = (jax.random.uniform(ks[0], (b, m, m * 3)) * 255).astype(jnp.bfloat16)
    start = jax.random.randint(ks[1], (v * b, 1, 2), 0, m - win, jnp.int32)
    start = start.at[..., 0].set((start[..., 0] // 8) * 8)
    rel = jax.random.uniform(ks[2], (v * b, 1, p, 2)) * (win - 1)
    scale = jnp.ones((v * b, 1, p))
    fused = pallas_retina.glimpse_sample((mip,), rel[..., 0], rel[..., 1],
                                         start, scale, (win,), (m,),
                                         interpret=True)
    ref = pallas_retina.glimpse_sample_xla((mip,), rel[..., 0], rel[..., 1],
                                           start, scale, (win,), (m,))
    assert fused.shape == (v * b, 3, p)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)
