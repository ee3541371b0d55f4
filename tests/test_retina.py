"""Retina pipeline tests: parameter distributions, fused vs canvas parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.ops import retina

CFG = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                          glimpse_size=30, supersample=2)


def _smooth_images(key, b, s):
    """Low-frequency test images (fused-vs-canvas comparison needs smooth
    content since the two modes use different downscale filters)."""
    small = jax.random.uniform(key, (b, 8, 8, 3)) * 255
    return jax.vmap(lambda im: jax.image.resize(im, (s, s, 3), "cubic"))(small)


def test_param_distributions_match_reference_ranges(rng):
    cfg = retina.RetinaConfig(grid_mask_prob=1.0, gaussian_noise_prob=1.0,
                              color_aug_prob=1.0)
    p = retina.sample_unlabeled_params(rng, 512, 640, cfg)
    assert (np.asarray(p.fix_yx) >= 0).all() and (np.asarray(p.fix_yx) < 1).all()
    # angle ~ (U-0.5)*160 (Contrastive_Learning.py:603)
    assert np.abs(np.asarray(p.angle)).max() <= 80.0
    assert np.asarray(p.gm_ratio).min() >= 0.2 and np.asarray(p.gm_ratio).max() <= 0.5
    assert np.asarray(p.gm_tile).min() >= 100 and np.asarray(p.gm_tile).max() <= 500
    assert np.abs(np.asarray(p.noise_mean)).max() <= 0.5
    assert np.asarray(p.noise_std).max() <= 100.0
    assert np.asarray(p.brightness).min() >= 0.5 and np.asarray(p.brightness).max() <= 1.5
    assert np.asarray(p.hue).min() >= 0.0 and np.asarray(p.hue).max() <= 90.0
    assert np.asarray(p.saturation).min() >= 0.5


def test_param_gating_off_is_neutral(rng):
    cfg = retina.RetinaConfig(grid_mask_prob=0.0, gaussian_noise_prob=0.0,
                              color_aug_prob=0.0)
    p = retina.sample_unlabeled_params(rng, 16, 640, cfg)
    np.testing.assert_allclose(np.asarray(p.gm_ratio), 0.0)
    np.testing.assert_allclose(np.asarray(p.noise_std), 0.0)
    np.testing.assert_allclose(np.asarray(p.brightness), 1.0)
    np.testing.assert_allclose(np.asarray(p.saturation), 1.0)


def test_output_shape_and_dtype(rng):
    imgs = jax.random.randint(rng, (3, 64, 64, 3), 0, 256).astype(jnp.uint8)
    p = retina.sample_unlabeled_params(rng, 3, 64, CFG)
    g = retina.unlabeled_glimpses(imgs, p, rng, CFG)
    assert g.shape == (3, 30, 30, 12)
    assert g.dtype == jnp.float32


@pytest.mark.parametrize("mode", ["fused", "matmul"])
def test_fast_modes_match_canvas_on_smooth_images(rng, mode):
    """Both fast paths (gather-fused and MXU-matmul) must approximate the
    exact canvas path."""
    imgs = _smooth_images(rng, 2, 64)
    # geometric-only comparison (photometrics identical by linearity; noise excluded)
    p = retina.sample_labeled_params(rng, 2, 64)
    p = p._replace(angle=jnp.array([10.0, -25.0]),
                   fix_yx=jnp.array([[0.3, 0.7], [0.5, 0.2]]))
    fast_cfg = retina.RetinaConfig(**{**CFG.__dict__, "mode": mode})
    fast = retina.labeled_glimpses(imgs, p, fast_cfg)
    canvas_cfg = retina.RetinaConfig(**{**CFG.__dict__, "mode": "canvas"})
    exact = retina.labeled_glimpses(imgs, p, canvas_cfg)
    err = np.abs(np.asarray(fast) - np.asarray(exact)).mean()
    assert err < 4.0, (mode, err)  # mean abs error on 0..255 scale


def test_matmul_equals_fused_bilinear_at_native_res(rng):
    """With every level on the native path and supersampling off, the matmul
    contraction must reproduce the gather-based bilinear sample exactly."""
    cfg_g = retina.RetinaConfig(canvas_size=64, crop_sizes=(24, 30),
                                glimpse_size=30, supersample=1, mode="fused")
    cfg_m = retina.RetinaConfig(canvas_size=64, crop_sizes=(24, 30),
                                glimpse_size=30, supersample=1, mode="matmul")
    imgs = _smooth_images(rng, 2, 64)
    p = retina.sample_labeled_params(rng, 2, 64)
    p = p._replace(angle=jnp.array([12.0, -30.0]))
    a = retina.labeled_glimpses(imgs, p, cfg_g)
    b = retina.labeled_glimpses(imgs, p, cfg_m)
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    assert err < 1.0, err  # bf16 contraction rounding only


def test_labeled_center_fixation_identity():
    """Angle 0, center fixation, full-window scale == plain resize."""
    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(64,), glimpse_size=32,
                              supersample=2)
    imgs = _smooth_images(jax.random.PRNGKey(1), 1, 64)
    p = retina.sample_labeled_params(jax.random.PRNGKey(2), 1, 64,
                                     fix_yx=jnp.full((1, 2), 0.5))
    g = retina.labeled_glimpses(imgs, p, cfg)
    ref = jax.image.resize(imgs[0], (32, 32, 3), "linear", antialias=True)
    err = np.abs(np.asarray(g[0]) - np.asarray(ref)).mean()
    assert err < 3.0, err


def test_flip_consistency(rng):
    """Flipping the input with a centered identity view flips the glimpse."""
    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(64,), glimpse_size=32,
                              supersample=2)
    imgs = _smooth_images(rng, 1, 64)
    base = retina.neutral_params(1, 64)
    g_plain = retina.labeled_glimpses(imgs, base, cfg)
    g_flip = retina.labeled_glimpses(imgs[:, :, ::-1, :], base, cfg)
    np.testing.assert_allclose(np.asarray(g_flip), np.asarray(g_plain)[:, :, ::-1, :],
                               atol=1.0)  # bf16 contraction rounding


def test_unlabeled_photometrics_change_output(rng):
    imgs = _smooth_images(rng, 2, 64)
    cfg = retina.RetinaConfig(**{**CFG.__dict__, "color_aug_prob": 1.0,
                                 "gaussian_noise_prob": 1.0})
    p = retina.sample_unlabeled_params(rng, 2, 64, cfg)
    g1 = retina.unlabeled_glimpses(imgs, p, jax.random.PRNGKey(1), cfg)
    p0 = retina.neutral_params(2, 64)._replace(fix_yx=p.fix_yx, angle=p.angle,
                                               rrc_origin_yx=p.rrc_origin_yx,
                                               rrc_size_hw=p.rrc_size_hw,
                                               flip=p.flip)
    g2 = retina.unlabeled_glimpses(imgs, p0, jax.random.PRNGKey(1), cfg)
    assert np.abs(np.asarray(g1) - np.asarray(g2)).max() > 1.0


def test_pyramid_shapes():
    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              glimpse_size=30)
    img = jnp.ones((64, 64, 3))
    crops, resizes = retina.foveated_pyramid(img, jnp.array([0.5, 0.5]),
                                             jnp.float32(0.0), cfg)
    assert [c.shape[0] for c in crops] == [64, 40, 24, 10, 30]
    assert all(r.shape == (30, 30, 3) for r in resizes)


def test_deterministic_given_key(rng):
    imgs = _smooth_images(rng, 2, 64)
    p = retina.sample_unlabeled_params(rng, 2, 64, CFG)
    g1 = retina.unlabeled_glimpses(imgs, p, rng, CFG)
    g2 = retina.unlabeled_glimpses(imgs, p, rng, CFG)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_precomputed_pyramid_matches_inline(rng):
    """apply_retina(pyramid=build_pyramid(...)) must equal the inline path —
    the train steps hoist the pyramid out of the fixation scan."""
    imgs = jax.random.randint(rng, (2, 64, 64, 3), 0, 256).astype(jnp.uint8)
    p = retina.sample_unlabeled_params(rng, 2, 64, CFG)
    inline = retina.apply_retina(imgs, p, rng, CFG, photometric=True)
    pyr = retina.build_pyramid(imgs, CFG)
    hoisted = retina.apply_retina(None, p, rng, CFG, photometric=True,
                                  pyramid=pyr)
    np.testing.assert_allclose(np.asarray(inline), np.asarray(hoisted))


def test_window_bounds_cover_footprint():
    """The static window must bound the rotated crop's mip footprint for
    every (crop, factor) the default configs produce."""
    for cfg in (retina.RetinaConfig(), CFG):
        factors = retina._mip_levels(cfg)
        for crop, f in factors.items():
            mip_size = cfg.canvas_size // f
            win = retina._window_size(crop, f, mip_size)
            assert win <= mip_size
            # footprint: crop * sqrt(2) in source px, /f in mip px, + margins
            assert win * f >= min(crop * 1.4142 + 4, cfg.canvas_size - 1) or \
                win == mip_size


def test_apply_retina_views_matches_per_view(rng):
    """The hoisted all-views invocation matches separate per-view
    apply_retina calls (same params, same noise-key splits; equal up to
    XLA reduction-order rounding at the different batch shape)."""
    from multimodal_active_ai_tpu.ops import retina

    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              supersample=2)
    b, v = 3, 4
    images = (jax.random.uniform(rng, (b, 64, 64, 3)) * 255).astype(jnp.uint8)
    pyramid = retina.build_pyramid(images, cfg)
    fix_keys = jax.random.split(jax.random.fold_in(rng, 7), 2 * v).reshape(v, 2, 2)

    per_view = []
    for j in range(v):
        p = retina.sample_unlabeled_params(fix_keys[j, 0], b, 64, cfg)
        per_view.append(retina.apply_retina(images, p, fix_keys[j, 1], cfg,
                                            photometric=True, pyramid=pyramid))

    p_views = jax.vmap(lambda k: retina.sample_unlabeled_params(k, b, 64, cfg))(
        fix_keys[:, 0])
    p_flat = jax.tree.map(lambda x: x.reshape((v * b,) + x.shape[2:]), p_views)
    g_all = retina.apply_retina_views(pyramid, p_flat, fix_keys[:, 1], cfg,
                                      photometric=True)
    g_all = g_all.reshape((v, b) + g_all.shape[1:])
    for j in range(v):
        np.testing.assert_allclose(np.asarray(g_all[j]),
                                   np.asarray(per_view[j]),
                                   rtol=1e-4, atol=1e-3)
