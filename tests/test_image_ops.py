"""Unit tests for the primitive retina ops (DALI-operator equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.ops import image_ops


def test_bilinear_sample_exact_at_centers():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    coords = jnp.array([[0.0, 0.0], [2.0, 3.0], [1.0, 2.0]])
    out = image_ops.bilinear_sample(img, coords)
    np.testing.assert_allclose(out[:, 0], [0.0, 11.0, 6.0])


def test_bilinear_sample_interpolates():
    img = jnp.array([[[0.0], [10.0]], [[20.0], [30.0]]])
    out = image_ops.bilinear_sample(img, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(out[0, 0], 15.0)


def test_bilinear_fill_mask():
    img = jnp.ones((4, 4, 3))
    out = image_ops.bilinear_sample(img, jnp.array([[1.0, 1.0], [1.0, 1.0]]),
                                    fill_value=0.0,
                                    fill_mask=jnp.array([False, True]))
    assert float(out[0, 0]) == 1.0 and float(out[1, 0]) == 0.0


def test_color_twist_neutral_is_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (5, 5, 3)) * 255
    out = image_ops.apply_color_twist(img, jnp.float32(1.0), jnp.float32(1.0),
                                      jnp.float32(0.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_color_twist_brightness_scales():
    img = jnp.full((2, 2, 3), 100.0)
    out = image_ops.apply_color_twist(img, jnp.float32(2.0), jnp.float32(1.0),
                                      jnp.float32(0.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), 200.0, atol=1e-3)


def test_color_twist_contrast_pivots_at_128():
    img = jnp.full((2, 2, 3), 128.0)
    out = image_ops.apply_color_twist(img, jnp.float32(1.0), jnp.float32(0.5),
                                      jnp.float32(0.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), 128.0, atol=1e-3)


def test_color_twist_zero_saturation_grayscales():
    img = jnp.array([[[200.0, 40.0, 90.0]]])
    out = image_ops.apply_color_twist(img, jnp.float32(1.0), jnp.float32(1.0),
                                      jnp.float32(0.0), jnp.float32(0.0))
    # luma-only: all channels equal
    v = np.asarray(out)[0, 0]
    np.testing.assert_allclose(v, v[0], atol=1e-3)


def test_grid_mask_off_keeps_everything():
    coords = jax.random.uniform(jax.random.PRNGKey(1), (10, 2)) * 100
    keep = image_ops.grid_mask_keep(coords, jnp.float32(0.0),
                                    jnp.zeros(2), jnp.float32(0.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(keep), 1.0)


def test_grid_mask_ratio_half_masks_quarter():
    gy, gx = jnp.meshgrid(jnp.arange(200.0), jnp.arange(200.0), indexing="ij")
    coords = jnp.stack([gy, gx], -1)
    keep = image_ops.grid_mask_keep(coords, jnp.float32(0.0), jnp.zeros(2),
                                    jnp.float32(0.5), jnp.float32(20.0))
    frac_masked = 1.0 - float(jnp.mean(keep))
    assert abs(frac_masked - 0.25) < 0.02


def test_hflip():
    img = jnp.arange(6.0).reshape(1, 6, 1)
    flipped = image_ops.hflip(img, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(flipped)[0, :, 0], [5, 4, 3, 2, 1, 0])
    same = image_ops.hflip(img, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(same), np.asarray(img))


def test_resize_filter_preserves_mean():
    img = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3)) * 255
    out = image_ops.resize_with_filter(img, (16, 16))
    assert abs(float(out.mean()) - float(img.mean())) < 2.0


def test_crop_resize_matches_manual_crop():
    img = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3)) * 255
    out = image_ops.crop_resize_with_filter(img, jnp.array([16.0, 16.0]), (32, 32), (32, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[16:48, 16:48]), atol=1e-2)


def test_rotate_coords_identity_and_90():
    center = jnp.array([2.0, 2.0])
    c = jnp.array([[1.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(image_ops.rotate_coords(c, jnp.float32(0.0), center)), [[1.0, 3.0]],
        atol=1e-6)
    out = image_ops.rotate_coords(c, jnp.float32(90.0), center)
    # inverse of a 90° CCW rotation applied to (y-2,x-2)=(-1,1)
    np.testing.assert_allclose(np.asarray(out), [[3.0, 3.0]], atol=1e-5)
