"""Primitive device-side image operations for the retina pipeline.

These are the TPU-native replacements for the individual DALI CUDA operators
used by the reference's pipelines (``NVIDIA_DALI_Pipelines.py``):
``ops.Resize`` / ``ops.RandomResizedCrop`` / ``ops.Rotate`` / ``ops.Crop`` /
``ops.Flip`` / ``ops.ColorTwist`` / ``ops.GridMask`` /
``ops.NormalDistribution``. Everything is a pure jittable function on
float32 images in the raw 0..255 range (the reference never normalizes to
[0,1]: DALI outputs uint8-scale values that flow straight into conv1,
``SimCLR/SimCLR.py:24-26``).

Conventions: NHWC layout (TPU-native), pixel centers at integer coordinates,
half-pixel resize mapping (``src = (dst + 0.5) * scale - 0.5``, the
DALI/OpenCV convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sampling


def bilinear_sample(img: jnp.ndarray, coords_yx: jnp.ndarray,
                    fill_value: float | None = None,
                    fill_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bilinearly sample ``img (H, W, C)`` at float coords ``(..., 2)`` (y, x).

    Out-of-bounds coordinates are edge-clamped; if ``fill_mask`` (True where
    the sample should be replaced by ``fill_value``) is given, those samples
    are overwritten — used to reproduce DALI ``Rotate``'s zero fill outside
    the source canvas.
    """
    h, w, c = img.shape
    y = coords_yx[..., 0]
    x = coords_yx[..., 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    flat = img.reshape(h * w, c)

    def gather(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wy = wy[..., None]
    wx = wx[..., None]
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    if fill_mask is not None:
        out = jnp.where(fill_mask[..., None], jnp.asarray(fill_value or 0.0, out.dtype), out)
    return out


def resize_with_filter(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Antialiased linear (triangle-filter) resize, the DALI ``ops.Resize``
    default (``NVIDIA_DALI_Pipelines.py:424``). Used by the exact "canvas"
    retina mode; the fused mode approximates it by supersampled averaging."""
    h, w, c = img.shape
    oh, ow = out_hw
    scale = jnp.array([oh / h, ow / w], dtype=jnp.float32)
    # translation 0: scale_and_translate already uses half-pixel-center
    # sampling (src = (dst+.5)/scale - .5, the jax.image.resize convention).
    # An extra 0.5*(scale-1) term here double-counted that and phase-shifted
    # every downscale by .5*(1-scale) output px (~6 src px at 400->30) —
    # found by the round-5 PIL golden fixture (tools/make_dali_golden.py);
    # invisible to the 64-canvas internal tests where scale is near 1.
    translation = jnp.zeros((2,), jnp.float32)
    return jax.image.scale_and_translate(
        img, (oh, ow, c), (0, 1), scale, translation, method="linear", antialias=True)


def crop_resize_with_filter(img: jnp.ndarray, origin_yx: jnp.ndarray,
                            crop_hw: tuple[int, int], out_hw: tuple[int, int]) -> jnp.ndarray:
    """Dynamic-position crop (static size) + antialiased resize.

    Equivalent of the DALI ``Crop(crop_pos_x/y)`` → ``Resize`` pairs forming
    the foveation pyramid (``NVIDIA_DALI_Pipelines.py:467-477``). The crop
    origin may be fractional; it is folded into the resize translation so no
    integer snap error is introduced.
    """
    h, w, c = img.shape
    ch, cw = crop_hw
    oh, ow = out_hw
    scale = jnp.array([oh / ch, ow / cw], dtype=jnp.float32)
    # src = origin + (dst + .5)/scale - .5: scale_and_translate's zero-
    # translation mapping is already the half-pixel-center convention (see
    # resize_with_filter), so only the crop origin shifts the sampling
    translation = -origin_yx * scale
    return jax.image.scale_and_translate(
        img, (oh, ow, c), (0, 1), scale, translation, method="linear", antialias=True)


# ---------------------------------------------------------------------------
# Geometric parameter helpers (affine maps are [y; x] -> A @ [y; x] + b)


def rotate_coords(coords_yx: jnp.ndarray, angle_deg: jnp.ndarray,
                  center_yx: jnp.ndarray) -> jnp.ndarray:
    """Map output coords of a rotation to input coords (inverse warp).

    DALI ``ops.Rotate`` with the default canvas expansion followed by a
    center ``Crop`` back to the original size (the reference graph,
    ``NVIDIA_DALI_Pipelines.py:457,467``) is equivalent to an in-place
    rotation about the canvas center with zero fill; positive angles rotate
    counter-clockwise.
    """
    theta = jnp.deg2rad(angle_deg)
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    rel = coords_yx - center_yx
    y, x = rel[..., 0], rel[..., 1]
    # inverse of CCW rotation: apply CW rotation to output coords
    xi = cos * x - sin * y
    yi = sin * x + cos * y
    return jnp.stack([yi, xi], axis=-1) + center_yx


# ---------------------------------------------------------------------------
# Pointwise photometric ops


# RGB <-> YIQ, the linear hue/saturation space DALI and TF use. The inverse
# is computed exactly so a neutral twist (b=c=s=1, h=0) is the identity.
import numpy as _np

_RGB2YIQ_NP = _np.array([[0.299, 0.587, 0.114],
                         [0.596, -0.274, -0.322],
                         [0.211, -0.523, 0.312]], dtype=_np.float64)
# host-side constants only: a module-level jnp.asarray would initialize
# the XLA backend at import time, breaking jax.distributed.initialize on
# multi-host launches (it must run before any backend use)
_YIQ2RGB_NP = _np.linalg.inv(_RGB2YIQ_NP)


def color_twist_matrix(brightness: jnp.ndarray, contrast: jnp.ndarray,
                       hue_deg: jnp.ndarray, saturation: jnp.ndarray):
    """Build the per-image 3x3 matrix + offset implementing DALI ``ColorTwist``.

    DALI composes hue rotation and saturation scaling in YIQ space with
    brightness (multiplicative) and contrast (pivot at half range, 128 for
    uint8 data) into one linear transform. Returns ``(M, b)`` such that
    ``out = M @ rgb + b``. All params are scalars (per image).
    """
    h = jnp.deg2rad(hue_deg)
    cos_h = jnp.cos(h)
    sin_h = jnp.sin(h)
    # hue rotation + saturation scale acting on (I, Q)
    hs = jnp.stack([
        jnp.stack([jnp.ones_like(cos_h), jnp.zeros_like(cos_h), jnp.zeros_like(cos_h)]),
        jnp.stack([jnp.zeros_like(cos_h), saturation * cos_h, -saturation * sin_h]),
        jnp.stack([jnp.zeros_like(cos_h), saturation * sin_h, saturation * cos_h]),
    ])  # (3, 3)
    m = (jnp.asarray(_YIQ2RGB_NP, jnp.float32) @ hs
         @ jnp.asarray(_RGB2YIQ_NP, jnp.float32))
    # contrast about 128, then brightness scale: out = b*(128 + c*(x - 128))
    m = brightness * contrast * m
    offset = brightness * 128.0 * (1.0 - contrast) * jnp.ones((3,), jnp.float32)
    return m, offset


def apply_color_twist(img: jnp.ndarray, brightness, contrast, hue_deg, saturation):
    """Apply DALI-equivalent ColorTwist (``NVIDIA_DALI_Pipelines.py:465``)."""
    m, b = color_twist_matrix(brightness, contrast, hue_deg, saturation)
    return img @ m.T + b


def grid_mask_keep(coords_yx: jnp.ndarray, angle_deg: jnp.ndarray,
                   shift_yx: jnp.ndarray, ratio: jnp.ndarray,
                   tile: jnp.ndarray) -> jnp.ndarray:
    """GridMask keep-indicator evaluated at coordinates (1 keep, 0 masked).

    Equivalent of DALI ``ops.GridMask(angle, shift_x, shift_y, ratio, tile)``
    (``NVIDIA_DALI_Pipelines.py:460``): a regular grid of square cutouts of
    side ``ratio * tile`` with period ``tile``, rotated by ``angle`` and
    shifted; ``ratio == 0`` masks nothing (the reference's "off" setting,
    ``Contrastive_Learning.py:610-611``).

    Shift source — exact reference parity, not a divergence: the reference
    graph wires the FIXATION position into the shift (``shift_x=crop_pos_x,
    shift_y=crop_pos_y`` at ``NVIDIA_DALI_Pipelines.py:460``; the
    ``grid_mask_source`` ExternalSource has only two outputs, ratio and
    tile, ``:440``). ``crop_pos`` is a normalized [0,1) float that DALI
    interprets in pixel units, so the effective shift is ≤1 px there and
    here alike — callers pass ``p.fix_yx`` for the same reason.
    """
    theta = jnp.deg2rad(angle_deg)
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    y = coords_yx[..., 0] - shift_yx[..., 0]
    x = coords_yx[..., 1] - shift_yx[..., 1]
    xr = cos * x - sin * y
    yr = sin * x + cos * y
    tile = jnp.maximum(tile, 1.0)
    fx = jnp.mod(xr, tile)
    fy = jnp.mod(yr, tile)
    cut = ratio * tile
    masked = jnp.logical_and(fx < cut, fy < cut)
    return jnp.where(jnp.logical_and(masked, ratio > 0.0), 0.0, 1.0)


def add_gaussian_noise(img: jnp.ndarray, key: jax.Array, mean: jnp.ndarray,
                       std: jnp.ndarray) -> jnp.ndarray:
    """``images += NormalDistribution(mean, stddev)`` (``NVIDIA_DALI_Pipelines.py:462``)."""
    noise = jax.random.normal(key, img.shape, dtype=img.dtype)
    return img + noise * std + mean


def hflip(img: jnp.ndarray, do_flip: jnp.ndarray) -> jnp.ndarray:
    """Conditional horizontal flip (``ops.Flip``, ``NVIDIA_DALI_Pipelines.py:464``)."""
    return jnp.where(do_flip, img[:, ::-1, :], img)
