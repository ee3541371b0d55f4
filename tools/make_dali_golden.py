#!/usr/bin/env python
"""Generate the DALI-convention golden fixture (tests/data/dali_golden.npz).

The retina test suite compares fast-vs-exact-canvas (internal consistency);
nothing pinned the EXTERNAL resampling conventions of the reference's DALI
graph (``NVIDIA_DALI_Pipelines.py:444-479``) — anchor semantics of
``Crop(crop_pos)``, rotation direction/center, antialiased triangle-filter
resizes. This script computes, ONCE, an independent oracle for two
deterministic parameter sets using PIL equivalents of the DALI ops
(Pillow's crop/rotate/resize implement the same conventions: corner-anchored
integer crops, counter-clockwise bilinear rotate about the image center
with zero fill, antialiased bilinear resize), and commits the expected
glimpse stacks. ``tests/test_dali_golden.py`` asserts the exact ``canvas``
retina mode reproduces them within tolerance.

Oracle chain per case (uint8 per stage, like DALI):
  [RandomResizedCrop window -> resize 640]  (unlabeled case only, :416)
  -> Rotate(angle)                          (:457; expand+center-crop ==
                                             fixed-canvas rotation, see
                                             image_ops.rotate_coords)
  -> Flip                                   (unlabeled case, :464)
  -> Crop(crop_pos)+Resize(30) pyramid      (:467-477)

Run from the repo root: python tools/make_dali_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANVAS = 640
CROPS = (400, 240, 100, 30)
GLIMPSE = 30


def make_source(seed: int = 7) -> np.ndarray:
    """Structured 640x640 RGB: smooth gradients + circles + an oriented
    grating, so rotation/crop/filter convention errors produce large,
    localized diffs (pure noise would hide a 1-px anchor bug)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:CANVAS, 0:CANVAS].astype(np.float32)
    r = np.hypot(y - 200, x - 420)
    img = np.stack([
        128 + 100 * np.sin(2 * np.pi * (0.7 * x + 0.3 * y) / 61.0),
        255 * (x / CANVAS),
        200 * np.exp(-((r / 180.0) ** 2)) + 40,
    ], axis=-1)
    img += rng.normal(0.0, 4.0, img.shape)
    for cy, cx, rad, ch in ((480, 140, 90, 0), (330, 330, 60, 1), (90, 90, 45, 2)):
        mask = (y - cy) ** 2 + (x - cx) ** 2 < rad ** 2
        img[..., ch][mask] = 235.0
    return np.clip(img, 0, 255).astype(np.uint8)


def oracle(img: np.ndarray, fix_yx, angle: float, rrc_origin_yx=None,
           rrc_size_hw=None, flip: bool = False) -> np.ndarray:
    im = Image.fromarray(img)
    if rrc_origin_yx is not None:
        oy, ox = rrc_origin_yx
        h, w = rrc_size_hw
        im = im.crop((ox, oy, ox + w, oy + h)).resize(
            (CANVAS, CANVAS), Image.BILINEAR)
    if angle:
        # PIL: positive = counter-clockwise, bilinear inverse warp about the
        # image center (corner coords w/2 == center coords (w-1)/2), fill 0
        im = im.rotate(angle, resample=Image.BILINEAR, fillcolor=(0, 0, 0))
    if flip:
        im = im.transpose(Image.FLIP_LEFT_RIGHT)
    glimpses = []
    for crop in CROPS:
        oy = round(fix_yx[0] * (CANVAS - crop))
        ox = round(fix_yx[1] * (CANVAS - crop))
        g = im.crop((ox, oy, ox + crop, oy + crop)).resize(
            (GLIMPSE, GLIMPSE), Image.BILINEAR)
        glimpses.append(np.asarray(g, np.float32))
    return np.concatenate(glimpses, axis=-1)  # (30, 30, 12)


CASES = {
    # labeled pipeline geometry (probe/DETR/RLS view): rotate + pyramid,
    # fixation chosen so every crop origin is integral (exact PIL crop)
    "labeled": dict(fix_yx=(0.3, 0.7), angle=13.5),
    # unlabeled geometric chain (photometrics off): RRC window + rotate +
    # flip + pyramid
    "unlabeled_geo": dict(fix_yx=(0.6, 0.2), angle=-20.0,
                          rrc_origin_yx=(50, 80), rrc_size_hw=(500, 430),
                          flip=True),
}


def main():
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "dali_golden.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = make_source()
    payload = {"source": src}
    for name, kw in CASES.items():
        payload[f"expected_{name}"] = oracle(src, **kw)
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}")

    # report the deviation of the canvas retina right away (informational).
    # Force CPU: this is a host-side tool and must not grab the exclusive
    # TPU client (the axon plugin ignores JAX_PLATFORMS).
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_active_ai_tpu.ops import retina as R

    cfg = R.RetinaConfig(canvas_size=CANVAS, crop_sizes=CROPS, mode="canvas")
    for name, kw in CASES.items():
        p = R.neutral_params(1, CANVAS)
        p = p._replace(fix_yx=jnp.array([kw["fix_yx"]], jnp.float32),
                       angle=jnp.array([kw["angle"]], jnp.float32))
        if "rrc_origin_yx" in kw:
            p = p._replace(
                rrc_origin_yx=jnp.array([kw["rrc_origin_yx"]], jnp.float32),
                rrc_size_hw=jnp.array([kw["rrc_size_hw"]], jnp.float32),
                flip=jnp.array([kw.get("flip", False)]))
        got = np.asarray(R.apply_retina(jnp.asarray(src[None]), p,
                                        __import__("jax").random.PRNGKey(0),
                                        cfg, photometric=False))[0]
        exp = payload[f"expected_{name}"]
        d = np.abs(got - exp)
        print(f"{name}: mean|d| {d.mean():.3f}  p99 {np.percentile(d, 99):.2f}"
              f"  max {d.max():.1f} (0-255 scale)")


if __name__ == "__main__":
    main()
