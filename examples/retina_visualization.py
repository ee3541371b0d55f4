#!/usr/bin/env python
"""Visual verification of the foveated retina (notebook parity).

Script equivalent of the reference's ``SimCLR/NVIDIA DALI/NVIDIA DALI.ipynb``
(SURVEY §2 #25): builds the visualization pipeline, renders the 5-level
foveation pyramid (full canvas + 4 crops and their 30×30 resizes) for a
given image and fixation, and saves a contact sheet. Works on any image file
or a generated test pattern.

Usage::

    python examples/retina_visualization.py [IMAGE] [--fix-x 0.3 --fix-y 0.7]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.ops import retina


def load_image(path: str | None, size: int = 640) -> np.ndarray:
    if path:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB").resize((size, size)), np.uint8)
    # generated test pattern: radial gradient + grid lines
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    r = np.sqrt((y - size / 2) ** 2 + (x - size / 2) ** 2) / (size / 2)
    img = np.stack([255 * (1 - r), 128 + 0 * r, 255 * r], -1)
    img[::40] = 255
    img[:, ::40] = 0
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None)
    ap.add_argument("--fix-x", type=float, default=0.3)
    ap.add_argument("--fix-y", type=float, default=0.7)
    ap.add_argument("--angle", type=float, default=15.0)
    ap.add_argument("--out", default="/tmp/retina_pyramid.png")
    args = ap.parse_args()

    img = jnp.asarray(load_image(args.image))
    cfg = retina.RetinaConfig()
    crops, resizes = retina.foveated_pyramid(
        img, jnp.array([args.fix_y, args.fix_x]), jnp.float32(args.angle), cfg)

    print("pyramid crops:", [tuple(c.shape) for c in crops])
    print("glimpse resizes:", [tuple(r.shape) for r in resizes])

    # contact sheet: the 30x30 resizes side by side, upscaled for visibility
    tiles = [np.asarray(jax.image.resize(r, (120, 120, 3), "nearest"))
             for r in resizes]
    sheet = np.concatenate(tiles, axis=1).clip(0, 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(sheet).save(args.out)
        print(f"saved pyramid contact sheet to {args.out}")
    except Exception as e:
        print(f"(could not save image: {e})")


if __name__ == "__main__":
    main()
