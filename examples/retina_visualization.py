#!/usr/bin/env python
"""Visual verification of the foveated retina (notebook parity).

Script equivalent of the reference's ``SimCLR/NVIDIA DALI/NVIDIA DALI.ipynb``
(SURVEY §2 #25): builds the visualization pipeline, renders the 5-level
foveation pyramid (full canvas + 4 crops and their 30×30 resizes) for a
given image and fixation, renders the COCO bbox overlay (with the
bbox-consistent horizontal flip of the reference reader,
``NVIDIA_DALI_Pipelines.py:56-64``) when annotations are given, and saves
contact sheets. Works on any image file or a generated test pattern.

Usage::

    python examples/retina_visualization.py [IMAGE] [--fix-x 0.3 --fix-y 0.7]
    python examples/retina_visualization.py COCO_IMG --annotations FILE [--flip]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.data.readers import bb_hflip, list_coco_images
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


def draw_boxes(img: np.ndarray, boxes_ltrb: np.ndarray,
               color=(255, 32, 32), thickness: int = 3) -> np.ndarray:
    """Burn normalized-ltrb rectangles into an RGB canvas (the notebook's
    bbox overlay, ``NVIDIA DALI.ipynb`` readers section)."""
    out = img.copy()
    s = img.shape[0]
    c = np.asarray(color, np.uint8)
    for l, t, r, b in np.asarray(boxes_ltrb, np.float32).reshape(-1, 4):
        x0, y0 = int(l * s), int(t * s)
        x1, y1 = int(r * s), int(b * s)
        x0, x1 = sorted((max(0, min(x0, s - 1)), max(0, min(x1, s - 1))))
        y0, y1 = sorted((max(0, min(y0, s - 1)), max(0, min(y1, s - 1))))
        th = thickness
        out[y0:y0 + th, x0:x1 + 1] = c
        out[max(y1 - th + 1, 0):y1 + 1, x0:x1 + 1] = c
        out[y0:y1 + 1, x0:x0 + th] = c
        out[y0:y1 + 1, max(x1 - th + 1, 0):x1 + 1] = c
    return out


def boxes_for_image(image_path: str, annotations_file: str):
    """The image's normalized-ltrb boxes from a COCO annotations JSON."""
    root = os.path.dirname(os.path.abspath(image_path))
    files, boxes, labels = list_coco_images(root, annotations_file,
                                            with_boxes=True)
    want = os.path.basename(image_path)
    for f, bx, lb in zip(files, boxes, labels):
        if os.path.basename(f) == want:
            return bx, lb
    return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None)
    ap.add_argument("--fix-x", type=float, default=0.3)
    ap.add_argument("--fix-y", type=float, default=0.7)
    ap.add_argument("--angle", type=float, default=15.0)
    ap.add_argument("--out", default="/tmp/retina_pyramid.png")
    ap.add_argument("--annotations", default=None,
                    help="COCO annotations JSON: render the bbox overlay")
    ap.add_argument("--flip", action="store_true",
                    help="horizontal flip (image + bbox-consistent BbFlip)")
    args = ap.parse_args()

    img = jnp.asarray(load_image(args.image))

    if args.annotations:
        boxes, box_labels = boxes_for_image(args.image, args.annotations)
        canvas = np.asarray(img)
        if args.flip:  # image flip + BbFlip, NVIDIA_DALI_Pipelines.py:56-64
            canvas = canvas[:, ::-1]
            boxes = bb_hflip(boxes)
        overlay = draw_boxes(canvas, boxes)
        overlay_out = os.path.splitext(args.out)[0] + "_boxes.png"
        try:
            from PIL import Image

            Image.fromarray(overlay).save(overlay_out)
            print(f"saved bbox overlay ({len(boxes)} boxes, labels "
                  f"{sorted(set(int(x) for x in box_labels))}) to {overlay_out}")
        except Exception as e:
            print(f"(could not save overlay: {e})")
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
