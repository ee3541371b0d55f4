#!/usr/bin/env python
"""Generate a tiny labeled ImageFolder dataset of structured JPEGs.

Purpose: the driver-level TPU learning run (PARITY.md round-4) needs a real
JPEG corpus on disk that flows through the production host path
(``HostLoader`` -> canvas cache -> device retina) AND carries learnable
class structure — class = dominant hue, instance = grating frequency/
orientation/phase (the same family as ``tests/test_convergence.py:
structured_images``, written as JPEGs in ``train/<class>/`` /
``val/<class>/`` layout so ``list_image_folder`` and the reference CLI
conventions apply).

Usage: python tools/make_tiny_imagefolder.py OUT_DIR [--classes 10]
       [--per-class 96] [--val-per-class 16] [--size 640]
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def class_image(c: int, ncls: int, inst: int, size: int,
                rng: np.random.RandomState) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size] / size
    hue = (c / ncls) * 2 * np.pi
    base = np.array([np.cos(hue), np.cos(hue - 2 * np.pi / 3),
                     np.cos(hue + 2 * np.pi / 3)]) * 0.5 + 0.5
    freq = 2 + (inst * 7) % 5
    ang = inst * 2.399
    grating = 0.5 + 0.5 * np.sin(
        2 * np.pi * freq * (xx * np.cos(ang) + yy * np.sin(ang))
        + rng.uniform(0, 2 * np.pi))
    img = base[None, None, :] * (0.35 + 0.65 * grating[..., None])
    img = img + rng.normal(0, 0.02, img.shape)       # mild sensor noise
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--per-class", type=int, default=96)
    ap.add_argument("--val-per-class", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    jobs = []
    for split, n in (("train", args.per_class), ("val", args.val_per_class)):
        for c in range(args.classes):
            d = os.path.join(args.out, split, f"class_{c:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                jobs.append((split, c, i, os.path.join(d, f"{i:04d}.jpg")))

    def make(job):
        split, c, i, path = job
        if os.path.isfile(path):
            return
        inst = i + (10_000 if split == "val" else 0)
        rng = np.random.RandomState(args.seed + 131 * c + inst)
        img = class_image(c, args.classes, inst, args.size, rng)
        Image.fromarray(img).save(path + ".tmp", format="JPEG", quality=90)
        os.replace(path + ".tmp", path)

    with ThreadPoolExecutor(max_workers=os.cpu_count() or 8) as pool:
        list(pool.map(make, jobs))
    print(f"{args.out}: {args.classes} classes × {args.per_class} train "
          f"+ {args.val_per_class} val JPEGs at {args.size}px")


if __name__ == "__main__":
    main()
