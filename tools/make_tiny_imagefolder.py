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

``--cue right-stripe`` switches to the location-cued family used to prove
the RLS driver's learned-saccade question on real JPEGs: the background is
the SAME gray grating for every class (class-uninformative), and the class
hue lives ONLY in a vertical stripe on the right 10% of the canvas — the
640px JPEG version of the synthetic task
``tests/test_convergence.py::test_rls_policy_eval_beats_random_eval``
already proves separates greedy-policy eval from random-saccade eval.
Retina geometry (crop window origin = fix·(canvas−crop), crop sizes
400/240/100/30 of a 640 canvas): the stripe at x ∈ [0.9, 1.0) enters the
coarsest 400-window only when fix_x ≳ 0.8, so a random fixation sees the
cue ~17% of the time while a policy that learns fix_x → 1 always does.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _hue_basis(c: int, ncls: int) -> np.ndarray:
    hue = (c / ncls) * 2 * np.pi
    return np.array([np.cos(hue), np.cos(hue - 2 * np.pi / 3),
                     np.cos(hue + 2 * np.pi / 3)]) * 0.5 + 0.5


def class_image(c: int, ncls: int, inst: int, size: int,
                rng: np.random.RandomState) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size] / size
    base = _hue_basis(c, ncls)
    freq = 2 + (inst * 7) % 5
    ang = inst * 2.399
    grating = 0.5 + 0.5 * np.sin(
        2 * np.pi * freq * (xx * np.cos(ang) + yy * np.sin(ang))
        + rng.uniform(0, 2 * np.pi))
    img = base[None, None, :] * (0.35 + 0.65 * grating[..., None])
    img = img + rng.normal(0, 0.02, img.shape)       # mild sensor noise
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def cue_stripe_image(c: int, ncls: int, inst: int, size: int,
                     rng: np.random.RandomState,
                     frac0: float = 0.9, frac1: float = 1.0) -> np.ndarray:
    """Location-cued image: gray class-uninformative background, class hue
    only in the vertical stripe x ∈ [frac0, frac1) (the 640px JPEG analogue
    of ``tests/test_convergence.py::test_rls_policy_eval_beats_random_eval``'s
    64px in-memory task)."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    phase = rng.uniform(0, 2 * np.pi)
    bg = 0.5 + 0.25 * np.sin(2 * np.pi * 3 * (xx + yy) + phase)
    img = np.repeat(bg[..., None], 3, axis=2)
    x0, x1 = int(round(frac0 * size)), int(round(frac1 * size))
    tex = 0.6 + 0.4 * np.sin(2 * np.pi * 4 * yy[:, x0:x1] + inst * 1.7)
    img[:, x0:x1] = _hue_basis(c, ncls)[None, None, :] * tex[..., None]
    img = img + rng.normal(0, 0.02, img.shape)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def fovea_stripe_image(c: int, ncls: int, inst: int, size: int,
                       rng: np.random.RandomState) -> np.ndarray:
    """``cue_stripe_image`` with the stripe at x ∈ [0.84375, 0.9375)
    ([540, 600) at 640px) — centered on the fovea of the LARGEST fixation an
    A=10 action grid can express (fix = 9/10 → 30 px fovea at
    x ∈ [549, 579], fully inside the cue). The queue7 postmortem (PARITY.md)
    showed the right-edge stripe and a tractable action grid are mutually
    exclusive: at A=10 the fovea tops out 3 px into a [576, 640) stripe."""
    return cue_stripe_image(c, ncls, inst, size, rng,
                            frac0=0.84375, frac1=0.9375)


def wide_stripe_image(c: int, ncls: int, inst: int, size: int,
                      rng: np.random.RandomState) -> np.ndarray:
    """``cue_stripe_image`` with a 2× wider stripe, x ∈ [0.75, 0.9375)
    ([480, 600) at 640px): same A=10-foveatable right edge as fovea-stripe,
    but ~9 px instead of ~4.5 px wide in the coarsest 30 px glimpse and
    visible to the coarse window for fix_x > 0.33 (~67% of random
    fixations vs ~42%). The queue8/part-7 postmortems (PARITY.md) found
    CE stuck at the ln(4) floor from-init too, pointing at raw cue signal
    strength rather than the backbone — this is the signal-strength knob
    while still leaving headroom for a learned fix → 0.9 policy to add
    foveal detail."""
    return cue_stripe_image(c, ncls, inst, size, rng,
                            frac0=0.75, frac1=0.9375)


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--per-class", type=int, default=96)
    ap.add_argument("--val-per-class", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cue", choices=["none", "right-stripe", "fovea-stripe",
                                      "wide-stripe"],
                    default="none",
                    help="location-cued family for the RLS learned-saccade "
                         "evidence run (class hue only in a vertical stripe; "
                         "fovea-stripe centers it on the A=10 grid's max "
                         "fixation fovea; wide-stripe doubles its width for "
                         "signal strength)")
    args = ap.parse_args()
    gen = {"right-stripe": cue_stripe_image,
           "fovea-stripe": fovea_stripe_image,
           "wide-stripe": wide_stripe_image,
           "none": class_image}[args.cue]

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
        img = gen(c, args.classes, inst, args.size, rng)
        Image.fromarray(img).save(path + ".tmp", format="JPEG", quality=90)
        os.replace(path + ".tmp", path)

    with ThreadPoolExecutor(max_workers=os.cpu_count() or 8) as pool:
        list(pool.map(make, jobs))
    print(f"{args.out}: {args.classes} classes × {args.per_class} train "
          f"+ {args.val_per_class} val JPEGs at {args.size}px")


if __name__ == "__main__":
    main()
