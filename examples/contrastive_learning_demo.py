#!/usr/bin/env python
"""End-to-end SimCLR chain demo (notebook parity).

Script equivalent of ``Contrastive Learning.ipynb`` (SURVEY §2 #24): the
reference notebook manually drives COCOReader → FoveatedRetinalProcessor →
SimCLR forward on two views → the naive module-level loss
(``SimCLR/SimCLR.py:36-144``) and constructs one optimizer. Here the same
chain runs on synthetic data: retina → SimCLR forward on two views → both
the naive O(N²) NT-Xent and the production cross-batch loss, then one
optimizer step — each stage printing its shapes, so it doubles as an
interactive smoke test of the full stack.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.models import SimCLRModule
from multimodal_active_ai_tpu.objectives.ntxent import (
    contrastive_loss,
    naive_ntxent_loss,
)
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train


def main():
    rng = jax.random.PRNGKey(15)
    cfg = retina.RetinaConfig(canvas_size=256, crop_sizes=(160, 96, 40, 30),
                              supersample=2)
    batch = 8

    # "reader": synthetic uint8 canvases (the notebook reads MSCOCO)
    images = jax.random.randint(rng, (batch, 256, 256, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)
    print("reader batch:", images.shape, images.dtype)

    # retina: two augmented views of the same batch
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    p1 = retina.sample_unlabeled_params(k1, batch, 256, cfg)
    p2 = retina.sample_unlabeled_params(k2, batch, 256, cfg)
    v1 = retina.unlabeled_glimpses(images, p1, k3, cfg)
    v2 = retina.unlabeled_glimpses(images, p2, k4, cfg)
    print("glimpse stacks:", v1.shape, "(B, 30, 30, 12)")

    # SimCLR module: encoder f (ResNet-18 with foveated surgery) + projector g
    model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    variables = model.init(rng, v1, train=False)
    h1 = model.apply(variables, v1, train=False)
    h2 = model.apply(variables, v2, train=False)
    print("projections:", h1.shape, "(B, 128)")

    # losses: naive O(N²) oracle (the notebook's compute_loss) vs production
    naive = naive_ntxent_loss(h1, h2, temperature=0.5)
    loss, logits_ab, labels = contrastive_loss(h1, h2, temperature=0.5)
    print(f"naive NT-Xent: {float(naive):.4f}   "
          f"cross-batch NT-Xent: {float(loss):.4f}")

    # one optimizer construction + train step (the notebook stops here too)
    sched = schedule.simclr_learning_rate(0.01, batch, 64, batch, 1, 5)
    tx = optimizers.get_optimizer("lars", sched)
    state = simclr_train.create_train_state(model, tx, rng, v1[:2])
    step = simclr_train.make_train_step(model, None, cfg, num_fixations=2,
                                        temperature=0.5, donate=False)
    state, metrics = step(state, images, rng)
    print("one train step, per-fixation losses:",
          [round(float(x), 4) for x in metrics["losses"]])


if __name__ == "__main__":
    main()
