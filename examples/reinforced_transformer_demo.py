#!/usr/bin/env python
"""Glimpse-captioner demo (Reinforced Transformer notebook parity).

Script equivalent of ``.ipynb_checkpoints/Reinforced Transformer-checkpoint
.ipynb`` (SURVEY §2 #28): the reference prototype wires an
Annotated-Transformer-style image-decoder × sentence-decoder that generates
captions from glimpses, plus a motor (saccade) generator. Here the
productionized pieces run end to end on synthetic data: the retina collects
a glimpse sequence at policy-proposed saccades (the DQN is the framework's
motor generator), a frozen encoder extracts per-glimpse features, the
GlimpseCaptioner is trained for a few teacher-forcing steps, and greedy
decoding generates token ids from the glimpse memory.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from multimodal_active_ai_tpu.models import SimCLRModule
from multimodal_active_ai_tpu.models.qnet import build_dqn
from multimodal_active_ai_tpu.models.text import (
    BOS_ID,
    GlimpseCaptioner,
    tokenize,
)
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.train.rls_train import make_rollout

VOCAB = 512
MAX_LEN = 8


def main():
    rng = jax.random.PRNGKey(15)
    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              glimpse_size=30, supersample=1)
    batch, fixations = 4, 3
    images = jax.random.randint(rng, (batch, 64, 64, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)

    # motor generator: the DQN policy proposes where to look next from the
    # previous glimpse (untrained here; the RLS driver trains it)
    dqn = build_dqn(arch="ResNet18", num_of_actions=100, axis_name=None,
                    norm_kind="bn")
    sample = jnp.ones((2, cfg.glimpse_size, cfg.glimpse_size,
                       cfg.num_channels))
    dqn_vars = dqn.init(rng, sample, train=False)
    rollout = make_rollout(dqn, cfg, fixations, num_of_actions=100,
                           eps_start=0.9, eps_end=0.05, eps_decay=30.0)
    ro = rollout(dqn_vars, images, rng, jnp.asarray(1, jnp.int32))
    glimpses, saccades = ro.glimpses, ro.saccades
    print("glimpse sequence:", glimpses.shape, "saccades:", saccades.shape)

    # frozen encoder features per glimpse
    enc = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    enc_vars = enc.init(rng, glimpses[:, 0], train=False)
    feats = jnp.stack([
        enc.apply(enc_vars, glimpses[:, j], train=False,
                  method=SimCLRModule.features).reshape(batch, -1)
        for j in range(fixations)], axis=1)
    print("glimpse features:", feats.shape)

    # caption decoder: a few teacher-forcing steps on toy captions
    captions = ["a red square", "a blue circle", "a green dot", "a cat"]
    toks = jnp.asarray([tokenize(c, VOCAB, MAX_LEN)[0] for c in captions])
    model = GlimpseCaptioner(vocab_size=VOCAB, d_model=64, nhead=4,
                             num_layers=2, dim_feedforward=128)
    params = model.init(rng, feats, toks, train=False)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, feats, toks[:, :-1], train=False)
        targets = toks[:, 1:]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        return jnp.mean(jnp.where(targets != 0, ce, 0.0))

    step = jax.jit(lambda p, o: (lambda l, g: (l, *tx.update(g, o, p)))(
        *jax.value_and_grad(loss_fn)(p)))
    for i in range(5):
        loss, updates, opt_state = step(params, opt_state)
        params = optax.apply_updates(params, updates)
        print(f"caption CE step {i}: {float(loss):.4f}")

    # greedy decoding from the glimpse memory
    ids = jnp.full((batch, 1), BOS_ID, jnp.int32)
    for _ in range(MAX_LEN - 1):
        logits = model.apply({"params": params}, feats, ids, train=False)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
    print("greedy-decoded token ids:\n", jax.device_get(ids))


if __name__ == "__main__":
    main()
