"""Generic frozen-parameter guard: from-init configurations train EVERYTHING.

The round-4 queue9 postmortem (PARITY.md): ``make_detr_optimizer`` applied
the pretrained-backbone param groups unconditionally, so every "from-init"
RLS hardware run silently trained a transformer readout on a frozen
random-init CNN — and THREE TPU attempts were spent before any test caught
it. This module is the guard the verdict asked for: for each driver's
from-scratch configuration, run ONE production train step and assert every
trainable parameter leaf's update norm is nonzero. Any future
silently-frozen-group regression (optimizer partitions, stop_gradients,
mislabeled trees) fails here, on CPU, before TPU spend.

Intentionally-frozen parts are asserted to be *exactly* unchanged instead
(the probe/captions encoders — ``Representation_Evaluation.py:598-654``
freezes the encoder by design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.ops import retina

CFG = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                          supersample=1)


# The FIRST decoder layer's self-attention value projection has a
# structurally zero gradient in any DETR: the decoder target starts as
# zeros (``detr_CLA/models/transformer.py:61``: ``tgt = torch.zeros_like
# (query_embed)``), so that projection's input is identically zero on every
# step. The reference's torch model has the same dead kernel; it is not a
# frozen-group bug. (With ≥2 decoder layers only layer 0 is affected.)
STRUCTURAL_ZERO_GRAD = (
    "['transformer']['TransformerDecoderLayer_0']['_MHA_0']"
    "['MultiHeadDotProductAttention_0']['value']['kernel']",
)


def _assert_all_leaves_moved(before, after, what):
    moved, stuck = [], []
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree.leaves(after)
    for (path, b), a in zip(flat_b, flat_a):
        key = jax.tree_util.keystr(path)
        if key in STRUCTURAL_ZERO_GRAD:
            continue
        norm = float(np.linalg.norm(np.asarray(a, np.float64)
                                    - np.asarray(b, np.float64)))
        (moved if norm > 0 else stuck).append(key)
    assert not stuck, (
        f"{what}: {len(stuck)}/{len(stuck) + len(moved)} parameter leaves "
        f"had ZERO update after one from-init step — a silently-frozen "
        f"group (queue9 class): {stuck[:10]}")


def _assert_unchanged(before, after, what):
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        assert np.array_equal(np.asarray(b), np.asarray(a)), (
            f"{what}: intentionally-frozen tree changed")


def _tiny_detr():
    from multimodal_active_ai_tpu.models.detr import DETR

    # backbone_norm='group' — the supported from-scratch configuration
    # (detr driver --backbone-norm group). With the DEFAULT stats-less
    # FrozenBN a random-init backbone normalizes nothing: 0-255 glimpses
    # blow activations up until the encoder self-attention softmax
    # saturates to an exact one-hot and Q/K grads are EXACTLY zero in f32
    # — the very pathology the queue9 postmortem documented, reproduced
    # here numerically (the driver refuses-with-warning that combination).
    return DETR(backbone_arch="ResNet18", num_classes=10, num_queries=4,
                hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1,
                dim_feedforward=64, dropout=0.0, backbone_norm="group")


def _batch(rng, n=4):
    images = (jax.random.uniform(rng, (n, 64, 64, 3)) * 255).astype(jnp.uint8)
    labels = jnp.arange(n, dtype=jnp.int32) % 10
    return images, labels


def test_detr_from_init_trains_every_parameter(mesh2, rng):
    """The exact queue9 bug class: a from-scratch DETR run
    (``pretrained_backbone=False``) must update EVERY parameter — backbone
    stem and layer1 included (``DETR_Image_Classification.py`` from-scratch
    path; reference param groups at ``:385-394`` are pretrained-only)."""
    from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
    from multimodal_active_ai_tpu.train import detr_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    model = _tiny_detr()
    criterion = SetCriterion(num_queries=4, num_classes=10)
    variables = model.init(rng, jnp.ones((2, 3, 30, 30, 12)),
                           jnp.full((2, 3, 2), 0.5))
    tx = detr_train.make_detr_optimizer(variables["params"], 1e-3, 1e-5,
                                        0.0, 0.1, 200, 10,
                                        pretrained_backbone=False)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))
    step = detr_train.make_detr_train_step(model, criterion, mesh2, CFG, 3)
    images, labels = _batch(rng)
    before = jax.device_get(state.params)
    # 4 steps at F=3, not 1 step: two init degeneracies give EXACTLY zero
    # grads on early steps without any frozen group — (a) the decoder tgt
    # is zeros and value/out biases are zero-init, so self-attention Q/K/out
    # kernel grads vanish until the biases move (step 2+); (b) a step that
    # draws num_fixs=1 leaves the encoder self-attention with a single
    # unmasked token (softmax ≡ 1 → zero Q/K grad), so several steps are
    # needed for a >1-token draw. set_to_zero()-style freezes never move,
    # which is what this guard detects.
    for s in range(4):
        state, m = step(state, images, labels, jax.random.PRNGKey(2 + s))
    assert np.isfinite(float(jax.device_get(m["loss_ce"])))
    _assert_all_leaves_moved(before, jax.device_get(state.params),
                             "DETR from-init")


@pytest.mark.slow
def test_simclr_trains_every_parameter(mesh2, rng):
    """SimCLR pretraining has no frozen groups: every encoder + projector
    leaf must move (``Contrastive_Learning.py:697-699``)."""
    import optax
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.train import simclr_train

    model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    state = simclr_train.create_train_state(
        model, optax.adam(1e-3), rng, jnp.ones((2, 30, 30, 12)))
    step = simclr_train.make_train_step(model, mesh2, CFG, num_fixations=2,
                                        temperature=0.5, donate=False)
    images, _ = _batch(rng)
    before = jax.device_get(state.params)
    state, _ = step(state, images, jax.random.PRNGKey(2))
    _assert_all_leaves_moved(before, jax.device_get(state.params), "SimCLR")


@pytest.mark.slow
def test_rls_from_init_trains_detr_and_dqn_everywhere(mesh2, rng):
    """RLS from-init: the DETR update must move every DETR leaf and the
    Bellman update must move every policy-DQN leaf
    (``DETR_Image_Classification_RLS.py:731-788``)."""
    import optax
    from multimodal_active_ai_tpu.models.qnet import build_dqn
    from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
    from multimodal_active_ai_tpu.train import detr_train, rls_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    model = _tiny_detr()
    criterion = SetCriterion(num_queries=4, num_classes=10)
    variables = model.init(rng, jnp.ones((2, 3, 30, 30, 12)),
                           jnp.full((2, 3, 2), 0.5))
    tx = detr_train.make_detr_optimizer(variables["params"], 1e-3, 1e-5,
                                        0.0, 0.1, 200, 10,
                                        pretrained_backbone=False)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))
    dqn = build_dqn(arch="ResNet18", num_of_actions=10, axis_name=None,
                    norm_kind="bn")
    dqn_vars = dqn.init(jax.random.fold_in(rng, 1),
                        jnp.ones((2, 30, 30, 12)), train=False)
    policy_state = TrainState.create(apply_fn=dqn.apply,
                                     params=dqn_vars["params"],
                                     tx=optax.rmsprop(1e-3),
                                     batch_stats=dqn_vars["batch_stats"])

    step = rls_train.make_rls_train_step(model, criterion, dqn, mesh2, CFG,
                                         num_fixations=3, num_of_actions=10,
                                         eps_start=0.9, eps_end=0.05,
                                         eps_decay=10.0)
    images, labels = _batch(rng)
    before = jax.device_get(state.params)
    # 3 steps for the same init-degeneracy reason as the DETR guard above
    for s in range(3):
        state, m, rollout, reward = step(state, dqn_vars, images, labels,
                                         jax.random.PRNGKey(4 + s),
                                         jnp.asarray(0, jnp.int32))
    _assert_all_leaves_moved(before, jax.device_get(state.params),
                             "RLS/DETR from-init")

    bellman = rls_train.make_dqn_update_step(dqn, num_of_actions=10,
                                             gamma=0.0, mesh=mesh2)
    glimpses = jax.device_get(rollout.glimpses)
    transition = (jnp.asarray(glimpses[:, 0]),
                  jnp.zeros((4, 2), jnp.int32),
                  jnp.asarray(glimpses[:, 1]),
                  jnp.asarray(jax.device_get(reward)))
    target_vars = jax.tree.map(lambda x: x, dqn_vars)
    before_dqn = jax.device_get(policy_state.params)
    policy_state, loss = bellman(policy_state, target_vars, transition)
    assert np.isfinite(float(jax.device_get(loss)))
    _assert_all_leaves_moved(before_dqn, jax.device_get(policy_state.params),
                             "RLS/DQN Bellman")


@pytest.mark.slow
def test_probe_trains_probe_and_freezes_encoder(mesh2, rng):
    """Linear probe: every probe leaf moves; the encoder is frozen BY DESIGN
    and must be bit-identical (``Representation_Evaluation.py:598-654``)."""
    import optax
    from multimodal_active_ai_tpu.models import LogisticRegression, SimCLRModule
    from multimodal_active_ai_tpu.train import eval_probe
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    encoder = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    enc_vars = encoder.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    probe = LogisticRegression(num_classes=10)
    pv = probe.init(rng, jnp.ones((2, 512 * 16 * 2)))
    state = TrainState.create(apply_fn=probe.apply, params=pv["params"],
                              tx=optax.adam(1e-3), batch_stats={})
    step = eval_probe.make_probe_train_step(encoder, probe, mesh2, CFG, 2)
    images, labels = _batch(rng)
    before_probe = jax.device_get(state.params)
    before_enc = jax.device_get(enc_vars)
    state, m = step(state, enc_vars, images, labels, jax.random.PRNGKey(1))
    _assert_all_leaves_moved(before_probe, jax.device_get(state.params),
                             "probe head")
    _assert_unchanged(before_enc, jax.device_get(enc_vars), "probe encoder")


@pytest.mark.slow
def test_caption_probe_trains_both_towers(mesh2, rng):
    """Captions probe: image head AND text tower leaves all move; the
    encoder stays frozen (probe scope of component #27)."""
    import optax
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.models.mlp import MLP
    from multimodal_active_ai_tpu.models.text import TextEncoder
    from multimodal_active_ai_tpu.train import caption_probe
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    encoder = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    enc_vars = encoder.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    head = MLP(hidden_dim=64, output_dim=32)
    text = TextEncoder(vocab_size=50, d_model=32, nhead=2, num_layers=1,
                       dim_feedforward=64, out_dim=32, dropout=0.0)
    hp = head.init(rng, jnp.ones((2, 512 * 16 * 2)))["params"]
    tokens = jnp.ones((4, 8), jnp.int32)
    tp = text.init(jax.random.fold_in(rng, 1), tokens, train=False)["params"]
    state = TrainState.create(apply_fn=None,
                              params={"image_head": hp, "text": tp},
                              tx=optax.adam(1e-3), batch_stats={})
    step = caption_probe.make_caption_probe_train_step(
        encoder, head, text, mesh2, CFG, 2, temperature=0.5)
    images, _ = _batch(rng)
    before = jax.device_get(state.params)
    state, m = step(state, enc_vars, images, tokens, jax.random.PRNGKey(3))
    assert np.isfinite(float(jax.device_get(m["loss"])))
    _assert_all_leaves_moved(before, jax.device_get(state.params),
                             "caption towers")
