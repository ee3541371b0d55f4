"""DETR stack tests: position encodings, transformer, classifier, optimizer
partition, and the glimpse-sequence collection (SURVEY §2 #15-19)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.config import DETRConfig
from multimodal_active_ai_tpu.models import detr as detr_models
from multimodal_active_ai_tpu.models.position_encoding import (
    PositionEmbeddingLearned,
    PositionEmbeddingSine,
)
from multimodal_active_ai_tpu.models.transformer import Transformer
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.train import detr_train


def test_sine_embedding_shape_and_determinism(rng):
    s = jax.random.uniform(rng, (3, 5, 2))
    pe = PositionEmbeddingSine(num_pos_feats=64)
    out = pe.apply({}, s)
    assert out.shape == (3, 5, 128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe.apply({}, s)))


def test_sine_embedding_depends_on_coords(rng):
    # NOTE: the reference normalizes by the per-sequence max
    # (position_encoding.py:43-45), so *constant* sequences at different
    # absolute coords normalize identically; dependence is only on the
    # relative pattern within a sequence. Use non-degenerate sequences.
    pe = PositionEmbeddingSine(num_pos_feats=64)
    a = pe.apply({}, jnp.array([[[0.1, 0.2], [0.9, 0.8], [0.5, 0.5], [0.3, 0.7]]]))
    b = pe.apply({}, jnp.array([[[0.8, 0.1], [0.2, 0.9], [0.6, 0.4], [0.7, 0.3]]]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


def test_learned_embedding(rng):
    s = jax.random.uniform(rng, (2, 6, 2))
    pe = PositionEmbeddingLearned(num_pos_feats=64)
    v = pe.init(rng, s)
    out = pe.apply(v, s)
    assert out.shape == (2, 6, 128)


def test_transformer_shapes(rng):
    t = Transformer(d_model=64, nhead=4, num_encoder_layers=2,
                    num_decoder_layers=2, dim_feedforward=128,
                    return_intermediate_dec=True)
    src = jax.random.normal(rng, (2, 5, 64))
    mask = jnp.zeros((2, 5), bool)
    q = jax.random.normal(rng, (10, 64))
    pos = jax.random.normal(rng, (2, 5, 64))
    v = t.init(rng, src, mask, q, pos)
    hs, memory = t.apply(v, src, mask, q, pos)
    assert hs.shape == (2, 2, 10, 64)  # (dec_layers, B, Q, C)
    assert memory.shape == (2, 5, 64)


def test_transformer_respects_padding_mask(rng):
    """Padded saccade positions must not influence the decoder output."""
    t = Transformer(d_model=32, nhead=4, num_encoder_layers=1,
                    num_decoder_layers=1, dim_feedforward=64, dropout=0.0)
    src = jax.random.normal(rng, (1, 4, 32))
    q = jax.random.normal(rng, (3, 32))
    pos = jnp.zeros((1, 4, 32))
    mask = jnp.array([[False, False, True, True]])
    v = t.init(rng, src, mask, q, pos)
    hs1, _ = t.apply(v, src, mask, q, pos)
    # perturb the masked positions: output must be unchanged
    src2 = src.at[:, 2:].add(100.0)
    hs2, _ = t.apply(v, src2, mask, q, pos)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2), atol=1e-4)


@pytest.fixture(scope="module")
def tiny_detr(rng):
    cfg = DETRConfig(enc_layers=1, dec_layers=1, hidden_dim=64, nheads=4,
                     dim_feedforward=128, num_queries=4, dataset="imagenet")
    model, criterion = detr_models.build(cfg, num_classes=10)
    g = jnp.ones((2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    variables = model.init(rng, g, s)
    return cfg, model, criterion, variables


def test_detr_forward_shapes(tiny_detr):
    cfg, model, criterion, variables = tiny_detr
    g = jnp.ones((2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    out = model.apply(variables, g, s)
    assert out["pred_logits"].shape == (2, 4, 10)
    losses = criterion(out["pred_logits"], jnp.array([1, 2]))
    assert np.isfinite(float(losses["loss_ce"]))


def test_detr_param_labels(tiny_detr):
    cfg, model, criterion, variables = tiny_detr
    labels = detr_train.detr_param_labels(variables["params"])
    flat = jax.tree.leaves(labels)
    assert set(flat) <= {"head", "backbone", "frozen"}
    # the stem must be frozen, layer4 trainable at lr_backbone
    assert labels["backbone_f"]["conv1"]["kernel"] == "frozen"
    l4 = [k for k in labels["backbone_f"] if k.startswith("layer4")]
    assert labels["backbone_f"][l4[0]]["Conv_0"]["kernel"] == "backbone"
    assert labels["input_proj"]["kernel"] == "head"


def test_detr_optimizer_freezes_stem(tiny_detr, rng):
    cfg, model, criterion, variables = tiny_detr
    tx = detr_train.make_detr_optimizer(variables["params"], 1e-3, 1e-4,
                                        1e-4, 0.1, 200, 100)
    state = tx.init(variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, state, variables["params"])
    stem_update = updates["backbone_f"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(stem_update), 0.0)
    head_update = updates["input_proj"]["kernel"]
    assert np.abs(np.asarray(head_update)).max() > 0


def test_detr_optimizer_from_init_trains_everything(tiny_detr):
    """pretrained_backbone=False labels EVERY param 'head' — the queue9
    postmortem fix: from-scratch runs must not freeze a random-init stem."""
    cfg, model, criterion, variables = tiny_detr
    tx = detr_train.make_detr_optimizer(variables["params"], 1e-3, 1e-4,
                                        1e-4, 0.1, 200, 100,
                                        pretrained_backbone=False)
    state = tx.init(variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, state, variables["params"])
    stem_update = updates["backbone_f"]["conv1"]["kernel"]
    assert np.abs(np.asarray(stem_update)).max() > 0
    # and every leaf moves (nothing silently left in a zero partition)
    assert all(np.abs(np.asarray(u)).max() > 0 for u in jax.tree.leaves(updates))


def test_group_norm_backbone_builds_and_steps(rng):
    """--backbone-norm group: a from-scratch backbone with real normalization
    (stats-less FrozenBN on a random init normalizes nothing)."""
    cfg = DETRConfig(enc_layers=1, dec_layers=1, hidden_dim=64, nheads=4,
                     dim_feedforward=128, num_queries=4, dataset="imagenet",
                     backbone_norm="group")
    model, criterion = detr_models.build(cfg, num_classes=10)
    g = jax.random.uniform(rng, (2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    variables = model.init(rng, g, s)
    # GroupNorm carries no running statistics
    assert "backbone_f" not in variables.get("batch_stats", {})
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})}, g, s)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_load_backbone_flag_and_group_norm_guard(tmp_path, tiny_detr):
    from detr_image_classification import load_backbone_into_detr

    cfg, model, criterion, variables = tiny_detr
    out, loaded = load_backbone_into_detr(variables, "")
    assert loaded is False and out is variables
    out, loaded = load_backbone_into_detr(variables, str(tmp_path / "nope"))
    assert loaded is False
    # a group-norm model (no FrozenBN buffers) must refuse a checkpoint
    # rather than load weights whose normalization it cannot represent
    f = tmp_path / "bb.msgpack"
    f.write_bytes(b"x")
    gn_vars = {"params": variables["params"], "batch_stats": {}}
    with pytest.raises(ValueError, match="backbone-norm group"):
        load_backbone_into_detr(gn_vars, str(f))


def test_collect_glimpse_sequence(rng):
    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              supersample=1)
    images = jax.random.randint(rng, (2, 64, 64, 3), 0, 256).astype(jnp.uint8)
    g, s, mask = detr_train.collect_glimpse_sequence(images, rng, cfg, 5)
    assert g.shape == (2, 5, 30, 30, 12)
    assert s.shape == (2, 5, 2)
    assert mask.shape == (2, 5)
    assert (np.asarray(s) >= 0).all() and (np.asarray(s) < 1).all()
    # mask marks a suffix of padded fixations
    m = np.asarray(mask)[0]
    assert (np.diff(m.astype(int)) >= 0).all()
