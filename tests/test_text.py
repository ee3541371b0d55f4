"""Text tower + captioner tests (multimodal path, SURVEY §2 #27/#28)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.models.text import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    GlimpseCaptioner,
    TextEncoder,
    Vocabulary,
    tokenize,
)


def test_tokenize_structure():
    ids, mask = tokenize("A man riding a horse.", max_len=16)
    assert len(ids) == 16 and len(mask) == 16
    assert ids[0] == BOS_ID
    assert EOS_ID in ids
    assert sum(mask) == ids.index(EOS_ID) + 1 if EOS_ID in ids else True
    # deterministic hashing
    ids2, _ = tokenize("A man riding a horse.", max_len=16)
    assert ids == ids2
    # identical words hash to the same bucket
    a, _ = tokenize("horse", max_len=8)
    b, _ = tokenize("horse horse", max_len=8)
    assert a[1] == b[1] == b[2]


def test_text_encoder_shapes(rng):
    enc = TextEncoder(vocab_size=1024, d_model=32, nhead=4, num_layers=1,
                      dim_feedforward=64, out_dim=16)
    ids = jnp.asarray([tokenize("a cat", 1024, 8)[0],
                       tokenize("a dog on grass", 1024, 8)[0]], jnp.int32)
    v = enc.init(rng, ids)
    out = enc.apply(v, ids)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_text_encoder_ignores_padding(rng):
    enc = TextEncoder(vocab_size=1024, d_model=32, nhead=4, num_layers=1,
                      dim_feedforward=64, out_dim=16, dropout=0.0)
    ids = jnp.asarray([tokenize("a cat", 1024, 12)[0]], jnp.int32)
    v = enc.init(rng, ids)
    out1 = enc.apply(v, ids)
    # replacing pad ids with other pad-marked garbage must not matter:
    # (PAD positions are excluded by mask; assert same output when padding
    # length grows)
    ids_longer = jnp.asarray([tokenize("a cat", 1024, 12)[0]], jnp.int32)
    out2 = enc.apply(v, ids_longer)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_captioner_shapes_and_causality(rng):
    cap = GlimpseCaptioner(vocab_size=512, d_model=32, nhead=4, num_layers=1,
                           dim_feedforward=64, dropout=0.0)
    feats = jax.random.normal(rng, (2, 3, 40))
    ids = jnp.asarray([[BOS_ID, 5, 6, 7], [BOS_ID, 8, 9, PAD_ID]], jnp.int32)
    v = cap.init(rng, feats, ids)
    logits = cap.apply(v, feats, ids)
    assert logits.shape == (2, 4, 512)
    # causality: changing a later token must not change earlier logits
    ids2 = ids.at[:, 3].set(100)
    logits2 = cap.apply(v, feats, ids2)
    np.testing.assert_allclose(np.asarray(logits[:, :3]),
                               np.asarray(logits2[:, :3]), atol=1e-5)
    assert np.abs(np.asarray(logits[:, 3]) - np.asarray(logits2[:, 3])).max() > 0


def test_caption_probe_train_step_runs(rng):
    """End-to-end caption-probe train step (regression: the text tower in
    train mode needs a dropout rng threaded through the step)."""
    import optax

    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.models.mlp import MLP
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.train import caption_probe
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              glimpse_size=30, supersample=1)
    enc = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    enc_vars = enc.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    feat_dim = 512 * 4 * 4 * 2  # 2 fixations concatenated
    head = MLP(hidden_dim=64, output_dim=32)
    head_vars = head.init(rng, jnp.ones((2, feat_dim)))
    text = TextEncoder(vocab_size=128, d_model=32, nhead=4, num_layers=1,
                       dim_feedforward=64, out_dim=32)
    text_vars = text.init(rng, jnp.zeros((2, 8), jnp.int32), train=False)
    params = {"image_head": head_vars["params"], "text": text_vars["params"]}
    state = TrainState.create(apply_fn=None, params=params,
                              tx=optax.adam(1e-3), batch_stats={})
    step = caption_probe.make_caption_probe_train_step(
        enc, head, text, None, cfg, num_fixations=2, temperature=0.1)
    images = jax.random.randint(rng, (4, 64, 64, 3), 0, 256).astype(jnp.uint8)
    tokens = jax.random.randint(rng, (4, 8), 3, 128, dtype=jnp.int32)
    state, m = step(state, enc_vars, images, tokens, rng)
    assert np.isfinite(float(m["loss"]))


def test_vocabulary_build_and_roundtrip():
    from multimodal_active_ai_tpu.models.text import (
        BOS_ID, EOS_ID, PAD_ID, Vocabulary,
    )

    texts = ["a dog runs", "a dog sits", "a cat sits on a mat"]
    vocab = Vocabulary.build(texts, max_size=64, max_len=8)
    # frequency order: 'a' (4x) first, then 'dog'/'sits' (2x) by appearance
    assert vocab.words[0] == "a"
    assert set(vocab.words) == {"a", "dog", "runs", "sits", "cat", "on", "mat"}
    assert vocab.size == 4 + 7

    ids, mask = vocab.encode("a dog sits")
    assert ids[0] == BOS_ID and ids[4] == EOS_ID
    assert mask == [1, 1, 1, 1, 1, 0, 0, 0]
    assert ids[5:] == [PAD_ID] * 3
    # distinct known words get distinct stable ids; round-trips
    assert len(set(ids[1:4])) == 3
    assert vocab.decode(ids) == "a dog sits"
    # same word -> same id across calls
    ids2, _ = vocab.encode("dog dog")
    assert ids2[1] == ids2[2] == ids[2]


def test_vocabulary_oov_and_size_cap():
    from multimodal_active_ai_tpu.models.text import Vocabulary

    vocab = Vocabulary.build(["alpha beta gamma delta"], max_size=6, max_len=8)
    assert vocab.size <= 6  # cap includes the 4 reserved ids -> 2 words kept
    assert len(vocab.words) == 2
    ids, _ = vocab.encode("alpha beta gamma zeta")
    assert ids[1] != Vocabulary.OOV_ID and ids[2] != Vocabulary.OOV_ID
    assert ids[3] == ids[4] == Vocabulary.OOV_ID   # gamma dropped by cap, zeta unseen
    assert vocab.oov_words == 2 and vocab.total_words == 4
    assert vocab.oov_rate == 0.5
    assert vocab.decode(ids) == "alpha beta <unk> <unk>"


def test_vocabulary_encoder_compatible(rng):
    """Vocabulary.encode feeds TextEncoder exactly like tokenize does."""
    import numpy as np

    from multimodal_active_ai_tpu.models.text import TextEncoder, Vocabulary

    vocab = Vocabulary.build(["the quick brown fox", "the lazy dog"],
                             max_size=32, max_len=8)
    enc = TextEncoder(vocab_size=vocab.size, d_model=32, nhead=2,
                      num_layers=1, dim_feedforward=64, out_dim=16)
    ids = np.asarray([vocab.encode("the quick dog")[0],
                      vocab.encode("a fox")[0]], np.int32)
    variables = enc.init(rng, jnp.asarray(ids))
    out = enc.apply(variables, jnp.asarray(ids))
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vocabulary_u8_roundtrip(tmp_path):
    """The vocab persists beside the text tower (round-4 advisor item): a
    text-tower checkpoint is only meaningful with the exact word→id map it
    was trained against, so the word list rides in the checkpoint dict and
    survives the msgpack round trip."""
    import numpy as np
    from multimodal_active_ai_tpu.utils import checkpoint as ckpt

    corpus = ["A cat sat on the mat.", "A naïve dog; the dog barked!"]
    vocab = Vocabulary.build(corpus, max_len=8)
    path = str(tmp_path / "probe.msgpack")
    ckpt.save_checkpoint({"vocab_words_u8": vocab.to_u8(),
                          "vocab_size": vocab.size}, False, filename=path)
    payload = ckpt.load_checkpoint(path)
    restored = Vocabulary.from_u8(payload["vocab_words_u8"], max_len=8)
    assert restored.words == vocab.words
    assert int(payload["vocab_size"]) == restored.size
    ids_a, _ = vocab.encode(corpus[1])
    ids_b, _ = restored.encode(corpus[1])
    assert ids_a == ids_b


def test_imagefolder_captions_templates():
    """Class-directory names become content-carrying captions, templates
    rotate by file index so the corpus vocabulary is richer than one
    token per class."""
    from coco_captions_probe import _CAPTION_TEMPLATES, imagefolder_captions

    caps = imagefolder_captions([0, 0, 1, 1, 1], ["class_000", "class_001"])
    assert len(caps) == 5
    assert all("class 000" in c for c in caps[:2])
    assert all("class 001" in c for c in caps[2:])
    # index-rotated templates: consecutive files of one class differ
    assert caps[2] != caps[3]
    assert len(_CAPTION_TEMPLATES) >= 2


import pytest


@pytest.mark.slow
def test_caption_probe_imagefolder_driver(tmp_path, capsys):
    """--dataset imagefolder end to end: real JPEGs through the host path,
    captions templated from the class tree, corpus vocab built + persisted.
    (The TPU learning leg showed the synthetic reader's label↔image
    independence makes retrieval unlearnable — this mode is the correlated
    replacement; PARITY.md round-4.)"""
    pytest.importorskip("PIL")
    import coco_captions_probe
    from multimodal_active_ai_tpu.models.text import Vocabulary
    from multimodal_active_ai_tpu.utils import checkpoint as ckpt
    from PIL import Image

    rng = np.random.RandomState(0)
    root = tmp_path / "corpus" / "train"
    for c in range(2):
        d = root / f"class_{c:03d}"
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:04d}.jpg")

    coco_captions_probe.main([
        str(tmp_path / "no_ckpt.msgpack"), str(tmp_path / "corpus"),
        "--dataset", "imagefolder", "--canvas-size", "64", "-b", "1",
        "--arch", "ResNet18", "-f", "2", "--epochs", "1", "-t",
        "--checkpoint-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "caption vocabulary" in out
    payload = ckpt.load_checkpoint(str(tmp_path / "caption_probe_checkpoint.msgpack"))
    vocab = Vocabulary.from_u8(payload["vocab_words_u8"], max_len=32)
    assert any("class" in w for w in vocab.words)
