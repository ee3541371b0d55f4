#!/usr/bin/env python
"""COCO-Captions multimodal probe driver (TPU-native).

Productionizes the reference's multimodal prototypes
(``.ipynb_checkpoints/COCO Captions Test-checkpoint.ipynb`` and
``Reinforced Transformer-checkpoint.ipynb``, SURVEY §2 #27/#28) as a real
entry point: a frozen pretrained SimCLR encoder embeds foveated glimpses, a
text transformer embeds the paired captions, the towers are aligned with
symmetric InfoNCE, and image↔text retrieval top-1/top-5 is reported.

CLI: ``python coco_captions_probe.py MODEL_CKPT DATA [--dataset mscoco] …``
(``--dataset synthetic`` runs with generated images + templated captions;
``--dataset imagefolder`` templates captions from the class directories of
an ImageNet-layout corpus and feeds the real JPEGs through the host path —
image and caption are then *correlated*, so retrieval is learnable, unlike
the synthetic reader whose labels are independent of pixel content).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from time import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_active_ai_tpu.config import _flag, parse_into, MODEL_NAMES
from multimodal_active_ai_tpu.data import SyntheticReader, list_coco_images
from multimodal_active_ai_tpu.data.readers import list_image_folder
from multimodal_active_ai_tpu.data.loader import HostLoader
from multimodal_active_ai_tpu.models import MLP, SimCLRModule
from multimodal_active_ai_tpu.models.text import (
    TextEncoder,
    Vocabulary,
    tokenize,
)
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    initialize_distributed,
    make_global_array,
    per_process_batch,
)
from multimodal_active_ai_tpu.train import caption_probe, optimizers, schedule
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils import checkpoint as ckpt
from multimodal_active_ai_tpu.utils.meters import AverageMeter
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream
from representation_evaluation import load_pretrained_encoder


@dataclass
class CaptionProbeConfig:
    model: str = _flag("model", default=None, positional=True,
                       help="pretrained SimCLR checkpoint")
    data: str = _flag("data", default=None, positional=True)
    arch: str = _flag("--arch", "-a", default="ResNet18", choices=MODEL_NAMES)
    dataset: str = _flag("--dataset", default="mscoco",
                         choices=["mscoco", "synthetic", "imagefolder"])
    batch_size: int = _flag("-b", "--batch-size", default=64)
    num_fixations: int = _flag("-f", "--num-fixations", default=2)
    epochs: int = _flag("--epochs", default=5)
    lr: float = _flag("--lr", default=1e-4)
    temperature: float = _flag("--temperature", default=0.05)
    max_len: int = _flag("--max-len", default=32)
    vocab_size: int = _flag("--vocab-size", default=32768)
    print_freq: int = _flag("--print-freq", "-p", default=10)
    workers: int = _flag("-j", "--workers", default=4)
    canvas_size: int = _flag("--canvas-size", default=640)
    seed: int = _flag("--seed", default=15)
    test: bool = _flag("-t", "--test", default=False, action="store_true")
    verbose: bool = _flag("-v", "--verbose", default=False, action="store_true")
    num_examples: int = _flag("--num-examples", default=0)
    checkpoint_dir: str = _flag("--checkpoint-dir", default=".")
    resume: str = _flag("--resume", default="")
    canvas_cache: str = _flag("--canvas-cache", default="",
                              help="decode-once canvas cache directory")


def load_caption_pairs(cfg):
    """(files, captions) from COCO annotations (``captions_train2014.json``)."""
    root = os.path.join(cfg.data, "MSCOCO", "cocoapi")
    ann_file = os.path.join(root, "annotations", "captions_train2014.json")
    file_root = os.path.join(root, "images", "train2014")
    if not os.path.isfile(ann_file):
        ann_file = None
        for cand in os.listdir(cfg.data) if os.path.isdir(cfg.data) else []:
            if cand.startswith("captions") and cand.endswith(".json"):
                ann_file = os.path.join(cfg.data, cand)
                file_root = cfg.data
                break
    if ann_file is None:
        files = list_coco_images(cfg.data)
        return files, [os.path.basename(f).replace("_", " ") for f in files]
    with open(ann_file) as f:
        ann = json.load(f)
    by_id = {im["id"]: im["file_name"] for im in ann["images"]}
    files, captions = [], []
    for a in ann["annotations"]:
        name = by_id.get(a["image_id"])
        if name:
            files.append(os.path.join(file_root, name))
            captions.append(a["caption"])
    return files, captions


_CAPTION_TEMPLATES = (
    "a photo of a {} pattern",
    "an image with {} coloring",
    "the picture shows a {} grating",
    "a synthetic {} textured sample",
)


def imagefolder_captions(labels, classes):
    """One templated caption per file from its class-directory name.

    The class name carries the image's content (the corpus encodes class as
    dominant hue), so image↔caption retrieval is learnable; templates rotate
    deterministically by file index to give the corpus vocabulary more than
    one token per class. Captions repeat across files of a class, which caps
    in-batch retrieval top-1 below 100% (duplicate positives) — climbing far
    above 1/B chance is still the learning signal.
    """
    names = [c.replace("_", " ") for c in classes]
    return [_CAPTION_TEMPLATES[i % len(_CAPTION_TEMPLATES)].format(names[l])
            for i, l in enumerate(labels)]


def main(argv=None):
    cfg = parse_into(CaptionProbeConfig, argv, prog="COCO_Captions_Probe")
    initialize_distributed(verbose=cfg.verbose)
    mesh = create_mesh()
    global_batch, local_batch = per_process_batch(cfg.batch_size, mesh)

    retina_cfg = retina.RetinaConfig(canvas_size=cfg.canvas_size)
    encoder = SimCLRModule(arch=cfg.arch, axis_name=None, norm_kind="bn")
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.ones((2, 30, 30, retina_cfg.num_channels))
    enc_variables = load_pretrained_encoder(encoder, cfg, rng, sample)

    # data (before the towers: the text tower is sized by the built vocab)
    if cfg.dataset == "synthetic":
        n = cfg.num_examples or 16 * local_batch
        # decorrelate shards: each process must contribute DISTINCT rows of
        # the global batch (duplicate (image, caption) pairs corrupt the
        # InfoNCE positives), same scheme as contrastive_learning.build_reader
        reader = SyntheticReader(local_batch, cfg.canvas_size,
                                 num_examples=n,
                                 seed=cfg.seed + 7919 * jax.process_index())
        captions = None
    else:
        if cfg.dataset == "imagefolder":
            root = os.path.join(cfg.data, "train")
            if not os.path.isdir(root):
                root = cfg.data
            files, file_labels, classes = list_image_folder(root)
            caps = imagefolder_captions(file_labels, classes)
        else:
            files, caps = load_caption_pairs(cfg)
        reader = HostLoader(files, list(range(len(files))),
                            batch_size=local_batch,
                            canvas_size=cfg.canvas_size, shuffle=True,
                            shard_id=jax.process_index(),
                            num_shards=jax.process_count(),
                            seed=cfg.seed, num_threads=cfg.workers,
                            cache_dir=cfg.canvas_cache or None)
        captions = caps

    # corpus-built frequency vocabulary over the caption annotations (the
    # reference prototype tokenized real caption text — notebook cell 18);
    # synthetic runs keep the corpus-free hashing tokenizer
    vocab = None
    text_vocab_size = cfg.vocab_size
    resume_payload = None
    if cfg.resume and os.path.isfile(cfg.resume):
        resume_payload = ckpt.load_checkpoint(cfg.resume)
    elif cfg.resume:
        print(f"=> no checkpoint found at '{cfg.resume}'")
    if captions is not None:
        if resume_payload is not None and "vocab_words_u8" in resume_payload:
            # the saved embedding is indexed by the vocab it was trained
            # with — restore THAT word→id map rather than trusting the
            # annotations on disk to rebuild it identically
            vocab = Vocabulary.from_u8(resume_payload["vocab_words_u8"],
                                       max_len=cfg.max_len)
            rebuilt = Vocabulary.build(captions, max_size=cfg.vocab_size,
                                       max_len=cfg.max_len)
            if rebuilt.words != vocab.words and jax.process_index() == 0:
                print("WARNING: caption corpus changed since the checkpoint "
                      f"was written ({rebuilt.size} vs {vocab.size} entries);"
                      " using the checkpoint's vocabulary")
        else:
            vocab = Vocabulary.build(captions, max_size=cfg.vocab_size,
                                     max_len=cfg.max_len)
        text_vocab_size = vocab.size
        if jax.process_index() == 0:
            print(f"caption vocabulary: {vocab.size} entries "
                  f"(cap {cfg.vocab_size}) over {len(captions)} captions")

    # towers: image head (MLP on concat features -> 128), text encoder
    head = MLP(hidden_dim=1024, output_dim=128)
    text = TextEncoder(vocab_size=text_vocab_size, out_dim=128)

    from multimodal_active_ai_tpu.models.resnet import encoder_feature_dim
    feat_dim = encoder_feature_dim(cfg.arch) * 16 * cfg.num_fixations
    head_vars = head.init(rng, jnp.ones((2, feat_dim)))
    text_vars = text.init(rng, jnp.zeros((2, cfg.max_len), jnp.int32))

    params = {"image_head": head_vars["params"], "text": text_vars["params"]}
    tx = optimizers.get_optimizer("adam", cfg.lr)
    state = TrainState.create(apply_fn=None, params=params, tx=tx, batch_stats={})
    if resume_payload is not None:
        saved_size = int(resume_payload.get("vocab_size", text_vocab_size))
        if saved_size != text_vocab_size:
            raise ValueError(
                f"checkpoint text tower was built for a {saved_size}-entry "
                f"vocabulary but this run has {text_vocab_size}; the saved "
                "word→id mapping does not apply")
        state = state.replace(params=ckpt.restore_like(
            state.params, resume_payload["state_dict"]))
        print(f"=> resumed caption probe from '{cfg.resume}' "
              f"(epoch {int(resume_payload['epoch'])})")

    train_step = caption_probe.make_caption_probe_train_step(
        encoder, head, text, mesh, retina_cfg, cfg.num_fixations,
        cfg.temperature)
    eval_step = caption_probe.make_caption_probe_eval_step(
        encoder, head, text, mesh, retina_cfg, cfg.num_fixations,
        cfg.temperature)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def tokens_for(labels):
        if captions is None:  # synthetic: templated caption per label
            texts = [f"a synthetic picture of class {int(l)}" for l in labels]
            return np.asarray([tokenize(t, cfg.vocab_size, cfg.max_len)[0]
                               for t in texts], np.int32)
        return np.asarray([vocab.encode(captions[int(l)])[0]
                           for l in labels], np.int32)

    def put(x):
        # make_global_array handles device arrays too: passthrough on one
        # process, host-pull + assembly on many (a process-local device
        # array fed straight to a global-mesh jit is a shape error)
        return make_global_array(x, batch_sharding)

    for epoch in range(cfg.epochs):
        meters = {k: AverageMeter() for k in
                  ("loss", "i2t_top1", "i2t_top5", "t2i_top1", "t2i_top5")}
        step_keys = epoch_key_stream(rng, epoch, len(reader) + 1)
        val_keys = epoch_key_stream(rng, 40_000 + epoch, len(reader) + 1)
        losses = AverageMeter()
        end = time()
        for i, (images, labels) in enumerate(iter(reader)):
            tokens = tokens_for(np.asarray(labels))
            state, m = train_step(state, enc_variables, put(images),
                                  put(tokens), step_keys[i])
            if i % cfg.print_freq == 0:
                losses.update(float(jax.device_get(m["loss"])))
                if jax.process_index() == 0:
                    print(f"Epoch: [{epoch}][{i}/{len(reader)}]\t"
                          f"Loss {losses.val:.6f} ({losses.avg:.6f})\t"
                          f"Time {(time() - end) / cfg.print_freq:.3f}")
                end = time()
            if cfg.test and i > 10:
                break
        reader.reset()

        for i, (images, labels) in enumerate(iter(reader)):
            tokens = tokens_for(np.asarray(labels))
            m = jax.device_get(eval_step(state, enc_variables, put(images),
                                         put(tokens), val_keys[i]))
            for k in meters:
                meters[k].update(float(m[k]))
            if cfg.test and i > 3:
                break
        reader.reset()
        if jax.process_index() == 0:
            print(f"##I2T Top-1 {meters['i2t_top1'].avg}\n"
                  f"##I2T Top-5 {meters['i2t_top5'].avg}\n"
                  f"##T2I Top-1 {meters['t2i_top1'].avg}\n"
                  f"##T2I Top-5 {meters['t2i_top5'].avg}")
            if vocab is not None:
                print(f"##Vocab {vocab.size} OOV-rate {vocab.oov_rate:.4f}")
            payload = {
                "epoch": epoch + 1,
                "state_dict": jax.device_get(state.params),
                # the text tower is only meaningful with its exact word→id
                # map: persist the vocabulary (and its size for a hard check)
                "vocab_size": text_vocab_size,
            }
            if vocab is not None:
                payload["vocab_words_u8"] = vocab.to_u8()
            ckpt.save_checkpoint(payload, False,
                filename=os.path.join(cfg.checkpoint_dir,
                                      "caption_probe_checkpoint.msgpack"),
                best_filename=os.path.join(cfg.checkpoint_dir,
                                           "caption_probe_best.msgpack"))
        if cfg.test:
            break
    return state


def cli() -> int:
    """Console entry point (pyproject [project.scripts]): discard main's
    returned train state so the process exits 0 on success."""
    main()
    return 0


if __name__ == "__main__":
    main()
