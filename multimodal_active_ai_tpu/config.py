"""Config dataclasses + CLI shims matching the reference drivers' argparse.

The reference has no config system beyond per-driver argparse with ~25-40
flags (``Contrastive_Learning.py:96-178``, ``DETR_Image_Classification.py:
75-176``, ``DETR_Image_Classification_RLS.py:85-224``,
``Representation_Evaluation.py:80-159``). Here every driver is backed by a
dataclass; :func:`add_args_from_dataclass` generates argparse flags with the
same names/defaults, so reference command lines keep working.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field, fields


# ResNet10 is a TPU-framework extension (CI/dryrun compile-budget arch);
# ResNet18..152 mirror the reference's choices (Contrastive_Learning.py:238)
MODEL_NAMES = ["ResNet10", "ResNet18", "ResNet34", "ResNet50", "ResNet101",
               "ResNet152"]
DATASETS = ["mscoco", "imagenet", "synthetic"]
OPTIMIZERS = ["sgd", "adam", "lars"]


def _flag(*names, **kw):
    return field(default=kw.pop("default"), metadata={"names": names, **kw})


@dataclass
class ContrastiveConfig:
    """``Contrastive_Learning.parse()`` (``Contrastive_Learning.py:96-178``)."""

    data: str = _flag("data", default=None, positional=True,
                      help="path to MSCOCO or IMAGENET dataset")
    arch: str = _flag("--arch", "-a", default="ResNet18", choices=MODEL_NAMES)
    workers: int = _flag("-j", "--workers", default=4)
    epochs: int = _flag("--epochs", default=190)
    start_epoch: int = _flag("--start-epoch", default=0)
    batch_size: int = _flag("-b", "--batch-size", default=256)
    num_fixations: int = _flag("-f", "--num-fixations", default=10)
    lr: float = _flag("--lr", "--learning-rate", default=0.01)
    lrs: str = _flag("--lrs", "--learning-rate-scaling", default="linear")
    warmup_epochs: int = _flag("--warmup-epochs", default=10)
    momentum: float = _flag("--momentum", default=0.9)
    temperature: float = _flag("--temperature", default=0.05)
    weight_decay: float = _flag("--weight-decay", "--wd", default=1e-4)
    print_freq: int = _flag("--print-freq", "-p", default=10)
    resume: str = _flag("--resume", default="")
    optimizer: str = _flag("--optimizer", default="adam", choices=OPTIMIZERS)
    dataset: str = _flag("--dataset", default="mscoco", choices=DATASETS)
    color_augmentation: float = _flag("--color-augmentation", default=0.5)
    grid_mask_augmentation: float = _flag("--grid-mask-augmentation", default=0.0)
    gaussian_noise_augmentation: float = _flag("--gaussian-noise-augmentation", default=0.5)
    test: bool = _flag("-t", "--test", default=False, action="store_true")
    verbose: bool = _flag("-v", "--verbose", default=False, action="store_true")
    brightness: float = _flag("--brightness", default=1.0)
    contrast: float = _flag("--contrast", default=1.0)
    hue: float = _flag("--hue", default=90.0)
    saturation: float = _flag("--saturation", default=0.5)
    plot_training_history: bool = _flag("-pth", "--plot-training-history",
                                        default=False, action="store_true")
    # --- TPU-framework extensions (not in the reference CLI) ---
    canvas_size: int = _flag("--canvas-size", default=640,
                             help="host-decoded source canvas edge (TPU addition)")
    seed: int = _flag("--seed", default=15, help="base PRNG seed (DALI used 15+device_id)")
    bf16: bool = _flag("--bf16", default=True, action="store_true",
                       help="bfloat16 compute on the MXU")
    checkpoint_dir: str = _flag("--checkpoint-dir", default=".")
    num_examples: int = _flag("--num-examples", default=0,
                              help="synthetic dataset size when --dataset synthetic")
    multislice: bool = _flag("--multislice", default=False, action="store_true",
                             help="hybrid DCN(slice)×ICI mesh on multi-slice topologies")
    export_torch: str = _flag("--export-torch", default="",
                              help="also write a reference-layout .pth.tar "
                                   "checkpoint (torch.save) to this path")
    canvas_cache: str = _flag("--canvas-cache", default="",
                              help="decode-once raw-canvas cache directory "
                                   "(epoch 1 decodes, later epochs stream)")
    unroll_fixations: int = _flag("--unroll-fixations", default=0,
                                  help="fixation-loop unroll: 0 auto "
                                       "(scan unroll=5 on TPU — the benched "
                                       "default; unrolled on CPU), "
                                       "-1 full unroll, 1 plain scan, "
                                       "n>1 scan unroll=n")
    device_prefetch: int = _flag("--device-prefetch", default=2,
                                 help="host->device transfers issued ahead "
                                      "of the step (0 = synchronous put; "
                                      "DALI prefetch_queue_depth role)")
    stat_fusion: str = _flag("--stat-fusion", default="",
                             choices=["", "gram", "pallas"],
                             help="produce the 1x1 convs' BN statistics "
                                  "with the conv itself (models/conv_bn.py)"
                                  "; 'gram' is GSPMD-safe, 'pallas' is "
                                  "single-device. Checkpoints use the "
                                  "fused layout; downstream loaders "
                                  "auto-convert")


@dataclass
class EvalConfig:
    """``Representation_Evaluation.parse()`` (``Representation_Evaluation.py:80-159``)."""

    model: str = _flag("model", default=None, positional=True,
                       help="path to the pretrained SimCLR checkpoint")
    data: str = _flag("data", default=None, positional=True)
    arch: str = _flag("--arch", "-a", default="ResNet18", choices=MODEL_NAMES)
    # classifier TYPE, not a path (Representation_Evaluation.py:101,427-437)
    classifier: str = _flag("--classifier", default="logistic_regression",
                            choices=["logistic_regression"])
    dataset: str = _flag("--dataset", default="imagenet", choices=DATASETS)
    workers: int = _flag("-j", "--workers", default=4)
    epochs: int = _flag("--epochs", default=90)
    start_epoch: int = _flag("--start-epoch", default=0)
    batch_size: int = _flag("-b", "--batch-size", default=256)
    num_fixations: int = _flag("-f", "--num-fixations", default=2)
    lr: float = _flag("--lr", "--learning-rate", default=1e-7)
    lrs: str = _flag("--lrs", "--learning-rate-scaling", default="linear")
    warmup_epochs: int = _flag("--warmup-epochs", default=10)
    momentum: float = _flag("--momentum", default=0.9)
    weight_decay: float = _flag("--weight-decay", "--wd", default=1e-4)
    print_freq: int = _flag("--print-freq", "-p", default=10)
    resume: str = _flag("--resume", default="")
    optimizer: str = _flag("--optimizer", default="adam", choices=OPTIMIZERS)
    evaluate: bool = _flag("-e", "--evaluate", default=False, action="store_true")
    test: bool = _flag("-t", "--test", default=False, action="store_true")
    verbose: bool = _flag("-v", "--verbose", default=False, action="store_true")
    # --- TPU-framework extensions ---
    canvas_size: int = _flag("--canvas-size", default=640)
    seed: int = _flag("--seed", default=15)
    bf16: bool = _flag("--bf16", default=True, action="store_true")
    checkpoint_dir: str = _flag("--checkpoint-dir", default=".")
    num_examples: int = _flag("--num-examples", default=0)
    num_classes: int = _flag("--num-classes", default=1000)
    multislice: bool = _flag("--multislice", default=False, action="store_true")
    export_torch: str = _flag("--export-torch", default="",
                              help="also write a reference-layout .pth.tar "
                                   "checkpoint (torch.save) to this path")
    canvas_cache: str = _flag("--canvas-cache", default="",
                              help="decode-once raw-canvas cache directory "
                                   "(epoch 1 decodes, later epochs stream)")


@dataclass
class DETRConfig:
    """``DETR_Image_Classification.parse()`` (``DETR_Image_Classification.py:75-176``)."""

    backbone_path: str = _flag("backbone_path", default=None, positional=True)
    data: str = _flag("data", default=None, positional=True)
    dataset: str = _flag("--dataset", default="imagenet", choices=DATASETS)
    workers: int = _flag("-j", "--workers", default=4)
    epochs: int = _flag("--epochs", default=2)
    start_epoch: int = _flag("--start-epoch", default=0)
    batch_size: int = _flag("-b", "--batch-size", default=256)
    num_fixations: int = _flag("-f", "--num-fixations", default=2)
    lr: float = _flag("--lr", "--learning-rate", default=1e-4)
    lr_drop: int = _flag("--lr-drop", default=200)
    lr_backbone: float = _flag("--lr_backbone", default=1e-5)
    lrs: str = _flag("--lrs", "--learning-rate-scaling", default="linear")
    warmup_epochs: int = _flag("--warmup-epochs", default=10)
    momentum: float = _flag("--momentum", default=0.9)
    weight_decay: float = _flag("--weight-decay", "--wd", default=1e-4)
    print_freq: int = _flag("--print-freq", "-p", default=10)
    resume: str = _flag("--resume", default="")
    evaluate: bool = _flag("-e", "--evaluate", default=False, action="store_true")
    test: bool = _flag("-t", "--test", default=False, action="store_true")
    verbose: bool = _flag("-v", "--verbose", default=False, action="store_true")
    clip_max_norm: float = _flag("--clip_max_norm", default=0.1)
    backbone: str = _flag("--backbone", default="ResNet18", choices=MODEL_NAMES)
    dilation: bool = _flag("--dilation", default=False, action="store_true")
    position_embedding: str = _flag("--position_embedding", default="sine",
                                    choices=["sine", "learned"])
    enc_layers: int = _flag("--enc_layers", default=6)
    dec_layers: int = _flag("--dec_layers", default=6)
    dim_feedforward: int = _flag("--dim_feedforward", default=2048)
    hidden_dim: int = _flag("--hidden_dim", default=256)
    dropout: float = _flag("--dropout", default=0.1)
    nheads: int = _flag("--nheads", default=8)
    num_queries: int = _flag("--num_queries", default=10)
    pre_norm: bool = _flag("--pre_norm", default=False, action="store_true")
    # --- TPU-framework extensions ---
    canvas_size: int = _flag("--canvas-size", default=640)
    seed: int = _flag("--seed", default=15)
    bf16: bool = _flag("--bf16", default=True, action="store_true")
    checkpoint_dir: str = _flag("--checkpoint-dir", default=".")
    num_examples: int = _flag("--num-examples", default=0)
    num_classes: int = _flag("--num-classes", default=1000)
    multislice: bool = _flag("--multislice", default=False, action="store_true")
    export_torch: str = _flag("--export-torch", default="",
                              help="also write a reference-layout .pth.tar "
                                   "checkpoint (torch.save) to this path")
    canvas_cache: str = _flag("--canvas-cache", default="",
                              help="decode-once raw-canvas cache directory "
                                   "(epoch 1 decodes, later epochs stream)")
    backbone_norm: str = _flag("--backbone-norm", default="frozen",
                               choices=["frozen", "group"],
                               help="backbone norm: 'frozen' = the reference's"
                                    " FrozenBatchNorm2d (backbone.py:151; its"
                                    " statistics come from a pretrained"
                                    " checkpoint); 'group' = GroupNorm for"
                                    " FROM-SCRATCH runs — stats-less FrozenBN"
                                    " on a random init normalizes nothing"
                                    " (round-4 queue9 postmortem, PARITY.md)")


@dataclass
class RLSConfig(DETRConfig):
    """``DETR_Image_Classification_RLS.parse()`` adds the DQN flags
    (``DETR_Image_Classification_RLS.py:189-218``)."""

    dqn_resume: str = _flag("--dqn-resume", default="")
    dqn: str = _flag("--dqn", default="ResNet18", choices=MODEL_NAMES)
    replay_memory_capacity: int = _flag("--replay-memory-capacity", default=10000)
    dqn_batch_size: int = _flag("-dqnb", "--dqn-batch-size", default=256)
    gamma: float = _flag("--gamma", default=0.999)
    eps_start: float = _flag("--eps-start", default=0.9)
    eps_end: float = _flag("--eps-end", default=0.05)
    eps_decay: float = _flag("--eps-decay", default=10.0)
    target_update_freq: int = _flag("--target-update-freq", default=3)
    num_of_actions: int = _flag("--num-of-actions", default=100)
    dense_replay: bool = _flag("--dense-replay", default=False,
                               action="store_true",
                               help="push EVERY consecutive glimpse pair to "
                                    "the replay (divergence; the reference "
                                    "pushes only the final pair, RLS "
                                    ":757-769)")


def add_args_from_dataclass(parser: argparse.ArgumentParser, cls) -> None:
    for f in fields(cls):
        meta = dict(f.metadata)
        names = meta.pop("names", (f"--{f.name.replace('_', '-')}",))
        positional = meta.pop("positional", False)
        action = meta.pop("action", None)
        kwargs = {"help": meta.get("help")}
        if positional:
            parser.add_argument(names[0], type=type(f.default) if f.default is not None else str,
                                **kwargs)
        elif action == "store_true":
            parser.add_argument(*names, dest=f.name, action="store_true",
                                default=f.default, **kwargs)
            if f.default:
                # a store_true flag that defaults on is otherwise impossible
                # to turn off from the CLI (e.g. --bf16): pair every long
                # name with a --no-X off-switch
                off = [f"--no-{n[2:]}" for n in names if n.startswith("--")]
                if off:
                    parser.add_argument(*off, dest=f.name,
                                        action="store_false",
                                        help=f"disable {names[0]}")
        else:
            choices = meta.get("choices")
            parser.add_argument(*names, dest=f.name, type=type(f.default),
                                default=f.default, choices=choices, **kwargs)


def parse_into(cls, argv=None, prog: str | None = None):
    parser = argparse.ArgumentParser(prog=prog)
    add_args_from_dataclass(parser, cls)
    ns = parser.parse_args(argv)
    kwargs = {f.name: getattr(ns, f.name) for f in fields(cls)}
    return cls(**kwargs)
