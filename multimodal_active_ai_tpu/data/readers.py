"""Dataset catalogs and shard bookkeeping.

Host-side replacement for the reader halves of the reference's DALI
pipelines: ``ops.FileReader`` (ImageNet folder layout,
``NVIDIA_DALI_Pipelines.py:604-610``), ``ops.COCOReader`` (``:34-42``) and
``compute_shard_size`` (``:647-657``) with DALI's ``pad_last_batch``
semantics (the last batch of a shard is filled by repeating the final
sample so every shard yields full, static-shape batches — a TPU requirement
as much as a DALI one).
"""

from __future__ import annotations

import json
import math
import os
from typing import Sequence

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".JPEG", ".JPG", ".PNG")


def list_image_folder(root: str) -> tuple[list[str], list[int], list[str]]:
    """ImageNet-style ``root/class_x/img.JPEG`` catalog → (files, labels, classes).

    Class indices follow sorted class-directory order, the convention shared
    by DALI's FileReader and torchvision ImageFolder.
    """
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    files, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for name in sorted(os.listdir(cdir)):
            if name.endswith(IMG_EXTENSIONS):
                files.append(os.path.join(cdir, name))
                labels.append(idx)
    return files, labels, classes


def list_coco_images(file_root: str, annotations_file: str | None = None) -> list[str]:
    """COCO image catalog (``ops.COCOReader`` file side, ``NVIDIA_DALI_Pipelines.py:34``).

    The SimCLR pretraining path consumes only the images (bboxes/labels are
    brought but unused, ``Contrastive_Learning.py:592-593``), so this returns
    the image file list — from the annotations JSON when given (preserving
    the reader's annotation-driven ordering) else a directory listing.
    """
    if annotations_file and os.path.isfile(annotations_file):
        with open(annotations_file) as f:
            ann = json.load(f)
        return [os.path.join(file_root, im["file_name"]) for im in ann["images"]]
    return [os.path.join(file_root, n) for n in sorted(os.listdir(file_root))
            if n.endswith(IMG_EXTENSIONS)]


def compute_shard_size(epoch_size: int, shard_id: int, num_shards: int,
                       batch_size: int, pad_last_batch: bool = True) -> int:
    """Per-shard example count, reference ``NVIDIA_DALI_Pipelines.py:647-657``.

    With ``pad_last_batch`` DALI pads the epoch so every shard sees whole
    batches: ``epoch_size_padded = ceil(epoch/num_shards)·num_shards``, then
    shard boundaries are the floor-divided prefix as in the reference.
    """
    if pad_last_batch:
        padded = math.ceil(epoch_size / num_shards) * num_shards
    else:
        padded = epoch_size
    beg = math.floor(shard_id * padded / num_shards)
    end = math.floor((shard_id + 1) * padded / num_shards)
    return end - beg


def shard_files(files: Sequence, shard_id: int, num_shards: int) -> list:
    """Contiguous shard slice of the catalog (DALI sharding:
    ``shard_id/num_shards`` contiguous ranges, padded by repeating the last
    element to the padded shard size)."""
    n = len(files)
    padded = math.ceil(n / num_shards) * num_shards
    beg = math.floor(shard_id * padded / num_shards)
    end = math.floor((shard_id + 1) * padded / num_shards)
    out = [files[min(i, n - 1)] for i in range(beg, min(end, n))]
    want = end - beg
    while len(out) < want and out:
        out.append(out[-1])
    return out
