"""Host data loader: sharded file reading, JPEG decode, prefetch.

This is the host half of the DALI replacement: the reference decodes JPEGs
on GPU (nvJPEG inside ``ops.ImageDecoder``, ``NVIDIA_DALI_Pipelines.py:48``)
— not an option on TPU, so decode runs on the host CPU (PIL / the native C++
runtime in :mod:`multimodal_active_ai_tpu.data.native` when built) into
fixed-size uint8 canvases, double-buffered ahead of the device. The retina
(all per-pixel augmentation) stays on device.

Pipeline contract matching the reference reader pipes (pipe1/pipe3,
``Contrastive_Learning.py:290-328``): contiguous shard per process,
``pad_last_batch`` semantics, optional shuffle (DETR classifier train uses
``random_shuffle=True``, ``DETR_Image_Classification.py:263``), and an
epoch ``reset()``.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from multimodal_active_ai_tpu.data import readers


def _put_until(q: "queue.Queue", item, stop: "threading.Event") -> bool:
    """Blocking put that aborts when the consumer signalled shutdown (an
    abandoned iterator must not leave the producer parked on a full queue)."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


def _decode_resize_pil(path: str, canvas: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((canvas, canvas), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


class HostLoader:
    """Threaded, double-buffered batch producer of ``(images_u8, labels)``.

    ``images_u8``: (B, canvas, canvas, 3) uint8; ``labels``: (B,) int32 (or
    -1 when the catalog has no labels, e.g. COCO SimCLR pretraining).
    """

    def __init__(self, files, labels=None, batch_size: int = 256,
                 canvas_size: int = 640, shard_id: int = 0, num_shards: int = 1,
                 shuffle: bool = False, seed: int = 15, prefetch: int = 2,
                 num_threads: int = 4, use_native: bool | None = None):
        self.all_files = list(files)
        self.all_labels = list(labels) if labels is not None else None
        self.batch_size = batch_size
        self.canvas_size = canvas_size
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0
        self._native = None
        if use_native is not False:
            try:
                from multimodal_active_ai_tpu.data import native
                if native.available():
                    self._native = native
            except Exception:
                if use_native:
                    raise

        idx = list(range(len(self.all_files)))
        self._base_index = readers.shard_files(idx, shard_id, num_shards)
        self.shard_size = readers.compute_shard_size(
            len(self.all_files), shard_id, num_shards, batch_size)

    def __len__(self):
        return -(-self.shard_size // self.batch_size)

    def reset(self):
        """Epoch boundary, reference ``pipe.reset()`` (``Contrastive_Learning.py:541``)."""
        self.epoch += 1

    def _epoch_order(self):
        order = list(self._base_index)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        # pad_last_batch: repeat the final sample to fill the last batch
        want = len(self) * self.batch_size
        while len(order) < want:
            order.append(order[-1])
        return order

    def _load_one(self, i: int) -> tuple[np.ndarray, int]:
        path = self.all_files[i]
        if self._native is not None:
            img = self._native.decode_resize(path, self.canvas_size)
            if img is None:  # native decoder punts (e.g. PNG) -> PIL fallback
                img = _decode_resize_pil(path, self.canvas_size)
        else:
            img = _decode_resize_pil(path, self.canvas_size)
        label = self.all_labels[i] if self.all_labels is not None else -1
        return img, label

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        order = self._epoch_order()
        nbatches = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # one pool for the epoch: PIL releases the GIL during decode, so
            # the fallback path parallelizes like the native pthread pool
            # (the reference leans on DALI's threaded nvJPEG decode,
            # ``NVIDIA_DALI_Pipelines.py:48``); decode of batch N+1 overlaps
            # the device step on batch N through the prefetch queue.
            try:
                with ThreadPoolExecutor(
                        max_workers=max(self.num_threads, 1)) as pool:
                    for b in range(nbatches):
                        if stop.is_set():
                            return
                        sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                        images = np.empty((self.batch_size, self.canvas_size,
                                           self.canvas_size, 3), np.uint8)
                        labels = np.empty((self.batch_size,), np.int32)
                        if self.all_labels is not None:
                            labels[:] = [self.all_labels[i] for i in sel]
                        else:
                            labels[:] = -1
                        if (self._native is not None
                                and hasattr(self._native, "decode_batch")):
                            paths = [self.all_files[i] for i in sel]
                            ok = self._native.decode_batch(
                                paths, self.canvas_size, images,
                                num_threads=self.num_threads)
                            misses = [j for j in range(len(sel)) if not ok[j]]
                        else:
                            misses = list(range(len(sel)))
                        if misses:  # PIL path (or native punts, e.g. PNG)
                            def dec(j):
                                images[j] = _decode_resize_pil(
                                    self.all_files[sel[j]], self.canvas_size)
                            list(pool.map(dec, misses))
                        if not _put_until(out_q, (images, labels), stop):
                            return
                _put_until(out_q, None, stop)
            except BaseException as exc:  # noqa: BLE001
                # a dead producer must not leave the consumer parked on
                # out_q.get() forever: forward the error as the sentinel
                _put_until(out_q, exc, stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "HostLoader producer failed") from item
                yield item
        finally:
            stop.set()
