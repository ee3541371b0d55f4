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

import hashlib
import json
import os
import queue
import threading
from time import perf_counter

import numpy as np

from multimodal_active_ai_tpu.data import readers


class CanvasCache:
    """Decode-once raw-canvas cache: per-shard uint8 memmap of decoded
    ``(canvas, canvas, 3)`` images plus a row-validity bitmap.

    The reference's DALI pipeline re-decodes every JPEG every epoch on GPU
    (``NVIDIA_DALI_Pipelines.py:48``); on TPU decode runs on host CPUs and
    dominates the host path, so the first epoch pays decode once and every
    later epoch streams raw canvases from the page cache / disk — the moral
    equivalent of DALI's indexed prefetch executor
    (``NVIDIA_DALI_Pipelines.py:30-32,553-581``) with decode amortized to
    zero in steady state. The cache survives restarts; a fingerprint of
    (file list, canvas size) guards against reuse across datasets.
    """

    def __init__(self, cache_dir: str, files: list[str], canvas: int,
                 shard_id: int = 0, num_shards: int = 1,
                 decoder_id: str = ""):
        os.makedirs(cache_dir, exist_ok=True)
        fp = hashlib.sha256()
        fp.update(f"{canvas}|{shard_id}/{num_shards}|{len(files)}|"
                  f"{decoder_id}|".encode())
        for f in files:
            fp.update(f.encode())
            # per-file size+mtime: a dataset regenerated in place at the
            # same paths must invalidate the cache, not serve stale canvases
            try:
                st = os.stat(f)
                fp.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
            except OSError:
                pass
            fp.update(b"\0")
        self.fingerprint = fp.hexdigest()[:16]
        base = os.path.join(cache_dir,
                            f"canvas_{canvas}_{self.fingerprint}")
        self.meta_path = base + ".json"
        self.data_path = base + ".u8"
        self.flag_path = base + ".flags"
        self.n = len(files)
        self.canvas = canvas
        # projected footprint: an n*canvas*canvas*3 uint8 memmap per shard;
        # warn (and require an env override above a threshold) BEFORE
        # sparse-allocating terabytes on a real dataset
        size_gb = self.n * canvas * canvas * 3 / 1e9
        limit_gb = float(os.environ.get("MAAI_CANVAS_CACHE_MAX_GB", "256"))
        if size_gb > limit_gb:
            raise RuntimeError(
                f"canvas cache would hold {size_gb:.1f} GB for this shard "
                f"({self.n} images at {canvas}x{canvas}x3 uint8), above the "
                f"{limit_gb:.0f} GB guard; raise MAAI_CANVAS_CACHE_MAX_GB "
                "to proceed or drop --canvas-cache")
        if size_gb > 1.0:
            print(f"canvas cache: up to {size_gb:.1f} GB at {cache_dir} "
                  f"({self.n} images, canvas {canvas})")
        meta = {"n": self.n, "canvas": canvas,
                "fingerprint": self.fingerprint}
        if os.path.isfile(self.meta_path):
            try:
                with open(self.meta_path) as f:
                    stale = json.load(f) != meta
            except (ValueError, OSError):
                # corrupt/truncated meta (killed mid-dump): rebuild, don't raise
                stale = True
            if stale:  # different dataset/layout (or unreadable)
                os.remove(self.meta_path)
        # reuse only when BOTH files survive intact; a partial pair (killed
        # mid-create, or the big .u8 deleted to reclaim space while stale
        # all-ones .flags remain) must rebuild from scratch — opening
        # mismatched halves would either crash or serve zeroed canvases
        # flagged as valid
        reuse = (os.path.isfile(self.meta_path)
                 and os.path.isfile(self.data_path)
                 and os.path.isfile(self.flag_path))
        if not reuse:
            for p in (self.data_path, self.flag_path):
                if os.path.isfile(p):
                    os.remove(p)
            with open(self.meta_path, "w") as f:
                json.dump(meta, f)
        mode = "r+" if reuse else "w+"
        self._data = np.memmap(self.data_path, np.uint8, mode,
                               shape=(self.n, canvas, canvas, 3))
        self._flags = np.memmap(self.flag_path, np.uint8, mode,
                                shape=(self.n,))

    def get(self, i: int) -> np.ndarray | None:
        """Row ``i`` if already decoded, else None."""
        if self._flags[i]:
            return self._data[i]
        return None

    def valid_rows(self, rows: np.ndarray) -> np.ndarray:
        """Bool mask of which of ``rows`` are decoded."""
        return self._flags[rows].astype(bool)

    def read_rows(self, rows: np.ndarray, out: np.ndarray,
                  positions: np.ndarray) -> None:
        """Vectorized gather: ``out[positions] = data[rows]`` in ONE numpy
        fancy-index copy. A per-row Python loop here held the GIL long
        enough to starve the host→device transfer thread on 1-core hosts
        (measured 3.0 s vs 0.11 s per 157 MB put)."""
        self._advise_willneed(rows)
        out[positions] = self._data[rows]

    def _advise_willneed(self, rows: np.ndarray) -> None:
        """``madvise(MADV_WILLNEED)`` the row runs about to be gathered.

        The fancy-index copy demand-faults the memmap one page at a time;
        on a disk-backed cache whose pages fell out of the page cache that
        serializes ~40k 4 KiB faults per 157 MB batch. Advising the
        contiguous row runs first lets the kernel read ahead asynchronously
        while the copy proceeds. Best-effort: silently skipped where the
        mmap handle or madvise is unavailable."""
        mm = getattr(self._data, "_mmap", None)
        madvise = getattr(mm, "madvise", None)
        if madvise is None:
            return
        import mmap as _mmap

        if not hasattr(_mmap, "MADV_WILLNEED"):
            return
        row_bytes = self.canvas * self.canvas * 3
        page = _mmap.PAGESIZE
        srt = np.sort(np.asarray(rows, np.int64))
        if srt.size == 0:
            return  # the run-collapse below would index into the empty array
        # collapse sorted rows into contiguous [start, stop) runs
        breaks = np.nonzero(np.diff(srt) > 1)[0]
        starts = np.concatenate(([0], breaks + 1))
        stops = np.concatenate((breaks, [len(srt) - 1]))
        try:
            for a, b in zip(srt[starts], srt[stops]):
                off = int(a) * row_bytes // page * page
                length = (int(b) + 1) * row_bytes - off
                madvise(_mmap.MADV_WILLNEED, off, length)
        except (OSError, ValueError):
            pass

    def put(self, i: int, img: np.ndarray) -> None:
        self._data[i] = img
        self._flags[i] = 1

    @property
    def complete(self) -> bool:
        return bool(self._flags.all())

    @property
    def hits(self) -> int:
        return int(self._flags.sum())


def _put_until(q: "queue.Queue", item, stop: "threading.Event") -> bool:
    """Blocking put that aborts when the consumer signalled shutdown (an
    abandoned iterator must not leave the producer parked on a full queue).

    The timeout is long ON PURPOSE: a 0.2 s retry interval measured 206 vs
    92 ms/batch end-to-end (the repeated timed-wait wakeups churn the GIL
    against the consumer on few-core hosts). Shutdown stays prompt because
    the consumer drains the queue after setting ``stop`` (below), which
    unblocks a parked put immediately."""
    while not stop.is_set():
        try:
            q.put(item, timeout=5.0)
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
                 num_threads: int = 4, use_native: bool | None = None,
                 cache_dir: str | None = None):
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

        # decode-once canvas cache (rows indexed by shard-local position);
        # cache_pos maps a global file index -> its cache row
        self.cache = None
        self._cache_pos = {}
        if cache_dir:
            self.cache = CanvasCache(
                cache_dir, [self.all_files[i] for i in self._base_index],
                canvas_size, shard_id, num_shards,
                # decoder identity: native fixed-point resize and PIL produce
                # different pixels — canvases from one must not satisfy the
                # other silently
                decoder_id="native" if self._native is not None else "pil")
            self._cache_pos = {fi: j for j, fi in enumerate(self._base_index)}
        # per-epoch loader statistics (decode/cache/wait breakdown)
        self.stats = {"decode_s": 0.0, "wait_s": 0.0, "batches": 0,
                      "decoded": 0, "cache_hits": 0}

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

    def stats_line(self) -> str:
        """One-line decode/cache/wait breakdown for the current epoch."""
        s = self.stats
        b = max(s["batches"], 1)
        return (f"loader: {s['batches']} batches | "
                f"produce {1000 * s['decode_s'] / b:.1f} ms/batch | "
                f"consumer wait {1000 * s['wait_s'] / b:.1f} ms/batch | "
                f"{s['decoded']} decoded, {s['cache_hits']} cache hits")

    def _produce_batch(self, sel, pool):
        """Assemble one (images, labels) batch: cache reads, then native /
        PIL decode of the remainder, then cache write-back."""
        images = np.empty((self.batch_size, self.canvas_size,
                           self.canvas_size, 3), np.uint8)
        labels = np.empty((self.batch_size,), np.int32)
        if self.all_labels is not None:
            labels[:] = [self.all_labels[i] for i in sel]
        else:
            labels[:] = -1

        need = list(range(len(sel)))
        if self.cache is not None:
            rows = np.fromiter((self._cache_pos.get(fi, -1) for fi in sel),
                               np.int64, len(sel))
            valid = rows >= 0
            valid[valid] = self.cache.valid_rows(rows[valid])
            hit_pos = np.nonzero(valid)[0]
            if hit_pos.size:
                self.cache.read_rows(rows[hit_pos], images, hit_pos)
            need = list(np.nonzero(~valid)[0])
            self.stats["cache_hits"] += int(hit_pos.size)
        if need:
            if (self._native is not None
                    and hasattr(self._native, "decode_batch")):
                paths = [self.all_files[sel[j]] for j in need]
                tmp = images if len(need) == len(sel) else np.empty(
                    (len(need), self.canvas_size, self.canvas_size, 3),
                    np.uint8)
                ok = self._native.decode_batch(paths, self.canvas_size, tmp,
                                               num_threads=self.num_threads)
                if tmp is not images:
                    for k, j in enumerate(need):
                        if ok[k]:
                            images[j] = tmp[k]
                misses = [need[k] for k in range(len(need)) if not ok[k]]
            else:
                misses = list(need)
            if misses:  # PIL path (or native punts, e.g. PNG)
                def dec(j):
                    images[j] = _decode_resize_pil(
                        self.all_files[sel[j]], self.canvas_size)
                list(pool.map(dec, misses))
            if self.cache is not None:
                for j in need:
                    row = self._cache_pos.get(sel[j])
                    if row is not None:
                        self.cache.put(row, images[j])
            self.stats["decoded"] += len(need)
        return images, labels

    def __iter__(self):
        order = self._epoch_order()
        nbatches = len(self)
        self.stats = {"decode_s": 0.0, "wait_s": 0.0, "batches": 0,
                      "decoded": 0, "cache_hits": 0}
        if self.prefetch == 0:
            # synchronous mode: produce in the CONSUMER thread. On few-core
            # hosts the background producer's long GIL-holding memcpys
            # interleave pathologically with the host->device transfer
            # (measured 3-5 s vs 0.11 s per 157 MB put); serial
            # produce->put->step sidesteps it, and the device still overlaps
            # the next produce with the async step execution.
            return self._iter_sync(order, nbatches)
        return self._iter_threaded(order, nbatches)

    def _iter_sync(self, order, nbatches):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(self.num_threads, 1)) as pool:
            for b in range(nbatches):
                sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                t0 = perf_counter()
                item = self._produce_batch(sel, pool)
                self.stats["decode_s"] += perf_counter() - t0
                self.stats["batches"] += 1
                yield item

    def _iter_threaded(self, order, nbatches):
        from concurrent.futures import ThreadPoolExecutor

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
                        t0 = perf_counter()
                        item = self._produce_batch(sel, pool)
                        self.stats["decode_s"] += perf_counter() - t0
                        if not _put_until(out_q, item, stop):
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
                t0 = perf_counter()
                item = out_q.get()
                self.stats["wait_s"] += perf_counter() - t0
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "HostLoader producer failed") from item
                self.stats["batches"] += 1
                yield item
        finally:
            stop.set()
            while True:  # unblock a producer parked on a full queue
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
