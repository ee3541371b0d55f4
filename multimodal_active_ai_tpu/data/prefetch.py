"""Host→device transfer prefetch: overlap ``device_put`` with the step.

The reference leans on DALI's ``prefetch_queue_depth`` to keep augmented
batches ready ahead of the consumer (``SimCLR/NVIDIA DALI/
NVIDIA_DALI_Pipelines.py:30-32``; set to 1 there only because its
global-variable command channel forces synchronous execution). The TPU
equivalent has two stages — the host producer (decode/cache gather, already
overlapped by :class:`~multimodal_active_ai_tpu.data.loader.HostLoader`'s
prefetch queue) and the host→device transfer. This module overlaps the
SECOND stage: a bounded background thread runs ``put(batch)`` (the
``make_global_array`` / ``device_put`` call) for batch N+1 while the caller
steps on batch N, so the H2D copy rides under the device's async step
execution instead of serializing with it.

On few-core hosts the extra thread can interleave pathologically with the
producer (the 1-vCPU tunnel box measured 3-5 s per 157 MB put under
concurrency — PERF.md); ``depth=0`` degrades to the plain synchronous path.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

# seconds between is-the-consumer-gone checks while parked on a full queue
# (module-level so tests can shrink it to exercise the stall path quickly)
_PUT_TIMEOUT = 5.0


def device_prefetch(batches: Iterable, put: Callable, depth: int = 2) -> Iterator:
    """Yield ``put(batch)`` for each batch, with up to ``depth`` transfers
    issued ahead of the consumer.

    ``batches`` yields host batches (or tuples); ``put`` maps one batch to
    its device-resident form. Exceptions from the source iterator or from
    ``put`` re-raise at the consumer's next ``next()``. ``depth=0`` is the
    synchronous identity pipeline.
    """
    if depth <= 0:
        for b in batches:
            yield put(b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()
    put_timeout = _PUT_TIMEOUT

    def blocking_put(item) -> bool:
        """Put that never gives up while the consumer is alive: a single
        bounded timeout would silently DROP the end/exception sentinel when
        the consumer stalls past it with a full queue (a multi-minute XLA
        compile on batch 0 is routine here) and leave it parked on ``q.get()``
        forever."""
        while not stop.is_set():
            try:
                q.put(item, timeout=put_timeout)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if stop.is_set():
                    return
                if not blocking_put(put(b)):
                    return
            blocking_put(_END)
        except BaseException as exc:  # noqa: BLE001 — forwarded as sentinel
            blocking_put(exc)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise RuntimeError("device prefetch failed") from item
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker parked on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
