"""Profiling & tracing: the observability subsystem (SURVEY §5).

The reference's only performance surface is wall-clock meters with explicit
``torch.cuda.synchronize()`` (``Contrastive_Learning.py:707-734``). This
module keeps that Speed/##Perf surface (see
:mod:`multimodal_active_ai_tpu.utils.meters`) and adds what the reference
lacks: ``jax.profiler`` trace capture (viewable in TensorBoard/Perfetto),
a step timer with device synchronization, and a lightweight xplane-free
step-stats summary.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import re
from time import perf_counter

import jax

# module/step parent spans to drop when summing device leaf-op times
# (jit_* program spans, while/body/cond control frames, bare step ints)
PARENT_SPAN = re.compile(r"^(jit_|while|body|cond|\d+$)")


def device_leaf_ops(trace_dir: str) -> list[tuple[str, float]]:
    """``(op_name, duration_us)`` for every leaf X-event on a device pid of
    the newest ``*.trace.json.gz`` under ``trace_dir``.

    This is the measurement CLAUDE.md mandates for this environment (wall
    timing through the tunnel is dispatch-bound nonsense): capture with
    :func:`trace`, then sum per-op ``dur`` on the TPU pids. Shared by
    ``tools/profile_step.py`` (per-op breakdown) and
    ``tools/bn_stat_bench.py`` (device-time totals) so the pid detection
    and parent-span filtering cannot drift apart. Raises ``RuntimeError``
    when no trace file exists.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no trace found under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and any(k in e.get("args", {}).get("name", "")
                        for k in ("TPU", "/device:", "Device"))}
    return [(e.get("name", ""), float(e.get("dur", 0.0)))
            for e in events
            if e.get("ph") == "X" and e.get("pid") in dev_pids
            and not PARENT_SPAN.match(e.get("name", ""))]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/maai_trace", enabled: bool = True):
    """Capture a jax.profiler trace around a code block.

    Usage::

        with profiling.trace("/tmp/trace"):
            state, m = train_step(state, images, key)
            jax.block_until_ready(m)
    """
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Synchronized per-step wall timer (the reference's
    ``cuda.synchronize(); time()`` pattern, ``Contrastive_Learning.py:721-723``,
    as a reusable object)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.times: list[float] = []

    def start(self):
        self._t0 = perf_counter()

    def stop(self, *sync_on):
        for x in sync_on:
            jax.block_until_ready(x)
        dt = perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def avg(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def summary(self, items_per_step: int = 0) -> str:
        if not self.times:
            return "no steps recorded"
        avg = self.avg
        line = f"steps={len(self.times)} avg={avg * 1e3:.2f}ms"
        if items_per_step:
            line += f" throughput={items_per_step / avg:.1f}/s"
        return line


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
