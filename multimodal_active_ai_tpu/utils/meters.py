"""Host-side metric meters and cross-replica scalar reduction.

TPU-native counterpart of the reference's ``SimCLR/Utilities.py``: the
``AverageMeter`` semantics (val/sum/count/avg, reference
``Utilities.py:8-24``) are kept identical so the ``Speed``/``##Perf`` log
lines are comparable, while ``reduce_tensor`` (``Utilities.py:30-34``, an
NCCL all_reduce / world_size) becomes :func:`mean_across_replicas` — under
pjit a scalar produced from sharded data is already globally consistent, so
the host-side reduction collapses to a device-mean only when the caller
explicitly holds per-replica values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class AverageMeter:
    """Computes and stores the average and current value.

    Mirrors reference ``SimCLR/Utilities.py:8-24`` (val/sum/count/avg and the
    same update arithmetic) so checkpointed histories and printed stats are
    directly comparable.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    # checkpoint schema helpers: the reference pickles the meter object inside
    # .pth.tar checkpoints (``Contrastive_Learning.py:529``); we serialize a dict.
    def state_dict(self):
        return {
            "val": float(self.val),
            "avg": float(self.avg),
            "sum": float(self.sum),
            "count": float(self.count),
        }

    def load_state_dict(self, state):
        # cast to python floats: msgpack-restored scalars arrive as
        # read-only numpy arrays, which would make `sum += ...` raise
        self.val = float(state["val"])
        self.avg = float(state["avg"])
        self.sum = float(state["sum"])
        self.count = float(state["count"])


def mean_across_replicas(value, axis_name: str | None = None):
    """Average a per-replica scalar across the mesh.

    Replaces reference ``Utilities.reduce_tensor`` (``Utilities.py:30-34``):
    inside `shard_map`/`pmap` pass ``axis_name``; outside (pjit-global values)
    this is the identity because the value is already global.
    """
    if axis_name is None:
        return value
    return jax.lax.pmean(value, axis_name=axis_name)


def to_python_float(t) -> float:
    """Host transfer of a scalar; counterpart of ``Utilities.py:43-47``."""
    return float(jax.device_get(t))


def speed_line(epoch, i, loader_len, batch_time: AverageMeter, losses: AverageMeter,
               total_batch_size: int) -> str:
    """Format the reference's per-iteration training log line.

    Format parity with ``Contrastive_Learning.py:726-734``.
    """
    return (
        "Epoch: [{0}][{1}/{2}]\t"
        "Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
        "Speed {3:.3f} ({4:.3f})\t"
        "Loss {loss.val:.10f} ({loss.avg:.4f})".format(
            epoch, i, loader_len,
            total_batch_size / batch_time.val if batch_time.val else float("nan"),
            total_batch_size / batch_time.avg if batch_time.avg else float("nan"),
            batch_time=batch_time,
            loss=losses,
        )
    )


def perf_line(prec1, prec5, best_prec1, total_batch_size, avg_epoch_time) -> str:
    """Format the reference's per-epoch summary (``Contrastive_Learning.py:532-539``)."""
    return (
        "##Contrastive Top-1 {0}\n"
        "##Contrastive Top-5 {1}\n"
        "##Best Contrastive Top-1 saved {2}\n"
        "##Perf {3}".format(prec1, prec5, best_prec1,
                            total_batch_size / avg_epoch_time if avg_epoch_time else float("nan"))
    )
