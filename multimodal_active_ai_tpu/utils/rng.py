"""Host-side PRNG key streams for training loops.

The reference steers per-batch randomness from host ``random``/``numpy``
calls (``Contrastive_Learning.py:601-635``); the TPU rebuild passes PRNG
keys into jitted steps instead. Doing that naively as
``jax.random.fold_in(key, i)`` or ``keys[i]`` on a *device* array is a
throughput trap: the per-step Python integer becomes a compile-time
constant of a fresh tiny XLA program (dynamic-slice / threefry), so every
training step pays a new compilation + host↔device round trip — hundreds
of milliseconds on a remote-tunneled TPU, dwarfing the actual step. This
module materializes key streams to host numpy once per epoch; per-step
indexing is then free and the (4-byte × 2) key upload rides the step's
dispatch.
"""

from __future__ import annotations

import jax
import numpy as np


def host_key_stream(key, n: int) -> np.ndarray:
    """``n`` independent program keys as host numpy, from ONE device call.

    Index the result per step and pass ``keys[i]`` straight to a jitted
    step function (the key re-uploads as a tiny transfer; it is a traced
    argument, so no recompilation happens).
    """
    return jax.device_get(jax.random.split(key, n))


def epoch_key_stream(root_key, epoch: int, n: int) -> np.ndarray:
    """Per-epoch key stream: fold the epoch on device once, then split."""
    return host_key_stream(jax.random.fold_in(root_key, epoch), n)
