"""Synthetic on-device data source for benchmarks and tests.

The reference has no equivalent (it always reads MSCOCO/ImageNet from
Lustre); this exists so the compute path (retina + encoder + loss) can be
exercised and benchmarked without a dataset, with batches generated directly
in HBM — no host↔device transfer in the hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


class SyntheticReader:
    """Deterministic fake image/label batches, generated on device."""

    def __init__(self, batch_size: int, canvas_size: int, num_examples: int = 12800,
                 num_classes: int = 1000, seed: int = 15):
        self.batch_size = batch_size
        self.canvas_size = canvas_size
        self.num_examples = num_examples
        self.num_classes = num_classes
        # host-side key stream: per-batch fold_in/indexing on device arrays
        # would compile a fresh tiny program per batch index (see utils.rng)
        self._keys = jax.device_get(
            jax.random.split(jax.random.PRNGKey(seed), len(self)))
        self._i = 0

        @jax.jit
        def gen(key):
            kimg, klab = jax.random.split(key)
            images = jax.random.randint(
                kimg, (batch_size, canvas_size, canvas_size, 3), 0, 256,
                dtype=jnp.int32).astype(jnp.uint8)
            labels = jax.random.randint(klab, (batch_size,), 0, num_classes,
                                        dtype=jnp.int32)
            return images, labels

        self._gen = gen

    def __iter__(self):
        self._i = 0
        return self

    def __next__(self):
        if self._i * self.batch_size >= self.num_examples:
            raise StopIteration
        batch = self._gen(self._keys[self._i])
        self._i += 1
        return batch

    def reset(self):
        """Reader-reset parity with HostLoader (DALI ``pipe.reset()``)."""
        self._i = 0

    def __len__(self):
        return -(-self.num_examples // self.batch_size)
