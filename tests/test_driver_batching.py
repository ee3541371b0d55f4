"""Driver-level batch accounting on a multi-device mesh.

Regression tests for the reference batch semantics (``-b`` is the per-rank /
per-data-shard batch; the global batch is ``b × world_size``,
``Contrastive_Learning.py:585-587`` + ``Model_Util.py:11-15``): the CLI
driver must consume ``b × n_data`` distinct images per optimizer step, scale
the LR by that same global batch, and assemble global arrays through the
multi-host-safe feed path.
"""

import os

import jax
import numpy as np
import pytest

from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_global_array,
    per_process_batch,
)


def test_per_process_batch_semantics(mesh8):
    gb, lb = per_process_batch(2, mesh8)
    assert gb == 2 * mesh8.shape[DATA_AXIS]
    assert lb == gb // jax.process_count()  # single process: feeds it all


def test_make_global_array_roundtrip(mesh8):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = make_global_array(x, batch_sharding(mesh8))
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(jax.device_get(arr), x)
    # sharded over the data axis: each device holds 2 rows
    assert {s.data.shape[0] for s in arr.addressable_shards} == {2}


def test_make_global_array_process_local_path(mesh8):
    """The multi-host assembly primitive works on this (1-process) mesh too:
    every device is addressable, so process-local data == the global batch."""
    x = np.arange(8 * 3, dtype=np.int32).reshape(8, 3)
    arr = jax.make_array_from_process_local_data(batch_sharding(mesh8), x)
    np.testing.assert_array_equal(jax.device_get(arr), x)


@pytest.mark.slow
def test_simclr_driver_trains_global_batch(tmp_path, monkeypatch):
    """`-b 2` on the 8-device mesh: every driver step must train a global
    batch of 16 distinct images, the LR schedule must be built from that
    global batch, and `-t` mode must still validate + checkpoint."""
    import contrastive_learning
    from multimodal_active_ai_tpu.train import schedule, simclr_train

    seen_shapes, first_batch, sched_calls = [], [], []

    orig_make = simclr_train.make_train_step

    def spying_make(*a, **kw):
        step = orig_make(*a, **kw)

        def wrapped(state, images, key):
            seen_shapes.append(tuple(images.shape))
            if not first_batch:
                first_batch.append(np.asarray(jax.device_get(images)))
            return step(state, images, key)

        return wrapped

    orig_sched = schedule.simclr_learning_rate

    def spying_sched(base_lr, global_batch_size, num_examples, batch_size,
                     *a, **kw):
        sched_calls.append((global_batch_size, num_examples, batch_size))
        return orig_sched(base_lr, global_batch_size, num_examples,
                          batch_size, *a, **kw)

    monkeypatch.setattr(simclr_train, "make_train_step", spying_make)
    monkeypatch.setattr(schedule, "simclr_learning_rate", spying_sched)

    contrastive_learning.main([
        str(tmp_path / "unused"), "--dataset", "synthetic",
        "--arch", "ResNet18", "-b", "2", "--canvas-size", "64", "-f", "2",
        "--epochs", "1", "-t", "--num-examples", "32",
        "--checkpoint-dir", str(tmp_path),
    ])

    # 32 examples / global batch 16 = 2 steps, each over 16 images
    assert seen_shapes and all(s[0] == 16 for s in seen_shapes), seen_shapes
    assert len(seen_shapes) == 2
    # all 16 images in a step are distinct (not a repeated per-process batch)
    flat = first_batch[0].reshape(16, -1)
    assert len({r.tobytes() for r in flat}) == 16
    # LR scaling uses the global batch actually trained; warmup steps derive
    # from the per-process reader batch (num_examples / batch = steps/epoch)
    (gbs, n_ex, bs), = sched_calls
    assert gbs == 16 and n_ex == 32 and bs == 16
    # -t mode still validated and saved the checkpoint through the CLI
    assert os.path.isfile(tmp_path / "checkpoint.msgpack")
