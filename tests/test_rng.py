"""Host key-stream tests (utils/rng.py): the per-step recompile trap fix."""

import jax
import numpy as np

from multimodal_active_ai_tpu.utils.rng import epoch_key_stream, host_key_stream


def test_host_key_stream_is_numpy_and_deterministic(rng):
    a = host_key_stream(rng, 8)
    b = host_key_stream(rng, 8)
    assert isinstance(a, np.ndarray) and a.shape[0] == 8
    np.testing.assert_array_equal(a, b)
    # distinct keys within a stream
    assert len({tuple(k) for k in a.reshape(8, -1)}) == 8


def test_epoch_key_streams_differ_across_epochs(rng):
    a = epoch_key_stream(rng, 0, 4)
    b = epoch_key_stream(rng, 1, 4)
    assert not np.array_equal(a, b)


def test_host_keys_usable_in_jit(rng):
    keys = host_key_stream(rng, 3)
    f = jax.jit(lambda k: jax.random.uniform(k, (2,)))
    outs = [np.asarray(f(k)) for k in keys]
    assert not np.array_equal(outs[0], outs[1])
