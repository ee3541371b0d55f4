"""Multi-slice (DCN) hybrid-mesh construction, exercised in CI with faked
slice topologies (the reference scales across nodes with MPI+NCCL,
``Contrastive_Learning.py:62-93``; the TPU equivalent is a hybrid mesh whose
outer data axis crosses slices over DCN while inner axes stay on ICI)."""

import jax
import numpy as np
import pytest

from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_hybrid_mesh,
)


class FakeSliceDevice:
    """Real CPU device + a faked slice_index (CPU devices report none)."""

    def __init__(self, dev, slice_index):
        self._dev = dev
        self.slice_index = slice_index

    def __getattr__(self, k):
        return getattr(self._dev, k)

    # identity hash/eq: a proxy must NOT compare equal to its real device,
    # or jax's Mesh cache interns a proxy mesh for the real one

    def __repr__(self):
        return f"Fake(slice={self.slice_index}, {self._dev})"


def _fake_two_slices(monkeypatch):
    devs = [FakeSliceDevice(d, i // 4) for i, d in enumerate(jax.devices()[:8])]
    monkeypatch.setattr(jax, "devices", lambda *a, **kw: devs)
    return devs


def test_hybrid_mesh_two_slices(monkeypatch):
    """The DCN branch runs: 2 slices × 4 ICI devices -> 8-way data axis with
    each slice's devices contiguous (gradient all-reduce reduces within a
    slice over ICI before crossing DCN)."""
    _fake_two_slices(monkeypatch)
    mesh = create_hybrid_mesh(verbose=True)
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape[MODEL_AXIS] == 1
    flat = list(np.asarray(mesh.devices).reshape(-1))
    slices = [d.slice_index for d in flat]
    assert slices == [0, 0, 0, 0, 1, 1, 1, 1]
    # all 8 physical devices present exactly once
    assert len({d._dev for d in flat}) == 8


def test_hybrid_mesh_model_axis(monkeypatch):
    _fake_two_slices(monkeypatch)
    mesh = create_hybrid_mesh(data_per_slice=2, model=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2
    # the model axis never crosses a slice boundary (stays on ICI)
    for row in np.asarray(mesh.devices):
        assert len({d.slice_index for d in row}) == 1


def test_hybrid_mesh_single_slice_fallback():
    """CPU devices report no slice_index -> plain create_mesh path."""
    mesh = create_hybrid_mesh()
    assert mesh.shape[DATA_AXIS] == len(jax.devices())


def test_multislice_flag_parses():
    from multimodal_active_ai_tpu.config import ContrastiveConfig, parse_into

    cfg = parse_into(ContrastiveConfig, ["/d", "--multislice"])
    assert cfg.multislice
    cfg = parse_into(ContrastiveConfig, ["/d"])
    assert not cfg.multislice


@pytest.mark.slow
def test_hybrid_mesh_executes_sharded_program(monkeypatch):
    """A GSPMD-jitted program compiles and runs over the hybrid mesh built
    from the faked 2-slice topology (the devices are real; only the slice
    labels are faked)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    _fake_two_slices(monkeypatch)
    mesh = create_hybrid_mesh()
    monkeypatch.undo()  # restore jax.devices before executing
    # unwrap proxies for execution (Mesh holds them fine, but the compiled
    # program needs real devices)
    arr = np.empty(np.asarray(mesh.devices).shape, dtype=object)
    for idx, d in np.ndenumerate(np.asarray(mesh.devices)):
        arr[idx] = d._dev
    real = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    x = jax.device_put(np.arange(32, dtype=np.float32).reshape(8, 4),
                       NamedSharding(real, P(DATA_AXIS)))
    y = jax.jit(lambda a: (a * 2).sum(),
                in_shardings=NamedSharding(real, P(DATA_AXIS)),
                out_shardings=NamedSharding(real, P()))(x)
    assert float(y) == float(np.arange(32).sum() * 2)
