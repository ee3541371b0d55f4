"""Device-mesh bootstrap: the TPU-native replacement of the reference's L0 layer.

The reference bootstraps a cluster with MPI rank discovery + a MASTER_ADDR
broadcast and NCCL process groups (``Contrastive_Learning.py:62-93,198-225``).
On TPU the same capability is `jax.distributed.initialize()` plus a
`jax.sharding.Mesh`; collectives are inserted by XLA from sharding
annotations and ride ICI (intra-slice) / DCN (multi-slice). Control-plane
scalar broadcasts (the reference MPI-bcasts RNG draws,
``DQN/Training.py:22-28``) are unnecessary: every host folds the same seeded
PRNG key, so stochastic decisions agree by construction.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Axis names used across the framework. Data parallelism is the only strategy
# the reference implements (SURVEY §2.4); the model axis exists so larger
# encoders can be tensor-sharded without API change.
DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           verbose: bool = False) -> None:
    """Multi-host bootstrap; replaces the MPI block at ``Contrastive_Learning.py:62-93``.

    Single-process runs (the common case in tests and on one TPU VM) are a
    no-op, mirroring the reference's graceful single-process fallback
    (``Contrastive_Learning.py:87-93``). On managed TPU pods the three
    arguments auto-detect; elsewhere (or for the reference's
    MASTER_ADDR-style launch), set ``MAAI_NUM_PROCESSES``,
    ``MAAI_COORDINATOR`` (host:port) and ``MAAI_PROCESS_ID`` — the env
    equivalent of the reference's RANK/WORLD_SIZE/MASTER_ADDR contract.
    """
    n = num_processes
    if n is None:
        n = int(os.environ.get("MAAI_NUM_PROCESSES", "1"))
    if n <= 1:
        if verbose:
            print("single-process run; skipping jax.distributed.initialize")
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("MAAI_COORDINATOR")
    if process_id is None and "MAAI_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MAAI_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=n,
        process_id=process_id,
    )
    if verbose:
        print(f"distributed initialized: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.local_device_count()} local devices")


def create_mesh(data: int | None = None, model: int = 1,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``data=None`` uses all devices not claimed by the model axis. The flat
    device order follows ``jax.devices()`` so the data axis maps onto ICI
    neighbours first (XLA's default device order is ICI-contiguous).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch-leading array: batch split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def make_global_array(x, sharding: NamedSharding):
    """Assemble a batch-sharded global array from this process's local rows.

    The multi-host feed path: each process's reader yields its
    ``global_batch / process_count`` share of the batch and this stitches the
    shares into one global array (``jax.make_array_from_process_local_data``),
    the TPU equivalent of DALI's per-rank shards feeding one DDP step
    (``NVIDIA_DALI_Pipelines.py:36-37`` + ``Contrastive_Learning.py:418-424``).
    Single-process runs reduce to a plain sharded ``device_put``, with
    device arrays (e.g. from :class:`SyntheticReader`) passing through for
    jit to lay out. Multi-process runs MUST assemble — a process-local
    device array fed to a non-addressable-mesh jit is an error — so device
    arrays are pulled to host and stitched like numpy ones.
    """
    if jax.process_count() == 1:
        if not isinstance(x, np.ndarray):
            return x
        return jax.device_put(x, sharding)
    if not isinstance(x, np.ndarray):
        x = np.asarray(jax.device_get(x))
    return jax.make_array_from_process_local_data(sharding, x)


def local_batch_rows(x) -> np.ndarray:
    """Host copy of THIS PROCESS's rows of a batch-sharded global array.

    The inverse of :func:`make_global_array` for batch-leading outputs a
    multi-host program returns sharded (e.g. the RLS rollout buffers that
    feed the host replay memory): single-process runs get the full array;
    multi-process runs get the addressable shards concatenated in batch
    order — each process keeps its own transitions, like the reference's
    per-rank replay pushes (``DETR_Image_Classification_RLS.py:751-769``).
    """
    if jax.process_count() == 1 or not hasattr(x, "addressable_shards"):
        return np.asarray(jax.device_get(x))
    # dedupe by batch offset: with a model axis (or a replicated array)
    # several local devices hold the SAME rows — keep one copy per offset.
    # Contract: the array is sharded over the BATCH axis only — a shard
    # split along any other axis would make the kept copy a fragment (one
    # device's columns) silently posing as full rows, so check it is full.
    by_start: dict[int, np.ndarray] = {}
    for s in x.addressable_shards:
        if any(sl.indices(dim) != (0, dim, 1)
               for sl, dim in zip(s.index[1:], x.shape[1:])):
            raise ValueError(
                "local_batch_rows requires P(DATA_AXIS)-only sharding: "
                f"shard {s.index} does not span the full non-batch extent "
                f"of shape {x.shape}")
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)


def per_process_batch(per_shard_batch: int, mesh: Mesh) -> tuple[int, int]:
    """(global_batch, per-process batch) from the per-data-shard ``-b``.

    Reference semantics: ``-b`` is the per-rank batch and the global batch is
    ``b × world_size`` (``Contrastive_Learning.py:585-587`` +
    ``Model_Util.py:11-15``). Here "rank" is a data-axis shard (device), so
    ``global = b × data_axis`` and each host process feeds
    ``global / process_count`` rows per step.
    """
    n_data = mesh.shape[DATA_AXIS]
    global_batch = per_shard_batch * n_data
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} (= -b {per_shard_batch} × "
            f"{n_data} data shards) not divisible by {n_proc} processes")
    return global_batch, global_batch // n_proc

def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch size; replaces DALI's shard bookkeeping
    (``NVIDIA_DALI_Pipelines.py:647-657``) for device-level sharding."""
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n_data}")
    return global_batch // n_data


def data_parallel_jit(fn, mesh: Mesh | None, batch_args: Sequence[int],
                      donate_argnums: Sequence[int] = (),
                      num_outputs: int = 1, batch_outputs: Sequence[int] = ()):
    """GSPMD data parallelism: jit ``fn`` with the listed positional args
    batch-sharded over the ``data`` axis and everything else replicated.

    This is the production parallelization path for every train/eval step
    in the framework. The step functions are written for the *global* batch
    with no explicit collectives; XLA inserts the gradient all-reduce, the
    global BatchNorm-statistic reduction (SyncBatchNorm parity), and the
    contrastive-negative exchange from these sharding annotations alone,
    scheduling them onto ICI. The equivalent ``shard_map`` + explicit
    ``all_gather``/``pmean`` formulation measured ~200× slower on TPU for
    the SimCLR step (see ``train/simclr_train.py``), so it is not used.

    ``num_outputs``: arity of fn's output tuple (1 = single pytree).
    ``batch_outputs``: indices of outputs that are batch-leading and should
    stay sharded over the data axis (e.g. rollout buffers).

    A 1-device mesh compiles as a plain jit: the program is identical, and
    engaging the SPMD partitioner for a single device measured ~30x slower
    execution on the remote-tunneled TPU backend used for benching.
    """
    if mesh is None or mesh.size == 1:
        return jax.jit(fn, donate_argnums=tuple(donate_argnums))
    import inspect

    n = len(inspect.signature(fn).parameters)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    in_sh = tuple(data if i in tuple(batch_args) else repl for i in range(n))
    if num_outputs == 1:
        out_sh = data if 0 in tuple(batch_outputs) else repl
    else:
        out_sh = tuple(data if i in tuple(batch_outputs) else repl
                       for i in range(num_outputs))
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh,
                   donate_argnums=tuple(donate_argnums))


def create_hybrid_mesh(data_per_slice: int | None = None, model: int = 1,
                       verbose: bool = False) -> Mesh:
    """Multi-slice mesh: data parallelism across slices over DCN, data(+model)
    within a slice over ICI.

    The reference scales across nodes with MPI+NCCL over the datacenter
    network (``Contrastive_Learning.py:62-93``); the TPU equivalent is a
    hybrid mesh in which the *outer* data axis maps to DCN (slice-to-slice)
    and inner axes stay on ICI, so gradient all-reduces hierarchically
    reduce within a slice before crossing slices. Falls back to
    :func:`create_mesh` on single-slice/CPU topologies.
    """
    from jax.experimental import mesh_utils

    devices = jax.devices()
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if num_slices <= 1:
        return create_mesh(data=data_per_slice, model=model)
    per_slice = len(devices) // num_slices
    if data_per_slice is None:
        data_per_slice = per_slice // model
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(data_per_slice, model),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices)
    mesh = Mesh(dev_array.reshape(num_slices * data_per_slice, model),
                (DATA_AXIS, MODEL_AXIS))
    if verbose:
        print(f"hybrid mesh: {num_slices} slices x {data_per_slice} data "
              f"x {model} model")
    return mesh
