#!/usr/bin/env python
"""Multi-process (multi-host) smoke worker: the feed + collective contract.

The reference scales with MPI rank bootstrap + NCCL collectives
(``Contrastive_Learning.py:62-93,198-225``); this framework's equivalents
are ``parallel.mesh.initialize_distributed`` (jax.distributed) and the
``make_global_array`` per-process feed into GSPMD programs. This worker
runs ONE process of an N-process job and verifies, against ground truth:

  1. bootstrap via initialize_distributed (coordinator rendezvous),
  2. a global mesh spanning all processes' devices,
  3. make_global_array assembling each process's distinct local rows,
  4. a data_parallel_jit program whose result needs cross-process
     reduction (the gradient-allreduce path the drivers rely on).

Run (one line per process, any host):
  python tools/multiprocess_check.py PROC_ID NUM_PROCS COORD_ADDR:PORT

CI runs 2 local CPU processes via ``tests/test_multiprocess.py`` (JAX's
Gloo-backed CPU collectives).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(proc_id: int, num_procs: int, coordinator: str) -> None:
    # platform comes from the environment: CI exports JAX_PLATFORMS=cpu for
    # the Gloo-backed run; on a real pod leave it unset so the native TPU
    # platform (ICI/DCN collectives) is what actually gets verified
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # pod-shaped runs: N virtual CPU devices PER PROCESS, so each process
    # feeds a strict subset of a multi-device shard (the real TPU-pod
    # topology: e.g. 2 hosts x 4 chips -> an 8-way data mesh)
    local_devices = int(os.environ.get("MAAI_LOCAL_DEVICES", "0"))
    if local_devices:
        jax.config.update("jax_num_cpu_devices", local_devices)

    import numpy as np

    from multimodal_active_ai_tpu.parallel.mesh import (
        DATA_AXIS,
        batch_sharding,
        create_mesh,
        data_parallel_jit,
        initialize_distributed,
        make_global_array,
        per_process_batch,
    )

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id,
                           verbose=True)
    assert jax.process_count() == num_procs

    mesh = create_mesh()
    n_data = mesh.shape[DATA_AXIS]
    sh = batch_sharding(mesh)

    # -b semantics across processes: global = b * n_data, local = global/P
    gb, lb = per_process_batch(2, mesh)
    assert gb == 2 * n_data and lb == gb // num_procs, (gb, lb)

    # each process contributes DISTINCT rows; a global reduction must see
    # every process's data (value encodes the producing process)
    local = np.full((lb, 3), float(proc_id + 1), np.float32)
    arr = make_global_array(local, sh)
    assert arr.shape == (gb, 3), arr.shape

    fn = data_parallel_jit(lambda x: (x * 2.0).sum(), mesh, batch_args=(0,))
    total = float(jax.device_get(fn(arr)))
    expect = 2.0 * 3 * lb * sum(p + 1 for p in range(num_procs))
    assert total == expect, (total, expect)

    # device arrays also assemble (the SyntheticReader path)
    import jax.numpy as jnp

    dev_local = jnp.full((lb, 3), float(proc_id + 1), jnp.float32)
    arr2 = make_global_array(dev_local, sh)
    total2 = float(jax.device_get(fn(arr2)))
    assert total2 == expect, (total2, expect)

    print(f"MULTIPROCESS OK proc {proc_id}/{num_procs}: "
          f"{jax.local_device_count()} local devices, global batch {gb}, "
          f"cross-process reduction {total} == {expect}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
