"""Test environment: 8 virtual CPU devices so mesh/collective paths run in CI.

This realizes the multi-device test strategy SURVEY §4 calls for: the
reference could not test its NCCL/MPI paths without a cluster; here the
``data``-axis collectives (the ``Objective.py:102-114`` equivalent, SyncBN
pmean, gradient psum) execute on a simulated 8-device host mesh.

Note: this environment ships a TPU platform plugin that takes priority over
the ``JAX_PLATFORMS`` env var, so the CPU platform and virtual device count
are forced through ``jax.config`` before first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# full-precision matmuls/convs for numerical parity tests
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from multimodal_active_ai_tpu.parallel.mesh import create_mesh

    return create_mesh()


@pytest.fixture(scope="session")
def mesh2():
    """Small mesh for expensive end-to-end steps (8 virtual devices on one
    physical core make full train-step tests crawl)."""
    from multimodal_active_ai_tpu.parallel.mesh import create_mesh

    return create_mesh(data=2, model=1, devices=jax.devices()[:2])


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
