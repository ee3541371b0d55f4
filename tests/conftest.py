"""Test environment: 8 virtual CPU devices so mesh/collective paths run in CI.

This realizes the multi-device test strategy SURVEY §4 calls for: the
reference could not test its NCCL/MPI paths without a cluster; here the
``data``-axis collectives (the ``Objective.py:102-114`` equivalent, SyncBN
pmean, gradient psum) execute on a simulated 8-device host mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# full-precision matmuls/convs for numerical parity tests (this CPU build's
# default conv precision is reduced)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from multimodal_active_ai_tpu.parallel.mesh import create_mesh

    return create_mesh()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
