"""Test harness: force an 8-device virtual CPU platform before jax import so
multi-chip sharding paths are exercised without TPU hardware (SURVEY 4:
multi-host tests via mesh emulation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the container's sitecustomize registers the TPU platform before conftest
# runs, so env vars alone don't stick — force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from wrf_partmc_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices()[:8], shape=(2, 4))
