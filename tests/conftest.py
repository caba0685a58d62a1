"""Test harness: force an 8-virtual-device CPU backend.

The axon PJRT sitecustomize registers a 1-chip TPU backend and pins
`jax_platforms=axon` at interpreter start. For tests we want the standard JAX
fake-device backend (SURVEY.md §4.4): N virtual CPU devices so the full
sharded train step, sampling fan-out, and SMC resampling collectives run and
are checked for numeric parity without a pod. Re-pinning `jax_platforms` to
cpu *before the first backend init* wins over the sitecustomize (verified on
this box), and `--xla_force_host_platform_device_count` gives 8 devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("fake 8-device CPU backend unavailable")
    return devs
