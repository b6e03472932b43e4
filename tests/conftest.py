"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing multi-chip semantics without TPU
hardware: XLA exposes 8 host-CPU devices, so sharding/pjit paths compile and
execute exactly as they would on a v5e-8 (minus performance).
Must run before jax initializes its backends, hence the env vars at import.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel), which is slow to connect and single-chip — tests always run on the
# virtual CPU mesh. The axon sitecustomize force-sets jax_platforms via
# jax.config at interpreter startup, so an env var alone is not enough: we must
# override the config value again before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
