"""Test configuration.

- Force 8 virtual CPU devices (multi-chip sharding logic is validated on a CPU
  mesh; real CI hardware is a single TPU chip).
- Default all test computation to CPU: unit parity tests compare against torch
  float32, and the axon TPU tunnel both reduces matmul precision and deadlocks
  when combined with JAX_PLATFORMS=cpu + torch (observed in this image).
  NOTE: do NOT set JAX_PLATFORMS=cpu here — with torch imported it hangs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.pop("JAX_PLATFORMS", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
