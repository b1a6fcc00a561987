"""Test harness: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding is validated on a host-platform mesh
(xla_force_host_platform_device_count), mirroring how the driver's
dryrun_multichip check works. Must run before `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
