"""Test harness: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding is validated on a host-platform mesh
(xla_force_host_platform_device_count), mirroring how the driver's
dryrun_multichip check works.

Note: this machine's sitecustomize registers a TPU ('axon') PJRT plugin at
interpreter boot and pins jax_platforms via jax.config.update — env vars
alone do NOT move JAX off the TPU. The config.update below runs after that
hook and wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
