"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is validated on CPU via XLA's host-platform device spoofing
(the standard fake-backend trick the CUDA reference lacks — SURVEY.md §4).
The env vars must be set before jax initializes its backends; the axon TPU
plugin registers itself at interpreter start, so we also force the platform
back to cpu through jax.config.
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
