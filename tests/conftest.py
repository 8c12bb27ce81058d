"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only pytest strategy (SURVEY.md §4) — the TPU analog of its
mock datasets is a forced host-platform device count so sharding/pjit paths are exercised
without real chips.
"""

import os

# must be set before jax initializes its backends
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize hook force-registers the TPU tunnel platform; override it so
# tests run on the local 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
