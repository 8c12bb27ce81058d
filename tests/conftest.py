"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only pytest strategy (SURVEY.md §4) — the TPU analog of its
mock datasets is a forced host-platform device count so sharding/pjit paths are exercised
without real chips.
"""

import os

# must be set before jax initializes its backends
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    prev = (prev + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices share ONE core here: an 8-way all-reduce needs all 8 device
# threads scheduled within the rendezvous window, and XLA's default 40s hard limit
# F-aborts the whole process when the box is busy (observed in the CLI test
# sequence: "Termination timeout for `all reduce ...` of 40 seconds exceeded")
if "collective_call_terminate_timeout" not in prev:
    prev += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = prev
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize hook force-registers the TPU tunnel platform; override it so
# tests run on the local 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-bound on this 1-core box
# (~46 min cold); cached re-runs skip identical XLA compiles entirely
_cache_dir = os.environ.get("HOLOCRON_TEST_CACHE", "/tmp/holocron_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
