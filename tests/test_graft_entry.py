"""Driver-contract tests for __graft_entry__.py.

The round-1 failure mode (MULTICHIP_r01.json ok=false) was dryrun_multichip being
callable only from its __main__ block: the driver imports the module and calls the
FUNCTION, in an environment where the axon sitecustomize has already registered a
1-device TPU backend. These tests reproduce that invocation exactly: a fresh
subprocess, default environment, no conftest help.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def _run_in_subprocess(code: str, timeout: int = 600) -> subprocess.CompletedProcess:
    env = os.environ.copy()
    # the driver does NOT set these; make sure we don't inherit them from conftest
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_dryrun_multichip_driver_style():
    # exactly what the driver does: import the module, call the function with n=8
    res = _run_in_subprocess(
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "DRYRUN_OK" in res.stdout


def test_dryrun_multichip_driver_style_after_jax_import():
    # harsher variant: the driver env may have already initialized a backend
    # (axon registers a single TPU). The function must still obtain an
    # 8-device CPU mesh by resetting backends.
    # Backend INIT in the default env touches the axon tunnel; when the tunnel is
    # down, jax.devices() hangs — an infra outage, not a contract failure. Probe
    # first and skip rather than burning the full 600 s timeout.
    import pytest

    try:
        _run_in_subprocess("import jax; jax.devices()", timeout=120)
    except subprocess.TimeoutExpired:
        pytest.skip("default-env jax backend (axon tunnel) unresponsive — infra outage")
    res = _run_in_subprocess(
        "import jax; jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "DRYRUN_OK" in res.stdout


def test_dryrun_multichip_odd_device_count():
    # model_parallel must be derived from the actual device count: 3 devices -> pure DP
    res = _run_in_subprocess(
        "import __graft_entry__ as g; g.dryrun_multichip(3); print('DRYRUN_OK')"
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "DRYRUN_OK" in res.stdout


def test_entry_compiles_and_runs():
    res = _run_in_subprocess(
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; fn, args = g.entry();"
        "out = jax.jit(fn)(*args); jax.device_get(out); print('ENTRY_OK', out.shape)"
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "ENTRY_OK" in res.stdout
