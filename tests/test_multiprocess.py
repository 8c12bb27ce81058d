"""True multi-process certification of the multi-host training path.

Everything else in the suite runs multi-DEVICE but single-PROCESS; these tests run
the trainer across two OS processes joined by ``jax.distributed`` (4 virtual CPU
devices each, one 8-device global mesh, Gloo collectives) — the same topology as a
multi-host TPU pod. This is the only place ``host_local_put``'s
``make_array_from_process_local_data`` branch, the ``DataLoader`` shard split and
the ``_host_batch`` eval gather actually execute with ``jax.process_count() > 1``.

The contract asserted: a 2-process run reproduces the single-process 8-device
run's final parameters and eval metrics on identical deterministic data. Batch
composition per step matches as a SET (the strided shard split permutes rows
within each global batch; loss means, gradient means and BN batch stats are all
order-invariant), so trajectories agree to float32 reduction noise.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "mp_worker_train.py"
DET_WORKER = Path(__file__).resolve().parent / "mp_worker_detection_eval.py"
PIPE_WORKER = Path(__file__).resolve().parent / "mp_worker_pipeline.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = os.environ.copy()
    # the worker picks its own platform/device count; don't inherit conftest's
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{env.get('PYTHONPATH', '')}"
    return env


def _run_workers(
    nproc: int, outdir: Path, variant: str = "plain", timeout: int = 900, script: Path = WORKER
) -> None:
    outdir.mkdir(parents=True, exist_ok=True)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc), str(port), str(outdir), variant],
            cwd=REPO_ROOT,
            env=_worker_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    # wait-any loop: if one worker dies, its peer blocks forever on a collective —
    # kill the survivors promptly and surface the CRASHED worker's output (a
    # sequential communicate() would burn the whole timeout and hide the diagnosis)
    import time

    deadline = time.monotonic() + timeout
    while any(p.poll() is None for p in procs):
        if any(p.poll() is not None and p.returncode != 0 for p in procs):
            break  # a worker failed; stop waiting on the (soon-to-hang) others
        if time.monotonic() > deadline:
            break
        time.sleep(0.5)
    outs = []
    for p in procs:
        if p.poll() is None:
            p.kill()
        out, _ = p.communicate()
        outs.append(out)
    report = "\n".join(f"--- worker {i} (rc={p.returncode}) ---\n{o}" for i, (p, o) in enumerate(zip(procs, outs)))
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "WORKER_DONE" in out, f"worker failed:\n{report}"


@pytest.fixture(scope="module")
def single_process_reference(tmp_path_factory):
    """One single-process 8-device run — every 2-process variant compares to it
    (zero1/tp/spatial are trajectory-equal to plain DP by construction)."""
    sp_dir = tmp_path_factory.mktemp("sp")
    _run_workers(1, sp_dir)
    return sp_dir


def _assert_matches(got_dir: Path, want_dir: Path, rtol: float, atol: float) -> None:
    got = np.load(got_dir / "params.npz")
    want = np.load(want_dir / "params.npz")
    assert set(got.files) == set(want.files)
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=rtol, atol=atol,
            err_msg=f"param {k} diverged from the single-process run",
        )
    m_got = json.load(open(got_dir / "metrics.json"))
    m_want = json.load(open(want_dir / "metrics.json"))
    assert m_got["acc1"] == pytest.approx(m_want["acc1"], abs=1e-9)
    assert m_got["acc5"] == pytest.approx(m_want["acc5"], abs=1e-9)
    assert m_got["val_loss"] == pytest.approx(m_want["val_loss"], rel=1e-3)


def test_two_process_training_matches_single_process(tmp_path, single_process_reference):
    _run_workers(2, tmp_path / "mp")
    _assert_matches(tmp_path / "mp", single_process_reference, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("variant", ["zero1", "tp", "spatial"])
def test_two_process_scaling_variants_match_single_process(
    tmp_path, single_process_reference, variant
):
    """ZeRO-1 / tensor-parallel / spatial-parallel each certified under REAL
    multi-process execution: a (data x model|spatial) mesh spanning two OS
    processes must still reproduce the plain single-process trajectory."""
    _run_workers(2, tmp_path / variant, variant=variant)
    _assert_matches(tmp_path / variant, single_process_reference, rtol=5e-4, atol=5e-5)


def test_initialize_joins_runtime_from_env(tmp_path):
    """parallel.initialize() must join the distributed runtime from the standard
    env vars WITHOUT touching the jax backend first (a process_count() probe
    before the join both reads 1 and poisons jax.distributed.initialize)."""
    port = _free_port()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from holocron_tpu.parallel import initialize; initialize();"
        "assert jax.process_count() == 2, jax.process_count();"
        "initialize();"  # idempotent
        "print('INIT_OK', jax.process_index())"
    )
    procs = []
    for i in range(2):
        env = _worker_env()
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(i),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], cwd=REPO_ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "INIT_OK" in out, f"initialize() failed:\n{out}"


def test_two_process_pipeline_hops_cross_process(tmp_path):
    """GPipe microbatch hops (lax.ppermute) must be correct when the pipe mesh
    spans two OS processes — the hop at the stage-4/5 boundary crosses the
    inter-process transport, which no single-process test can execute. Both
    topologies must also produce the same output."""
    _run_workers(2, tmp_path / "mp", script=PIPE_WORKER)
    _run_workers(1, tmp_path / "sp", script=PIPE_WORKER)
    got = np.load(tmp_path / "mp" / "pipeline_out.npy")
    want = np.load(tmp_path / "sp" / "pipeline_out.npy")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_two_process_detection_eval_counters_match(tmp_path):
    """Detection eval runs host-side over each process's loader shard; the
    cross-process counter sum must make every host report the single-process
    metrics (the save-on-best decision depends on them being identical)."""
    _run_workers(2, tmp_path / "mp", script=DET_WORKER)
    _run_workers(1, tmp_path / "sp", script=DET_WORKER)
    m_mp = json.load(open(tmp_path / "mp" / "det_metrics.json"))
    m_sp = json.load(open(tmp_path / "sp" / "det_metrics.json"))
    assert m_mp == m_sp
    # the crafted stub makes half the boxes loc misses — a sanity anchor that the
    # counters actually moved (an all-zero reduction would also "match")
    assert m_sp["loc_err"] == pytest.approx(0.5, abs=1e-6)
