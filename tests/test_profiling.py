"""Tests for the device-trace measurement backbone (holocron_tpu/utils/profiling.py).

Wall-clock through the axon tunnel is dispatch-bound, so every perf number in
docs/PERF.md comes from these trace parsers — they deserve their own coverage.
"""

import gzip
import json

import jax.numpy as jnp
import pytest

from holocron_tpu.utils.profiling import device_op_summary, trace_device_ops


def test_trace_device_ops_parses_synthetic_trace(tmp_path):
    """Parser aggregates 'X' events on the device 'XLA Ops' threads, summing across
    repeated op names and ignoring host threads."""
    trace = {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1, "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "thread_name", "pid": 1, "tid": 10, "args": {"name": "XLA Ops"}},
            {"ph": "M", "name": "process_name", "pid": 2, "args": {"name": "python host"}},
            {"ph": "M", "name": "thread_name", "pid": 2, "tid": 20, "args": {"name": "XLA Ops"}},
            {"ph": "X", "pid": 1, "tid": 10, "name": "fusion", "dur": 100.0},
            {"ph": "X", "pid": 1, "tid": 10, "name": "fusion", "dur": 50.0},
            {"ph": "X", "pid": 1, "tid": 10, "name": "convolution", "dur": 25.0},
            {"ph": "X", "pid": 2, "tid": 20, "name": "host_noise", "dur": 999.0},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)
    ops = trace_device_ops(str(tmp_path))
    assert ops == {"fusion": 150.0, "convolution": 25.0}


def test_trace_device_ops_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        trace_device_ops(str(tmp_path))


def test_device_op_summary_end_to_end(tmp_path):
    """CPU traces carry no "XLA Ops" device timeline (TPU-only), so on this test
    platform the contract is: runs the jitted fn, parses the trace, and returns the
    result structure without crashing (ops may legitimately be empty)."""
    x = jnp.ones((64, 64), jnp.float32)
    res = device_op_summary(lambda a: (a @ a) + 1.0, x, iters=3, logdir=str(tmp_path / "t"))
    assert set(res) == {"ms_per_iter", "ops"}
    assert res["ms_per_iter"] >= 0
    assert isinstance(res["ops"], dict)
