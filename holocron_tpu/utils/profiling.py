"""Device-time measurement via ``jax.profiler`` traces.

Wall-clock timing through the axon TPU tunnel is polluted by per-dispatch host
overhead (tens of ms), so micro-benchmarks must read the device timeline instead:
capture a trace, parse the "XLA Ops" lines, and report true device time. This is the
measurement backbone for ``scripts/bench_ops.py`` / ``scripts/profile_train_step.py``
(the reference has only perf_counter loops, SURVEY.md §5).
"""

import glob
import gzip
import json
import tempfile
from collections import defaultdict
from typing import Callable, Dict, Optional

__all__ = ["device_op_summary", "trace_device_ops"]


def trace_device_ops(trace_dir: str) -> Dict[str, float]:
    """Parses a ``jax.profiler`` trace directory -> {op_name: total_duration_us} over
    the device's "XLA Ops" timeline.

    TPU-oriented: CPU-platform traces carry no "XLA Ops" timeline, so the result is
    empty there — micro-benchmarks must run on the real chip."""
    traces = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not traces:
        raise FileNotFoundError(f"no trace under {trace_dir} (profiling unsupported here?)")
    events = json.loads(gzip.open(sorted(traces)[-1]).read()).get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name"))
    }
    if not dev_pids:  # CPU platform: the device timeline is the host one
        dev_pids = {
            e["pid"]
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
        and e["args"]["name"] == "XLA Ops"
    }
    agg: Dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            agg[e["name"]] += e.get("dur", 0.0)
    return dict(agg)


def device_op_summary(
    fn: Callable, *args, iters: int = 20, logdir: Optional[str] = None
) -> Dict[str, float]:
    """Jits ``fn``, runs ``iters`` dispatches under a profiler trace, and returns
    ``{"ms_per_iter": ..., "ops": {name: us_total}}`` measured on the DEVICE timeline
    (immune to dispatch/tunnel overhead)."""
    import jax

    jit_fn = jax.jit(fn)
    out = jit_fn(*args)
    jax.device_get(out)  # compile + sync outside the trace
    logdir = logdir or tempfile.mkdtemp(prefix="holocron_ops_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = jit_fn(*args)
        jax.device_get(out)
    ops = trace_device_ops(logdir)
    total_us = sum(ops.values())
    return {"ms_per_iter": total_us / iters / 1e3, "ops": ops}
