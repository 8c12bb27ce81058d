#!/usr/bin/env python
"""Measures GPipe's per-device memory claim on the virtual CPU mesh.

``parallel/pipeline.py`` claims per-device activation residency of ``2·B/n + B/M``
microbatch buffers (two belt shards + one circulating microbatch) instead of the
full batch ``B``. This script compiles the REAL darknet53 512-channel stage
(``features/layer_3_block_{0..7}``, extracted with ``Model.stage_variables``) both
ways and reads XLA's own buffer assignment (``compiled.memory_analysis()``) — the
same accounting the TPU compiler uses for HBM, measured here on the 8-device CPU
mesh, where per-device temp size is the SPMD per-device program's peak.

Usage: python scripts/bench_pipeline_memory.py [--batch 256] [--hw 8]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# must be set before jax initializes its backends (same trick as tests/conftest.py)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def mib(n: float) -> str:
    return f"{n / 2**20:8.1f} MiB"


def main(args):
    from holocron_tpu.models import darknet53
    from holocron_tpu.models.classification.darknetv3 import ResBlock
    from holocron_tpu.parallel import create_mesh, pipeline_module, stack_stage_variables

    b, hw, c, s = args.batch, args.hw, 512, 8
    model = darknet53()
    model.init((1, hw * 16, hw * 16, 3))  # stage 3 sits at stride 16
    stacked = stack_stage_variables(model.variables, "layer_3_block_")
    block = ResBlock(c, c // 2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, hw, hw, c)).astype(np.float32))
    buf = b * hw * hw * c * 4  # one full-batch activation buffer, bytes

    def report(tag, lowered, theory_bufs):
        mem = lowered.compile().memory_analysis()
        print(
            f"  {tag:<28} temp {mib(mem.temp_size_in_bytes)}   "
            f"args {mib(mem.argument_size_in_bytes)}   "
            f"out {mib(mem.output_size_in_bytes)}   "
            f"(theory ~{theory_bufs:.2f} x {mib(buf).strip()} activations)"
        )
        return mem.temp_size_in_bytes

    print(
        f"darknet53 stage 3: {s} ResBlocks @ {c}ch, batch {b}, {hw}x{hw} spatial "
        f"(one activation buffer = {mib(buf).strip()})\n"
    )

    # -- sequential single-device fold (the non-pipelined baseline) ---------------
    def seq(vars_stacked, h):
        for i in range(s):
            vi = jax.tree.map(lambda t: t[i], vars_stacked)
            h = block.apply(vi, h, train=False)
        return h

    dev = jax.devices()[0]
    seq_j = jax.jit(seq, device=dev)
    t_seq = report("sequential (1 device)", seq_j.lower(stacked, x), 2.0)

    # -- pipelined over n stages ---------------------------------------------------
    results = {}
    for n, m in [(4, 8), (8, 8), (8, 16), (8, 32)]:
        if b % m:
            continue
        mesh = create_mesh(jax.devices()[:n], axes=("pipe",))
        xs = jax.device_put(x, NamedSharding(mesh, P("pipe")))
        ps = jax.device_put(stacked, NamedSharding(mesh, P("pipe")))
        fn = jax.jit(
            lambda p, h, mesh=mesh, m=m: pipeline_module(block, p, h, mesh=mesh, num_microbatches=m)
        )
        theory = 2.0 / n + 1.0 / m  # two belt shards + one circulating microbatch
        t = report(f"pipelined n={n} M={m}", fn.lower(ps, xs), theory)
        results[(n, m)] = t

    best = min(results.values())
    print(
        f"\nper-device temp memory, best pipelined vs sequential: "
        f"{mib(best).strip()} vs {mib(t_seq).strip()} ({t_seq / best:.1f}x less)"
    )
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", default=256, type=int)
    parser.add_argument("--hw", default=8, type=int, help="stage-3 spatial size (input is 16x)")
    sys.exit(main(parser.parse_args()))
