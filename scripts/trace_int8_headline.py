#!/usr/bin/env python
"""Device-traces the int8 HEADLINE form next to the bf16 form (VERDICT r3 #5).

Builds the arch exactly as bench.py does (reparametrized deploy form when the
model supports it, bf16 variables, qparams closed over the jit as constants),
captures a ``jax.profiler`` trace of each form on the real chip, and prints
per-op device-time tables plus a category split — the data that says where the
gap to the ~394 TOP/s int8 peak goes (bf16-kept narrow stages? requantize
chains? layout copies?).

Usage: python scripts/trace_int8_headline.py [--arch darknet53] [--batch 256]
       [--iters 30] [--min-in-channels 32]
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_train_step import categorize  # noqa: E402  (same categorizer as the train tables)


def trace_form(fwd, x, iters: int):
    import jax

    from holocron_tpu.utils.profiling import trace_device_ops

    import tempfile

    out = fwd(x)
    jax.device_get(out)  # compile + sync outside the trace
    logdir = tempfile.mkdtemp(prefix="holocron_int8_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fwd(x)
        jax.device_get(out)
    ops = trace_device_ops(logdir)
    return ops


def report(tag: str, ops, iters: int, batch: int, top: int = 18):
    total_us = sum(ops.values())
    ms_per_iter = total_us / iters / 1e3
    print(f"\n== {tag}: {ms_per_iter:.3f} ms/iter device time, {batch / ms_per_iter * 1e3:,.0f} img/s roofline ==")
    cats = defaultdict(float)
    for name, us in ops.items():
        cats[categorize(name)] += us
    print("| category | us/iter | share |")
    print("|---|---|---|")
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"| {cat} | {us / iters:.1f} | {us / total_us * 100:.1f}% |")
    print(f"\ntop {top} ops ({tag}):")
    print("| op | us/iter | share |")
    print("|---|---|---|")
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"| {name[:90]} | {us / iters:.1f} | {us / total_us * 100:.1f}% |")
    return ms_per_iter


def main(args):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import holocron_tpu.models as zoo
    from bench import _naturalistic_batch
    from holocron_tpu.quant import quantize_model

    batch = args.batch
    model = getattr(zoo, args.arch)(dtype=jnp.bfloat16)
    model.init((batch, args.size, args.size, 3))
    for i in range(2):
        try:
            model(_naturalistic_batch(jax.random.key(100 + i), batch, args.size), train=True)
        except ValueError:
            break  # detection modules demand targets in train mode; init BN stats suffice for a perf trace
    if hasattr(model.module, "reparametrize"):
        if args.s2d_input:
            # host-rearranged space-to-depth deploy form (docs/PERF.md round-3 table):
            # the 3-ch stem becomes a 12-ch 2x2 stride-1 conv — quantizable once
            # min_in_channels <= 12 (VERDICT r4 #4: the round-3 measurement kept the
            # folded stem bf16; this re-evaluates it in int8 fusion context)
            model.reparametrize(s2d_input=True)
        else:
            model.reparametrize()

    variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), model.variables)
    module = model.module
    x = _naturalistic_batch(jax.random.key(0), batch, args.size, jnp.bfloat16)
    if args.s2d_input:
        from holocron_tpu.transforms.functional import space_to_depth_batch

        x = space_to_depth_batch(x)

    fwd = jax.jit(lambda a: module.apply(variables, a, train=False))
    qm = quantize_model(
        model, calibration_batches=[x.astype(jnp.float32)], min_in_channels=args.min_in_channels
    )
    qm.variables = variables
    qfwd, qparams = qm.apply_fn(), qm.qparams
    jfwd = jax.jit(lambda a: qfwd(qm.variables, qparams, a))

    bf16_ms = None
    if not args.int8_only:
        bf16_ops = trace_form(fwd, x, args.iters)
        bf16_ms = report("bf16 const form", bf16_ops, args.iters, batch)
    int8_ops = trace_form(jfwd, x, args.iters)
    int8_ms = report(
        f"selective-int8 const form (min_in_channels={args.min_in_channels})",
        int8_ops, args.iters, batch,
    )

    out = {
        "arch": args.arch,
        "batch": batch,
        "size": args.size,
        "s2d_input": bool(args.s2d_input),
        "min_in_channels": args.min_in_channels,
        "int8_ms_per_iter_device": round(int8_ms, 3),
    }
    if bf16_ms is not None:
        out["bf16_ms_per_iter_device"] = round(bf16_ms, 3)
        out["int8_speedup_device"] = round(bf16_ms / int8_ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="repvgg_a0", help="any zoo factory (classification/detection/segmentation)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=224, help="input side (det archs: 416)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--min-in-channels", type=int, default=64, help="quantize_conv floor (the lever experiment)")
    p.add_argument("--int8-only", action="store_true", help="skip the bf16 reference trace")
    p.add_argument(
        "--s2d-input",
        action="store_true",
        help="host-rearranged space-to-depth deploy form (RepVGG only): 12-ch stem, quantizable at --min-in-channels<=12",
    )
    main(p.parse_args())
