#!/usr/bin/env python
"""Model latency / throughput benchmark.

TPU-native analog of the reference's scripts/eval_latency.py:20-103 (10 warmup + 100
timed iterations on a 224x224 input, reparametrize first for RepVGG/MobileOne),
extended with the throughput-oriented images/sec metric at a configurable batch size.

Usage:
    python scripts/eval_latency.py repvgg_a0 --dtype bfloat16 --batch 32
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main(args):
    from holocron_tpu import models

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    model = models.__dict__[args.arch](dtype=dtype)
    model.init((args.batch, args.size, args.size, 3), dtype=dtype)
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()

    variables = model.variables
    if args.dtype == "bfloat16":
        variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), variables)
    module = model.module
    x = jax.random.normal(jax.random.key(0), (args.batch, args.size, args.size, 3), dtype)

    if args.quantize:
        from holocron_tpu.quant import quantize_model

        qm = quantize_model(model, calibration_batches=[x], arch=args.arch)
        qm.variables = variables  # keep the non-quantized remainder in the bench dtype
        qparams = qm.qparams
        qfwd = qm.apply_fn()
        # weights + qparams closed over the jit as constants: XLA bakes them into
        # the executable — measured +27% int8 / +7% bf16 (docs/PERF.md)
        fwd = jax.jit(lambda inp: qfwd(variables, qparams, inp))
    else:
        fwd = jax.jit(lambda inp: module.apply(variables, inp, train=False))
    for _ in range(args.warmup):
        out = fwd(x)
    jax.device_get(out)

    # round-trip latency: per-call host sync (includes any host<->device transport)
    t0 = time.perf_counter()
    jax.device_get(fwd(x))
    rtt_ms = (time.perf_counter() - t0) * 1000

    # device throughput: queue all iterations, executions serialize on-device, one sync
    t0 = time.perf_counter()
    for _ in range(args.it):
        out = fwd(x)
    jax.device_get(out)
    total = time.perf_counter() - t0

    mean_ms = total / args.it * 1000
    backend = jax.devices()[0].platform
    print(f"{args.arch} ({backend}, {args.dtype}, batch={args.batch}, {args.size}px)")
    print(f"device mean {mean_ms:.2f}ms/iter, host round-trip {rtt_ms:.2f}ms")
    print(f"throughput: {args.batch * args.it / total:.1f} images/sec")


def parse_args():
    parser = argparse.ArgumentParser(
        description="Model latency evaluation", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("arch", type=str, help="architecture to use")
    parser.add_argument("--size", type=int, default=224, help="input size")
    parser.add_argument("--batch", type=int, default=1, help="batch size")
    parser.add_argument("--it", type=int, default=100, help="number of timed iterations")
    parser.add_argument("--warmup", type=int, default=10, help="number of warmup iterations")
    parser.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument(
        "--quantize",
        action="store_true",
        help="selective int8 PTQ (per-channel weights, calibrated activations) — see holocron_tpu/quant.py",
    )
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
