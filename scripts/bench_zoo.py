#!/usr/bin/env python
"""Zoo-wide latency/throughput sweep -> JSONL.

TPU-native analog of the reference's README latency table
(/root/reference/README.md:169-195; protocol scripts/eval_latency.py:20-35 — 10
warmup + 100 timed iterations, reparametrize first): runs every factory through the
`eval_latency` protocol in ONE process (keeps the tunnel/compile cache warm) and
appends machine-readable JSON lines so the README/docs tables can be generated.

Usage:
    python scripts/bench_zoo.py --out /tmp/zoo_bench.jsonl                 # classification
    python scripts/bench_zoo.py --tasks segmentation detection --batch 32
"""

import argparse
import json
import time
import traceback

import jax
import jax.numpy as jnp

CLASSIFICATION = [
    "repvgg_a0", "repvgg_a1", "repvgg_a2", "repvgg_b0", "repvgg_b1", "repvgg_b2",
    "repvgg_b3",
    "mobileone_s0", "mobileone_s1", "mobileone_s2", "mobileone_s3",
    "rexnet1_0x", "rexnet1_3x", "rexnet1_5x", "rexnet2_0x", "rexnet2_2x",
    "resnet18", "resnet34", "resnet50", "resnet50d", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d",
    "res2net50_26w_4s", "sknet50", "sknet101", "sknet152", "tridentnet50",
    "pyconv_resnet50", "pyconvhg_resnet50",
    "darknet24", "darknet19", "darknet53", "cspdarknet53", "cspdarknet53_mish",
    "convnext_atto", "convnext_femto", "convnext_pico", "convnext_nano",
    "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
    "convnext_xl",
]
SEGMENTATION = ["unet", "unet2", "unetp", "unetpp", "unet3p", "unet_tvvgg11", "unet_tvresnet34", "unet_rexnet13"]
DETECTION = ["yolov1", "yolov2", "yolov4"]

SIZES = {"classification": 224, "segmentation": 256, "detection": 416}


def bench_one(arch: str, task: str, batch: int, size: int, dtype, it: int, warmup: int,
              quantize: bool = False) -> dict:
    from holocron_tpu import models

    model = models.__dict__[arch](dtype=dtype)
    model.init((batch, size, size, 3), dtype=dtype)
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()

    variables = model.variables
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), variables)
    module = model.module
    x = jax.random.normal(jax.random.key(0), (batch, size, size, 3), dtype)

    # The remote-compile service rejects const-form HLO past ~200 MB of embedded
    # weights (HTTP 413; thresholds measured in scripts/bench_b1.py) — past that,
    # fall back to weights-as-args like the bf16 convnext_large/xl rows.
    param_bytes = sum(t.size * t.dtype.itemsize for t in jax.tree.leaves(variables))
    const_form = param_bytes < 200e6

    if quantize:
        from holocron_tpu.quant import quantize_model

        qm = quantize_model(model, calibration_batches=[x], arch=arch)
        qm.variables = variables
        qparams = qm.qparams
        qfwd = qm.apply_fn()
        if const_form:
            # weights/qparams as jit constants — the deploy protocol (docs/PERF.md):
            # XLA bakes them into the executable (+27% int8 / +7% bf16 vs args)
            fwd = jax.jit(lambda inp: qfwd(variables, qparams, inp))
        else:
            inner = jax.jit(qfwd)
            fwd = lambda inp: inner(variables, qparams, inp)  # noqa: E731
    elif const_form:
        fwd = jax.jit(lambda inp: module.apply(variables, inp, train=False))
    else:
        inner = jax.jit(lambda v, inp: module.apply(v, inp, train=False))
        fwd = lambda inp: inner(variables, inp)  # noqa: E731
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fwd(x)
    jax.device_get(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(it):
        out = fwd(x)
    jax.device_get(out)  # queued dispatch; executions serialize on-device
    total = time.perf_counter() - t0

    n_params = sum(p.size for p in jax.tree.leaves(model.params))
    return {
        "arch": arch,
        "task": task,
        "batch": batch,
        "size": size,
        "dtype": str(dtype.__name__),
        "mean_ms": round(total / it * 1000, 3),
        "img_per_sec": round(batch * it / total, 1),
        "params_m": round(n_params / 1e6, 2),
        "compile_s": round(compile_s, 1),
        "form": "const" if const_form else "args",
    }


def main(args):
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    plan = []
    if "classification" in args.tasks:
        plan += [(a, "classification") for a in CLASSIFICATION]
    if "segmentation" in args.tasks:
        plan += [(a, "segmentation") for a in SEGMENTATION]
    if "detection" in args.tasks:
        plan += [(a, "detection") for a in DETECTION]
    if args.archs:
        plan = [(a, t) for a, t in plan if a in args.archs]

    for arch, task in plan:
        size = args.size or SIZES[task]
        try:
            row = bench_one(arch, task, args.batch, size, dtype, args.it, args.warmup,
                            quantize=args.quantize)
            if args.quantize:
                row["quantized"] = True
        except Exception as e:  # noqa: BLE001 — keep sweeping on per-arch failure
            row = {"arch": arch, "task": task, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        line = json.dumps(row)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--tasks", nargs="+", default=["classification"],
                   choices=["classification", "segmentation", "detection"])
    p.add_argument("--archs", nargs="*", default=None, help="subset filter")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=None, help="override per-task default size")
    p.add_argument("--it", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--quantize", action="store_true", help="selective int8 PTQ (holocron_tpu.quant)")
    p.add_argument("--out", default=None, help="append JSONL results here")
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
