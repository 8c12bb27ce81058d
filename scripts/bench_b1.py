#!/usr/bin/env python
"""Batch-1 latency sweep on the reference's OWN headline benchmark.

The reference's README performance claim is a batch-1 latency table over 25
classification factories (/root/reference/README.md:169-195; protocol
scripts/eval_latency.py:20-35 — 100 iterations, (224, 224) input, reparametrized
RepVGG), measured on an RTX 2070 Max-Q / i7-10750H. This script reproduces that
exact workload on one TPU chip, reporting:

- ``device_ms``: mean device-busy time per forward, summed over the "XLA Ops"
  timeline of a ``jax.profiler`` trace (``utils/profiling.device_op_summary``).
  Wall-clock through the axon tunnel is dispatch-bound at batch 1 (tens of ms of
  host overhead for sub-ms forwards), so the device timeline is the only honest
  analog of the reference's CUDA-synchronized loop.
- ``queued_ms``: mean wall time with all iterations queued and ONE final sync —
  what a pipelined caller (e.g. the serving micro-batcher) observes per forward.

Weights are closed over the jit (the const-weights deploy protocol, docs/PERF.md);
archs whose const-form HLO exceeds the remote-compile size limit fall back to
weights-as-arguments automatically.

Usage:
    python scripts/bench_b1.py --out docs/bench/zoo_b1_224_bf16.jsonl
"""

import argparse
import json
import time
import traceback

import jax
import jax.numpy as jnp

# (gpu_ms, cpu_ms) mean latency from the reference README table
# (/root/reference/README.md:169-195) — RTX 2070 Max-Q / i7-10750H, batch 1, 224px.
REFERENCE_B1_MS = {
    "repvgg_a0": (3.14, 23.28),
    "repvgg_a1": (4.13, 29.61),
    "repvgg_a2": (7.35, 46.87),
    "repvgg_b0": (4.23, 33.16),
    "repvgg_b1": (12.48, 100.66),
    "repvgg_b2": (20.12, 155.90),
    "repvgg_b3": (24.94, 224.68),
    "rexnet1_0x": (6.01, 13.66),
    "rexnet1_3x": (6.43, 19.13),
    "rexnet1_5x": (6.46, 21.06),
    "rexnet2_0x": (6.75, 31.77),
    "rexnet2_2x": (6.92, 33.61),
    "sknet50": (11.40, 54.03),
    "sknet101": (23.55, 94.89),
    "sknet152": (69.81, 253.07),
    "tridentnet50": (16.62, 142.85),
    "res2net50_26w_4s": (9.25, 41.84),
    "resnet50d": (36.97, 36.97),
    "pyconv_resnet50": (20.03, 178.85),
    "pyconvhg_resnet50": (38.41, 301.03),
    "darknet24": (3.94, 29.39),
    "darknet19": (3.17, 26.36),
    "darknet53": (7.12, 53.20),
    "cspdarknet53": (6.41, 48.05),
    "cspdarknet53_mish": (6.88, 67.78),
}

# The reference publishes NO det/seg latency numbers (its README table is
# classification-only), so these rows extend the protocol to the det/seg zoo at the
# reference's own training resolutions (references/detection/train.py:416,
# references/segmentation/train.py:256) with the repo's numbers as the new
# reference point (VERDICT r4 #7).
DEFAULT_SIZES = {
    "yolov1": 448,  # reference yolov1 head is fixed at its 448px training grid
    "yolov2": 416,
    "yolov4": 416,
    "unet": 256,
    "unetp": 256,
    "unetpp": 256,
    "unet3p": 256,
    # NOTE: no "dynamic_unet" row — it is a builder, not a zero-arg factory
    # (reference holocron/models/segmentation/unet.py:371-414 takes an encoder);
    # its concrete instantiations unet2/unet_tvvgg11/unet_tvresnet34/unet_rexnet13
    # are benched individually.
    "unet_tvvgg11": 256,
    "unet_tvresnet34": 256,
    "unet_rexnet13": 256,
    "unet2": 256,
}


def bench_one(arch: str, size: int, iters: int) -> dict:
    from holocron_tpu import models
    from holocron_tpu.utils.profiling import device_op_summary

    model = models.__dict__[arch](dtype=jnp.bfloat16)
    model.init((1, size, size, 3), dtype=jnp.bfloat16)
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()
    variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), model.variables)
    module = model.module

    x = jax.random.normal(jax.random.key(0), (1, size, size, 3), jnp.bfloat16)

    def measure(form):
        if form == "const":
            # const-weights deploy form: weights baked into the executable
            fwd = jax.jit(lambda inp: module.apply(variables, inp, train=False))
            jax.device_get(fwd(x))
            return fwd, device_op_summary(fwd, x, iters=iters)
        inner = jax.jit(lambda v, inp: module.apply(v, inp, train=False))
        fwd = lambda inp: inner(variables, inp)  # noqa: E731
        jax.device_get(fwd(x))
        # weights must be EXPLICIT args to the profiling helper: it re-jits its fn,
        # and re-jitting the `fwd` closure would bake the weights back in as
        # constants — recreating the const form (and its 413) under another name
        return fwd, device_op_summary(inner, variables, x, iters=iters)

    # The remote-compile service rejects const-form HLO past ~200 MB of embedded
    # weights (HTTP 413 — measured: 181 MB repvgg_b1 compiles, 283 MB repvgg_b2 does
    # not), and a doomed attempt costs minutes of compile time — skip const outright
    # for models past the threshold.
    param_bytes = sum(t.size * t.dtype.itemsize for t in jax.tree.leaves(variables))
    form = "const" if param_bytes < 200e6 else "args"
    try:
        fwd, summary = measure(form)
    except Exception:  # noqa: BLE001
        if form == "args":
            raise
        form = "args"
        fwd, summary = measure(form)

    # pipelined wall time: queue all iterations, one sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    jax.device_get(out)
    queued_ms = (time.perf_counter() - t0) / iters * 1000

    n_params = sum(p.size for p in jax.tree.leaves(model.params))
    ref_gpu, ref_cpu = REFERENCE_B1_MS.get(arch, (None, None))
    row = {
        "arch": arch,
        "batch": 1,
        "size": size,
        "dtype": "bfloat16",
        "form": form,
        "device_ms": round(summary["ms_per_iter"], 4),
        "queued_ms": round(queued_ms, 3),
        "params_m": round(n_params / 1e6, 2),
        "ref_gpu_ms": ref_gpu,
        "ref_cpu_ms": ref_cpu,
    }
    if ref_gpu and summary["ms_per_iter"] > 0:  # CPU traces carry no device timeline
        row["speedup_vs_ref_gpu"] = round(ref_gpu / summary["ms_per_iter"], 1)
    return row


def main(args):
    archs = args.archs or list(REFERENCE_B1_MS)
    for arch in archs:
        try:
            row = bench_one(arch, args.size or DEFAULT_SIZES.get(arch, 224), args.it)
        except Exception as e:  # noqa: BLE001 — keep sweeping on per-arch failure
            row = {"arch": arch, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        line = json.dumps(row)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--archs", nargs="*", default=None, help="subset (default: every reference-table arch)")
    p.add_argument("--size", type=int, default=0, help="0 = per-arch default (224; det 416/448, seg 256)")
    p.add_argument("--it", type=int, default=100, help="iterations per arch (reference protocol: 100)")
    p.add_argument("--out", default=None, help="append JSONL results here")
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
