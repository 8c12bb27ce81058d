#!/usr/bin/env python
"""Profiles the jitted train step on the real TPU and prints a device-op summary.

Captures a ``jax.profiler`` trace of N train steps (default RepVGG-A0, bf16 AMP +
LAMB — the docs/PERF.md configuration; any classification, segmentation, or
detection factory via ``--arch``, task inferred from the factory's namespace),
parses the device timeline ("XLA Ops" lines), and prints: total device time per
step, the top ops by self-time, and the conv/elementwise/optimizer split — the
data behind the roofline tables in docs/PERF.md.

Usage: python scripts/profile_train_step.py [--arch resnet50] [--batch 128] [--steps 5]
       python scripts/profile_train_step.py --arch unet --batch 32 --size 256
       python scripts/profile_train_step.py --arch yolov4 --batch 32 --size 416
"""

import argparse
import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def categorize(op_name: str) -> str:
    name = op_name.lower()
    if "conv" in name:
        return "convolution"
    if any(k in name for k in ("dot", "matmul")):
        return "matmul"
    if any(k in name for k in ("all-reduce", "all-gather", "reduce-scatter", "collective")):
        return "collective"
    if "copy" in name or "transpose" in name:
        return "copy/layout"
    if "reduce" in name or "norm" in name:
        return "reduction/norm"
    if "fusion" in name:
        return "fusion (elementwise/other)"
    return "other"


def infer_task(arch: str) -> str:
    from holocron_tpu.models import detection, segmentation

    if arch in detection.__dict__:
        return "detection"
    if arch in segmentation.__dict__:
        return "segmentation"
    return "classification"


def main(args):
    import numpy as np

    from holocron_tpu import models
    from holocron_tpu.nn.functional import cross_entropy
    from holocron_tpu.optim import lamb
    from holocron_tpu.trainer import ClassificationTrainer, DetectionTrainer, SegmentationTrainer

    task = args.task or infer_task(args.arch)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, args.size, args.size, 3)).astype(np.float32)
    if task == "classification":
        y = rng.integers(0, 10, size=(args.batch,)).astype(np.int32)
    elif task == "segmentation":
        y = rng.integers(0, 10, size=(args.batch, args.size, args.size)).astype(np.int32)
    else:  # detection: padded relative-xyxy GT dicts (static shapes under jit)
        from holocron_tpu.models.detection import pad_targets

        targets = []
        for _ in range(args.batch):
            k = int(rng.integers(1, 8))
            xy = rng.uniform(0.0, 0.9, size=(k, 2)).astype(np.float32)
            wh = rng.uniform(0.05, 0.1, size=(k, 2)).astype(np.float32)
            targets.append({
                "boxes": np.concatenate([xy, xy + wh], axis=1),
                "labels": rng.integers(0, 10, size=(k,)).astype(np.int32),
            })
        y = pad_targets(targets, 50)
    loader = [(x, y)]

    model = getattr(models, args.arch)()
    remat = {"none": False, "full": True, "dots": "dots"}[args.remat]
    if args.opt == "lamb":
        opt = lambda lr: lamb(lr)  # noqa: E731
    elif args.opt == "sgd":
        import optax

        opt = lambda lr: optax.sgd(lr, momentum=0.9)  # noqa: E731
    else:
        from holocron_tpu.optim import adamp

        opt = lambda lr: adamp(lr)  # noqa: E731
    if task == "classification":
        trainer = ClassificationTrainer(model, loader, loader, cross_entropy, opt, amp=True, remat=remat)
    elif task == "segmentation":
        trainer = SegmentationTrainer(model, loader, loader, cross_entropy, opt, amp=True, remat=remat)
    else:
        trainer = DetectionTrainer(model, loader, loader, None, opt, amp=True, remat=remat)

    logdir = tempfile.mkdtemp(prefix="holocron_profile_")
    trainer.profile(logdir=logdir, num_steps=args.steps, lr=1e-3)

    traces = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    if not traces:
        print("no trace captured (profiling unsupported on this backend?)")
        return 1
    data = json.loads(gzip.open(traces[0]).read())
    events = data.get("traceEvents", [])

    # find the device pid and its "XLA Ops" thread
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "TPU" in str(e.get("args", {}).get("name"))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in dev_pids and e["args"]["name"] == "XLA Ops"
    }
    ops = [e for e in events if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    for e in ops:
        dur = e.get("dur", 0.0)
        by_op[e["name"]] += dur
        by_cat[categorize(e["name"])] += dur
    total_us = sum(by_op.values())
    per_step_ms = total_us / args.steps / 1e3
    if not total_us:
        print("no TPU device ops in trace (CPU backend?) — skipping the timeline summary")
        per_step_ms = float("nan")
    else:
        print(f"\ndevice time: {per_step_ms:.2f} ms/step over {args.steps} steps "
              f"({args.batch / per_step_ms * 1e3:.0f} img/s/chip)")
    print("\nby category:")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / args.steps / 1e3:7.2f} ms/step  {100 * dur / total_us:5.1f}%  {cat}")
    print("\ntop 12 ops by self time:")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {dur / args.steps / 1e3:7.2f} ms/step  {100 * dur / total_us:5.1f}%  {name[:90]}")

    # FLOPs-side roofline: XLA's own cost analysis of the compiled step
    try:
        import jax

        lowered = trainer._train_step.lower(
            trainer.model.params, trainer.model.state or {}, trainer._opt_state,
            jax.numpy.asarray(x), jax.tree.map(jax.numpy.asarray, y), jax.random.key(0),
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops")
        if flops:
            print(f"\nXLA cost analysis: {flops / 1e9:.1f} GFLOP/step -> "
                  f"{flops / (per_step_ms / 1e3) / 1e12:.1f} TFLOP/s achieved")
        nbytes = cost.get("bytes accessed")
        if nbytes:
            gbps = nbytes / (per_step_ms / 1e3) / 1e9
            print(f"bytes accessed: {nbytes / 1e9:.1f} GB/step -> {gbps:.0f} GB/s "
                  f"({100 * gbps / 819:.0f}% of v5e HBM peak)")
    except Exception as e:
        print("cost analysis unavailable:", e)
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="repvgg_a0", help="model factory name (any task)")
    parser.add_argument(
        "--task", default=None, choices=["classification", "segmentation", "detection"],
        help="inferred from --arch's namespace when omitted",
    )
    parser.add_argument("--size", default=224, type=int)
    parser.add_argument("--batch", default=128, type=int)
    parser.add_argument("--steps", default=5, type=int)
    parser.add_argument("--remat", default="none", choices=["none", "full", "dots"])
    parser.add_argument("--opt", default="lamb", choices=["lamb", "sgd", "adamp"])
    sys.exit(main(parser.parse_args()))
