#!/usr/bin/env python
"""Renders the zoo-wide benchmark JSONL (scripts/bench_zoo.py) as a markdown table.

The reference's README ships a 25-row latency table (/root/reference/README.md:169-195,
RTX 2070 Max-Q + i7-10750H); this renders the TPU v5e equivalent with the reference's
GPU numbers alongside for context.

Usage:
    python scripts/gen_bench_table.py /tmp/zoo_cls.jsonl [--quant /tmp/zoo_q.jsonl]
"""

import argparse
import json

# Reference README batch-1 GPU mean latencies (ms) for context — RTX 2070 Max-Q,
# 224px, reparametrized where applicable (/root/reference/README.md:169-195).
REF_GPU_MS = {
    "repvgg_a0": 3.14, "repvgg_a1": 4.13, "repvgg_a2": 7.35, "repvgg_b0": 4.23,
    "repvgg_b1": 12.48, "repvgg_b2": 20.12, "repvgg_b3": 24.94,
    "rexnet1_0x": 6.01, "rexnet1_3x": 6.43, "rexnet1_5x": 6.46,
    "rexnet2_0x": 6.75, "rexnet2_2x": 6.92,
    "sknet50": 11.40, "sknet101": 23.55, "sknet152": 69.81,
    "tridentnet50": 16.62, "res2net50_26w_4s": 9.25, "resnet50d": 36.97,
    "pyconv_resnet50": 20.03, "pyconvhg_resnet50": 38.41,
    "darknet24": 3.94, "darknet19": 3.17, "darknet53": 7.12,
    "cspdarknet53": 6.41, "cspdarknet53_mish": 6.88,
}


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if "error" not in row:
                rows[row["arch"]] = row  # last occurrence wins
    return rows


def main_b1(args):
    """Renders scripts/bench_b1.py JSONL: head-to-head with the reference's own
    batch-1 headline table (device-timeline ms vs its GPU/CPU ms)."""
    rows = load(args.jsonl)
    ordered = sorted(rows.values(), key=lambda r: r["device_ms"])
    print("| Arch | TPU device ms (b=1) | reference GPU ms | reference CPU ms | vs GPU |")
    print("|---|---|---|---|---|")
    for r in ordered:
        gpu = f"{r['ref_gpu_ms']:.2f}" if r.get("ref_gpu_ms") else "—"
        cpu = f"{r['ref_cpu_ms']:.2f}" if r.get("ref_cpu_ms") else "—"
        speed = f"**{r['speedup_vs_ref_gpu']:.1f}x**" if r.get("speedup_vs_ref_gpu") else "—"
        print(f"| {r['arch']} | {r['device_ms']:.3f} | {gpu} | {cpu} | {speed} |")


def main(args):
    rows = load(args.jsonl)
    qrows = load(args.quant) if args.quant else {}
    ordered = sorted(rows.values(), key=lambda r: -r["img_per_sec"])
    cols = "| Arch | params (M) | device ms / batch | images/sec/chip |"
    sep = "|---|---|---|---|"
    if qrows:
        cols += " int8 images/sec |"
        sep += "---|"
    cols += " reference GPU ms (b=1) |"
    sep += "---|"
    print(cols)
    print(sep)
    for r in ordered:
        line = f"| {r['arch']} | {r['params_m']:.1f} | {r['mean_ms']:.2f} | {r['img_per_sec']:,.0f} |"
        if qrows:
            q = qrows.get(r["arch"])
            if q and q["img_per_sec"] > r["img_per_sec"] * 1.02:
                line += f" {q['img_per_sec']:,.0f} ({q['img_per_sec'] / r['img_per_sec']:.2f}x) |"
            else:
                line += " — |"
        ref = REF_GPU_MS.get(r["arch"])
        line += f" {ref:.2f} |" if ref else " — |"
        print(line)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsonl")
    p.add_argument("--quant", default=None, help="JSONL from bench_zoo.py --quantize")
    p.add_argument("--b1", action="store_true", help="render scripts/bench_b1.py JSONL (batch-1 head-to-head)")
    try:
        _args = p.parse_args()
        main_b1(_args) if _args.b1 else main(_args)
    except BrokenPipeError:  # `| head` is a normal way to use this
        pass
