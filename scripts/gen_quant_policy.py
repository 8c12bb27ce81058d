#!/usr/bin/env python
"""Generates holocron_tpu/models/_data/quant_policy.json from the measured zoo
benchmarks in docs/bench/*.jsonl.

The per-arch int8-vs-bf16 outcome is knowledge the package should act on, not just
document (VERDICT r2): `quantize_model` warns — and the serving path falls back to
bf16 — where int8 measurably loses. Policy = best-measured int8 throughput over
best-measured bf16 throughput per arch (best across the args/const deploy forms,
mirroring the README "best measured form" protocol).

Run after refreshing any zoo JSONL: python scripts/gen_quant_policy.py
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "docs" / "bench"
OUT = ROOT / "holocron_tpu" / "models" / "_data" / "quant_policy.json"

BF16 = [
    "zoo_v5e_224_b128_bf16.jsonl",
    "zoo_v5e_224_b128_bf16_const.jsonl",
    "zoo_v5e_segdet_b32_bf16.jsonl",
    "zoo_v5e_segdet_b32_bf16_const.jsonl",
]
INT8 = [
    "zoo_v5e_224_b128_int8.jsonl",
    "zoo_v5e_224_b128_int8_const.jsonl",
    "zoo_v5e_segdet_b32_int8.jsonl",
]


def best_per_arch(files):
    best = {}
    for name in files:
        path = BENCH / name
        if not path.exists():
            continue
        for line in path.read_text().splitlines():
            row = json.loads(line)
            if "img_per_sec" not in row:
                continue
            arch = row["arch"]
            best[arch] = max(best.get(arch, 0.0), row["img_per_sec"])
    return best


# Trace-measured per-arch quantization floors (scripts/trace_int8_headline.py,
# docs/PERF.md round-4 int8 trace): quantizing the 48-ch stage-1 convs WINS 3.6x in
# whole-graph fusion context on repvgg a-variants (the isolated per-conv measurement
# said parity — the fused quantize chain changes the answer). Only archs with a
# chip-traced + accuracy-gated lower floor belong here.
MIN_IN_CHANNELS_OVERRIDES = {
    "repvgg_a0": 48,  # the only zoo RepVGG with sub-64 stage widths (a=0.75)
}

# Measured per-arch stride-2 handling (quantize_model kwargs of the same names):
# s2d_strided rewrites eligible stride-2 3x3 int8 convs as stride-1 2x2 over the
# space-to-depth input; quantize_strided=False keeps strided convs bf16. Both are
# policy-driven through quant_policy.json — entries here survive regeneration
# (without this table a hand-added key would be silently dropped; ADVICE r4).
STRIDE_POLICY_OVERRIDES: dict = {
    # "<arch>": {"s2d_strided": True} / {"quantize_strided": False}, once traced+gated
}

# Quality-gate vetoes: an arch whose measured int8-vs-bf16 agreement fails its
# task's gate (classification top-1 >= 0.99; segmentation mask IoU >= 0.99;
# detection box-F1 — docs/PERF.md "int8 accuracy gates beyond classification")
# must stay un-recommended NO MATTER how fast int8 is. Speed rows alone set
# `recommended`, so a quality failure recorded only in
# docs/bench/quant_accuracy*.jsonl would be silently re-recommended on the next
# regeneration without this veto.
QUALITY_GATE_VETOES: dict = {
    "yolov2": (
        "int8 box-F1 vs bf16 = 0.893 (recall 0.806, matched IoU 0.819) on trained "
        "weights (2000 steps, loss 2.21) — int8 drops ~19% of bf16's detections; "
        "docs/bench/quant_accuracy_segdet.jsonl row 2026-08-20. Speed 1.11x does "
        "not clear the quality gate (yolov1 F1 1.0, yolov4 0.979-0.986 pass)."
    ),
}


def main():
    bf16 = best_per_arch(BF16)
    int8 = best_per_arch(INT8)
    policy = {
        arch: {
            "int8_speedup": round(int8[arch] / bf16[arch], 3),
            "recommended": int8[arch] / bf16[arch] >= 1.05,
        }
        for arch in sorted(set(bf16) & set(int8))
    }
    for arch, floor in MIN_IN_CHANNELS_OVERRIDES.items():
        if arch in policy:
            policy[arch]["min_in_channels"] = floor
    for arch, overrides in STRIDE_POLICY_OVERRIDES.items():
        if arch in policy:
            policy[arch].update(overrides)
    for arch, reason in QUALITY_GATE_VETOES.items():
        if arch in policy:
            policy[arch]["recommended"] = False
            policy[arch]["quality_veto"] = reason
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(policy, indent=1) + "\n")
    n_rec = sum(1 for v in policy.values() if v["recommended"])
    print(f"wrote {OUT}: {len(policy)} archs, {n_rec} recommended for int8")


if __name__ == "__main__":
    sys.exit(main())
