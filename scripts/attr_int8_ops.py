#!/usr/bin/env python
"""Maps the int8 headline trace's hot fusion names to HLO instructions.

The round-4 trace (docs/PERF.md) shows two ops eating 38.5% of the selective-int8
RepVGG-A0 step (clamp_convert_fusion.4 at 999us, convert_reduce_fusion at 964us)
but fusion names alone don't say WHICH layer they are. This compiles the exact
bench form and greps the optimized HLO for those instructions — their convolution
shapes + source metadata identify the layer, which decides the next lever.

Usage: python scripts/attr_int8_ops.py [--arch repvgg_a0] [--batch 256]
       [--ops clamp_convert_fusion.4 convert_reduce_fusion]
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(args):
    import jax
    import jax.numpy as jnp

    import holocron_tpu.models as zoo
    from bench import _naturalistic_batch
    from holocron_tpu.quant import quantize_model

    batch = args.batch
    model = getattr(zoo, args.arch)(dtype=jnp.bfloat16)
    model.init((batch, 224, 224, 3))
    for i in range(2):
        model(_naturalistic_batch(jax.random.key(100 + i), batch, 224), train=True)
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()

    variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), model.variables)
    qm = quantize_model(model, calibration_batches=[_naturalistic_batch(jax.random.key(0), batch, 224)],
                        arch=args.arch)
    qm.variables = variables
    qfwd = qm.apply_fn()
    qparams = qm.qparams
    fwd = jax.jit(lambda inp: qfwd(variables, qparams, inp))
    x = _naturalistic_batch(jax.random.key(1), batch, 224)

    print("lowering + compiling (remote compile, may take ~1 min)...", flush=True)
    hlo = fwd.lower(x).compile().as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines")

    # Fusion computation bodies are named e.g. `%fused_computation.4 { ... }` and the
    # call site `%clamp_convert_fusion.4 = ... fusion(...), calls=%fused_computation.4`.
    lines = hlo.splitlines()
    for opname in args.ops:
        pat = re.compile(r"%?" + re.escape(opname) + r"\b")
        callsites = [ln for ln in lines if pat.search(ln) and "= " in ln]
        print(f"\n=== {opname}: {len(callsites)} call site(s) ===")
        for ln in callsites[:4]:
            print(ln.strip()[:400])
            m = re.search(r"calls=%?([\w.\-]+)", ln)
            if not m:
                continue
            body = m.group(1)
            # print the fusion body's conv/reduce lines with shapes + metadata
            in_body, depth = False, 0
            for bl in lines:
                if re.match(rf"\s*%?{re.escape(body)}\b.*\{{", bl):
                    in_body = True
                if in_body:
                    depth += bl.count("{") - bl.count("}")
                    if any(k in bl for k in ("convolution", "reduce(", "reduce-window", "dot(")):
                        print("   ", bl.strip()[:380])
                    if depth <= 0 and "{" in bl.replace("{", "", 0):
                        pass
                    if in_body and depth <= 0 and "}" in bl and "{" not in bl:
                        break

    # All convolutions overall, sorted by appearance, to cross-reference shapes.
    print("\n=== all convolution instructions (shape -> metadata) ===")
    for ln in lines:
        if "convolution(" in ln or ("fusion(" in ln and "conv" in ln):
            meta = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', ln)
            shape = re.search(r"=\s*(\S+)\s", ln)
            name = re.match(r"\s*%?([\w.\-]+)\s*=", ln)
            print(f"  {name.group(1) if name else '?':45s} {shape.group(1) if shape else '?':40s} "
                  f"{(meta.group(1) if meta else '')[:120]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="repvgg_a0")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--ops", nargs="+", default=["clamp_convert_fusion.4", "convert_reduce_fusion"])
    main(p.parse_args())
