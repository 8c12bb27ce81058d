#!/usr/bin/env python
"""Measures the exotic nn ops on the real TPU: is XLA's fusion good enough, or does
an op earn a hand-written Pallas kernel?

For each op: wall time under jit at a realistic shape, the XLA cost-analysis FLOPs
and bytes, and the implied utilization — ops far below both the compute and bandwidth
rooflines are Pallas candidates (the round-1 policy: measure before hand-writing).

Usage: python scripts/bench_ops.py [--iters 30]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# v5e single-chip peaks (public spec): bf16 MXU and HBM bandwidth
PEAK_TFLOPS = 197.0
PEAK_GBPS = 819.0


def bench(name, fn, *args, iters=30):
    """Times on the DEVICE timeline (wall time through the tunnel is dominated by
    per-dispatch host overhead; see holocron_tpu.utils.profiling)."""
    import jax

    from holocron_tpu.utils.profiling import device_op_summary

    summary = device_op_summary(fn, *args, iters=iters)
    ms = summary["ms_per_iter"]

    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    tflops = flops / (ms / 1e3) / 1e12
    gbps = bytes_ / (ms / 1e3) / 1e9
    bound = max(tflops / PEAK_TFLOPS, gbps / PEAK_GBPS)
    print(f"{name:<38} {ms:7.3f} ms  {tflops:7.2f} TF/s  {gbps:7.1f} GB/s  util {bound:5.1%}")
    return {"name": name, "ms": ms, "tflops": tflops, "gbps": gbps, "util": bound}


def main(args):
    import jax
    import jax.numpy as jnp

    import holocron_tpu.nn as hnn
    from holocron_tpu.kernels.add2d import add2d_matmul
    from holocron_tpu.nn import functional as F

    key = jax.random.key(0)
    results = []
    x = jax.random.normal(key, (32, 56, 56, 128), jnp.bfloat16)

    # module-based ops: init once, time the apply
    def module_op(mod, inp):
        import inspect

        takes_train = "train" in inspect.signature(type(mod).__call__).parameters
        kwargs = {"train": False} if takes_train else {}
        variables = jax.jit(lambda k, v: mod.init(k, v, **kwargs))(key, inp)
        return lambda v: mod.apply(variables, v, **kwargs), inp

    results.append(bench("hard_mish (elementwise)", F.hard_mish, x, iters=args.iters))
    results.append(bench("z_pool", lambda v: F.z_pool(v, axis=3), x, iters=args.iters))
    results.append(bench(
        "concat_downsample2d", lambda v: F.concat_downsample2d(v, 2), x, iters=args.iters
    ))

    fn, inp = module_op(hnn.BlurPool2d(kernel_size=3, stride=2), x)
    results.append(bench("BlurPool2d (128ch)", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.SAM(), x)
    results.append(bench("SAM attention", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.TripletAttention(), x)
    results.append(bench("TripletAttention", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.SlimConv2d(kernel_size=3, padding=1, r=32, L=2), x)
    results.append(bench("SlimConv2d 128->", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.PyConv2d(out_channels=128, kernel_size=3, num_levels=3, padding=1), x)
    results.append(bench("PyConv2d 3-level", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.Involution2d(kernel_size=7, padding=3, groups=8, reduction_ratio=2), x)
    results.append(bench("Involution2d k7 (module: Pallas path)", fn, inp, iters=args.iters))
    # the Pallas stencil in isolation vs the best pure-XLA formulation
    from holocron_tpu.kernels.involution import involution_stencil

    n_, h_, w_, c_, g_, k_ = 32, 56, 56, 128, 8, 7
    xp_ = jax.random.normal(key, (n_, h_ + k_ - 1, w_ + k_ - 1, c_), jnp.bfloat16)
    kf_ = jax.random.normal(key, (n_, h_, w_, k_ * k_ * g_), jnp.bfloat16)
    results.append(bench(
        "involution stencil (Pallas, raw)",
        lambda a, b: involution_stencil(a, b, k_, g_), xp_, kf_, iters=args.iters,
    ))

    def involution_xla_best(a, b):
        kern_full = jnp.broadcast_to(
            b.reshape(n_, h_, w_, g_, 1, k_ * k_), (n_, h_, w_, g_, c_ // g_, k_ * k_)
        ).reshape(n_, h_, w_, c_, k_ * k_)
        out = jnp.zeros((n_, h_, w_, c_), a.dtype)
        for idx in range(k_ * k_):
            dy, dx = divmod(idx, k_)
            out = out + kern_full[..., idx] * a[:, dy : dy + h_, dx : dx + w_]
        return out

    results.append(bench("involution best-XLA (shift-acc)", involution_xla_best, xp_, kf_, iters=args.iters))
    fn, inp = module_op(hnn.LambdaLayer(out_channels=128, dim_k=16, r=7, num_heads=4, dim_u=1), x)
    results.append(bench("LambdaLayer r7", fn, inp, iters=args.iters))
    fn, inp = module_op(hnn.NormConv2d(out_channels=64, kernel_size=3, padding=1), x.astype(jnp.float32))
    results.append(bench("NormConv2d (xcorr engine)", fn, inp, iters=args.iters))

    # Add2d: Pallas kernel vs the pure-XLA broadcast fallback
    patches = jax.random.normal(key, (12544, 576), jnp.float32)
    w = jax.random.normal(key, (576, 128), jnp.float32)
    results.append(bench("add2d Pallas kernel", lambda p, ww: add2d_matmul(p, ww), patches, w, iters=args.iters))
    results.append(bench(
        "add2d XLA broadcast",
        lambda p, ww: -jnp.sum(jnp.abs(p[:, :, None] - ww[None]), axis=1),
        patches, w, iters=args.iters,
    ))

    print("\nPallas candidates (util < 15%):")
    for r in sorted(results, key=lambda r: r["util"]):
        if r["util"] < 0.15:
            print(f"  {r['name']} ({r['util']:.1%})")
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", default=30, type=int)
    sys.exit(main(parser.parse_args()))
