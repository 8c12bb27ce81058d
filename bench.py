"""Headline benchmark: RepVGG-A0 (reparametrized) 224px bf16 inference throughput.

Mirrors the reference protocol (scripts/eval_latency.py:20-56 — 10 warmup + 100 timed
iters, reparametrize first) but measures images/sec/chip at a throughput-oriented batch
size, the BASELINE.json metric. ``vs_baseline`` is value / 8000 — the ratio to the
north-star target (>=8k images/sec/chip on v5e); 1.0 means target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from holocron_tpu.models import repvgg_a0

    batch = int(__import__("os").environ.get("BENCH_BATCH", "256"))
    model = repvgg_a0(dtype=jnp.bfloat16)
    model.init((batch, 224, 224, 3), dtype=jnp.bfloat16)
    model.reparametrize()

    # params in bf16 for deploy inference: halves weight traffic from HBM
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.variables)
    module = model.module
    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))

    x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3), jnp.bfloat16)

    # warmup (includes compile); device_get forces a real round-trip sync (the
    # experimental tunnel platform's block_until_ready is unreliable)
    for _ in range(10):
        out = fwd(variables, x)
    jax.device_get(out)

    iters = 100
    t_start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    jax.device_get(out)  # executions are serialized on-device; this waits for all
    total = time.perf_counter() - t_start

    imgs_per_sec = batch * iters / total
    mean_ms = total / iters * 1e3  # mean per-iteration latency (queued dispatch: only the mean is measurable)

    print(
        json.dumps({
            "metric": f"repvgg_a0 224px bf16 inference throughput (batch={batch}, mean={mean_ms:.2f}ms/iter)",
            "value": round(imgs_per_sec, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(imgs_per_sec / 8000.0, 4),
        })
    )


if __name__ == "__main__":
    main()
