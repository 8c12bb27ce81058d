"""Headline benchmark: RepVGG-A0 (reparametrized) 224px inference throughput.

Mirrors the reference protocol (scripts/eval_latency.py:20-56 — 10 warmup + 100 timed
iters, reparametrize first) but measures images/sec/chip at a throughput-oriented batch
size, the BASELINE.json metric. Measures BOTH the bf16 deploy form and the
selective-int8 form (holocron_tpu/quant.py) and reports the faster — the best
supported serving configuration of the same model — with both numbers in the label.
``vs_baseline`` is value / 8000 — the ratio to the north-star target (>=8k
images/sec/chip on v5e); 1.0 means target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def _throughput(fwd, args, batch: int, iters: int = 100) -> float:
    # warmup (includes compile); device_get forces a real round-trip sync (the
    # experimental tunnel platform's block_until_ready is unreliable)
    for _ in range(10):
        out = fwd(*args)
    jax.device_get(out)
    t_start = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    jax.device_get(out)  # executions are serialized on-device; this waits for all
    return batch * iters / (time.perf_counter() - t_start)


def main() -> None:
    from holocron_tpu.models import repvgg_a0
    from holocron_tpu.quant import quantize_model

    batch = int(__import__("os").environ.get("BENCH_BATCH", "256"))
    model = repvgg_a0(dtype=jnp.bfloat16)
    model.init((batch, 224, 224, 3), dtype=jnp.bfloat16)
    model.reparametrize()

    # params in bf16 for deploy inference: halves weight traffic from HBM
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.variables)
    module = model.module
    x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3), jnp.bfloat16)

    # weights closed over the jit as constants (Model.deploy_forward rationale):
    # XLA pre-tiles/folds them into the executable — measured +7% over args
    fwd = jax.jit(lambda a: module.apply(variables, a, train=False))
    bf16_ips = _throughput(fwd, (x,), batch)

    # Selective-int8 deploy form; never allowed to take down the headline number.
    int8_ips = 0.0
    try:
        qm = quantize_model(model, calibration_batches=[x])
        qm.variables = variables  # non-quantized remainder stays bf16
        qfwd, qparams = qm.apply_fn(), qm.qparams
        # qparams closed over as jit constants: lets XLA bake the int8 weights /
        # scales into the executable (measured ~20% faster than passing them as args)
        jfwd = jax.jit(lambda v, a: qfwd(v, qparams, a))
        int8_ips = _throughput(jfwd, (qm.variables, x), batch)
    except Exception as exc:  # pragma: no cover - defensive for driver runs
        import sys

        print(f"int8 path skipped: {exc!r}", file=sys.stderr, flush=True)

    best, form = max((bf16_ips, "bf16"), (int8_ips, "selective-int8"))
    print(
        json.dumps({
            "metric": (
                f"repvgg_a0 224px inference throughput, best deploy form = {form} "
                f"(batch={batch}; bf16 {bf16_ips:,.0f} img/s, int8 {int8_ips:,.0f} img/s)"
            ),
            "value": round(best, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(best / 8000.0, 4),
        })
    )


if __name__ == "__main__":
    main()
