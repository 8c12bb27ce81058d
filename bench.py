"""Headline benchmark: RepVGG-A0 (reparametrized) 224px inference throughput.

Mirrors the reference protocol (scripts/eval_latency.py:20-56 — 10 warmup + 100 timed
iters, reparametrize first) but measures images/sec/chip at a throughput-oriented batch
size, the BASELINE.json metric. Measures BOTH the bf16 deploy form and the
selective-int8 form (holocron_tpu/quant.py) and reports the fastest form THAT PASSES
THE ACCURACY GATE: int8 may only take the headline if its top-1 agreement with the
bf16 form on held-out naturalistic inputs clears ``HOLOCRON_INT8_AGREEMENT``
(default 0.99) — "best deploy form" means fastest form that passes accuracy, not
fastest form outright (VERDICT r2). BN statistics are adapted to the input
distribution before reparametrization so the folded weights are in a realistic
regime rather than raw init.

``vs_baseline`` is value / 8000 — the ratio to the north-star target (>=8k
images/sec/chip on v5e); 1.0 means target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def _backend_responsive(timeout: int = 300) -> bool:
    """Probes the default jax backend in a SUBPROCESS with a hard timeout.

    The axon tunnel can die in a way where backend init / a trivial jit never
    returns (observed: >2 h outage mid round 3) — an in-process call can't be
    cancelled, so the probe must be a killable child. A healthy tunnel completes
    this in ~15-30 s including the compile round-trip."""
    import subprocess
    import sys

    code = "import jax, jax.numpy as jnp; jax.device_get(jax.jit(lambda a: a * 2)(jnp.ones((4,))))"
    try:
        return subprocess.run([sys.executable, "-c", code], timeout=timeout, capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


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


def _naturalistic_batch(key, batch: int, size: int, dtype=jnp.float32) -> jax.Array:
    """Spatially-correlated inputs (bilinear-upsampled noise + per-image color bias),
    standardized — much closer to normalized natural-image statistics than white
    noise, which is what the int8 agreement gate should judge on."""
    k1, k2 = jax.random.split(key)
    coarse = jax.random.normal(k1, (batch, size // 8, size // 8, 3))
    img = jax.image.resize(coarse, (batch, size, size, 3), method="bilinear")
    img = img + 0.5 * jax.random.normal(k2, (batch, 1, 1, 3))  # per-image color cast
    img = (img - img.mean(axis=(1, 2, 3), keepdims=True)) / (
        img.std(axis=(1, 2, 3), keepdims=True) + 1e-6
    )
    return img.astype(dtype)


def main() -> None:
    from holocron_tpu.models import repvgg_a0
    from holocron_tpu.quant import measure_agreement, quantize_model

    # preflight: never hang the driver on a dead tunnel — report instead
    if os.environ.get("HOLOCRON_BENCH_NO_PREFLIGHT") != "1":
        for attempt in range(3):
            if _backend_responsive():
                break
            if attempt < 2:  # separate attempts only; don't delay the give-up report
                time.sleep(60)
        else:
            # include the last on-chip measurement so an infra outage at bench time
            # doesn't erase the recorded performance context
            last = None
            try:
                import pathlib

                rows = [
                    json.loads(line)
                    for line in pathlib.Path("docs/bench/headline.jsonl").read_text().splitlines()
                    if line.strip()
                ]
                last = rows[-1] if rows else None
            except Exception:
                pass
            suffix = (
                f" — last measured {last['value']:.0f} {last.get('unit', '')} ({last.get('ts', '?')})"
                if last
                else ""
            )
            print(
                json.dumps({
                    "metric": "repvgg_a0 224px inference throughput — NOT MEASURED: "
                    "TPU backend unresponsive (tunnel outage; trivial jit never returned "
                    "in 3x300s subprocess probes)" + suffix,
                    "value": 0,
                    "unit": "images/sec/chip",
                    "vs_baseline": 0.0,
                })
            )
            return

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    agreement_floor = float(os.environ.get("HOLOCRON_INT8_AGREEMENT", "0.99"))
    model = repvgg_a0(dtype=jnp.bfloat16)  # bf16 compute; params/BN stats stay f32
    model.init((batch, 224, 224, 3))

    # adapt BN running stats to the benchmark input distribution before folding:
    # reparametrize() bakes them into the deploy conv, so the quantization gate
    # judges realistically-scaled weights, not raw-init statistics
    for i in range(4):
        model(_naturalistic_batch(jax.random.key(100 + i), batch, 224), train=True)
    model.reparametrize()

    # params in bf16 for deploy inference: halves weight traffic from HBM
    variables = jax.tree.map(lambda t: t.astype(jnp.bfloat16), model.variables)
    module = model.module
    x = _naturalistic_batch(jax.random.key(0), batch, 224, jnp.bfloat16)

    # weights closed over the jit as constants (Model.deploy_forward rationale):
    # XLA pre-tiles/folds them into the executable — measured +7% over args
    fwd = jax.jit(lambda a: module.apply(variables, a, train=False))
    bf16_ips = _throughput(fwd, (x,), batch)

    # Selective-int8 deploy form; never allowed to take down the headline number.
    int8_ips = 0.0
    agreement = None
    try:
        # arch enables the measured per-arch policy: for repvgg_a0 that lowers the
        # quantization floor to the 48-ch stage-1 convs (trace-measured +18% device
        # time, agreement 1.0 — docs/PERF.md round-4 int8 trace)
        qm = quantize_model(model, calibration_batches=[x.astype(jnp.float32)], arch="repvgg_a0")
        qm.variables = variables  # non-quantized remainder stays bf16
        qfwd, qparams = qm.apply_fn(), qm.qparams
        # qparams closed over as jit constants: lets XLA bake the int8 weights /
        # scales into the executable (measured ~20% faster than passing them as args)
        jfwd = jax.jit(lambda a: qfwd(qm.variables, qparams, a))
        # accuracy gate on held-out naturalistic batches
        gate_batches = [
            _naturalistic_batch(jax.random.key(200 + i), batch, 224, jnp.bfloat16)
            for i in range(2)
        ]
        agreement = measure_agreement(fwd, jfwd, gate_batches)
        if agreement["top1_agreement"] >= agreement_floor:
            int8_ips = _throughput(jfwd, (x,), batch)
    except Exception as exc:  # pragma: no cover - defensive for driver runs
        import sys

        print(f"int8 path skipped: {exc!r}", file=sys.stderr, flush=True)

    best, form = max((bf16_ips, "bf16"), (int8_ips, "selective-int8"))
    gate_str = (
        f", int8 top-1 agreement {agreement['top1_agreement']:.3f} "
        f"(gate >={agreement_floor})" if agreement is not None else ""
    )
    print(
        json.dumps({
            "metric": (
                f"repvgg_a0 224px inference throughput, best accuracy-gated deploy form = {form} "
                f"(batch={batch}; bf16 {bf16_ips:,.0f} img/s, int8 {int8_ips:,.0f} img/s{gate_str})"
            ),
            "value": round(best, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(best / 8000.0, 4),
        })
    )
    # record the measurement so a later outage-time run can still report context
    try:
        import datetime
        import pathlib

        row = {
            "ts": datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ"),
            "value": round(best, 1),
            "unit": "images/sec/chip",
            "form": form,
            "batch": batch,
            "source": "bench.py auto-append (single-chip run)",
        }
        p = pathlib.Path("docs/bench/headline.jsonl")
        p.parent.mkdir(parents=True, exist_ok=True)
        with p.open("a") as f:
            f.write(json.dumps(row) + "\n")
    except Exception:  # pragma: no cover - recording must never fail the bench
        pass


if __name__ == "__main__":
    main()
