"""Smoke tests for the bench/export tooling scripts (reference analog:
scripts/eval_latency.py — SURVEY.md §2h). Runs each CLI in-process with tiny shapes."""

import json
import runpy
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(script: str, argv) -> None:
    old = sys.argv
    sys.argv = [script, *argv]
    try:
        runpy.run_path(str(ROOT / "scripts" / script), run_name="__main__")
    finally:
        sys.argv = old


def test_eval_latency_smoke(capsys):
    _run("eval_latency.py", ["repvgg_a0", "--batch", "1", "--size", "32", "--it", "2", "--warmup", "1"])
    out = capsys.readouterr().out
    assert "images/sec" in out and "repvgg_a0" in out


def test_eval_latency_quantize_smoke(capsys):
    _run(
        "eval_latency.py",
        ["repvgg_a0", "--batch", "1", "--size", "32", "--it", "2", "--warmup", "1", "--quantize"],
    )
    assert "images/sec" in capsys.readouterr().out


def test_export_quantized_stablehlo(tmp_path):
    """--quantize bakes int8 kernels into the StableHLO artifact; the script's own
    round-trip check asserts deserialized outputs match the live quantized forward."""
    out = tmp_path / "m.stablehlo"
    _run("export_model.py", ["repvgg_a0", "--size", "32", "--quantize", "--output", str(out)])
    assert out.stat().st_size > 1_000_000  # int8 weights present (f32 would be ~4x)


def test_bench_serving_smoke(capsys):
    _run("bench_serving.py", ["--arch", "repvgg_a0", "--n", "2", "--warmup", "1", "--size", "64"])
    out = capsys.readouterr().out
    row = json.loads(out.strip().splitlines()[-1])
    assert row["arch"] == "repvgg_a0" and row["e2e_ms_p50"] > 0


def test_bench_zoo_and_table(tmp_path, capsys):
    out_file = tmp_path / "zoo.jsonl"
    _run(
        "bench_zoo.py",
        ["--archs", "repvgg_a0", "--batch", "1", "--size", "32", "--it", "2", "--warmup", "1",
         "--out", str(out_file)],
    )
    rows = [json.loads(line) for line in out_file.read_text().splitlines()]
    assert rows and rows[0]["arch"] == "repvgg_a0" and rows[0]["img_per_sec"] > 0
    assert rows[0]["params_m"] > 0
    capsys.readouterr()

    _run("gen_bench_table.py", [str(out_file)])
    table = capsys.readouterr().out
    assert "| repvgg_a0 |" in table and "3.14" in table  # reference GPU column present


def test_bench_b1_and_table(tmp_path, capsys):
    """Batch-1 head-to-head sweep (scripts/bench_b1.py): plumbing smoke on CPU
    (device_ms is 0 there — CPU traces carry no 'XLA Ops' timeline) + renderer."""
    out_file = tmp_path / "b1.jsonl"
    _run("bench_b1.py", ["--archs", "repvgg_a0", "--size", "32", "--it", "2", "--out", str(out_file)])
    rows = [json.loads(line) for line in out_file.read_text().splitlines()]
    assert rows[0]["arch"] == "repvgg_a0" and rows[0]["batch"] == 1
    assert rows[0]["ref_gpu_ms"] == 3.14 and rows[0]["queued_ms"] > 0
    capsys.readouterr()

    _run("gen_bench_table.py", [str(out_file), "--b1"])
    table = capsys.readouterr().out
    assert "| repvgg_a0 |" in table and "3.14" in table


def test_parity_harness_skips_cleanly_without_reference(tmp_path):
    """scripts/parity/run.py must exit 0 with a SKIP message when the reference
    checkout is absent (graceful degradation contract, VERDICT r2 item 3)."""
    import os
    import subprocess

    env = {**os.environ, "HOLOCRON_REF": str(tmp_path / "nonexistent")}
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "parity" / "run.py"), "api"],
        capture_output=True,
        text=True,
        env=env,
        cwd=ROOT,
    )
    assert res.returncode == 0, res.stderr
    assert "SKIP" in res.stdout


def test_parity_harness_api_suite():
    """When the reference checkout + torch are available, the public-symbol diff
    must pass (zero missing symbols — docs/PARITY.md)."""
    import os
    import subprocess

    import pytest

    ref = os.environ.get("HOLOCRON_REF", "/root/reference")
    if not (Path(ref) / "holocron").is_dir():
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "parity" / "run.py"), "api"],
        capture_output=True,
        text=True,
        cwd=ROOT,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "all parity checks passed" in res.stdout


def test_gen_quant_policy_overrides_and_veto(tmp_path, capsys):
    """Policy regeneration must honor the three override tables: a speed win sets
    `recommended`, the floor/stride overrides attach their keys, and a quality-gate
    veto pins `recommended: false` regardless of measured speed (VERDICT r4 #2 —
    without the veto a failed arch would be silently re-recommended on the next
    regeneration)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_quant_policy", ROOT / "scripts" / "gen_quant_policy.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bench = tmp_path / "bench"
    bench.mkdir()
    bf16_rows = [
        {"arch": "fast", "img_per_sec": 100.0},
        {"arch": "slow", "img_per_sec": 100.0},
        {"arch": "vetoed", "img_per_sec": 100.0},
    ]
    int8_rows = [
        {"arch": "fast", "img_per_sec": 200.0},
        {"arch": "slow", "img_per_sec": 80.0},
        {"arch": "vetoed", "img_per_sec": 200.0},
    ]
    (bench / mod.BF16[0]).write_text("\n".join(json.dumps(r) for r in bf16_rows))
    (bench / mod.INT8[0]).write_text("\n".join(json.dumps(r) for r in int8_rows))

    mod.BENCH = bench
    mod.OUT = tmp_path / "quant_policy.json"
    mod.MIN_IN_CHANNELS_OVERRIDES = {"fast": 48}
    mod.STRIDE_POLICY_OVERRIDES = {"fast": {"quantize_strided": False}}
    mod.QUALITY_GATE_VETOES = {"vetoed": "synthetic agreement failure (test)"}
    mod.main()
    capsys.readouterr()

    policy = json.loads(mod.OUT.read_text())
    assert policy["fast"] == {
        "int8_speedup": 2.0,
        "recommended": True,
        "min_in_channels": 48,
        "quantize_strided": False,
    }
    assert policy["slow"]["recommended"] is False and "quality_veto" not in policy["slow"]
    assert policy["vetoed"]["recommended"] is False
    assert policy["vetoed"]["quality_veto"] == "synthetic agreement failure (test)"
