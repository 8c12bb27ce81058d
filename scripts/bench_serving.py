#!/usr/bin/env python
"""End-to-end HTTP serving latency bench.

Spins the stdlib inference service in-process (api/app/main.py), fires warm
`POST /classification` requests with a synthetic JPEG, and reports
median/p90 end-to-end latency plus the server's per-stage attribution headers
(decode / queue-wait / device call — VERDICT r3 #4: localize the host cost the
reference's single X-Process-Time total hides). The TPU-native counterpart of
timing the reference's ONNXRuntime FastAPI route (SURVEY.md §3.5).

Two modes:
  - sequential (default): one in-flight request, the p50 floor measurement.
  - ``--concurrency 1 4 16 64``: closed-loop load test — k client threads each
    keep exactly one request in flight; reports throughput (req/s), p50/p99
    end-to-end latency, and the MEAN DEVICE BATCH SIZE from the X-Batch-Size
    header — the direct evidence that batch-while-busy dispatch coalesces
    (VERDICT r4 #1: the batcher's core function was previously asserted, never
    measured).

Usage:
    python scripts/bench_serving.py --arch repvgg_a0 --n 50 [--quantize]
    python scripts/bench_serving.py --concurrency 1 4 16 64 --n 200 [--quantize]
"""

import argparse
import http.client
import io
import json
import os
import socket
import statistics
import threading
import time


def _connect(port: int, timeout: float) -> http.client.HTTPConnection:
    """Keep-alive connection with TCP_NODELAY — http.client sends headers and body
    in separate writes, and Nagle + delayed-ACK turns that into a ~40 ms stall per
    request on a reused connection."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.connect()
    conn.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return conn


def main(args):
    if args.quantize:
        os.environ["HOLOCRON_QUANTIZE"] = "1"
    os.environ["HOLOCRON_ARCH"] = args.arch

    import numpy as np
    from PIL import Image

    from api.app.main import serve

    srv = serve("127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (args.size, args.size, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85)
    payload = buf.getvalue()

    def one(timeout=300, conn=None):
        own = conn is None
        if own:
            conn = _connect(port, timeout)
        t0 = time.perf_counter()
        conn.request("POST", "/classification", body=payload, headers={"Content-Type": "image/jpeg"})
        resp = conn.getresponse()
        body = resp.read()
        dt = (time.perf_counter() - t0) * 1e3
        stages = {
            "server": float(resp.getheader("X-Process-Time") or 0) * 1e3,
            "decode": float(resp.getheader("X-Decode-Ms") or 0),
            "queue": float(resp.getheader("X-Queue-Ms") or 0),
            "infer": float(resp.getheader("X-Infer-Ms") or 0),
            "batch": float(resp.getheader("X-Batch-Size") or 1),
        }
        if own:
            conn.close()
        assert resp.status == 200, body
        return dt, stages

    def closed_loop(k: int, total: int):
        """k client threads, each with exactly one request in flight (closed loop):
        the standard serving-load protocol — offered load adapts to service rate, so
        the system is saturated at whatever concurrency it can actually sustain."""
        samples: list = []
        lock = threading.Lock()
        per = max(1, total // k)  # k > total must still send one request per client
        barrier = threading.Barrier(k + 1)

        def client():
            conn = _connect(port, 600)
            barrier.wait()
            local = []
            for _ in range(per):
                try:
                    local.append(one(conn=conn))
                except (http.client.HTTPException, ConnectionError, OSError):
                    # server closed the keep-alive socket (idle timeout / restart):
                    # reconnect and retry once — the retried request is timed whole
                    conn.close()
                    conn = _connect(port, 600)
                    local.append(one(conn=conn))
            conn.close()
            with lock:
                samples.extend(local)

        threads = [threading.Thread(target=client) for _ in range(k)]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        e2e = sorted(dt for dt, _ in samples)
        n = len(e2e)
        return {
            "concurrency": k,
            "n": n,
            "throughput_rps": round(n / wall, 1),
            "e2e_ms_p50": round(e2e[n // 2], 2),
            "e2e_ms_p90": round(e2e[int(0.9 * n)], 2),
            "e2e_ms_p99": round(e2e[min(int(0.99 * n), n - 1)], 2),
            "mean_batch_size": round(statistics.mean(s["batch"] for _, s in samples), 2),
            "queue_ms_p50": round(statistics.median(s["queue"] for _, s in samples), 2),
            "infer_ms_p50": round(statistics.median(s["infer"] for _, s in samples), 2),
        }

    # first request compiles the const-weights deploy forward — minutes through
    # the remote-compile tunnel (docs/PERF.md), seconds on a normal TPU host
    one(timeout=1200)
    for _ in range(args.warmup - 1):
        one()

    if args.concurrency:
        # warm every power-of-two batch bucket up to max concurrency so the load
        # phase never hits a cold compile mid-measurement: the server runs
        # in-process, so drive the batcher's infer_fn directly — deterministic,
        # unlike racing real requests into particular coalesced sizes
        from api.app import config as _config
        from api.app import vision as _vision

        batcher = _vision.get_batcher()
        # the batcher pads a coalesced batch UP to the next power of two, so the
        # covering bucket for k clients is the first power of two >= min(k, MAX_BATCH)
        # — stopping at the last bucket <= k would leave e.g. k=48 hitting a cold
        # bucket-64 compile mid-measurement
        top = min(max(args.concurrency), _config.MAX_BATCH)
        bucket = 1
        while True:
            batcher.infer_fn(np.zeros((bucket, 224, 224, 3), np.uint8))
            if bucket >= top:
                break
            bucket *= 2
        for k in args.concurrency:
            row = closed_loop(k, args.n)
            row.update({"arch": args.arch, "quantized": bool(args.quantize)})
            print(json.dumps(row))
        srv.shutdown()
        return

    samples = [one() for _ in range(args.n)]
    e2e = [dt for dt, _ in samples]
    result = {
        "arch": args.arch,
        "quantized": bool(args.quantize),
        "n": args.n,
        "e2e_ms_p50": round(statistics.median(e2e), 2),
        "e2e_ms_p90": round(sorted(e2e)[int(0.9 * len(e2e))], 2),
    }
    for stage in ("server", "decode", "queue", "infer"):
        result[f"{stage}_ms_p50"] = round(statistics.median(s[stage] for _, s in samples), 2)
    # the unattributed remainder: HTTP parse + response serialize + thread handoff
    result["other_host_ms_p50"] = round(
        max(result["server_ms_p50"] - result["decode_ms_p50"] - result["queue_ms_p50"] - result["infer_ms_p50"], 0.0),
        2,
    )
    print(json.dumps(result))
    srv.shutdown()


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="repvgg_a0")
    p.add_argument("--size", type=int, default=224, help="source image side before server resize")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--quantize", action="store_true")
    p.add_argument(
        "--concurrency",
        type=int,
        nargs="*",
        default=[],
        help="closed-loop mode: one row per k (k threads, 1 in-flight request each)",
    )
    main(p.parse_args())
