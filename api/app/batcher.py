"""Request micro-batching for the inference service.

The jitted model is pure and thread-safe, but calling it per request wastes the
chip: concurrent requests coalesce here into one padded model call. Batch sizes are
bucketed to powers of two so XLA compiles at most ``log2(max_batch) + 1`` programs.

The reference serves ONNXRuntime per-request (api/app/vision.py:56-62); batching is
the TPU-idiomatic equivalent for a device whose throughput comes from batch size.

Dispatch policy (round 4, from the serving-latency attribution in docs/PERF.md):
**batch-while-busy**. A request arriving while the worker is idle dispatches
immediately — waiting ``max_wait_ms`` for followers only taxes the low-QPS case
(sequential requests paid the full 5 ms wait for followers that never came).
Requests arriving while the device call is in flight coalesce naturally in the
queue, so high-QPS batching behavior is unchanged; the extra grace window is only
used when the queue already holds a follower.
"""

import math
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, List, Tuple

import numpy as np

__all__ = ["MicroBatcher"]


class MicroBatcher:
    """Coalesces single-sample inference requests into batched model calls.

    Args:
        infer_fn: ``(N, H, W, C) float32 -> (N, num_classes) float32`` batched model
        max_batch: largest coalesced batch (power of two recommended)
        max_wait_ms: grace window for followers once at least one is already queued
    """

    def __init__(self, infer_fn: Callable, max_batch: int = 8, max_wait_ms: float = 5.0) -> None:
        self.infer_fn = infer_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: "queue.Queue[Tuple[np.ndarray, float, Future]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, x: np.ndarray) -> Dict[str, np.ndarray]:
        """Blocks until the (1, ...) sample's result is available.

        Returns ``{"probs": (num_classes,), "queue_ms": float, "infer_ms": float,
        "batch_size": int}`` — the per-stage attribution the service surfaces as
        response headers.
        """
        fut: Future = Future()
        self._queue.put((np.asarray(x), time.perf_counter(), fut))
        return fut.result()

    def _drain(self) -> List[Tuple[np.ndarray, float, Future]]:
        items = [self._queue.get()]  # block for the first request
        # batch-while-busy: only extend the window when a follower is ALREADY here
        # (arrived during the previous device call); an idle queue dispatches now
        while len(items) < self.max_batch:
            try:
                items.append(self._queue.get_nowait())
            except queue.Empty:
                break
        if 1 < len(items) < self.max_batch:
            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.max_batch:
                try:
                    items.append(self._queue.get(timeout=max(deadline - time.perf_counter(), 0)))
                except queue.Empty:
                    break
        return items

    def _run(self) -> None:
        while True:
            items = self._drain()
            t_start = time.perf_counter()
            xs = [x[0] if x.ndim == 4 else x for x, _, _ in items]
            n = len(xs)
            # bucket to the next power of two: bounded compile count, stable shapes
            bucket = 1 << math.ceil(math.log2(max(n, 1)))
            batch = np.stack(xs + [xs[-1]] * (bucket - n))
            try:
                out = np.asarray(self.infer_fn(batch))
                t_done = time.perf_counter()
                infer_ms = (t_done - t_start) * 1e3
                for i, (_, t_enq, fut) in enumerate(items):
                    fut.set_result({
                        "probs": out[i],
                        "queue_ms": (t_start - t_enq) * 1e3,
                        "infer_ms": infer_ms,
                        "batch_size": n,
                    })
            except Exception as e:  # propagate to every waiter
                for _, _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
