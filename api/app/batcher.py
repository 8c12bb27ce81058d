"""Request micro-batching for the inference service.

The jitted model is pure and thread-safe, but calling it per request wastes the
chip: concurrent requests coalesce here into one padded model call. Batch sizes are
bucketed to powers of two so XLA compiles at most ``log2(max_batch) + 1`` programs.

The reference serves ONNXRuntime per-request (api/app/vision.py:56-62); batching is
the TPU-idiomatic equivalent for a device whose throughput comes from batch size.
"""

import math
import queue
import threading
from concurrent.futures import Future
from typing import Callable, List, Tuple

import numpy as np

__all__ = ["MicroBatcher"]


class MicroBatcher:
    """Coalesces single-sample inference requests into batched model calls.

    Args:
        infer_fn: ``(N, H, W, C) float32 -> (N, num_classes) float32`` batched model
        max_batch: largest coalesced batch (power of two recommended)
        max_wait_ms: how long the worker waits for more requests after the first
    """

    def __init__(self, infer_fn: Callable, max_batch: int = 8, max_wait_ms: float = 5.0) -> None:
        self.infer_fn = infer_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: "queue.Queue[Tuple[np.ndarray, Future]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, x: np.ndarray) -> np.ndarray:
        """Blocks until the (1, ...) sample's result is available; returns (num_classes,)."""
        fut: Future = Future()
        self._queue.put((np.asarray(x), fut))
        return fut.result()

    def _drain(self) -> List[Tuple[np.ndarray, Future]]:
        items = [self._queue.get()]  # block for the first request
        deadline = self.max_wait
        while len(items) < self.max_batch:
            try:
                items.append(self._queue.get(timeout=deadline))
            except queue.Empty:
                break
        return items

    def _run(self) -> None:
        while True:
            items = self._drain()
            xs = [x[0] if x.ndim == 4 else x for x, _ in items]
            n = len(xs)
            # bucket to the next power of two: bounded compile count, stable shapes
            bucket = 1 << math.ceil(math.log2(max(n, 1)))
            batch = np.stack(xs + [xs[-1]] * (bucket - n))
            try:
                out = np.asarray(self.infer_fn(batch))
                for i, (_, fut) in enumerate(items):
                    fut.set_result(out[i])
            except Exception as e:  # propagate to every waiter
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
