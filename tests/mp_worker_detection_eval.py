"""Multi-process worker certifying DetectionTrainer.evaluate's cross-process
counter reduction.

Detection eval runs on HOST numpy (dynamic-shaped IoU assignment), so under
multi-host each process sees only its own val-loader shard and the integer
counters must be summed across processes (trainer/detection.py). This worker uses
a deterministic stub detector (no mesh work needed — the reduction is the thing
under test) over a sharded loader; every process must print the SAME metrics, and
test_multiprocess.py checks they equal the single-process values.

Usage: python mp_worker_detection_eval.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

import numpy as np


class DetValDataset:
    """Index-keyed boxes: even samples are detected correctly by the stub model,
    odd ones get an offset (missed) box — so the global error rates depend on
    exactly WHICH samples were counted, catching double- or under-counting."""

    def __init__(self, n: int = 12) -> None:
        self.n = n

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        x = np.full((16, 16, 3), i / self.n, np.float32)
        box = np.array([[1.0 + i, 1.0 + i, 6.0 + i, 6.0 + i]], np.float32)
        return x, {"boxes": box, "labels": np.array([i % 3], np.int64)}


def det_collate(batch):
    xs, ts = zip(*batch)
    return np.stack(xs), list(ts)


class StubDetector:
    """model(x) -> per-image detection dicts, keyed off the deterministic image
    fill value so each process reproduces the same detections for its shard."""

    def __call__(self, x):
        out = []
        for img in np.asarray(x):
            i = int(round(float(img[0, 0, 0]) * 12))
            if i % 2 == 0:  # exact hit
                boxes = np.array([[1.0 + i, 1.0 + i, 6.0 + i, 6.0 + i]], np.float32)
            else:  # badly localized -> IoU < 0.5 -> loc miss
                boxes = np.array([[10.0 + i, 10.0 + i, 14.0 + i, 14.0 + i]], np.float32)
            out.append({"boxes": boxes, "labels": np.array([i % 3]), "scores": np.ones(1)})
        return out


def main() -> None:
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nproc}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )

    from holocron_tpu.trainer.detection import DetectionTrainer
    from holocron_tpu.utils.data import DataLoader

    loader = DataLoader(
        DetValDataset(12), batch_size=4, num_workers=1, collate_fn=det_collate, num_shards="auto"
    )
    trainer = DetectionTrainer.__new__(DetectionTrainer)  # eval needs model+loader only
    trainer.model = StubDetector()
    trainer.val_loader = loader
    metrics = trainer.evaluate()
    if pid == 0:
        with open(os.path.join(outdir, "det_metrics.json"), "w") as f:
            json.dump(metrics, f)
    print(f"[{pid}] WORKER_DONE {metrics}", flush=True)


if __name__ == "__main__":
    main()
