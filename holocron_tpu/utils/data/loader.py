"""Host-side input pipeline: dataset abstractions + a threaded, prefetching loader.

The TPU-native replacement for the reference's torch DataLoader workers
(references/classification/train.py:137-146): a thread pool decodes/augments on host
while the device computes, yielding contiguous NHWC numpy batches ready for
``jax.device_put`` (the trainer shards them over the data mesh axis).
"""

import concurrent.futures as cf
import itertools
import random
from collections import deque
from pathlib import Path
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DataLoader", "ImageFolder", "SyntheticDataset", "default_collate", "normalize_image", "prefetch"]


def prefetch(iterable, fn: Optional[Callable] = None, size: int = 2):
    """Yields items of ``iterable`` with a ``size``-item lookahead, applying ``fn``
    eagerly ahead of consumption.

    With ``fn`` = device placement (``jax.device_put`` is asynchronous), upcoming
    batches' H2D transfers overlap the consumer's compute on the current batch — the
    sharding-aware analog of ``flax.jax_utils.prefetch_to_device``.
    """
    it = iter(iterable)
    queue: deque = deque()

    def enqueue(n: int) -> None:
        for item in itertools.islice(it, n):
            queue.append(fn(item) if fn is not None else item)

    enqueue(max(size, 1))
    while queue:
        out = queue.popleft()
        enqueue(1)
        yield out

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def normalize_image(img, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    """uint8 HWC image -> float32 normalized NHWC-ready array."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


class ImageFolder:
    """Directory-per-class image dataset (the torchvision ImageFolder contract)."""

    def __init__(self, root: str, transform: Optional[Callable] = None, target_transform: Optional[Callable] = None):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"no such directory: {root}")
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[Path, int]] = [
            (p, self.class_to_idx[c])
            for c in self.classes
            for p in sorted((self.root / c).rglob("*"))
            if p.suffix.lower() in IMG_EXTENSIONS
        ]
        self.transform = transform
        self.target_transform = target_transform

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        from PIL import Image

        path, target = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class SyntheticDataset:
    """Random dataset for smoke tests and --check-setup runs without real data."""

    def __init__(self, num_samples: int = 128, shape=(224, 224, 3), num_classes: int = 10, task: str = "classification", seed: int = 0):
        self.num_samples = num_samples
        self.shape = shape
        self.num_classes = num_classes
        self.task = task
        self._rng = np.random.default_rng(seed)
        self._cache = {}

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx: int):
        if idx not in self._cache:
            rng = np.random.default_rng(idx)
            img = rng.normal(size=self.shape).astype(np.float32)
            if self.task == "classification":
                tgt = int(rng.integers(0, self.num_classes))
            elif self.task == "segmentation":
                tgt = rng.integers(0, self.num_classes, size=self.shape[:2]).astype(np.int32)
            else:  # detection
                n = int(rng.integers(1, 4))
                boxes = np.sort(rng.random((n, 2, 2)), axis=1).transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
                boxes = boxes[:, [0, 2, 1, 3]]
                tgt = {"boxes": boxes, "labels": rng.integers(0, self.num_classes, size=(n,))}
            self._cache[idx] = (img, tgt)
        return self._cache[idx]


def default_collate(batch: List[Tuple[Any, Any]]):
    xs, ys = zip(*batch)
    x = np.stack([np.asarray(v) for v in xs], axis=0)
    if isinstance(ys[0], dict):
        return x, list(ys)
    return x, np.stack([np.asarray(v) for v in ys], axis=0)


class DataLoader:
    """Batched iteration with shuffling, threaded sample loading and (multi-host)
    process sharding.

    For multi-host training (``parallel/multihost.py``), pass
    ``num_shards=jax.process_count(), shard_index=jax.process_index()`` (or just
    ``num_shards="auto"``): every host draws the SAME epoch permutation (same seed,
    same rng state trajectory) and takes a disjoint strided slice of it, with the
    permutation wrap-padded to a multiple of ``num_shards`` first — torch
    ``DistributedSampler`` semantics. Padding matters for correctness, not just
    balance: in multi-host SPMD every train step is one collective program entered
    by ALL processes, so unequal shards would leave one host blocking forever on a
    step its peers never enter, and unequal ``len(loader)`` would bake different
    ``total_steps`` into each host's LR schedule. With padding, each epoch covers
    every sample at least once (at most ``num_shards - 1`` repeats globally) and
    every host runs the exact same step count — the host-side half of the hybrid
    ICI x DCN data-parallel recipe.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = False,
        collate_fn: Callable = default_collate,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        num_shards: Any = None,
        shard_index: Optional[int] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._rng = random.Random(seed)
        if num_shards == "auto":
            import jax

            num_shards, shard_index = jax.process_count(), jax.process_index()
        self.num_shards = int(num_shards) if num_shards else 1
        self.shard_index = int(shard_index) if shard_index is not None else 0
        if not 0 <= self.shard_index < self.num_shards:
            raise ValueError(f"shard_index {self.shard_index} not in [0, {self.num_shards})")
        # epoch counter for stateful collates (torch DistributedSampler.set_epoch
        # analog): bumped at the top of every __iter__ and pushed to the collate's
        # optional ``set_epoch`` hook, so per-batch augmentation seeds can vary
        # across epochs while staying thread-order independent within one
        self.epoch = -1

    def _shard_size(self) -> int:
        # wrap-padded strided split: every shard has exactly ceil(n / num_shards)
        # samples, so len(loader) / step counts / schedule lengths agree across hosts
        return -(-len(self.dataset) // self.num_shards)

    def __len__(self) -> int:
        n = self._shard_size()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        self.epoch += 1
        set_epoch = getattr(self.collate_fn, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(self.epoch)
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            # identical permutation on every host (same seed/state), THEN the
            # strided slice — shards stay disjoint while staying shuffled
            self._rng.shuffle(indices)
        if self.num_shards > 1:
            # wrap-pad to a multiple of num_shards (repeat the permutation head)
            # so every host's shard — and therefore its per-epoch step count — is
            # identical; then take the disjoint strided slice
            total = self._shard_size() * self.num_shards
            if indices:
                indices = (indices * -(-total // len(indices)))[:total]
            indices = indices[self.shard_index :: self.num_shards]
        batches = [indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.num_workers > 1:
            # Per-sample thread parallelism within a batch + a 2-batch lookahead
            # window, with the collate ALSO run off the consumer thread (a dedicated
            # small executor, so batched collates — e.g. the native fused JPEG
            # decode — pipeline across batches instead of blocking iteration).
            lookahead = 2
            with cf.ThreadPoolExecutor(self.num_workers) as pool, cf.ThreadPoolExecutor(lookahead) as collate_pool:

                def submit(batch_ids):
                    sample_futs = [pool.submit(self.dataset.__getitem__, i) for i in batch_ids]
                    return collate_pool.submit(
                        lambda futs: self.collate_fn([f.result() for f in futs]), sample_futs
                    )

                window: deque = deque(submit(b) for b in batches[:lookahead])
                nxt = lookahead
                while window:
                    batch_fut = window.popleft()
                    if nxt < len(batches):
                        window.append(submit(batches[nxt]))
                        nxt += 1
                    yield batch_fut.result()
        else:
            for batch_ids in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_ids])
