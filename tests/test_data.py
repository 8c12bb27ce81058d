"""Host input-pipeline tests: DataLoader batching/ordering and prefetch semantics.

Reference analog: torch DataLoader behavior relied on by
references/classification/train.py:137-146.
"""

import numpy as np
import pytest

from holocron_tpu.utils.data import DataLoader, prefetch


class _DS:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2, 3), i, np.float32), i


def _labels(batches):
    return [tuple(int(v) for v in y) for _, y in batches]


def test_dataloader_threaded_preserves_order():
    dl = DataLoader(_DS(), batch_size=3, num_workers=4)
    assert len(dl) == 4
    assert _labels(list(dl)) == [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9,)]


def test_dataloader_single_worker_matches_threaded():
    a = _labels(list(DataLoader(_DS(), batch_size=4, num_workers=1)))
    b = _labels(list(DataLoader(_DS(), batch_size=4, num_workers=4)))
    assert a == b


def test_dataloader_drop_last():
    dl = DataLoader(_DS(), batch_size=3, num_workers=2, drop_last=True)
    assert len(dl) == 3
    assert all(len(y) == 3 for y in _labels(list(dl)))


def test_dataloader_shuffle_is_seeded_and_reshuffles():
    dl = DataLoader(_DS(), batch_size=10, shuffle=True, num_workers=1, seed=0)
    first = _labels(list(dl))[0]
    second = _labels(list(dl))[0]
    assert sorted(first) == list(range(10))
    assert first != second  # epoch-to-epoch reshuffle
    again = _labels(list(DataLoader(_DS(), batch_size=10, shuffle=True, num_workers=1, seed=0)))[0]
    assert again == first  # same seed -> same order


def test_prefetch_semantics():
    assert list(prefetch([1, 2, 3], lambda v: v * 10)) == [10, 20, 30]
    assert list(prefetch([], size=4)) == []
    assert list(prefetch([7], size=4)) == [7]
    calls = []
    gen = prefetch(range(6), lambda v: calls.append(v) or v, size=2)
    assert next(gen) == 0
    assert calls == [0, 1, 2]  # stays 2 items ahead of consumption
    assert list(gen) == [1, 2, 3, 4, 5]


def _write_fake_cifar10(root):
    import pickle

    base = root / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(4, 3072), dtype=np.uint8)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, size=4))}, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": rng.integers(0, 256, size=(6, 3072), dtype=np.uint8), b"labels": list(range(6))}, f
        )
    with open(base / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"class_{i}".encode() for i in range(10)]}, f)


def test_cifar10_reader(tmp_path):
    from holocron_tpu.utils.data import CIFAR10

    _write_fake_cifar10(tmp_path)
    train = CIFAR10(str(tmp_path), train=True)
    test = CIFAR10(str(tmp_path), train=False)
    assert len(train) == 20 and len(test) == 6
    img, label = train[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert isinstance(label, int)
    assert train.classes == [f"class_{i}" for i in range(10)]
    # transform hook
    ds = CIFAR10(str(tmp_path), train=False, transform=lambda im: im.astype(np.float32) / 255)
    img2, _ = ds[0]
    assert img2.dtype == np.float32 and img2.max() <= 1.0
    with pytest.raises(FileNotFoundError):
        CIFAR10(str(tmp_path / "nope"))


def test_dataloader_process_sharding():
    """Multi-host sharding (DistributedSampler semantics): every shard draws the SAME
    epoch permutation, the permutation is wrap-padded to equal shard sizes — so every
    'host' runs the identical step count (unequal shards would deadlock a multi-host
    collective) — and the union covers the dataset at least once."""
    from holocron_tpu.utils.data import DataLoader, SyntheticDataset

    ds = SyntheticDataset(num_samples=22, shape=(8, 8, 3), num_classes=3)

    def collect(loader):
        seen = []
        for x, y in loader:
            seen.extend(np.asarray(x).reshape(len(x), -1)[:, 0].tolist())
        return seen

    loaders = [
        DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=1,
                   num_shards=3, shard_index=i)
        for i in range(3)
    ]
    shards = [collect(ld) for ld in loaders]
    sizes = [len(s) for s in shards]
    # equal shards: ceil(22/3) = 8 each (2 wrap-padded repeats globally)
    assert sizes == [8, 8, 8]
    assert len({len(ld) for ld in loaders}) == 1  # identical per-host step counts
    all_vals = [v for s in shards for v in s]
    assert len(set(all_vals)) == 22  # every sample appears at least once
    # shards stay pairwise disjoint apart from the wrap-padded head repeats
    assert sum(sizes) - len(set(all_vals)) == 2

    # drop_last: identical step counts too (the multi-host lockstep contract)
    dl_loaders = [
        DataLoader(ds, batch_size=3, drop_last=True, num_workers=1, num_shards=3, shard_index=i)
        for i in range(3)
    ]
    assert len({len(ld) for ld in dl_loaders}) == 1
    assert len({len(collect(ld)) for ld in dl_loaders}) == 1

    # tiny dataset < num_shards: wraps enough to fill every shard
    tiny = SyntheticDataset(num_samples=2, shape=(4, 4, 3))
    tiny_loaders = [DataLoader(tiny, batch_size=1, num_workers=1, num_shards=4, shard_index=i) for i in range(4)]
    assert [len(collect(ld)) for ld in tiny_loaders] == [1, 1, 1, 1]

    with pytest.raises(ValueError):
        DataLoader(ds, num_shards=2, shard_index=5)

    # unsharded default unchanged
    base = DataLoader(ds, batch_size=4, num_workers=1)
    assert len(collect(base)) == 22
