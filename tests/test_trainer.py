import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import optim
from holocron_tpu.models.classification.repvgg import RepVGG
from holocron_tpu.models.core import Model
from holocron_tpu.nn import FocalLoss
from holocron_tpu.nn.functional import cross_entropy
from holocron_tpu.trainer import (
    BinaryClassificationTrainer,
    ClassificationTrainer,
    SegmentationTrainer,
    freeze_model,
    norm_param_mask,
)


class MockLoader:
    """Deterministic random dataset, reference MockClassificationDataset-style."""

    def __init__(self, num_batches=4, batch_size=4, shape=(16, 16, 3), num_classes=5, seed=0, binary=False, seg=False):
        rng = np.random.default_rng(seed)
        self.batches = []
        for _ in range(num_batches):
            x = rng.normal(size=(batch_size, *shape)).astype(np.float32)
            if binary:
                y = rng.integers(0, 2, size=(batch_size,)).astype(np.float32)
            elif seg:
                y = rng.integers(0, num_classes, size=(batch_size, shape[0], shape[1])).astype(np.int32)
            else:
                y = rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32)
            self.batches.append((x, y))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def tiny_model(num_classes=5):
    return Model(RepVGG([1], [8], 1.0, 1.0, num_classes=num_classes))


def make_trainer(**kwargs):
    loader = MockLoader()
    defaults = {
        "model": tiny_model(),
        "train_loader": loader,
        "val_loader": MockLoader(num_batches=2, seed=1),
        "criterion": cross_entropy,
        "optimizer": lambda lr: optim.adabelief(lr=lr),
    }
    defaults.update(kwargs)
    return ClassificationTrainer(**defaults)


def test_fit_n_epochs(tmp_path, capsys):
    trainer = make_trainer(output_file=str(tmp_path / "ckpt.bin"))
    trainer.fit_n_epochs(2, lr=1e-3)
    assert trainer.epoch == 2
    assert trainer.step == 8
    metrics = trainer.evaluate()
    assert set(metrics) == {"val_loss", "acc1", "acc5"}
    assert math.isfinite(metrics["val_loss"])
    # best checkpoint got saved
    assert (tmp_path / "ckpt.bin").exists()
    assert "Validation loss decreased" in capsys.readouterr().out


def test_training_reduces_loss():
    trainer = make_trainer()
    losses = trainer.check_setup(lr=5e-3, num_it=20)
    assert len(losses) == 20
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer()
    trainer.fit_n_epochs(1, lr=1e-3, sched_type="cosine")
    trainer.save(str(tmp_path / "state.bin"))

    trainer2 = make_trainer()
    trainer2.model(jnp.zeros((1, 16, 16, 3)))  # init
    trainer2.load(str(tmp_path / "state.bin"))
    assert trainer2.epoch == 1
    assert trainer2.step == 4
    for a, b in zip(jax.tree.leaves(trainer.model.params), jax.tree.leaves(trainer2.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_freeze_until():
    trainer = make_trainer()
    x, y = next(iter(trainer.train_loader))
    trainer.model(jnp.asarray(x))
    before = jax.tree.map(np.asarray, trainer.model.params)
    trainer.model._ensure_init(jnp.asarray(x))
    trainer._reset_opt(1e-2, freeze_until="features_0_0")
    trainer._run_step(x, y)
    after = trainer.model.params
    # frozen block params unchanged; head params changed
    frozen_before = jax.tree.leaves(before["features_0_0"])
    frozen_after = jax.tree.leaves(after["features_0_0"])
    for a, b in zip(frozen_before, frozen_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(before["head"]["kernel"]), np.asarray(after["head"]["kernel"]))
    # frozen BN stats unchanged too
    with pytest.raises(ValueError):
        trainer._reset_opt(1e-2, freeze_until="not_a_layer")


def test_gradient_accumulation():
    # hand-stepped accumulation state machine (reference tests/test_trainer.py:83-148):
    # params must only change every `gradient_acc` steps
    trainer = make_trainer(gradient_acc=2)
    x, y = next(iter(trainer.train_loader))
    trainer.model(jnp.asarray(x))
    trainer._reset_opt(1e-2)
    p0 = np.asarray(trainer.model.params["head"]["kernel"])
    trainer._run_step(x, y)  # accumulation step: no update
    p1 = np.asarray(trainer.model.params["head"]["kernel"])
    np.testing.assert_array_equal(p0, p1)
    trainer._run_step(x, y)  # update step
    p2 = np.asarray(trainer.model.params["head"]["kernel"])
    assert not np.array_equal(p1, p2)


def test_nan_tolerance():
    def nan_criterion(out, target):
        return jnp.float32(jnp.nan)

    trainer = make_trainer(criterion=nan_criterion, skip_nan_loss=True, nan_tolerance=2)
    with pytest.raises(ValueError):
        trainer.fit_n_epochs(1, lr=1e-3)


def test_find_lr():
    trainer = make_trainer()
    trainer.find_lr(num_it=4)
    assert len(trainer.lr_recorder) == len(trainer.loss_recorder) == 4
    assert trainer.lr_recorder[-1] > trainer.lr_recorder[0]
    with pytest.raises(ValueError):
        trainer.find_lr(num_it=100)


def test_amp_training():
    trainer = make_trainer(amp=True)
    losses = trainer.check_setup(lr=5e-3, num_it=10)
    assert all(math.isfinite(v) for v in losses)
    # params stay f32 masters
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(trainer.model.params))


def test_binary_classification_trainer():
    model = tiny_model(num_classes=1)

    def bce(out, target):
        return jnp.mean(jnp.maximum(out, 0) - out * target + jnp.log1p(jnp.exp(-jnp.abs(out))))

    trainer = BinaryClassificationTrainer(
        model=model,
        train_loader=MockLoader(binary=True, num_classes=1),
        val_loader=MockLoader(binary=True, num_classes=1, seed=1),
        criterion=bce,
        optimizer=lambda lr: optim.adamp(lr=lr),
    )
    trainer.fit_n_epochs(1, lr=1e-3)
    metrics = trainer.evaluate()
    assert set(metrics) == {"val_loss", "acc"}
    assert 0 <= metrics["acc"] <= 1


def test_segmentation_trainer():
    import flax.linen as nn

    class TinySeg(nn.Module):
        num_classes: int = 5

        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(self.num_classes, (3, 3), padding=1)(x)

    def seg_loss(out, target):
        return cross_entropy(out, target)

    trainer = SegmentationTrainer(
        model=Model(TinySeg()),
        train_loader=MockLoader(seg=True),
        val_loader=MockLoader(seg=True, seed=1),
        criterion=seg_loss,
        optimizer=lambda lr: optim.lamb(lr=lr),
        num_classes=5,
    )
    trainer.fit_n_epochs(1, lr=1e-3)
    metrics = trainer.evaluate()
    assert set(metrics) == {"val_loss", "acc_global", "mean_iou"}
    assert 0 <= metrics["mean_iou"] <= 1


def test_freeze_model_mask():
    params = {"a": {"kernel": 1, "bias": 2}, "b": {"kernel": 3}, "c": {"kernel": 4}}
    mask = freeze_model(params, "b")
    assert mask == {"a": {"kernel": False, "bias": False}, "b": {"kernel": False}, "c": {"kernel": True}}
    mask = freeze_model(params, None)
    assert all(jax.tree.leaves(mask))
    with pytest.raises(ValueError):
        freeze_model(params, "zzz")


def test_evaluate_before_fit_initializes_lazily():
    """--test-only path: evaluate() on a never-fitted trainer must lazy-init the model;
    top-5 accuracy clamps to the class count (4 classes -> always 100%)."""
    trainer = make_trainer(
        model=tiny_model(num_classes=4),
        val_loader=MockLoader(num_batches=2, num_classes=4, seed=1),
    )
    metrics = trainer.evaluate()
    assert math.isfinite(metrics["val_loss"])
    assert metrics["acc5"] == 1.0


def test_freeze_bn_mask():
    from holocron_tpu.trainer import freeze_bn

    params = {
        "block1": {"conv": {"kernel": 1}, "bn": {"scale": 1, "bias": 1}},
        "block2": {"bn": {"scale": 1, "bias": 1}},
    }
    stats = {"block1": {"bn": {"mean": 0, "var": 1}}, "block2": {"bn": {"mean": 0, "var": 1}}}
    mask = freeze_model(params, "block1")  # block1 frozen, block2 trainable
    stats_mask = freeze_bn(mask, stats)
    assert stats_mask == {
        "block1": {"bn": {"mean": False, "var": False}},
        "block2": {"bn": {"mean": True, "var": True}},
    }


def test_norm_param_mask():
    params = {
        "conv": {"kernel": np.ones(1), "bias": np.ones(1)},
        "bn": {"scale": np.ones(1), "bias": np.ones(1)},
    }
    mask = norm_param_mask(params)
    assert mask == {"conv": {"kernel": False, "bias": False}, "bn": {"scale": True, "bias": True}}


def test_data_parallel_training():
    # batch divisible by the 8-device CPU mesh: the step runs sharded over "data"
    trainer = make_trainer(
        train_loader=MockLoader(batch_size=8),
        val_loader=MockLoader(batch_size=8, seed=1),
    )
    assert trainer.mesh is not None and len(trainer.devices) == 8
    losses = trainer.check_setup(lr=5e-3, num_it=10)
    assert losses[-1] < losses[0]


def test_loss_criterion_object():
    # criterion objects from the nn catalog work inside the jitted step
    trainer = make_trainer(criterion=FocalLoss(gamma=2.0))
    losses = trainer.check_setup(lr=5e-3, num_it=5)
    assert all(math.isfinite(v) for v in losses)


def test_orbax_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer()
    x, y = next(iter(trainer.train_loader))
    trainer.model(jnp.asarray(x))
    trainer.epoch, trainer.step, trainer.min_loss = 3, 12, 0.5
    ckpt_dir = tmp_path / "orbax_ckpt"
    trainer.save(str(ckpt_dir))
    assert ckpt_dir.is_dir()

    trainer2 = make_trainer()
    trainer2.model(jnp.asarray(x))
    trainer2.load(str(ckpt_dir))
    assert trainer2.epoch == 3 and trainer2.step == 12 and trainer2.min_loss == 0.5
    for a, b in zip(jax.tree.leaves(trainer.model.params), jax.tree.leaves(trainer2.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_plot_recorder_and_top_losses(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    trainer = make_trainer(criterion=FocalLoss(gamma=2.0))
    trainer.find_lr(num_it=4)
    trainer.plot_recorder(block=False)
    # streaming top-loss collection runs end to end with a criterion object
    trainer.plot_top_losses(mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), classes=[str(i) for i in range(5)], block=False)
    with pytest.raises(AssertionError):
        make_trainer().plot_recorder()


def test_detection_trainer_end_to_end():
    from holocron_tpu.models.detection import pad_targets
    from holocron_tpu.models.detection.yolo import DetectionModel
    from holocron_tpu.models.detection.yolov2 import YOLOv2
    from holocron_tpu.trainer import DetectionTrainer

    rng = np.random.default_rng(0)

    def det_batch(seed):
        r = np.random.default_rng(seed)
        x = r.normal(size=(2, 32, 32, 3)).astype(np.float32)
        targets = []
        for _ in range(2):
            n = int(r.integers(1, 3))
            boxes = np.sort(r.random((n, 2, 2)), axis=1).transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
            boxes = boxes[:, [0, 2, 1, 3]]
            targets.append({"boxes": boxes, "labels": r.integers(0, 3, size=(n,))})
        return x, targets

    class Loader:
        def __init__(self, padded):
            self.padded = padded

        def __len__(self):
            return 2

        def __iter__(self):
            for s in range(2):
                x, t = det_batch(s)
                yield (x, pad_targets(t, 6)) if self.padded else (x, t)

    tiny_layout = [(8, 0), (16, 0), (16, 0), (32, 0), (32, 0)]
    model = DetectionModel(YOLOv2(tiny_layout, num_classes=3), max_boxes=6)
    trainer = DetectionTrainer(
        model, Loader(padded=True), Loader(padded=False), None, lambda lr: optim.tadam(lr=lr)
    )
    losses = trainer.check_setup(lr=1e-3, num_it=5)
    assert all(math.isfinite(v) for v in losses)
    metrics = trainer.evaluate()
    assert set(metrics) == {"loc_err", "clf_err", "det_err", "val_loss"}


def test_remat_training():
    trainer = make_trainer(remat=True)
    losses = trainer.check_setup(lr=5e-3, num_it=8)
    assert losses[-1] < losses[0]


def test_input_norm_uint8_matches_prenormalized_f32():
    """A uint8 batch + on-device input_norm must produce exactly the training loss of
    the host-normalized f32 batch (the 4x-lighter transfer path, VERDICT r2 item 4)."""
    mean, std = (0.4, 0.5, 0.45), (0.2, 0.25, 0.22)
    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
    y = rng.integers(0, 4, size=8).astype(np.int32)
    x_f32 = (x_u8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)

    losses = []
    for batch_x, norm in ((x_u8, (mean, std)), (x_f32, None)):
        loader = [(batch_x, y)]
        trainer = make_trainer(train_loader=loader, val_loader=loader, input_norm=norm)
        losses.append(trainer.check_setup(lr=1e-3, num_it=2))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_remat_dots_training():
    """remat='dots' (keep conv outputs, recompute elementwise in the backward —
    the HBM-traffic policy, docs/PERF.md) must train identically well."""
    trainer = make_trainer(remat="dots")
    losses = trainer.check_setup(lr=5e-3, num_it=8)
    assert losses[-1] < losses[0]

    import pytest

    with pytest.raises(ValueError, match="remat"):
        make_trainer(remat="bogus")


def test_training_learns_separable_data():
    """End-to-end learning check: constant-color classes + noise must be fit to
    near-perfect validation accuracy within a few epochs."""
    rng = np.random.default_rng(0)
    palette = rng.normal(size=(4, 1, 1, 3)).astype(np.float32) * 2

    def make_batches(n, seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            y = r.integers(0, 4, size=16)
            x = palette[y] + 0.3 * r.normal(size=(16, 16, 16, 3)).astype(np.float32)
            out.append((x.astype(np.float32), y.astype(np.int32)))
        return out

    class Loader(list):
        pass

    model = Model(RepVGG([1], [8], 1.0, 1.0, num_classes=4))
    trainer = ClassificationTrainer(
        model, Loader(make_batches(8, 0)), Loader(make_batches(2, 1)), cross_entropy,
        lambda lr: optim.adamp(lr=lr),
    )
    trainer.fit_n_epochs(3, lr=5e-3, sched_type="constant")
    metrics = trainer.evaluate()
    assert metrics["acc1"] > 0.9, metrics


def test_freeze_model_forward_order():
    # explicit forward order beats name-sorted order ('head' sorts first, stem last)
    params = {
        "head": {"kernel": 1},
        "layer_10": {"kernel": 2},
        "layer_2": {"kernel": 3},
        "stem": {"kernel": 4},
    }
    order = ["stem", "layer_2", "layer_10", "head"]
    mask = freeze_model(params, "layer_2", order)
    assert mask == {
        "stem": {"kernel": False},
        "layer_2": {"kernel": False},
        "layer_10": {"kernel": True},
        "head": {"kernel": True},
    }
    # natural-sort fallback: layer_10 comes AFTER layer_2 (lexicographic would invert)
    mask = freeze_model(params, "layer_2")
    assert mask["layer_10"] == {"kernel": True}
    assert mask["layer_2"] == {"kernel": False}


def test_freeze_until_resnet_forward_order():
    """Regression: ResNet-style trees flatten as head < layer_* < stem_0; freezing
    through layer_0_0 must freeze the STEM (called first) and keep the HEAD
    trainable — the exact inversion the name-sorted mask got wrong."""
    from holocron_tpu.models.classification.resnet import BasicBlock, ResNet

    model = Model(ResNet(BasicBlock, [1, 1], [8, 16], num_classes=5))
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 5, size=(8,)).astype(np.int32)

    trainer = ClassificationTrainer(
        model,
        [(x, y)],
        [(x, y)],
        cross_entropy,
        lambda lr: optim.adabelief(lr=lr),
    )
    model._ensure_init(jnp.asarray(x))
    order = model.forward_order()
    assert order.index("stem_0") < order.index("layer_0_0") < order.index("head")
    before = jax.tree.map(np.asarray, model.params)
    trainer._reset_opt(1e-2, freeze_until="layer_0_0")
    trainer._run_step(x, y)
    after = model.params
    # stem (before the frozen layer in forward order) is frozen
    for a, b in zip(jax.tree.leaves(before["stem_0"]), jax.tree.leaves(after["stem_0"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(before["layer_0_0"]), jax.tree.leaves(after["layer_0_0"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # layers after it, and the head, remain trainable
    assert not np.allclose(np.asarray(before["head"]["kernel"]), np.asarray(after["head"]["kernel"]))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before["layer_1_0"]), jax.tree.leaves(after["layer_1_0"]))
    )


def test_partial_batch_pad():
    # batch 5 on the 8-device mesh: wrap-padded to 8 and sharded (never unsharded)
    trainer = make_trainer()
    assert trainer.mesh is not None
    x = np.zeros((5, 16, 16, 3), np.float32)
    y = np.arange(5, dtype=np.int32)
    x_dev, y_dev = trainer.to_device(x, y)
    assert x_dev.shape[0] == 8 and y_dev.shape[0] == 8
    np.testing.assert_array_equal(np.asarray(y_dev), [0, 1, 2, 3, 4, 0, 1, 2])
    assert len(x_dev.sharding.device_set) == 8
    # and training on a partial batch still works end to end
    trainer2 = make_trainer(train_loader=MockLoader(batch_size=5), val_loader=MockLoader(batch_size=5, seed=1))
    losses = trainer2.check_setup(lr=5e-3, num_it=5)
    assert all(math.isfinite(v) for v in losses)


def test_partial_batch_drop():
    class MixedLoader:
        def __len__(self):
            return 3

        def __iter__(self):
            r = np.random.default_rng(0)
            for bs in (8, 5, 8):  # the size-5 batch must be skipped
                yield (
                    r.normal(size=(bs, 16, 16, 3)).astype(np.float32),
                    r.integers(0, 5, size=(bs,)).astype(np.int32),
                )

    trainer = make_trainer(train_loader=MixedLoader(), partial_batch="drop")
    trainer.fit_n_epochs(1, lr=1e-3)
    assert trainer.step == 2  # 3 batches, 1 dropped

    with pytest.raises(ValueError):
        make_trainer(partial_batch="bogus")


def test_to_device_is_idempotent():
    """The train loop's prefetch places batches ahead of _run_step_async, which
    calls to_device again — the second call must be a no-op (multi-host it would
    otherwise re-assemble the global array and crash/duplicate the batch)."""
    trainer = make_trainer()
    x = np.zeros((8, 16, 16, 3), np.float32)
    y = np.arange(8, dtype=np.int32)
    x1, y1 = trainer.to_device(x, y)
    x2, y2 = trainer.to_device(x1, y1)
    assert x2.shape == x1.shape and x2.sharding == x1.sharding
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


def test_mesh_data_axis_must_divide_process_count(monkeypatch):
    """2 hosts whose model axis eats the whole mesh must fail at construction with
    a clear error, not a ZeroDivisionError on the first batch."""
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="process count"):
        make_trainer()  # 8-device data mesh, 8 % 3 != 0


def test_sharded_matches_single_device_trajectory():
    """The one multi-chip correctness claim the CPU mesh can prove: an 8-way
    data-sharded fit reproduces the single-device loss trajectory and final params."""

    def run(devices):
        trainer = make_trainer(
            model=tiny_model(),
            train_loader=MockLoader(batch_size=8),
            val_loader=MockLoader(batch_size=8, seed=1),
            devices=devices,
        )
        losses = trainer.check_setup(lr=5e-3, num_it=8)
        return losses, jax.tree.map(np.asarray, trainer.model.params)

    losses_1, params_1 = run(jax.devices()[:1])
    losses_8, params_8 = run(None)  # all 8 mesh devices
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_8)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_tensor_parallel_trajectory_matches_single_device():
    """DP x TP training (4-way data, 2-way channel tensor parallelism with the conv
    kernels / BN vectors / moments split over the 'model' axis) must reproduce the
    single-device trajectory — the Trainer(model_parallel=...) contract."""

    def run(**kw):
        trainer = make_trainer(
            model=tiny_model(),
            train_loader=MockLoader(batch_size=8),
            val_loader=MockLoader(batch_size=8, seed=1),
            **kw,
        )
        losses = trainer.check_setup(lr=5e-3, num_it=8)
        return losses, trainer

    losses_1, t1 = run(devices=jax.devices()[:1])
    losses_tp, ttp = run(model_parallel=2, tp_min_channels=4)
    assert ttp.mesh.devices.shape == (4, 2)
    # the wide conv kernels must actually live sharded over the 'model' axis
    specs = {s.spec for leaf in jax.tree.leaves(ttp.model.params) for s in [leaf.sharding]}
    assert any(spec and spec[-1] == "model" for spec in specs), specs
    np.testing.assert_allclose(losses_1, losses_tp, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(t1.model.params), jax.tree.leaves(ttp.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    # eval path consumes the TP-sharded variables too
    metrics = ttp.evaluate()
    assert math.isfinite(metrics["val_loss"])


def test_spatial_parallel_trajectory_matches_single_device():
    """DP x SP training (batch over 'data', image rows over 'spatial', halo
    exchanges GSPMD-placed at the conv seams) must reproduce the single-device
    trajectory — the Trainer(spatial_parallel=...) contract. Uses a segmentation
    setup so the dense per-pixel masks shard with the image rows."""
    import flax.linen as nn

    class TinySeg(nn.Module):
        num_classes: int = 5

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), padding=1)(x)
            x = nn.relu(x)
            return nn.Conv(self.num_classes, (3, 3), padding=1)(x)

    def run(**kw):
        trainer = SegmentationTrainer(
            model=Model(TinySeg()),
            train_loader=MockLoader(seg=True, batch_size=8),
            val_loader=MockLoader(seg=True, batch_size=8, seed=1),
            criterion=cross_entropy,
            optimizer=lambda lr: optim.lamb(lr=lr),
            num_classes=5,
            **kw,
        )
        losses = trainer.check_setup(lr=5e-3, num_it=8)
        return losses, trainer

    losses_1, _ = run(devices=jax.devices()[:1])
    losses_sp, tsp = run(spatial_parallel=2)
    assert tsp.mesh.devices.shape == (4, 2)
    np.testing.assert_allclose(losses_1, losses_sp, rtol=2e-5, atol=2e-6)

    # the batch must land sharded on BOTH axes: images (N,H,W,C) and masks (N,H,W)
    from jax.sharding import PartitionSpec as P

    x, y = next(iter(MockLoader(seg=True, batch_size=8)))
    x_dev, y_dev = tsp.to_device(x, y)
    assert x_dev.sharding.spec == P("data", "spatial")
    assert y_dev.sharding.spec == P("data", "spatial")

    # classification targets (N,) batch-shard only
    tc = make_trainer(spatial_parallel=4)
    xc, yc = tc.to_device(np.zeros((8, 16, 16, 3), np.float32), np.zeros((8,), np.int32))
    assert xc.sharding.spec == P("data", "spatial")
    assert yc.sharding.spec == P("data")

    with pytest.raises(ValueError):
        make_trainer(spatial_parallel=2, model_parallel=2)
    with pytest.raises(ValueError):
        # H must divide the spatial axis: 12 rows cannot split 8 ways
        tc8 = make_trainer(spatial_parallel=8)
        tc8.to_device(np.zeros((8, 12, 12, 3), np.float32), np.zeros((8,), np.int32))


def test_zero_sharded_opt_state_trajectory_matches_single_device():
    """ZeRO-1 optimizer-state sharding (moments split over the DATA axis, params
    replicated) must keep the exact single-device trajectory — the memory win comes
    from placement, not from changing the update math."""
    from jax.sharding import PartitionSpec as P

    def run(**kw):
        trainer = make_trainer(
            model=tiny_model(),
            train_loader=MockLoader(batch_size=8),
            val_loader=MockLoader(batch_size=8, seed=1),
            **kw,
        )
        losses = trainer.check_setup(lr=5e-3, num_it=8)
        return losses, trainer

    losses_1, _ = run(devices=jax.devices()[:1])
    losses_z, tz = run(shard_opt_state=True, tp_min_channels=4)
    np.testing.assert_allclose(losses_1, losses_z, rtol=2e-5, atol=2e-6)

    # the wide moment leaves must actually live sharded over the data axis
    specs = [
        getattr(leaf, "sharding", None)
        for leaf in jax.tree.leaves(tz._opt_state)
        if getattr(leaf, "ndim", 0) >= 1
    ]
    assert any(s is not None and s.spec != P() and "data" in jax.tree.leaves(tuple(s.spec)) for s in specs), (
        "expected at least one optimizer moment sharded over 'data'"
    )


def test_progress_bar_renders_and_gates():
    """The TTY progress bar (reference core.py:299-306 fastprogress analog): forced-on
    mode renders step/rate/loss/ETA; default non-TTY mode writes nothing."""
    import io

    from holocron_tpu.trainer._progress import ProgressBar

    class Buf(io.StringIO):
        def isatty(self):
            return False

    # forced on via env
    import os

    os.environ["HOLOCRON_PROGRESS"] = "1"
    try:
        buf = Buf()
        bar = ProgressBar(total=10, desc="epoch 1", refresh_hz=1e9, stream=buf)
        for i in range(10):
            bar.update(1, loss=1.0 / (i + 1))
        bar.close()
        out = buf.getvalue()
        assert "epoch 1" in out and "10/10" in out and "loss 0.1000" in out and "it/s" in out
        assert out.endswith("\n")
    finally:
        del os.environ["HOLOCRON_PROGRESS"]

    # silent on non-TTY streams by default (CI logs stay clean)
    buf = Buf()
    bar = ProgressBar(total=10, stream=buf)
    bar.update(10, loss=0.5)
    bar.close()
    assert buf.getvalue() == ""


def test_fit_epoch_shows_progress(monkeypatch, capsys):
    """HOLOCRON_PROGRESS=1 surfaces a live bar from the real _fit_epoch loop."""
    monkeypatch.setenv("HOLOCRON_PROGRESS", "1")
    trainer = make_trainer()
    trainer.fit_n_epochs(1, 1e-3)
    err = capsys.readouterr().err
    assert "epoch 1" in err and "it/s" in err
