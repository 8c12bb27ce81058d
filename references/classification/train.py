#!/usr/bin/env python
"""Image classification training CLI.

TPU-native analog of the reference's references/classification/train.py:79-363: the same
argparse surface (actions --find-lr / --check-setup / --test-only, the optimizer zoo,
Mixup collation, label smoothing, W&B tracking) over the jitted mesh-sharded trainer.
Pass ``fake`` as data_path to train on a synthetic dataset (smoke runs / CI).
"""

import argparse
import datetime
import time
from pathlib import Path

import numpy as np


def build_optimizer(args):
    import optax

    from holocron_tpu import optim

    wd = args.weight_decay
    # factories accept a weight_decay override so the trainer can build the norm
    # param group with --norm-wd REPLACING the default decay (reference semantics,
    # holocron/trainer/core.py:238-252)
    return {
        "sgd": lambda lr, weight_decay=wd: optax.chain(
            optax.add_decayed_weights(weight_decay), optax.sgd(lr, momentum=0.9)
        ),
        "adam": lambda lr, weight_decay=wd: optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr)
        ),
        "adamw": lambda lr, weight_decay=wd: optax.adamw(lr, weight_decay=weight_decay),
        # torch.optim.RAdam couples weight decay into the gradient (reference
        # references/classification/train.py:200-203, betas=(0.95, 0.99), eps=1e-6)
        "radam": lambda lr, weight_decay=wd: optax.chain(
            optax.add_decayed_weights(weight_decay), optax.radam(lr, b1=0.95, b2=0.99, eps=1e-6)
        ),
        "adamp": lambda lr, weight_decay=wd: optim.adamp(lr, weight_decay=weight_decay),
        "adabelief": lambda lr, weight_decay=wd: optim.adabelief(lr, weight_decay=weight_decay),
        "ademamix": lambda lr, weight_decay=wd: optim.ademamix(lr, weight_decay=weight_decay),
        "lamb": lambda lr, weight_decay=wd: optim.lamb(lr, weight_decay=weight_decay),
        "lars": lambda lr, weight_decay=wd: optim.lars(lr, momentum=0.9, weight_decay=weight_decay),
        "tadam": lambda lr, weight_decay=wd: optim.tadam(lr, weight_decay=weight_decay),
        "adan": lambda lr, weight_decay=wd: optim.adan(lr, weight_decay=weight_decay),
    }[args.opt]


def build_datasets(args):
    from holocron_tpu.models.presets import CIFAR10 as CIF10_PRESET, IMAGENETTE
    from holocron_tpu.transforms import (
        Compose,
        RandomErasing,
        RandomHorizontalFlip,
        RandomResizedCrop,
        Resize,
        TrivialAugmentWide,
    )
    from holocron_tpu.utils.data import (
        CIFAR10,
        CIFAR100,
        ImageFolder,
        NativeImageFolder,
        SyntheticDataset,
        decode_rrc_batch,
        native_available,
        native_collate,
        normalize_image,
    )

    seed = getattr(args, "seed", 0)
    if args.data_path == "fake":
        shape = (args.train_crop_size, args.train_crop_size, 3)
        train_set = SyntheticDataset(args.fake_samples, shape, args.num_classes, seed=seed)
        val_set = SyntheticDataset(max(args.fake_samples // 4, args.batch_size), shape, args.num_classes, seed=seed + 1)
        return train_set, val_set, [str(i) for i in range(args.num_classes)], None, None, None

    dataset = args.dataset.lower()
    preset = IMAGENETTE if dataset == "imagenette" else CIF10_PRESET
    mean, std = preset.mean, preset.std

    def normalize(img):
        return normalize_image(img, mean, std)

    # the recipe every published checkpoint's train_args records
    # (reference references/classification/train.py:100-108)
    if dataset == "imagenette":
        train_dir, val_dir = Path(args.data_path) / "train", Path(args.data_path) / "val"
        pil_train = ImageFolder(train_dir)  # directory scan; decides the decode path
        all_jpeg = all(p.suffix.lower() in {".jpg", ".jpeg"} for p, _ in pil_train.samples)
        if all_jpeg and not args.no_native and native_available():
            # Native fast path: JPEG decode + RandomResizedCrop + flip fused in C++
            # (uint8 out), then the cheap recipe tail (TrivialAugmentWide + normalize
            # + RandomErasing) thread-pooled over the already-small crops.
            from concurrent.futures import ThreadPoolExecutor

            taw = TrivialAugmentWide()
            # erasing runs on uint8 with pixel_stats so the fill lands on the same
            # standard-normal distribution after the ON-DEVICE normalization
            erase = RandomErasing(p=args.random_erase, scale=(0.02, 0.2), pixel_stats=(mean, std))
            crop = args.train_crop_size
            pool = ThreadPoolExecutor(args.workers)

            def augment_one(img_and_seed):
                # batch stays uint8 end-to-end on the host: /255-mean-std runs inside
                # the jitted train step (Trainer input_norm) and the host->device
                # link moves 4x fewer bytes
                img, seed = img_and_seed
                rng = np.random.default_rng(seed)
                img = taw(img, rng=rng)
                if args.random_erase > 0:
                    img = erase(img, rng=rng)
                return img

            def train_collate(batch):
                buffers, ys = zip(*batch)
                n = len(buffers)
                # --seed reproducibility must be thread-order-independent: the
                # DataLoader runs collates on a small pool, so a shared sequential
                # Generator would make the draw order scheduler-dependent (and
                # np.random.Generator is not thread-safe). Key each batch's seeds
                # off (seed, epoch, its OWN bytes) instead — stable across runs for
                # a fixed shuffle seed, no shared mutable state between collate
                # threads. The epoch term (pushed by DataLoader via set_epoch)
                # matters: content alone would redraw the SAME crop/flip/augment for
                # any recurring batch composition — every epoch at batch_size=1.
                import zlib

                entropy = [seed, train_collate.epoch] + [
                    zlib.crc32(bytes(b[:4096]), len(b)) for b in buffers
                ]
                rng = np.random.default_rng(np.random.SeedSequence(entropy))
                seeds = rng.integers(1, 2**63, size=2 * n, dtype=np.uint64)
                x_u8 = decode_rrc_batch(
                    list(buffers), crop, crop, scale=(0.3, 1.0),
                    seeds=seeds[:n], num_threads=args.workers,
                )
                x = np.stack(list(pool.map(augment_one, zip(x_u8, seeds[n:]))))
                return np.ascontiguousarray(x), np.asarray(ys)

            train_collate.epoch = 0
            train_collate.set_epoch = lambda e: setattr(train_collate, "epoch", e)

            val_collate = native_collate(
                args.val_resize_size, args.val_resize_size, mean, std,
                center_crop=args.val_crop_size, num_threads=args.workers,
            )
            train_set = NativeImageFolder(train_dir)
            val_set = NativeImageFolder(val_dir)
            return train_set, val_set, train_set.classes, train_collate, val_collate, (mean, std)

        train_tf = Compose([
            RandomResizedCrop(args.train_crop_size, scale=(0.3, 1.0)),
            RandomHorizontalFlip(),
            TrivialAugmentWide(),
            normalize,
            RandomErasing(p=args.random_erase, scale=(0.02, 0.2)),
        ])

        def val_tf(img):
            img = Resize((args.val_resize_size, args.val_resize_size))(img)
            arr = normalize_image(img, mean, std)
            off = (args.val_resize_size - args.val_crop_size) // 2
            return arr[off : off + args.val_crop_size, off : off + args.val_crop_size]

        train_set = ImageFolder(train_dir, transform=train_tf)
        val_set = ImageFolder(val_dir, transform=val_tf)
        return train_set, val_set, train_set.classes, None, None, None

    # CIFAR path (reference train.py:111-124): no resizing, flip + TrivialAugmentWide
    cifar = CIFAR100 if dataset == "cifar100" else CIFAR10
    train_tf = Compose([
        RandomHorizontalFlip(),
        TrivialAugmentWide(),
        normalize,
        RandomErasing(p=args.random_erase),
    ])
    train_set = cifar(args.data_path, train=True, transform=train_tf)
    val_set = cifar(args.data_path, train=False, transform=normalize)
    return train_set, val_set, train_set.classes, None, None, None


def main(args):
    print(args)

    # joins the multi-process jax runtime when launched on a pod (env-driven:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, auto-detected
    # on Cloud TPU); a no-op for single-process runs. Must run before any jax call.
    from holocron_tpu.parallel import initialize

    initialize()

    if args.codecarbon:
        try:
            from codecarbon import EmissionsTracker

            tracker = EmissionsTracker()
            tracker.start()
        except ImportError:
            print("codecarbon is not installed, skipping emission tracking")
            args.codecarbon = False

    from holocron_tpu.models import classification
    from holocron_tpu.nn.functional import multilabel_cross_entropy
    from holocron_tpu.trainer import ClassificationTrainer
    from holocron_tpu.utils.data import DataLoader, Mixup

    from holocron_tpu.utils.data import default_collate

    train_set, val_set, classes, train_collate, val_collate, input_norm = build_datasets(args)
    num_classes = args.num_classes or len(classes)

    base_collate = train_collate or default_collate
    collate = base_collate
    if args.mixup_alpha > 0:
        mix = Mixup(num_classes, alpha=args.mixup_alpha, seed=getattr(args, "seed", 0))

        def collate(batch):  # noqa: F811
            x, y = base_collate(batch)
            return mix(x, y)

    train_loader = DataLoader(
        train_set, args.batch_size, shuffle=True, num_workers=args.workers, drop_last=True,
        collate_fn=collate, seed=getattr(args, "seed", 0), num_shards="auto",
    )
    val_loader = DataLoader(
        val_set, args.batch_size, num_workers=args.workers, collate_fn=val_collate or default_collate,
        num_shards="auto",  # multi-host: each host feeds its own shard; unsharded, every
        # host would push the FULL val set into the global batch, counting samples twice
    )

    model = classification.__dict__[args.arch](pretrained=args.pretrained, num_classes=num_classes)

    if args.pretrained and not model.pretrained_loaded:
        raise SystemExit(
            "--pretrained was requested but the released weights could not be loaded "
            "(offline or invalid URL) — refusing to continue with random initialization"
        )

    # label smoothing applies to BOTH soft (Mixup) and hard int targets — the
    # reference passes label_smoothing to CrossEntropyLoss unconditionally
    # (references/classification/train.py:194)
    import jax

    def criterion(out, target):
        if target.ndim != out.ndim:  # hard int targets -> one-hot
            target = jax.nn.one_hot(target, num_classes, dtype=out.dtype)
        smoothed = target * (1 - args.label_smoothing) + args.label_smoothing / num_classes
        return multilabel_cross_entropy(out, smoothed)

    trainer = ClassificationTrainer(
        model,
        train_loader,
        val_loader,
        criterion,
        build_optimizer(args),
        output_file=args.output_file,
        amp=args.amp,
        gradient_acc=args.grad_acc,
        gradient_clip=args.grad_clip,
        input_norm=input_norm,
        model_parallel=args.model_parallel,
        spatial_parallel=args.spatial_parallel,
        shard_opt_state=args.shard_opt_state,
    )
    if args.resume:
        print(f"Resuming {args.resume}")
        trainer.load(args.resume)

    if args.find_size:
        from holocron_tpu.utils import find_image_size

        find_image_size(train_set)
        return
    if args.find_lr:
        trainer.find_lr(args.freeze_until, num_it=min(len(train_loader), 100), norm_weight_decay=args.norm_wd)
        for lr, loss in zip(trainer.lr_recorder, trainer.loss_recorder):
            print(f"lr={lr:.2e} loss={loss:.4f}")
        return
    if args.check_setup:
        losses = trainer.check_setup(args.freeze_until, args.lr, norm_weight_decay=args.norm_wd, num_it=20)
        print(f"overfit-one-batch losses: {losses[0]:.4f} -> {losses[-1]:.4f}")
        return
    if args.test_only:
        print(trainer._eval_metrics_str(trainer.evaluate()))
        return

    on_epoch_end = None
    import jax

    # multi-host: metrics are identical on every host — log from process 0 only
    if args.wb and jax.process_index() == 0:
        import wandb

        run = wandb.init(name=args.name, project="holocron-tpu-classification", config=vars(args))
        on_epoch_end = lambda metrics: run.log(metrics)  # noqa: E731
        trainer.on_epoch_end = on_epoch_end

    print(f"Training {args.arch} for {args.epochs} epochs on {len(train_set)} samples")
    start_time = time.time()
    trainer.fit_n_epochs(args.epochs, args.lr, args.freeze_until, args.sched, norm_weight_decay=args.norm_wd)
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - start_time))}")
    if args.wb and jax.process_index() == 0:
        run.finish()
    if args.codecarbon:
        tracker.stop()


def parse_args():
    parser = argparse.ArgumentParser(
        description="holocron-tpu classification training", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    group = parser.add_argument_group("Data & model")
    group.add_argument("data_path", type=str, help="path to dataset folder ('fake' for synthetic data)")
    group.add_argument(
        "--dataset", default="imagenette", type=str, help="dataset to train on (imagenette/cifar10/cifar100)"
    )
    group.add_argument("--arch", default="darknet19", type=str, help="architecture to use")
    group.add_argument("--pretrained", action="store_true", help="use pre-trained parameters")
    group.add_argument("--num-classes", default=10, type=int, help="number of classes")
    group.add_argument("--output-file", default="./checkpoint.ckpt", help="path where to save")
    group.add_argument("--resume", default="", help="resume from checkpoint")
    group.add_argument("--fake-samples", default=64, type=int, help="synthetic dataset size")

    group = parser.add_argument_group("Hardware")
    group.add_argument("--amp", help="use bf16 mixed precision", action="store_true")
    group.add_argument(
        "--model-parallel",
        default=1,
        type=int,
        help="channel tensor-parallel factor (mesh 'model' axis); batch shards over the rest",
    )
    parser.add_argument(
        "--spatial-parallel",
        default=1,
        type=int,
        help="spatial-partitioning factor (mesh 'spatial' axis): image height sharded, halo exchanges GSPMD-placed",
    )
    parser.add_argument(
        "--shard-opt-state",
        action="store_true",
        help="ZeRO-1-style optimizer-state sharding over the data axis (~1/N optimizer memory, same trajectory)",
    )

    group = parser.add_argument_group("Data loading")
    group.add_argument("--seed", default=0, type=int, help="pipeline seed (shuffle, native RRC/flip, augment tail, mixup)")
    group.add_argument("-b", "--batch-size", default=32, type=int, help="batch size")
    group.add_argument("-j", "--workers", default=8, type=int, help="number of loader threads")
    group.add_argument(
        "--no-native", action="store_true", help="disable the native (C++) JPEG decode fast path"
    )

    group = parser.add_argument_group("Transformations")
    group.add_argument("--train-crop-size", default=176, type=int)
    group.add_argument("--val-resize-size", default=232, type=int)
    group.add_argument("--val-crop-size", default=224, type=int)
    group.add_argument("--mixup-alpha", default=0.2, type=float)
    group.add_argument("--random-erase", default=0.0, type=float, help="probability to do random erasing")

    group = parser.add_argument_group("Optimization")
    group.add_argument("--epochs", default=20, type=int)
    group.add_argument("--lr", default=1e-3, type=float)
    group.add_argument("--freeze-until", default=None, type=str)
    group.add_argument("--grad-acc", default=1, type=int)
    group.add_argument("--grad-clip", default=None, type=float)
    group.add_argument("--opt", default="adamp", type=str)
    group.add_argument("--sched", default="onecycle", type=str)
    group.add_argument("--wd", "--weight-decay", default=0, type=float, dest="weight_decay")
    group.add_argument("--norm-wd", default=None, type=float)
    group.add_argument("--label-smoothing", default=0.1, type=float)

    group = parser.add_argument_group("Actions")
    group.add_argument("--find-lr", action="store_true")
    group.add_argument("--find-size", dest="find_size", action="store_true", help="run the image size finder")
    group.add_argument("--check-setup", action="store_true")
    group.add_argument("--test-only", action="store_true")

    group = parser.add_argument_group("Experiment tracking")
    group.add_argument("--wb", action="store_true", help="log to Weights & Biases")
    group.add_argument("--codecarbon", action="store_true", help="track emissions with codecarbon")
    group.add_argument("--name", type=str, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
