#!/usr/bin/env python
"""Semantic segmentation training CLI.

TPU-native analog of references/segmentation/train.py (VOC-style joint image/mask
training, loss choice crossentropy/focal/mc with background down-weighting). Pass
``fake`` as data_path for synthetic data. Real data layout: ``<root>/images/*.jpg`` +
``<root>/masks/*.png`` (palette masks with class indices, 255 = ignore).
"""

import argparse
import datetime
import time
from pathlib import Path

import numpy as np


def build_datasets(args):
    from holocron_tpu.models.presets import IMAGENETTE
    from holocron_tpu.transforms import Resize
    from holocron_tpu.utils.data import SyntheticDataset, normalize_image

    if args.data_path == "fake":
        shape = (args.crop_size, args.crop_size, 3)
        return (
            SyntheticDataset(args.fake_samples, shape, args.num_classes, task="segmentation"),
            SyntheticDataset(max(args.fake_samples // 4, args.batch_size), shape, args.num_classes, task="segmentation", seed=1),
        )

    from PIL import Image

    mean, std = IMAGENETTE.mean, IMAGENETTE.std
    resize = Resize((args.crop_size, args.crop_size))
    mask_resize = Resize((args.crop_size, args.crop_size), interpolation="nearest")

    class SegFolder:
        def __init__(self, root):
            self.images = sorted((Path(root) / "images").glob("*"))
            self.masks = {p.stem: p for p in (Path(root) / "masks").glob("*")}

        def __len__(self):
            return len(self.images)

        def __getitem__(self, idx):
            img = Image.open(self.images[idx]).convert("RGB")
            mask = Image.open(self.masks[self.images[idx].stem])
            img = normalize_image(resize(img), mean, std)
            mask = np.asarray(mask_resize(np.asarray(mask)[..., None]))[..., 0].astype(np.int32)
            return img, mask

    return SegFolder(Path(args.data_path) / "train"), SegFolder(Path(args.data_path) / "val")


def main(args):
    print(args)

    # joins the multi-process jax runtime when launched on a pod (env-driven:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, auto-detected
    # on Cloud TPU); a no-op for single-process runs. Must run before any jax call.
    from holocron_tpu.parallel import initialize

    initialize()

    import jax.numpy as jnp

    from holocron_tpu import optim
    from holocron_tpu.models import segmentation
    from holocron_tpu.nn import functional as F
    from holocron_tpu.trainer import SegmentationTrainer
    from holocron_tpu.utils.data import DataLoader

    train_set, val_set = build_datasets(args)
    train_loader = DataLoader(
        train_set, args.batch_size, shuffle=True, num_workers=args.workers, drop_last=True, num_shards="auto"
    )
    val_loader = DataLoader(val_set, args.batch_size, num_workers=args.workers, num_shards="auto")

    model = segmentation.__dict__[args.arch](
        pretrained=args.pretrained, num_classes=args.num_classes
    )
    if args.pretrained and not model.pretrained_loaded:
        raise SystemExit(
            "--pretrained was requested but the released weights could not be loaded "
            "(offline or invalid URL) — refusing to continue with random initialization"
        )

    # class weighting: downweight background (reference segmentation/train.py:199-208)
    weight = jnp.ones(args.num_classes).at[0].set(args.bg_factor) if args.bg_factor != 1 else None
    if args.loss == "crossentropy":
        criterion = lambda out, tgt: F.cross_entropy(out, tgt, weight=weight, ignore_index=255)  # noqa: E731
    elif args.loss == "focal":
        criterion = lambda out, tgt: F.focal_loss(out, tgt, weight=weight, ignore_index=255)  # noqa: E731
    elif args.loss == "dice":
        import jax

        def criterion(out, tgt):
            probs = jax.nn.softmax(out, axis=-1)
            onehot = jax.nn.one_hot(jnp.clip(tgt, 0, args.num_classes - 1), args.num_classes)
            return F.dice_loss(probs, onehot, weight=weight)
    else:
        raise ValueError(f"unsupported loss: {args.loss}")

    import optax

    wd = args.weight_decay
    opt = {
        "adamw": lambda lr, weight_decay=wd: optax.adamw(lr, weight_decay=weight_decay),
        "adamp": lambda lr, weight_decay=wd: optim.adamp(lr, weight_decay=weight_decay),
        "radam": lambda lr, weight_decay=wd: optax.chain(
            optax.add_decayed_weights(weight_decay), optax.radam(lr, b1=0.95, b2=0.99, eps=1e-6)
        ),
        "adabelief": lambda lr, weight_decay=wd: optim.adabelief(lr, weight_decay=weight_decay),
    }[args.opt]

    trainer = SegmentationTrainer(
        model,
        train_loader,
        val_loader,
        criterion,
        opt,
        output_file=args.output_file,
        amp=args.amp,
        gradient_acc=args.grad_acc,
        model_parallel=args.model_parallel,
        spatial_parallel=args.spatial_parallel,
        shard_opt_state=args.shard_opt_state,
        num_classes=args.num_classes,
    )
    if args.resume:
        trainer.load(args.resume)
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

    import jax

    # multi-host: metrics are identical on every host — log from process 0 only
    if args.wb and jax.process_index() == 0:
        import wandb

        run = wandb.init(name=args.name, project="holocron-tpu-segmentation", config=vars(args))
        trainer.on_epoch_end = lambda metrics: run.log(metrics)

    print(f"Training {args.arch} for {args.epochs} epochs")
    start_time = time.time()
    trainer.fit_n_epochs(args.epochs, args.lr, args.freeze_until, args.sched, norm_weight_decay=args.norm_wd)
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - start_time))}")
    if args.wb and jax.process_index() == 0:
        run.finish()


def parse_args():
    parser = argparse.ArgumentParser(
        description="holocron-tpu segmentation training", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("data_path", type=str, help="dataset root ('fake' for synthetic data)")
    parser.add_argument("--arch", default="unet3p", type=str)
    parser.add_argument("--pretrained", action="store_true")
    parser.add_argument("--num-classes", default=21, type=int)
    parser.add_argument("--output-file", default="./checkpoint.ckpt")
    parser.add_argument("--resume", default="")
    parser.add_argument("--fake-samples", default=64, type=int)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument(
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
    parser.add_argument("-b", "--batch-size", default=16, type=int)
    parser.add_argument("-j", "--workers", default=8, type=int)
    parser.add_argument("--crop-size", default=256, type=int)
    parser.add_argument("--epochs", default=20, type=int)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--freeze-until", default=None, type=str)
    parser.add_argument("--grad-acc", default=1, type=int)
    parser.add_argument("--opt", default="adamp", type=str)
    parser.add_argument("--sched", default="onecycle", type=str)
    parser.add_argument("--wd", "--weight-decay", default=0, type=float, dest="weight_decay")
    parser.add_argument("--loss", default="crossentropy", type=str, choices=["crossentropy", "focal", "dice"])
    parser.add_argument("--bg-factor", default=1.0, type=float, help="background class weight")
    parser.add_argument("--norm-wd", default=None, type=float, help="weight decay of norm parameters")
    parser.add_argument("--find-lr", action="store_true")
    parser.add_argument("--check-setup", action="store_true")
    parser.add_argument("--test-only", action="store_true")
    parser.add_argument("--wb", action="store_true", help="log to Weights & Biases")
    parser.add_argument("--name", type=str, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
