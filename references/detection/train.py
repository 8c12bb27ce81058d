#!/usr/bin/env python
"""Object detection training CLI.

TPU-native analog of references/detection/train.py (VOC-style training with box-aware
transforms). Pass ``fake`` as data_path for synthetic data. Real data layout:
``<root>/{train,val}/images/*.jpg`` + matching ``<root>/{train,val}/labels/*.json``
with {"boxes": [[xmin,ymin,xmax,ymax] relative], "labels": [int]}.
"""

import argparse
import datetime
import json
import time
from pathlib import Path

import numpy as np


def build_datasets(args):
    from holocron_tpu.models.presets import IMAGENETTE
    from holocron_tpu.transforms import Resize
    from holocron_tpu.utils.data import SyntheticDataset, normalize_image

    if args.data_path == "fake":
        shape = (args.img_size, args.img_size, 3)
        return (
            SyntheticDataset(args.fake_samples, shape, args.num_classes, task="detection"),
            SyntheticDataset(max(args.fake_samples // 4, args.batch_size), shape, args.num_classes, task="detection", seed=1),
        )

    import sys

    from PIL import Image

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from transforms import (
        Compose as BoxCompose,
        RandomHorizontalFlip as BoxFlip,
        Resize as BoxResize,
        convert_to_relative,
    )

    mean, std = IMAGENETTE.mean, IMAGENETTE.std
    resize = Resize((args.img_size, args.img_size))
    # box-aware train augmentation (reference references/detection/train.py uses the
    # same Compose/Resize/flip stack from its transforms module)
    train_tf = BoxCompose([BoxResize((args.img_size, args.img_size)), BoxFlip(p=0.5)])
    val_tf = BoxResize((args.img_size, args.img_size))

    class DetFolder:
        def __init__(self, root, tf):
            self.images = sorted((Path(root) / "images").glob("*"))
            self.labels = {p.stem: p for p in (Path(root) / "labels").glob("*.json")}
            self.tf = tf

        def __len__(self):
            return len(self.images)

        def __getitem__(self, idx):
            img = np.asarray(Image.open(self.images[idx]).convert("RGB"))
            meta = json.loads(self.labels[self.images[idx].stem].read_text())
            target = {
                # stored relative [0, 1]; box transforms work in absolute pixels
                "boxes": np.asarray(meta["boxes"], np.float32).reshape(-1, 4)
                * np.asarray([img.shape[1], img.shape[0]] * 2, np.float32),
                "labels": np.asarray(meta["labels"], np.int64),
            }
            img, target = self.tf(img, target)
            img, target = convert_to_relative(img, target)
            return normalize_image(img, mean, std), target

    return DetFolder(Path(args.data_path) / "train", train_tf), DetFolder(Path(args.data_path) / "val", val_tf)


def main(args):
    print(args)

    # joins the multi-process jax runtime when launched on a pod (env-driven:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, auto-detected
    # on Cloud TPU); a no-op for single-process runs. Must run before any jax call.
    from holocron_tpu.parallel import initialize

    initialize()

    from holocron_tpu import optim
    from holocron_tpu.models import detection
    from holocron_tpu.models.detection import pad_targets
    from holocron_tpu.trainer import DetectionTrainer
    from holocron_tpu.utils.data import DataLoader, default_collate

    train_set, val_set = build_datasets(args)

    max_boxes = args.max_boxes

    def train_collate(batch):
        x, targets = default_collate(batch)
        return x, pad_targets(targets, max_boxes)

    train_loader = DataLoader(
        train_set, args.batch_size, shuffle=True, num_workers=args.workers, drop_last=True,
        collate_fn=train_collate, num_shards="auto",
    )
    val_loader = DataLoader(val_set, args.batch_size, num_workers=args.workers, num_shards="auto")

    model = detection.__dict__[args.arch](
        pretrained=args.pretrained, pretrained_backbone=args.pretrained_backbone, num_classes=args.num_classes
    )
    model.max_boxes = max_boxes
    if args.pretrained and not model.pretrained_loaded:
        raise SystemExit(
            "--pretrained was requested but the released weights could not be loaded "
            "(offline or invalid URL) — refusing to continue with random initialization"
        )

    import optax

    wd = args.weight_decay
    opt = {
        "adamw": lambda lr, weight_decay=wd: optax.adamw(lr, weight_decay=weight_decay),
        "adamp": lambda lr, weight_decay=wd: optim.adamp(lr, weight_decay=weight_decay),
        "tadam": lambda lr, weight_decay=wd: optim.tadam(lr, weight_decay=weight_decay),
        "radam": lambda lr, weight_decay=wd: optax.chain(
            optax.add_decayed_weights(weight_decay), optax.radam(lr, b1=0.95, b2=0.99, eps=1e-6)
        ),
    }[args.opt]

    trainer = DetectionTrainer(
        model,
        train_loader,
        val_loader,
        None,
        opt,
        output_file=args.output_file,
        amp=args.amp,
        gradient_acc=args.grad_acc,
        model_parallel=args.model_parallel,
        spatial_parallel=args.spatial_parallel,
        shard_opt_state=args.shard_opt_state,
        gradient_clip=args.grad_clip,
    )
    if args.resume:
        trainer.load(args.resume)
    if args.find_lr:
        trainer.find_lr(args.freeze_until, num_it=min(len(train_loader), 100), norm_weight_decay=args.norm_wd)
        for lr, loss in zip(trainer.lr_recorder, trainer.loss_recorder):
            print(f"lr={lr:.2e} loss={loss:.4f}")
        return
    if args.check_setup:
        losses = trainer.check_setup(args.freeze_until, args.lr, norm_weight_decay=args.norm_wd, num_it=10)
        print(f"overfit-one-batch losses: {losses[0]:.4f} -> {losses[-1]:.4f}")
        return
    if args.test_only:
        print(trainer._eval_metrics_str(trainer.evaluate()))
        return

    import jax

    # multi-host: metrics are identical on every host — log from process 0 only
    if args.wb and jax.process_index() == 0:
        import wandb

        run = wandb.init(name=args.name, project="holocron-tpu-detection", config=vars(args))
        trainer.on_epoch_end = lambda metrics: run.log(metrics)

    print(f"Training {args.arch} for {args.epochs} epochs")
    start_time = time.time()
    trainer.fit_n_epochs(args.epochs, args.lr, args.freeze_until, args.sched, norm_weight_decay=args.norm_wd)
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - start_time))}")
    if args.wb and jax.process_index() == 0:
        run.finish()


def parse_args():
    parser = argparse.ArgumentParser(
        description="holocron-tpu detection training", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("data_path", type=str, help="dataset root ('fake' for synthetic data)")
    parser.add_argument("--arch", default="yolov2", type=str)
    parser.add_argument("--pretrained", action="store_true")
    parser.add_argument("--pretrained-backbone", action="store_true")
    parser.add_argument("--num-classes", default=20, type=int)
    parser.add_argument("--output-file", default="./checkpoint.ckpt")
    parser.add_argument("--resume", default="")
    parser.add_argument("--fake-samples", default=32, type=int)
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
    parser.add_argument("-b", "--batch-size", default=8, type=int)
    parser.add_argument("-j", "--workers", default=8, type=int)
    parser.add_argument("--img-size", default=416, type=int)
    parser.add_argument("--max-boxes", default=50, type=int, help="GT padding size (static shapes under jit)")
    parser.add_argument("--epochs", default=40, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--freeze-until", default=None, type=str)
    parser.add_argument("--grad-acc", default=1, type=int)
    parser.add_argument("--grad-clip", default=None, type=float)
    parser.add_argument("--opt", default="tadam", type=str)
    parser.add_argument("--sched", default="onecycle", type=str)
    parser.add_argument("--wd", "--weight-decay", default=0, type=float, dest="weight_decay")
    parser.add_argument("--norm-wd", default=None, type=float, help="weight decay of norm parameters")
    parser.add_argument("--find-lr", action="store_true")
    parser.add_argument("--check-setup", action="store_true")
    parser.add_argument("--test-only", action="store_true")
    parser.add_argument("--wb", action="store_true", help="log to Weights & Biases")
    parser.add_argument("--name", type=str, default=None)
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
