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

    from PIL import Image

    mean, std = IMAGENETTE.mean, IMAGENETTE.std
    resize = Resize((args.img_size, args.img_size))

    class DetFolder:
        def __init__(self, root):
            self.images = sorted((Path(root) / "images").glob("*"))
            self.labels = {p.stem: p for p in (Path(root) / "labels").glob("*.json")}

        def __len__(self):
            return len(self.images)

        def __getitem__(self, idx):
            img = Image.open(self.images[idx]).convert("RGB")
            meta = json.loads(self.labels[self.images[idx].stem].read_text())
            arr = normalize_image(resize(img), mean, std)
            target = {
                "boxes": np.asarray(meta["boxes"], np.float32).reshape(-1, 4),
                "labels": np.asarray(meta["labels"], np.int64),
            }
            return arr, target

    return DetFolder(Path(args.data_path) / "train"), DetFolder(Path(args.data_path) / "val")


def main(args):
    print(args)

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
        train_set, args.batch_size, shuffle=True, num_workers=args.workers, drop_last=True, collate_fn=train_collate
    )
    val_loader = DataLoader(val_set, args.batch_size, num_workers=args.workers)

    model = detection.__dict__[args.arch](
        pretrained=args.pretrained, pretrained_backbone=args.pretrained_backbone, num_classes=args.num_classes
    )
    model.max_boxes = max_boxes
    if args.pretrained and not model.pretrained_loaded:
        raise SystemExit(
            "--pretrained was requested but the released weights could not be loaded "
            "(offline or invalid URL) — refusing to continue with random initialization"
        )

    opt = {
        "adamw": lambda lr: __import__("optax").adamw(lr, weight_decay=args.weight_decay),
        "adamp": lambda lr: optim.adamp(lr, weight_decay=args.weight_decay),
        "tadam": lambda lr: optim.tadam(lr, weight_decay=args.weight_decay),
        "radam": lambda lr: __import__("optax").radam(lr),
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
        gradient_clip=args.grad_clip,
    )
    if args.resume:
        trainer.load(args.resume)
    if args.check_setup:
        losses = trainer.check_setup(args.freeze_until, args.lr, num_it=10)
        print(f"overfit-one-batch losses: {losses[0]:.4f} -> {losses[-1]:.4f}")
        return
    if args.test_only:
        print(trainer._eval_metrics_str(trainer.evaluate()))
        return

    print(f"Training {args.arch} for {args.epochs} epochs")
    start_time = time.time()
    trainer.fit_n_epochs(args.epochs, args.lr, args.freeze_until, args.sched)
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - start_time))}")


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
    parser.add_argument("--check-setup", action="store_true")
    parser.add_argument("--test-only", action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
