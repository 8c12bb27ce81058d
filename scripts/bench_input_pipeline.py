#!/usr/bin/env python
"""Benchmarks the host input pipeline: native (C++ fused decode) vs PIL.

Synthesizes an Imagenette-shaped fake-JPEG dataset, then measures images/sec through
the exact train/val pipelines the classification CLI builds (the work torch
DataLoader workers do in the reference, references/classification/train.py:137-146).

Usage: python scripts/bench_input_pipeline.py [--samples 512] [--batch-size 64]
"""

import argparse
import io
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthesize_dataset(root: Path, num_samples: int, num_classes: int = 4) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", num_samples), ("val", max(num_samples // 4, 16))):
        for cls in range(num_classes):
            d = root / split / f"class_{cls}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n // num_classes):
                h = int(rng.integers(280, 460))
                w = int(rng.integers(320, 520))
                arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=85)
                (d / f"img_{i}.jpg").write_bytes(buf.getvalue())


def bench_loader(loader) -> float:
    for _ in loader:  # warmup pass (thread pools, library init, page cache)
        pass
    n_imgs = 0
    start = time.perf_counter()
    for x, _ in loader:
        n_imgs += x.shape[0]
    elapsed = time.perf_counter() - start
    return n_imgs / elapsed


def main(args):
    from holocron_tpu.models.presets import IMAGENETTE
    from holocron_tpu.transforms import (
        Compose,
        RandomErasing,
        RandomHorizontalFlip,
        RandomResizedCrop,
        Resize,
        TrivialAugmentWide,
    )
    from holocron_tpu.utils.data import (
        DataLoader,
        ImageFolder,
        NativeImageFolder,
        decode_rrc_batch,
        native_available,
        native_collate,
        normalize_image,
    )

    mean, std = IMAGENETTE.mean, IMAGENETTE.std
    crop, val_resize, val_crop = args.train_crop_size, 232, 224
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        print(f"synthesizing {args.samples} fake JPEGs...")
        synthesize_dataset(root, args.samples)

        # --- PIL pipeline (the fallback path) ---
        taw = TrivialAugmentWide()
        pil_train_tf = Compose([
            RandomResizedCrop(crop, scale=(0.3, 1.0)),
            RandomHorizontalFlip(),
            taw,
            lambda img: normalize_image(img, mean, std),
            RandomErasing(p=0.5, scale=(0.02, 0.2)),
        ])

        def pil_val_tf(img):
            img = Resize((val_resize, val_resize))(img)
            arr = normalize_image(img, mean, std)
            off = (val_resize - val_crop) // 2
            return arr[off : off + val_crop, off : off + val_crop]

        pil_train = DataLoader(
            ImageFolder(root / "train", transform=pil_train_tf),
            args.batch_size, shuffle=True, num_workers=args.workers, drop_last=True,
        )
        pil_val = DataLoader(
            ImageFolder(root / "val", transform=pil_val_tf), args.batch_size, num_workers=args.workers
        )

        results = {
            "pil_train_imgs_per_s": bench_loader(pil_train),
            "pil_val_imgs_per_s": bench_loader(pil_val),
        }

        # --- native pipeline (the CLI's default when available) ---
        if native_available():
            from concurrent.futures import ThreadPoolExecutor

            mean_arr, std_arr = np.asarray(mean, np.float32), np.asarray(std, np.float32)
            erase = RandomErasing(p=0.5, scale=(0.02, 0.2))
            master_rng = np.random.default_rng(0)
            pool = ThreadPoolExecutor(args.workers)

            def augment_one(img_and_seed):
                img, seed = img_and_seed
                rng = np.random.default_rng(seed)
                x = (taw(img, rng=rng).astype(np.float32) / 255.0 - mean_arr) / std_arr
                return erase(x, rng=rng)

            def train_collate(batch):
                buffers, ys = zip(*batch)
                n = len(buffers)
                seeds = master_rng.integers(1, 2**63, size=2 * n, dtype=np.uint64)
                x_u8 = decode_rrc_batch(list(buffers), crop, crop, scale=(0.3, 1.0),
                                        seeds=seeds[:n], num_threads=args.workers)
                x = np.stack(list(pool.map(augment_one, zip(x_u8, seeds[n:]))))
                return np.ascontiguousarray(x), np.asarray(ys)

            nat_train = DataLoader(
                NativeImageFolder(root / "train"), args.batch_size, shuffle=True,
                num_workers=args.workers, drop_last=True, collate_fn=train_collate,
            )
            nat_val = DataLoader(
                NativeImageFolder(root / "val"), args.batch_size, num_workers=args.workers,
                collate_fn=native_collate(val_resize, val_resize, mean, std,
                                          center_crop=val_crop, num_threads=args.workers),
            )
            results["native_train_imgs_per_s"] = bench_loader(nat_train)
            results["native_val_imgs_per_s"] = bench_loader(nat_val)
            results["train_speedup"] = results["native_train_imgs_per_s"] / results["pil_train_imgs_per_s"]
            results["val_speedup"] = results["native_val_imgs_per_s"] / results["pil_val_imgs_per_s"]
        else:
            print("native loader unavailable; PIL numbers only")

    for k, v in results.items():
        print(f"{k}: {v:.1f}")
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", default=512, type=int)
    parser.add_argument("--batch-size", default=64, type=int)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--train-crop-size", default=176, type=int)
    main(parser.parse_args())
