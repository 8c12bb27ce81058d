"""Dataset presets: normalization statistics and class names.

Reference: holocron/models/presets.py (which inlines the 1k ImageNet names). Here the
label data lives in ``_data/presets.json`` and is loaded once at import.
"""

import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Tuple

__all__ = ["CIFAR10", "IMAGENET", "IMAGENETTE"]


@dataclass
class _Dataset:
    mean: Tuple[float, ...]
    std: Tuple[float, ...]
    classes: List[str]


def _load(name: str) -> _Dataset:
    data = json.loads((Path(__file__).parent / "_data" / "presets.json").read_text())[name]
    return _Dataset(mean=tuple(data["mean"]), std=tuple(data["std"]), classes=data["classes"])


IMAGENET = _load("IMAGENET")
IMAGENETTE = _load("IMAGENETTE")
CIFAR10 = _load("CIFAR10")
