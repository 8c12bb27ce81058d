"""Checkpoint metadata schema.

Reference: holocron/models/checkpoints.py — the same public ``default_cfg`` surface
(evaluation results, loading meta, preprocessing, training recipe), minus the torch
dependency: interpolation is a plain enum and ``input_shape`` is channel-last (H, W, C),
the TPU-native layout.
"""

import logging
from dataclasses import dataclass
from enum import Enum
from typing import Dict, List, Optional, Tuple

__all__ = [
    "Checkpoint",
    "Dataset",
    "Evaluation",
    "Interpolation",
    "LoadingMeta",
    "Metric",
    "PreProcessing",
    "TrainingRecipe",
]

logger = logging.getLogger(__name__)


class Interpolation(str, Enum):
    """Resize interpolation mode (replaces torchvision's InterpolationMode)."""

    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


@dataclass
class TrainingRecipe:
    """How a checkpoint was produced (holocron/models/checkpoints.py:26-37)."""

    commit: Optional[str]
    script: Optional[str]
    args: Optional[str]


class Metric(str, Enum):
    """Evaluation metric (holocron/models/checkpoints.py:40-44)."""

    TOP1_ACC = "top1-accuracy"
    TOP5_ACC = "top5-accuracy"


class Dataset(str, Enum):
    """Training/evaluation dataset (holocron/models/checkpoints.py:47-52)."""

    IMAGENET1K = "imagenet-1k"
    IMAGENETTE = "imagenette"
    CIFAR10 = "cifar10"


@dataclass
class Evaluation:
    """Results of model evaluation."""

    dataset: Dataset
    results: Dict[Metric, float]


@dataclass
class LoadingMeta:
    """Metadata to load the model."""

    url: str
    sha256: str
    size: int
    arch: str
    num_params: int
    categories: List[str]


@dataclass
class PreProcessing:
    """Preprocessing metadata. ``input_shape`` is channel-last ``(H, W, C)``."""

    input_shape: Tuple[int, ...]
    mean: Tuple[float, ...]
    std: Tuple[float, ...]
    interpolation: Interpolation = Interpolation.BILINEAR


@dataclass
class Checkpoint:
    """Everything required to run a model exactly as evaluated
    (holocron/models/checkpoints.py:86-96)."""

    evaluation: Evaluation
    meta: LoadingMeta
    pre_processing: PreProcessing
    recipe: TrainingRecipe


def _handle_legacy_pretrained(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    default_checkpoint: Optional[Checkpoint] = None,
) -> Optional[Checkpoint]:
    """Maps the legacy ``pretrained=True`` flag to the default checkpoint
    (holocron/models/checkpoints.py:99-109)."""
    checkpoint = checkpoint or (default_checkpoint if pretrained else None)
    if pretrained and checkpoint is None:
        logger.warning("Invalid model URL, using default initialization.")
    return checkpoint
