from .augment import Compose, RandomErasing, RandomHorizontalFlip, RandomResizedCrop, TrivialAugmentWide
from .functional import fused_preprocess
from .interpolation import RandomZoomOut, Resize, ResizeMethod

__all__ = [
    "Compose",
    "RandomErasing",
    "RandomHorizontalFlip",
    "RandomResizedCrop",
    "RandomZoomOut",
    "Resize",
    "ResizeMethod",
    "TrivialAugmentWide",
    "fused_preprocess",
]
