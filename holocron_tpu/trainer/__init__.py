from .classification import BinaryClassificationTrainer, ClassificationTrainer
from .core import Trainer
from .detection import DetectionTrainer
from .segmentation import SegmentationTrainer
from .utils import freeze_bn, freeze_model, norm_param_mask, split_normalization_params, trainable_mask

__all__ = [
    "BinaryClassificationTrainer",
    "ClassificationTrainer",
    "DetectionTrainer",
    "SegmentationTrainer",
    "Trainer",
    "freeze_bn",
    "freeze_model",
    "norm_param_mask",
    "split_normalization_params",
    "trainable_mask",
]
