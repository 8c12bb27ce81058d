from . import boxes
from .boxes import *

__all__ = [
    "box_giou",
    "box_iou",
    "ciou_loss",
    "diou_loss",
]
