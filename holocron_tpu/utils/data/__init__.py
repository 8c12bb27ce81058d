from ._native import NativeImageFolder, decode_batch, decode_batch_u8, decode_rrc_batch, native_available, native_collate
from .cifar import CIFAR10, CIFAR100
from .collate import Mixup
from .loader import DataLoader, ImageFolder, SyntheticDataset, default_collate, normalize_image, prefetch

__all__ = [
    "CIFAR10",
    "CIFAR100",
    "DataLoader",
    "ImageFolder",
    "Mixup",
    "NativeImageFolder",
    "SyntheticDataset",
    "decode_batch",
    "decode_batch_u8",
    "decode_rrc_batch",
    "default_collate",
    "native_available",
    "native_collate",
    "normalize_image",
    "prefetch",
]
