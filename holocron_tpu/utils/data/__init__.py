from .cifar import CIFAR10, CIFAR100
from .collate import Mixup
from .loader import DataLoader, ImageFolder, SyntheticDataset, default_collate, normalize_image, prefetch
