from .collate import Mixup
