from . import data
from .misc import find_image_size, parallel

__all__ = [
    "find_image_size",
    "parallel",
]
