"""Host-side image transforms: flexible resize and random zoom-out.

Reference: holocron/transforms/interpolation.py. These run in the input pipeline on
PIL images or ``(H, W, C)`` numpy arrays (channel-last — this package's layout), the
device-side preprocessing (dtype/normalize) being fused into the jitted step.
"""

from enum import Enum
from math import sqrt
from typing import Any, Optional, Tuple

import numpy as np

__all__ = ["RandomZoomOut", "Resize", "ResizeMethod"]


class ResizeMethod(str, Enum):
    """Resize methods: ``squish`` (plain resize) or ``pad`` (aspect-preserving + pad)."""

    SQUISH = "squish"
    PAD = "pad"


def _get_image_shape(image) -> Tuple[int, int]:
    if isinstance(image, np.ndarray):
        if image.ndim != 3:
            raise ValueError("the input array is expected to be 3-dimensional (H, W, C)")
        return image.shape[0], image.shape[1]
    if hasattr(image, "size") and hasattr(image, "resize"):  # PIL
        w, h = image.size
        return h, w
    raise TypeError("expected arg 'image' to be a PIL image or a numpy array")


def _resize(image, size: Tuple[int, int], interpolation: str = "bilinear"):
    """Resize to (h, w), preserving input type."""
    h, w = size
    if isinstance(image, np.ndarray):
        import jax

        out = jax.image.resize(image.astype(np.float32), (h, w, image.shape[2]), method=interpolation)
        return np.asarray(out).astype(image.dtype)
    from PIL import Image

    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}[interpolation]
    return image.resize((w, h), resample)


def _pad(image, padding: Tuple[int, int, int, int], pad_mode: str = "constant"):
    """Pad with (left, top, right, bottom), preserving input type."""
    left, top, right, bottom = padding
    if isinstance(image, np.ndarray):
        np_mode = {"constant": "constant", "edge": "edge", "reflect": "reflect", "symmetric": "symmetric"}[pad_mode]
        return np.pad(image, ((top, bottom), (left, right), (0, 0)), mode=np_mode)
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = arr[..., None]
    padded = _pad(arr, padding, pad_mode)
    from PIL import Image

    return Image.fromarray(padded.squeeze(-1) if padded.shape[-1] == 1 else padded)


class Resize:
    """Flexible resize (reference interpolation.py:41-97): ``squish`` matches a plain
    resize; ``pad`` preserves the aspect ratio then symmetrically pads.

    >>> tf = Resize((224, 224), mode=ResizeMethod.PAD)
    >>> resized = tf(img)
    """

    def __init__(
        self,
        size: Tuple[int, int],
        mode: ResizeMethod = ResizeMethod.SQUISH,
        pad_mode: str = "constant",
        interpolation: str = "bilinear",
        **kwargs: Any,
    ) -> None:
        if not isinstance(mode, ResizeMethod):
            raise ValueError("mode is expected to be a ResizeMethod")
        if not isinstance(size, (tuple, list)) or len(size) != 2 or any(s <= 0 for s in size):
            raise ValueError("size is expected to be a sequence of 2 positive integers")
        self.size = tuple(size)
        self.mode = mode
        self.pad_mode = pad_mode
        self.interpolation = interpolation

    def get_params(self, image) -> Tuple[int, int]:
        h, w = _get_image_shape(image)
        o_ratio = h / w
        if self.size[0] / self.size[1] > o_ratio:
            return round(self.size[1] * o_ratio), self.size[1]
        return self.size[0], round(self.size[0] / o_ratio)

    def __call__(self, image):
        _get_image_shape(image)  # type validation
        if self.mode == ResizeMethod.SQUISH:
            return _resize(image, self.size, self.interpolation)
        h, w = self.get_params(image)
        img = _resize(image, (h, w), self.interpolation)
        h_pad, w_pad = self.size[0] - h, self.size[1] - w
        padding = (w_pad // 2, h_pad // 2, w_pad - w_pad // 2, h_pad - h_pad // 2)
        return _pad(img, padding, self.pad_mode)


class RandomZoomOut:
    """Random zoom-out (reference interpolation.py:99-156): shrink to a random scale
    (area-relative, aspect-preserving) then pad up to the target size.

    >>> tf = RandomZoomOut((224, 224), scale=(0.3, 1.0))
    """

    def __init__(
        self,
        size: Tuple[int, int],
        scale: Tuple[float, float] = (0.5, 1.0),
        interpolation: str = "bilinear",
        seed: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        if not isinstance(size, (tuple, list)) or len(size) != 2 or any(s <= 0 for s in size):
            raise ValueError("size is expected to be a sequence of 2 positive integers")
        if len(scale) != 2 or scale[0] > scale[1]:
            raise ValueError("scale is expected to be a couple of floats, the first one being small than the second")
        self.size = tuple(size)
        self.scale = tuple(scale)
        self.interpolation = interpolation
        self._rng = np.random.default_rng(seed)

    def get_params(self, image) -> Tuple[int, int]:
        h, w = _get_image_shape(image)
        scale = (self.scale[1] - self.scale[0]) * float(self._rng.random()) + self.scale[0]
        aratio = h / w
        tratio = self.size[0] / self.size[1]
        max_area = self.size[1] ** 2 * aratio if tratio > aratio else self.size[0] ** 2 / aratio
        area = max_area * scale
        w_ = round(sqrt(area / aratio))
        h_ = round(area / w_)
        return h_, w_

    def __call__(self, image):
        if self.scale[0] == 1:
            return image
        h, w = self.get_params(image)
        img = _resize(image, (h, w), self.interpolation)
        h_delta, w_delta = self.size[0] - h, self.size[1] - w
        padding = (w_delta // 2, h_delta // 2, w_delta - w_delta // 2, h_delta - h_delta // 2)
        return _pad(img, padding)
