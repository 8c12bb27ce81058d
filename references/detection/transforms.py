"""Box-aware transformations for object detection.

Analog of the reference's references/detection/transforms.py:15-127 on PIL images /
numpy HWC arrays with numpy box targets ({"boxes": (N,4) xyxy absolute, "labels": (N,)}).
"""

import numpy as np

from holocron_tpu.transforms.interpolation import _get_image_shape, _resize

__all__ = [
    "CenterCrop",
    "Compose",
    "ImageTransform",
    "RandomHorizontalFlip",
    "Resize",
    "VOCTargetTransform",
    "convert_to_relative",
]


class VOCTargetTransform:
    """Parses a VOC annotation dict into {boxes, labels} arrays
    (reference transforms.py:15-36)."""

    def __init__(self, classes):
        self.class_map = {label: idx for idx, label in enumerate(classes)}

    def __call__(self, image, target):
        objs = target["annotation"]["object"]
        boxes = np.asarray(
            [
                [int(o["bndbox"]["xmin"]), int(o["bndbox"]["ymin"]), int(o["bndbox"]["xmax"]), int(o["bndbox"]["ymax"])]
                for o in objs
            ],
            dtype=np.float32,
        ).reshape(-1, 4)
        labels = np.asarray([self.class_map[o["name"]] for o in objs], dtype=np.int64)
        return image, {"boxes": boxes, "labels": labels}


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, image, target):
        for t in self.transforms:
            image, target = t(image, target)
        return image, target


class ImageTransform:
    """Applies an image-only transform, passing the target through
    (reference transforms.py:45-54)."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, image, target):
        return self.transform(image), target


class Resize:
    """Resizes image + boxes (reference transforms.py:71-82). ``size`` is (h, w)."""

    def __init__(self, size, interpolation: str = "bilinear"):
        self.size = size if isinstance(size, tuple) else (size, size)
        self.interpolation = interpolation

    def __call__(self, image, target):
        h, w = _get_image_shape(image)
        boxes = np.array(target["boxes"], dtype=np.float32)
        boxes[:, [0, 2]] *= self.size[1] / w
        boxes[:, [1, 3]] *= self.size[0] / h
        return _resize(image, self.size, self.interpolation), {**target, "boxes": boxes}


class CenterCrop:
    """Center crop with box clamping (reference transforms.py:57-68). ``size`` is (h, w)."""

    def __init__(self, size):
        self.size = size if isinstance(size, tuple) else (size, size)

    def __call__(self, image, target):
        h, w = _get_image_shape(image)
        ch, cw = self.size
        y = int(h / 2 - ch / 2)
        x = int(w / 2 - cw / 2)
        if isinstance(image, np.ndarray):
            image = image[y : y + ch, x : x + cw]
        else:
            image = image.crop((x, y, x + cw, y + ch))
        boxes = np.array(target["boxes"], dtype=np.float32)
        boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], x, x + cw) - x
        boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], y, y + ch) - y
        return image, {**target, "boxes": boxes}


class RandomHorizontalFlip:
    """Flips image + boxes with probability p (reference transforms.py:118-127)."""

    def __init__(self, p: float = 0.5, seed=None):
        self.p = p
        self._rng = np.random.default_rng(seed)

    def __call__(self, image, target):
        if self._rng.random() < self.p:
            h, w = _get_image_shape(image)
            if isinstance(image, np.ndarray):
                image = np.ascontiguousarray(image[:, ::-1])
            else:
                from PIL import Image

                image = image.transpose(Image.FLIP_LEFT_RIGHT)
            boxes = np.array(target["boxes"], dtype=np.float32)
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
            target = {**target, "boxes": boxes}
        return image, target


def convert_to_relative(image, target):
    """Normalizes boxes to [0, 1] (reference transforms.py:106-115)."""
    h, w = _get_image_shape(image)
    boxes = np.array(target["boxes"], dtype=np.float32)
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]] / w, 0, 1)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]] / h, 0, 1)
    return image, {**target, "boxes": boxes}
