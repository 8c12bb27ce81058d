"""Functional transforms: just enough for the reference's interpolation.py
(resize/pad on PIL images or CHW tensors) and trainer (to_pil_image)."""

from enum import Enum
from typing import List, Optional, Union

import torch


class InterpolationMode(Enum):
    NEAREST = "nearest"
    NEAREST_EXACT = "nearest-exact"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    BOX = "box"
    HAMMING = "hamming"
    LANCZOS = "lanczos"


_PIL_MODES = {
    InterpolationMode.NEAREST: 0,
    InterpolationMode.LANCZOS: 1,
    InterpolationMode.BILINEAR: 2,
    InterpolationMode.BICUBIC: 3,
    InterpolationMode.BOX: 4,
    InterpolationMode.HAMMING: 5,
}


def _is_pil(img) -> bool:
    return not isinstance(img, torch.Tensor)


def resize(
    img,
    size: Union[int, List[int]],
    interpolation: InterpolationMode = InterpolationMode.BILINEAR,
    max_size: Optional[int] = None,
    antialias: Optional[bool] = True,
):
    if isinstance(size, int):
        size = [size, size]
    h, w = int(size[0]), int(size[-1]) if len(size) > 1 else int(size[0])
    if _is_pil(img):
        return img.resize((w, h), _PIL_MODES.get(interpolation, 2))
    mode = interpolation.value if isinstance(interpolation, InterpolationMode) else str(interpolation)
    x = img.unsqueeze(0).float()
    out = torch.nn.functional.interpolate(
        x, size=(h, w), mode=mode, align_corners=False if mode in ("bilinear", "bicubic") else None,
        antialias=bool(antialias) if mode in ("bilinear", "bicubic") else False,
    )
    return out.squeeze(0).to(img.dtype)


def pad(img, padding, fill: int = 0, padding_mode: str = "constant"):
    if isinstance(padding, int):
        padding = [padding] * 4
    if len(padding) == 2:
        padding = [padding[0], padding[1], padding[0], padding[1]]
    left, top, right, bottom = padding
    if _is_pil(img):
        from PIL import ImageOps

        if padding_mode == "constant":
            return ImageOps.expand(img, border=(left, top, right, bottom), fill=fill)
        import numpy as np
        from PIL import Image

        np_mode = {"edge": "edge", "reflect": "reflect", "symmetric": "symmetric"}[padding_mode]
        arr = np.asarray(img)
        pads = [(top, bottom), (left, right)] + [(0, 0)] * (arr.ndim - 2)
        return Image.fromarray(np.pad(arr, pads, mode=np_mode))
    mode = {"constant": "constant", "edge": "replicate", "reflect": "reflect"}[padding_mode]
    return torch.nn.functional.pad(img, (left, right, top, bottom), mode=mode, value=fill)


def to_pil_image(pic, mode=None):
    import numpy as np
    from PIL import Image

    if isinstance(pic, torch.Tensor):
        arr = pic.detach().cpu()
        if arr.dtype.is_floating_point:
            arr = (arr.clamp(0, 1) * 255).to(torch.uint8)
        arr = arr.numpy()
        if arr.ndim == 3:
            arr = arr.transpose(1, 2, 0)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
    else:
        arr = np.asarray(pic)
    return Image.fromarray(arr, mode=mode)
