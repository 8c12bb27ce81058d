"""Darknet-19 — the YOLOv2 backbone (`Redmon & Farhadi
<https://pjreddie.com/media/files/papers/YOLO9000.pdf>`_).

Reference: holocron/models/classification/darknetv2.py, incl. the ``passthrough``
forward that also returns the second-to-last stage's features (darknetv2.py:141-151).
"""

from enum import Enum
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..layers import max_pool2d
from ..utils import ConvSequence, _checkpoint, _configure_model

__all__ = ["Darknet19_Checkpoint", "DarknetV2", "darknet19"]

leaky_relu_01 = partial(jax.nn.leaky_relu, negative_slope=0.1)


class DarknetBodyV2(nn.Module):
    """Stem 3x3 + per-group (maxpool2 -> 3x3 -> num_blocks x (1x1 half, 3x3 full))
    (reference darknetv2.py:32-151)."""

    layout: Sequence[Tuple[int, int]]
    in_channels: int = 3
    stem_channels: int = 32
    passthrough: bool = False
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        x = ConvSequence(self.stem_channels, kernel_size=3, padding=1, name="stem", **common)(x, train)
        aux = None
        for i, (out_chans, num_blocks) in enumerate(self.layout):
            x = max_pool2d(x, 2, 2)
            x = ConvSequence(out_chans, kernel_size=3, padding=1, name=f"layer_{i}_0", **common)(x, train)
            for b in range(num_blocks):
                x = ConvSequence(out_chans // 2, kernel_size=1, name=f"layer_{i}_{2 * b + 1}", **common)(x, train)
                x = ConvSequence(out_chans, kernel_size=3, padding=1, name=f"layer_{i}_{2 * b + 2}", **common)(x, train)
            if i == len(self.layout) - 2:
                aux = x
        if self.passthrough:
            return x, aux
        return x


class DarknetV2(nn.Module):
    """Darknet-19 classifier: body -> 1x1 conv classifier -> GAP
    (reference darknetv2.py:153-185)."""

    layout: Sequence[Tuple[int, int]]
    num_classes: int = 10
    in_channels: int = 3
    stem_channels: int = 32
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = DarknetBodyV2(
            self.layout,
            self.in_channels,
            self.stem_channels,
            False,
            self.act_layer,
            self.norm_layer,
            self.drop_layer,
            self.conv_layer,
            self.dtype,
            name="features",
        )(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(x)
        return jnp.mean(x, axis=(1, 2))


def _darknet(checkpoint: Optional[Checkpoint], progress: bool, layout, **kwargs: Any) -> Model:
    return _configure_model(Model(DarknetV2(layout, **kwargs)), checkpoint, progress=progress)


class Darknet19_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="darknet19",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/darknet19_224-32fd3f97.pth",
        acc1=0.9386,
        acc5=0.9936,
        sha256="32fd3f979586556554652d650c44a59747c7762d81140cadbcd795179a3877ec",
        size=79387724,
        num_params=19827626,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch darknet19 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def darknet19(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """Darknet-19 (reference darknetv2.py:211-237)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, Darknet19_Checkpoint.DEFAULT.value)
    return _darknet(checkpoint, progress, [(64, 0), (128, 1), (256, 1), (512, 2), (1024, 2)], **kwargs)
