"""Darknet-53 — the YOLOv3 backbone (`Redmon & Farhadi
<https://pjreddie.com/media/files/papers/YOLOv3.pdf>`_).

Reference: holocron/models/classification/darknetv3.py, incl. the residual ResBlock
with optional post-residual DropBlock and the multi-feature forward used by YOLO necks
(darknetv3.py:152-166).
"""

from enum import Enum
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.modules.dropblock import DropBlock2d
from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..utils import ConvSequence, _checkpoint, _configure_model

__all__ = ["Darknet53_Checkpoint", "DarknetV3", "ResBlock", "darknet53"]

leaky_relu_01 = partial(jax.nn.leaky_relu, negative_slope=0.1)


class ResBlock(nn.Module):
    """1x1 squeeze -> 3x3 expand -> residual add (-> optional DropBlock)
    (reference darknetv3.py:23-70)."""

    planes: int
    mid_planes: int
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        out = ConvSequence(self.mid_planes, kernel_size=1, name="conv_0", **common)(x, train)
        out = ConvSequence(self.planes, kernel_size=3, padding=1, name="conv_1", **common)(out, train)
        out = out + x
        if self.drop_layer is not None:
            out = DropBlock2d(0.1, 7, name="dropblock")(out, train)
        return out


class DarknetBodyV3(nn.Module):
    """Stem 3x3 + per-stage (3x3/s2 conv -> num_blocks ResBlocks); can return the last
    ``num_features`` stage outputs for detection necks (reference darknetv3.py:73-166)."""

    layout: Sequence[Tuple[int, int]]
    in_channels: int = 3
    stem_channels: int = 32
    num_features: int = 1
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Union[jax.Array, List[jax.Array]]:
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        x = ConvSequence(self.stem_channels, kernel_size=3, padding=1, name="stem", **common)(x, train)
        features = []
        for i, (out_chans, num_blocks) in enumerate(self.layout):
            x = ConvSequence(out_chans, kernel_size=3, padding=1, stride=2, name=f"layer_{i}_conv", **common)(x, train)
            for b in range(num_blocks):
                x = ResBlock(
                    out_chans,
                    out_chans // 2,
                    self.act_layer,
                    self.norm_layer,
                    self.drop_layer,
                    self.conv_layer,
                    self.dtype,
                    name=f"layer_{i}_block_{b}",
                )(x, train)
            if i >= len(self.layout) - self.num_features:
                features.append(x)
        if self.num_features == 1:
            return x
        return features


class DarknetV3(nn.Module):
    """Darknet-53 classifier (reference darknetv3.py:169-196)."""

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
        x = DarknetBodyV3(
            self.layout,
            self.in_channels,
            self.stem_channels,
            1,
            self.act_layer,
            self.norm_layer,
            self.drop_layer,
            self.conv_layer,
            self.dtype,
            name="features",
        )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def _darknet(checkpoint: Optional[Checkpoint], progress: bool, layout, **kwargs: Any) -> Model:
    return _configure_model(Model(DarknetV3(layout, **kwargs)), checkpoint, progress=progress)


class Darknet53_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="darknet53",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/darknet53_224-5015f3fd.pth",
        acc1=0.9417,
        acc5=0.9957,
        sha256="5015f3fdf0963342e0c54790127350375ba269d871feed48f8328b2e43cf7819",
        size=162584273,
        num_params=40595178,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch darknet53 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def darknet53(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """Darknet-53 (reference darknetv3.py:224-250)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, Darknet53_Checkpoint.DEFAULT.value)
    return _darknet(checkpoint, progress, [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)], **kwargs)
