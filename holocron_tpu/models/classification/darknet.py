"""Darknet-24 — the YOLOv1 backbone (`Redmon et al.
<https://pjreddie.com/media/files/papers/yolo_1.pdf>`_).

Reference: holocron/models/classification/darknet.py. No normalization by default
(convs carry biases), LeakyReLU(0.1) activations.
"""

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import Model
from ..layers import max_pool2d
from ..presets import IMAGENETTE
from ..utils import ConvSequence, load_pretrained_params

__all__ = ["DarknetV1", "darknet24"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "darknet24": {
        **IMAGENETTE.__dict__,
        "input_shape": (224, 224, 3),
        "url": "https://github.com/frgfm/Holocron/releases/download/v0.1.3/darknet24_224-816d72cb.pt",
    },
}

leaky_relu_01 = partial(jax.nn.leaky_relu, negative_slope=0.1)


class DarknetBodyV1(nn.Module):
    """Stem 7x7/s2 + per-group (maxpool2 -> alternating 3x3/1x1 convs)
    (reference darknet.py:29-101)."""

    layout: Sequence[Sequence[int]]
    in_channels: int = 3
    stem_channels: int = 64
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = None
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
        x = ConvSequence(self.stem_channels, kernel_size=7, padding=3, stride=2, name="stem", **common)(x, train)
        for i, planes in enumerate(self.layout):
            x = max_pool2d(x, 2, 2)
            in_planes = x.shape[-1]
            for j, out_planes in enumerate(planes):
                ksize = 3 if out_planes > in_planes else 1
                x = ConvSequence(
                    out_planes,
                    kernel_size=ksize,
                    padding=ksize // 2,
                    name=f"layer_{i}_{j}",
                    **common,
                )(x, train)
                in_planes = out_planes
        return x


class DarknetV1(nn.Module):
    """Darknet-24 classifier (reference darknet.py:104-129)."""

    layout: Sequence[Sequence[int]]
    num_classes: int = 10
    in_channels: int = 3
    stem_channels: int = 64
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = DarknetBodyV1(
            self.layout,
            self.in_channels,
            self.stem_channels,
            self.act_layer,
            self.norm_layer,
            self.drop_layer,
            self.conv_layer,
            self.dtype,
            name="features",
        )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def _darknet(arch: str, pretrained: bool, progress: bool, layout, **kwargs: Any) -> Model:
    model = Model(DarknetV1(layout, **kwargs))
    model.default_cfg = default_cfgs[arch]  # legacy dict cfg, like the reference
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def darknet24(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """Darknet-24 (reference darknet.py:143-166)."""
    return _darknet(
        "darknet24",
        pretrained,
        progress,
        [[192], [128, 256, 256, 512], [*([256, 512] * 4), 512, 1024], [512, 1024] * 2],
        **kwargs,
    )
