"""Res2Net (`Gao et al. <https://arxiv.org/pdf/1904.01169.pdf>`_).

Reference: holocron/models/classification/res2net.py (based on timm's res2net).
Bottle2neck: 1x1 widen -> ScaleConv2d (multi-scale cascaded splits) -> 1x1 project.
"""

from enum import Enum
from math import floor
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..layers import avg_pool2d
from ..utils import ConvSequence, _checkpoint, _configure_model
from .resnet import ResNet, _Downsample

__all__ = ["Bottle2neck", "Res2Net50_26w_4s_Checkpoint", "res2net50_26w_4s"]


class ScaleConv2d(nn.Module):
    """Multi-scale conv: split channels into ``scale`` width-groups, run cascaded
    convs with residual adds, keep the last split as a shortcut
    (reference res2net.py:25-82)."""

    scale: int
    planes: int
    stride: int = 1
    groups: int = 1
    downsample: bool = False
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = self.planes // self.scale
        splits = [x[..., i * width : (i + 1) * width] for i in range(self.scale)]
        outs = []
        for idx in range(max(1, self.scale - 1)):
            res = splits[idx] if idx == 0 or self.downsample else outs[-1] + splits[idx]
            outs.append(
                ConvSequence(
                    width,
                    kernel_size=3,
                    stride=self.stride,
                    padding=1,
                    groups=self.groups,
                    act_layer=self.act_layer,
                    norm_layer=self.norm_layer,
                    drop_layer=self.drop_layer,
                    dtype=self.dtype,
                    name=f"conv_{idx}",
                )(res, train)
            )
        if self.scale > 1:
            if self.downsample:
                outs.append(avg_pool2d(splits[-1], 3, self.stride, padding=1))
            else:
                outs.append(splits[-1])
        return jnp.concatenate(outs, axis=-1)


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (reference res2net.py:84-135)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 26
    dilation: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    avg_downsample: bool = False
    zero_init_residual: bool = False
    scale: int = 4
    dtype: Optional[Any] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = floor(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "dtype": self.dtype,
        }
        out = ConvSequence(width * self.scale, kernel_size=1, name="conv_0", **common)(x, train)
        # the scale conv downsamples its shortcut chunk whenever the block has a
        # projection shortcut (reference res2net.py:108)
        out = ScaleConv2d(
            self.scale,
            width * self.scale,
            self.stride,
            self.groups,
            self.stride > 1 or self.downsample,
            self.act_layer,
            self.norm_layer,
            self.drop_layer,
            self.dtype,
            name="conv_1",
        )(out, train)
        out = ConvSequence(
            self.planes * self.expansion,
            kernel_size=1,
            norm_layer=self.norm_layer,
            drop_layer=self.drop_layer,
            dtype=self.dtype,
            name="conv_2",
        )(out, train)
        if self.downsample:
            identity = _Downsample(
                out.shape[-1], self.stride, self.avg_downsample, self.norm_layer, self.dtype, name="downsample"
            )(x, train)
        return self.act_layer(out + identity)


def _res2net(
    checkpoint: Optional[Checkpoint],
    progress: bool,
    num_blocks,
    out_chans,
    width_per_group: int,
    scale: int,
    **kwargs: Any,
) -> Model:
    module = ResNet(
        Bottle2neck, num_blocks, out_chans, width_per_group=width_per_group, block_args={"scale": scale}, **kwargs
    )
    return _configure_model(Model(module), checkpoint, progress=progress)


class Res2Net50_26w_4s_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="res2net50_26w_4s",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/res2net50_26w_4s_224-345170e8.pth",
        acc1=0.9394,
        acc5=0.9941,
        sha256="345170e8ff75d10330af55674090b0d9aa751e14b6f3b4a95bb8ea6cdd65be4b",
        size=95020747,
        num_params=23670610,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch res2net50_26w_4s --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def res2net50_26w_4s(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """Res2Net-50 26wx4s (reference res2net.py:183-211)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, Res2Net50_26w_4s_Checkpoint.DEFAULT.value)
    return _res2net(checkpoint, progress, [3, 4, 6, 3], [64, 128, 256, 512], 26, 4, **kwargs)
