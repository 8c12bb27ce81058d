"""ResNet / ResNeXt / ResNet-D family (`He et al. <https://arxiv.org/pdf/1512.03385.pdf>`_,
`Xie et al. <https://arxiv.org/pdf/1611.05431.pdf>`_).

Reference: holocron/models/classification/resnet.py — including the deep stem
(ResNet-C, :254), average-pool downsampling shortcut (ResNet-D, :379), the
``num_repeats`` channel repetition used by TridentNet (:309-311), and
``zero_init_residual`` (:352). NHWC Flax modules; the generic :class:`ResNet` container
accepts any block class (Res2Net/SKNet/PyConv/Trident blocks plug in via ``block`` +
``block_args``).
"""

from enum import Enum
from typing import Any, Callable, Dict, Optional, Sequence, Type, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..layers import BatchNorm2d, avg_pool2d, max_pool2d
from ..utils import ConvSequence, _checkpoint, _configure_model

__all__ = [
    "BasicBlock",
    "Bottleneck",
    "ResNeXt50_32x4d_Checkpoint",
    "ResNet",
    "ResNet18_Checkpoint",
    "ResNet34_Checkpoint",
    "ResNet50D_Checkpoint",
    "ResNet50_Checkpoint",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet50d",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "resnext101_32x8d",
]


class _Downsample(nn.Module):
    """Shortcut projection: 1x1 conv+BN, optionally preceded by an average pool
    (ResNet-D, reference resnet.py:375-403)."""

    out_channels: int
    stride: int = 1
    avg_downsample: bool = False
    norm_layer: Optional[Union[bool, Callable]] = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.avg_downsample and self.stride > 1:
            x = avg_pool2d(x, self.stride, self.stride, ceil_mode=True, count_include_pad=False)
            stride = 1
        else:
            stride = self.stride
        return ConvSequence(
            self.out_channels,
            kernel_size=1,
            stride=stride,
            norm_layer=self.norm_layer,
            dtype=self.dtype,
            name="proj",
        )(x, train)


class BasicBlock(nn.Module):
    """Two 3x3 convs + shortcut (reference resnet.py:90-143)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Union[bool, Callable]] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    avg_downsample: bool = False
    zero_init_residual: bool = False
    dtype: Optional[Any] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out = ConvSequence(
            self.planes,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            groups=self.groups,
            dilation=self.dilation,
            act_layer=self.act_layer,
            norm_layer=self.norm_layer,
            drop_layer=self.drop_layer,
            conv_layer=self.conv_layer,
            dtype=self.dtype,
            name="conv_0",
        )(x, train)
        final_norm = self.norm_layer
        if final_norm is True and self.zero_init_residual:
            final_norm = lambda c, name=None: BatchNorm2d(scale_init=nn.initializers.zeros, dtype=self.dtype, name=name)  # noqa: E731
        out = ConvSequence(
            self.planes,
            kernel_size=3,
            stride=1,
            padding=self.dilation,
            groups=self.groups,
            dilation=self.dilation,
            norm_layer=final_norm,
            drop_layer=self.drop_layer,
            conv_layer=self.conv_layer,
            dtype=self.dtype,
            name="conv_1",
        )(out, train)
        if self.downsample:
            identity = _Downsample(
                out.shape[-1], self.stride, self.avg_downsample, self.norm_layer, self.dtype, name="downsample"
            )(x, train)
        return self.act_layer(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck + shortcut (reference resnet.py:146-209)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Union[bool, Callable]] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    avg_downsample: bool = False
    zero_init_residual: bool = False
    dtype: Optional[Any] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        out = ConvSequence(width, kernel_size=1, stride=1, name="conv_0", **common)(x, train)
        out = ConvSequence(
            width,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            groups=self.groups,
            dilation=self.dilation,
            name="conv_1",
            **common,
        )(out, train)
        final_norm = self.norm_layer
        if final_norm is True and self.zero_init_residual:
            final_norm = lambda c, name=None: BatchNorm2d(scale_init=nn.initializers.zeros, dtype=self.dtype, name=name)  # noqa: E731
        out = ConvSequence(
            self.planes * self.expansion,
            kernel_size=1,
            stride=1,
            norm_layer=final_norm,
            drop_layer=self.drop_layer,
            conv_layer=self.conv_layer,
            dtype=self.dtype,
            name="conv_2",
        )(out, train)
        if self.downsample:
            identity = _Downsample(
                out.shape[-1], self.stride, self.avg_downsample, self.norm_layer, self.dtype, name="downsample"
            )(x, train)
        return self.act_layer(out + identity)


class ResNet(nn.Module):
    """Generic ResNet container (reference resnet.py:224-373): stem (regular or deep) ->
    optional max-pool -> optional channel repeat -> staged blocks -> GAP -> linear head.
    """

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    planes: Sequence[int]
    num_classes: int = 10
    in_channels: int = 3
    zero_init_residual: bool = False
    width_per_group: int = 64
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Union[bool, Callable]] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    deep_stem: bool = False
    stem_pool: bool = True
    avg_downsample: bool = False
    num_repeats: int = 1
    block_args: Optional[Union[Dict[str, Any], Sequence[Dict[str, Any]]]] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = 64
        stem_common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        if self.deep_stem:
            x = ConvSequence(in_planes // 2, kernel_size=3, stride=2, padding=1, name="stem_0", **stem_common)(x, train)
            x = ConvSequence(in_planes // 2, kernel_size=3, stride=1, padding=1, name="stem_1", **stem_common)(x, train)
            x = ConvSequence(in_planes, kernel_size=3, stride=1, padding=1, name="stem_2", **stem_common)(x, train)
        else:
            x = ConvSequence(in_planes, kernel_size=7, stride=2, padding=3, name="stem_0", **stem_common)(x, train)
        if self.stem_pool:
            x = max_pool2d(x, 3, 2, 1)

        if self.num_repeats > 1:
            x = jnp.tile(x, (1, 1, 1, self.num_repeats))

        # the reference defaults block_args to {"groups": 1} (resnet.py:318-319) — this
        # matters for blocks whose own default differs (SKBottleneck defaults groups=32)
        block_args = self.block_args if self.block_args is not None else {"groups": 1}
        if not isinstance(block_args, (list, tuple)):
            block_args = [block_args] * len(self.num_blocks)

        expansion = self.block.expansion
        stride = 1
        for i, (nb, planes, ba) in enumerate(zip(self.num_blocks, self.planes, block_args)):
            for j in range(nb):
                block_stride = stride if j == 0 else 1
                needs_ds = j == 0 and (stride != 1 or in_planes != planes * expansion)
                x = self.block(
                    planes=planes,
                    stride=block_stride,
                    downsample=needs_ds,
                    base_width=self.width_per_group,
                    act_layer=self.act_layer,
                    norm_layer=self.norm_layer,
                    drop_layer=self.drop_layer,
                    avg_downsample=self.avg_downsample,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    name=f"layer_{i}_{j}",
                    **ba,
                )(x, train)
            in_planes = planes * expansion
            stride = 2

        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def _resnet(
    checkpoint: Optional[Checkpoint],
    progress: bool,
    block: Type[nn.Module],
    num_blocks: Sequence[int],
    out_chans: Sequence[int],
    **kwargs: Any,
) -> Model:
    module = ResNet(block, num_blocks, out_chans, **kwargs)
    return _configure_model(Model(module), checkpoint, progress=progress)


class ResNet18_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="resnet18",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/resnet18_224-fc07006c.pth",
        acc1=0.9361,
        acc5=0.9946,
        sha256="fc07006c894cac8cf380fed699bc5a68463698753c954632f52bb8595040f781",
        size=44787043,
        num_params=11181642,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch resnet18 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class ResNet34_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="resnet34",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/resnet34_224-412b0792.pth",
        acc1=0.9381,
        acc5=0.9949,
        sha256="412b07927cc1938ee3add8d0f6bb18b42786646182f674d75f1433d086914485",
        size=85267035,
        num_params=21289802,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch resnet34 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class ResNet50_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="resnet50",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/resnet50_224-5b913f0b.pth",
        acc1=0.9378,
        acc5=0.9954,
        sha256="5b913f0b8148b483ba15541ab600cf354ca42b326e4896c4c3dbc51eb1e80e70",
        size=94384682,
        num_params=23528522,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch resnet50 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class ResNet50D_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="resnet50d",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/resnet50d_224-6218d936.pth",
        acc1=0.9465,
        acc5=0.9952,
        sha256="6218d936fa67c0047f1ec65564213db538aa826d84f2df1d4fa3224531376e6c",
        size=94464810,
        num_params=23547754,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch resnet50d --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class ResNeXt50_32x4d_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="resnext50_32x4d",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/resnext50_32x4d_224-5832c4ce.pth",
        acc1=0.9455,
        acc5=0.9949,
        sha256="5832c4ce33522a9eb7a8b5abe31cf30621721a92d4f99b4b332a007d81d071fe",
        size=92332638,
        num_params=23000394,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch resnext50_32x4d --batch-size 64 --mixup-alpha 0.2 --amp --device 0"
            " --epochs 100 --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176"
            " --val-resize-size 232 --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def resnet18(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-18 (reference resnet.py:472-498)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ResNet18_Checkpoint.DEFAULT.value)
    return _resnet(checkpoint, progress, BasicBlock, [2, 2, 2, 2], [64, 128, 256, 512], **kwargs)


def resnet34(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-34 (reference resnet.py:520-541)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ResNet34_Checkpoint.DEFAULT.value)
    return _resnet(checkpoint, progress, BasicBlock, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet50(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-50 (reference resnet.py:563-584)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ResNet50_Checkpoint.DEFAULT.value)
    return _resnet(checkpoint, progress, Bottleneck, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def resnet50d(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-50D — deep stem + average-pool shortcut (reference resnet.py:611-642)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ResNet50D_Checkpoint.DEFAULT.value)
    return _resnet(
        checkpoint,
        progress,
        Bottleneck,
        [3, 4, 6, 3],
        [64, 128, 256, 512],
        deep_stem=True,
        avg_downsample=True,
        **kwargs,
    )


def resnet101(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-101 (reference resnet.py:645-663)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _resnet(checkpoint, progress, Bottleneck, [3, 4, 23, 3], [64, 128, 256, 512], **kwargs)


def resnet152(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ResNet-152 (reference resnet.py:666-684)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _resnet(checkpoint, progress, Bottleneck, [3, 8, 86, 3], [64, 128, 256, 512], **kwargs)


def resnext50_32x4d(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """ResNeXt-50 32x4d (reference resnet.py:706-738)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ResNeXt50_32x4d_Checkpoint.DEFAULT.value)
    kwargs["width_per_group"] = 4
    return _resnet(
        checkpoint, progress, Bottleneck, [3, 4, 6, 3], [64, 128, 256, 512], block_args={"groups": 32}, **kwargs
    )


def resnext101_32x8d(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """ResNeXt-101 32x8d (reference resnet.py:740-768)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    kwargs["width_per_group"] = 8
    return _resnet(
        checkpoint, progress, Bottleneck, [3, 4, 23, 3], [64, 128, 256, 512], block_args={"groups": 32}, **kwargs
    )
