"""ReXNet (`Han et al. <https://arxiv.org/pdf/2007.00992.pdf>`_) — TPU-native rebuild.

Reference: holocron/models/classification/rexnet.py (itself adapted from clovaai/rexnet).
Blocks: optional SiLU 1x1 expansion -> depthwise 3x3 -> SE -> ReLU6 -> linear 1x1
projection, with the **partial residual** ``out[..., :in_c] += x`` (reference
rexnet.py:140-142). Linearly growing widths across the depth (rexnet.py:183-184).
"""

from enum import Enum
from math import ceil
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, Dataset, _handle_legacy_pretrained
from ..core import Model
from ..utils import ConvSequence, _checkpoint, _configure_model

__all__ = [
    "ReXBlock",
    "ReXNet",
    "ReXNet1_0x_Checkpoint",
    "ReXNet1_3x_Checkpoint",
    "ReXNet1_5x_Checkpoint",
    "ReXNet2_0x_Checkpoint",
    "ReXNet2_2x_Checkpoint",
    "SEBlock",
    "rexnet1_0x",
    "rexnet1_3x",
    "rexnet1_5x",
    "rexnet2_0x",
    "rexnet2_2x",
]


class SEBlock(nn.Module):
    """Squeeze-and-excitation gate (reference rexnet.py:38-66)."""

    se_ratio: int = 12
    act_layer: Callable = jax.nn.relu6
    norm_layer: Optional[Any] = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvSequence(
            channels // self.se_ratio,
            kernel_size=1,
            act_layer=self.act_layer,
            norm_layer=self.norm_layer,
            dtype=self.dtype,
            name="fc1",
        )(y, train)
        y = ConvSequence(
            channels, kernel_size=1, act_layer=jax.nn.sigmoid, norm_layer=None, dtype=self.dtype, name="fc2"
        )(y, train)
        return x * y


class ReXBlock(nn.Module):
    """Inverted bottleneck with partial residual (reference rexnet.py:69-143)."""

    channels: int
    t: int
    stride: int
    use_se: bool = True
    se_ratio: int = 12
    act_layer: Callable = jax.nn.relu6
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        use_shortcut = self.stride == 1 and in_channels <= self.channels
        common = {"norm_layer": self.norm_layer, "drop_layer": self.drop_layer, "dtype": self.dtype}

        out = x
        if self.t != 1:
            dw_channels = in_channels * self.t
            out = ConvSequence(dw_channels, kernel_size=1, act_layer=jax.nn.silu, name="expand", **common)(out, train)
        else:
            dw_channels = in_channels

        out = ConvSequence(
            dw_channels, kernel_size=3, stride=self.stride, padding=1, groups=dw_channels, name="dw", **common
        )(out, train)
        if self.use_se:
            out = SEBlock(self.se_ratio, self.act_layer, self.norm_layer, self.dtype, name="se")(out, train)
        out = self.act_layer(out)
        out = ConvSequence(self.channels, kernel_size=1, name="project", **common)(out, train)

        if use_shortcut:
            out = out.at[..., :in_channels].add(x)
        return out


class ReXNet(nn.Module):
    """ReXNet body (reference rexnet.py:146-231): SiLU stem, linearly-widening
    ReXBlocks, penultimate 1x1, GAP, dropout + linear head."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    in_channels: int = 3
    in_planes: int = 16
    final_planes: int = 180
    use_se: bool = True
    se_ratio: int = 12
    dropout_ratio: float = 0.2
    bn_momentum: float = 0.9
    act_layer: Callable = jax.nn.silu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        num_blocks = [ceil(e * self.depth_mult) for e in [1, 2, 2, 3, 3, 5]]
        strides = []
        for idx, s in enumerate([1, 2, 2, 2, 1, 2]):
            strides.extend([s] + [1] * (num_blocks[idx] - 1))
        depth = sum(num_blocks)

        stem_channel = 32 / self.width_mult if self.width_mult < 1.0 else 32
        inplanes = self.in_planes / self.width_mult if self.width_mult < 1.0 else self.in_planes
        chans = [round(self.width_mult * stem_channel)]
        chans.extend(round(self.width_mult * (inplanes + idx * self.final_planes / depth)) for idx in range(depth))
        ses = [False] * (num_blocks[0] + num_blocks[1]) + [self.use_se] * sum(num_blocks[2:])

        common = {"norm_layer": self.norm_layer, "drop_layer": self.drop_layer, "dtype": self.dtype}
        x = ConvSequence(
            chans[0], kernel_size=3, stride=2, padding=1, act_layer=self.act_layer, name="stem", **common
        )(x, train)

        t = 1
        for i, (c, s, se) in enumerate(zip(chans[1:], strides, ses)):
            x = ReXBlock(
                channels=c,
                t=t,
                stride=s,
                use_se=se,
                se_ratio=self.se_ratio,
                norm_layer=self.norm_layer,
                drop_layer=self.drop_layer,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
            t = 6

        pen_channels = int(self.width_mult * 1280)
        x = ConvSequence(
            pen_channels, kernel_size=1, act_layer=self.act_layer, name="penultimate", **common
        )(x, train)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def _rexnet(
    checkpoint: Optional[Checkpoint], progress: bool, width_mult: float, depth_mult: float, **kwargs: Any
) -> Model:
    module = ReXNet(width_mult, depth_mult, **kwargs)
    return _configure_model(Model(module), checkpoint, progress=progress)


class ReXNet1_0x_Checkpoint(Enum):
    # Porting of Ross Wightman's weights
    IMAGENET1K = _checkpoint(
        arch="rexnet1_0x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.1.2/rexnet1_0x_224-ab7b9733.pth",
        dataset=Dataset.IMAGENET1K,
        acc1=0.7786,
        acc5=0.93870,
        sha256="ab7b973341a59832099f6ee2a41eb51121b287ad4adaae8b2cd8dd92ef058f01",
        size=14351299,
        num_params=4796186,
    )
    IMAGENETTE = _checkpoint(
        arch="rexnet1_0x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/rexnet1_0x_224-7c19fd53.pth",
        acc1=0.9439,
        acc5=0.9962,
        sha256="7c19fd53a5433927e9b4b22fa9cb0833eb1e4c3254b4079b6818fce650a77943",
        size=14351299,
        num_params=3527996,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch rexnet1_0x --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENET1K


class ReXNet1_3x_Checkpoint(Enum):
    IMAGENET1K = _checkpoint(
        arch="rexnet1_3x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.1.2/rexnet1_3x_224-95479104.pth",
        dataset=Dataset.IMAGENET1K,
        acc1=0.7950,
        acc5=0.9468,
        sha256="95479104024ce294abbdd528df62bd1a23e67a9db2956e1d6cdb9a9759dc1c69",
        size=14351299,
        num_params=7556198,
    )
    IMAGENETTE = _checkpoint(
        arch="rexnet1_3x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/rexnet1_3x_224-cf85ae91.pth",
        acc1=0.9488,
        acc5=0.9939,
        sha256="cf85ae919cbc9484f9fa150106451f68d2e84c73f1927a1b80aeeaa243ccd65b",
        size=23920480,
        num_params=5907848,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch rexnet1_3x --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENET1K


class ReXNet1_5x_Checkpoint(Enum):
    IMAGENET1K = _checkpoint(
        arch="rexnet1_5x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.1.2/rexnet1_5x_224-c42a16ac.pth",
        dataset=Dataset.IMAGENET1K,
        acc1=0.8031,
        acc5=0.9517,
        sha256="c42a16ac73470d64852b8317ba9e875c833595a90a086b90490a696db9bb6a96",
        size=14351299,
        num_params=9727562,
    )
    IMAGENETTE = _checkpoint(
        arch="rexnet1_5x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/rexnet1_5x_224-4b9d7a59.pth",
        acc1=0.9447,
        acc5=0.9962,
        sha256="4b9d7a5901da6c2b9386987a6120bc86089d84df7727e43b78a4dfe2fc1c719a",
        size=31625286,
        num_params=7825772,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch rexnet1_5x --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENET1K


class ReXNet2_0x_Checkpoint(Enum):
    IMAGENET1K = _checkpoint(
        arch="rexnet2_0x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.1.2/rexnet2_0x_224-c8802402.pth",
        dataset=Dataset.IMAGENET1K,
        acc1=0.8031,
        acc5=0.9517,
        sha256="c8802402442551c77fe3874f84d4d7eb1bd67cce274375db11a869ed074a1089",
        size=14351299,
        num_params=16365244,
    )
    IMAGENETTE = _checkpoint(
        arch="rexnet2_0x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/rexnet2_0x_224-3f00641e.pth",
        acc1=0.9524,
        acc5=0.9957,
        sha256="3f00641e48a6d1d3c9794534eb372467e0730700498933c9e79e60c838671d13",
        size=55724412,
        num_params=13829854,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch rexnet2_0x --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class ReXNet2_2x_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="rexnet2_2x",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/rexnet2_2x_224-b23b2847.pth",
        acc1=0.9544,
        acc5=0.9946,
        sha256="b23b28475329e413bfb491503460db8f47a838ec8dcdc5d13ade6f40ee5841a6",
        size=67217933,
        num_params=16694966,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch rexnet2_2x --batch-size 32 --grad-acc 2 --mixup-alpha 0.2 --amp --device 0"
            " --epochs 100 --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176"
            " --val-resize-size 232 --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def rexnet1_0x(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ReXNet-1.0x (reference rexnet.py:275-303)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ReXNet1_0x_Checkpoint.DEFAULT.value)
    return _rexnet(checkpoint, progress, 1, 1, **kwargs)


def rexnet1_3x(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ReXNet-1.3x (reference rexnet.py:336-364)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ReXNet1_3x_Checkpoint.DEFAULT.value)
    return _rexnet(checkpoint, progress, 1.3, 1, **kwargs)


def rexnet1_5x(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ReXNet-1.5x (reference rexnet.py:397-425)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ReXNet1_5x_Checkpoint.DEFAULT.value)
    return _rexnet(checkpoint, progress, 1.5, 1, **kwargs)


def rexnet2_0x(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ReXNet-2.0x (reference rexnet.py:458-486)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ReXNet2_0x_Checkpoint.DEFAULT.value)
    return _rexnet(checkpoint, progress, 2, 1, **kwargs)


def rexnet2_2x(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ReXNet-2.2x (reference rexnet.py:508-536)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ReXNet2_2x_Checkpoint.DEFAULT.value)
    return _rexnet(checkpoint, progress, 2.2, 1, **kwargs)
