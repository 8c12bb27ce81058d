"""CSP-Darknet-53 — the YOLOv4 backbone (`Wang et al.
<https://arxiv.org/pdf/1911.11929.pdf>`_).

Reference: holocron/models/classification/darknetv4.py. Each CSPStage: strided base
conv -> 1x1 widening -> channel chunk(2) -> residual main path on one half -> concat ->
1x1 transition (darknetv4.py:110-114). The mish variant swaps in Mish activations and
DropBlock regularization.
"""

from enum import Enum
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.modules.dropblock import DropBlock2d
from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..utils import ConvSequence, _checkpoint, _configure_model
from .darknetv3 import ResBlock

__all__ = ["CSPDarknet53_Checkpoint", "CSPDarknet53_Mish_Checkpoint", "DarknetV4", "cspdarknet53", "cspdarknet53_mish"]


class CSPStage(nn.Module):
    """Cross-stage-partial stage (reference darknetv4.py:38-115)."""

    out_channels: int
    num_blocks: int = 1
    act_layer: Callable = jax.nn.leaky_relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        compression = 2 if self.num_blocks > 1 else 1
        half = self.out_channels // compression
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        x = ConvSequence(self.out_channels, kernel_size=3, padding=1, stride=2, name="base_0", **common)(x, train)
        x = ConvSequence(2 * half, kernel_size=1, name="base_1", **common)(x, train)
        x1, x2 = jnp.split(x, 2, axis=-1)
        out = x2
        for b in range(self.num_blocks):
            out = ResBlock(
                half,
                half if self.num_blocks > 1 else in_channels,
                self.act_layer,
                self.norm_layer,
                self.drop_layer,
                self.conv_layer,
                self.dtype,
                name=f"main_{b}",
            )(out, train)
        out = ConvSequence(half, kernel_size=1, name="main_conv", **common)(out, train)
        return ConvSequence(self.out_channels, kernel_size=1, name="transition", **common)(
            jnp.concatenate([x1, out], axis=-1), train
        )


class DarknetBodyV4(nn.Module):
    """Stem + CSP stages; can return the last ``num_features`` stage outputs
    (reference darknetv4.py:118-182)."""

    layout: Sequence[Tuple[int, int]]
    in_channels: int = 3
    stem_channels: int = 32
    num_features: int = 1
    act_layer: Callable = jax.nn.leaky_relu
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
            x = CSPStage(
                out_chans,
                num_blocks,
                self.act_layer,
                self.norm_layer,
                self.drop_layer,
                self.conv_layer,
                self.dtype,
                name=f"stage_{i}",
            )(x, train)
            if i >= len(self.layout) - self.num_features:
                features.append(x)
        if self.num_features == 1:
            return x
        return features


class DarknetV4(nn.Module):
    """CSP-Darknet-53 classifier (reference darknetv4.py:185-226)."""

    layout: Sequence[Tuple[int, int]]
    num_classes: int = 10
    in_channels: int = 3
    stem_channels: int = 32
    num_features: int = 1
    act_layer: Callable = jax.nn.leaky_relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = DarknetBodyV4(
            self.layout,
            self.in_channels,
            self.stem_channels,
            self.num_features,
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
    return _configure_model(Model(DarknetV4(layout, **kwargs)), checkpoint, progress=progress)


class CSPDarknet53_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="cspdarknet53",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/cspdarknet53_224-7a69463a.pth",
        acc1=0.9450,
        acc5=0.9964,
        sha256="7a69463a4bd445beb6691dfd6ef7378efcf941f75d07d60034106ebedfcb82f8",
        size=106732575,
        num_params=26627434,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch cspdarknet53 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class CSPDarknet53_Mish_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="cspdarknet53_mish",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/cspdarknet53_mish_224-1b660b3c.pth",
        acc1=0.9465,
        acc5=0.9969,
        sha256="1b660b3cb144195100c99ee3b9b863c37a5b5a59619c8de8c588b3d2af954b15",
        size=106737530,
        num_params=26627434,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch cspdarknet53_mish --batch-size 32 --grad-acc 2 --mixup-alpha 0.2 --amp"
            "  --device 0 --epochs 100 --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176"
            " --val-resize-size 232 --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def cspdarknet53(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """CSP-Darknet-53 (reference darknetv4.py:260-287)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, CSPDarknet53_Checkpoint.DEFAULT.value)
    return _darknet(checkpoint, progress, [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)], **kwargs)


def cspdarknet53_mish(
    pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any
) -> Model:
    """CSP-Darknet-53 with Mish + DropBlock (reference darknetv4.py:311-343)."""
    kwargs["act_layer"] = jax.nn.mish
    kwargs["drop_layer"] = DropBlock2d
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, CSPDarknet53_Mish_Checkpoint.DEFAULT.value)
    return _darknet(checkpoint, progress, [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)], **kwargs)
