"""SKNet (`Li et al. <https://arxiv.org/pdf/1903.06586.pdf>`_).

Reference: holocron/models/classification/sknet.py. SKConv2d runs ``m`` dilated conv
paths, then a soft-attention layer produces per-path channel weights softmaxed over
paths (sknet.py:107-113).
"""

from enum import Enum
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..utils import ConvSequence, _checkpoint, _configure_model
from .resnet import ResNet, _Downsample

__all__ = ["SKBottleneck", "SKConv2d", "SKNet50_Checkpoint", "SoftAttentionLayer", "sknet50", "sknet101", "sknet152"]


class SoftAttentionLayer(nn.Module):
    """GAP -> squeeze conv+BN+act -> excite conv (out_multiplier x channels) + sigmoid
    (reference sknet.py:41-71)."""

    sa_ratio: int = 16
    out_multiplier: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvSequence(
            max(channels // self.sa_ratio, 32),
            kernel_size=1,
            act_layer=self.act_layer,
            norm_layer=self.norm_layer,
            drop_layer=self.drop_layer,
            dtype=self.dtype,
            name="fc1",
        )(y, train)
        y = ConvSequence(
            channels * self.out_multiplier,
            kernel_size=1,
            act_layer=jax.nn.sigmoid,
            norm_layer=None,
            drop_layer=self.drop_layer,
            dtype=self.dtype,
            name="fc2",
        )(y, train)
        return y


class SKConv2d(nn.Module):
    """Selective kernel conv: m dilated paths, softmax-weighted sum
    (reference sknet.py:74-113)."""

    out_channels: int
    m: int = 2
    sa_ratio: int = 16
    groups: int = 1
    stride: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        paths = jnp.stack(
            [
                ConvSequence(
                    self.out_channels,
                    kernel_size=3,
                    dilation=idx + 1,
                    padding=idx + 1,
                    stride=self.stride,
                    groups=self.groups,
                    act_layer=self.act_layer,
                    norm_layer=self.norm_layer,
                    drop_layer=self.drop_layer,
                    dtype=self.dtype,
                    name=f"path_{idx}",
                )(x, train)
                for idx in range(self.m)
            ],
            axis=1,
        )  # (N, m, H, W, C)
        z = SoftAttentionLayer(
            self.sa_ratio, self.m, self.act_layer, self.norm_layer, self.drop_layer, self.dtype, name="sa"
        )(jnp.sum(paths, axis=1), train)
        # (N, 1, 1, m*C) -> (N, m, 1, 1, C): torch views (b, m, c, 1, 1) from channel-major
        n = x.shape[0]
        z = z.reshape(n, 1, 1, self.m, self.out_channels).transpose(0, 3, 1, 2, 4)
        attention = jax.nn.softmax(z, axis=1)
        return jnp.sum(attention * paths, axis=1)


class SKBottleneck(nn.Module):
    """SKNet bottleneck (reference sknet.py:116-165)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    base_width: int = 64
    dilation: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
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
            "dtype": self.dtype,
        }
        out = ConvSequence(width, kernel_size=1, name="conv_0", **common)(x, train)
        out = SKConv2d(
            width,
            2,
            16,
            self.groups,
            self.stride,
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


def _sknet(checkpoint: Optional[Checkpoint], progress: bool, num_blocks, out_chans, **kwargs: Any) -> Model:
    module = ResNet(SKBottleneck, num_blocks, out_chans, **kwargs)
    return _configure_model(Model(module), checkpoint, progress=progress)


class SKNet50_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="sknet50",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/sknet50_224-e2349031.pth",
        acc1=0.9437,
        acc5=0.9954,
        sha256="e2349031c838a4661cd729dbc7825605c9e0c966bd89bbcc9b39f0e324894d1f",
        size=141253623,
        num_params=35224394,
        commit="6e32c5b578711a2ef3731a8f8c61760ed9f03e58",
        train_args=(
            "./imagenette2-320/ --arch sknet50 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def sknet50(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """SKNet-50 (reference sknet.py:213-240)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, SKNet50_Checkpoint.DEFAULT.value)
    return _sknet(checkpoint, progress, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)


def sknet101(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """SKNet-101 (reference sknet.py:243-261)."""
    return _sknet(checkpoint if pretrained else None, progress, [3, 4, 23, 3], [64, 128, 256, 512], **kwargs)


def sknet152(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """SKNet-152 (reference sknet.py:264-282)."""
    return _sknet(checkpoint if pretrained else None, progress, [3, 8, 86, 3], [64, 128, 256, 512], **kwargs)
