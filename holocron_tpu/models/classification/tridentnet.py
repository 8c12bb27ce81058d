"""TridentNet (`Li et al. <https://arxiv.org/pdf/1901.01892.pdf>`_).

Reference: holocron/models/classification/tridentnet.py. TridentConv2d applies ONE
shared kernel to three channel-chunks with dilations 1/2/3 (tridentnet.py:42-58); the
blocks widen BN to 3x width (the ``bn_channels`` trick, :84) and the ResNet container
repeats input channels 3x (``num_repeats``).
"""

from typing import Any, Callable, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import kaiming_normal
from ..core import Model
from ..presets import IMAGENETTE
from ..utils import ConvSequence, load_pretrained_params
from .resnet import ResNet, _Downsample

__all__ = ["Tridentneck", "tridentnet50"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "tridentnet50": {
        **IMAGENETTE.__dict__,
        "input_shape": (224, 224, 3),
        "url": "https://github.com/frgfm/Holocron/releases/download/v0.1.2/tridentnet50_224-98b4ce9c.pth",
    },
}


class TridentConv2d(nn.Module):
    """Weight-shared 3-branch conv over channel chunks (reference tridentnet.py:27-58).

    ``dilation`` of 1 applies the same dilation to all branches; ``num_branches``
    applies dilations 1..num_branches. On TPU this is three convs sharing one HWIO
    kernel — XLA batches them onto the MXU with a single weight fetch.
    """

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Optional[Any] = None
    num_branches: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.dilation != 1 and self.dilation != self.num_branches:
            raise ValueError(f"expected dilation to either be 1 or {self.num_branches}.")
        if x.shape[-1] % self.num_branches != 0:
            raise ValueError("expected number of channels of input tensor to be a multiple of `num_branches`.")
        k = self.kernel_size if isinstance(self.kernel_size, int) else self.kernel_size[0]
        in_chunk = x.shape[-1] // self.num_branches
        kernel = self.param("kernel", kaiming_normal(), (k, k, in_chunk // self.groups, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        # NOTE: folding the branches into the batch dim for uniform dilations was
        # measured SLOWER on v5e (162ms vs 51ms per batch-128 forward) — the layout
        # transposes outweigh the conv launch savings. Three convs it is.
        dtype = self.dtype or x.dtype
        dilations = (
            [1] * self.num_branches if self.dilation == 1 else [1 + idx for idx in range(self.num_branches)]
        )
        outs = []
        for idx, dilation in enumerate(dilations):
            chunk = x[..., idx * in_chunk : (idx + 1) * in_chunk]
            pad = dilation * self.padding
            out = jax.lax.conv_general_dilated(
                chunk.astype(dtype),
                kernel.astype(dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
            if bias is not None:
                out = out + bias.astype(dtype)
            outs.append(out)
        return jnp.concatenate(outs, axis=-1)


class Tridentneck(nn.Module):
    """Bottleneck over 3 weight-shared branches (reference tridentnet.py:61-133)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 3
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
            "conv_layer": TridentConv2d,
            "dtype": self.dtype,
        }
        out = ConvSequence(width, kernel_size=1, dilation=1, bn_channels=3 * width, name="conv_0", **common)(x, train)
        out = ConvSequence(
            width,
            kernel_size=3,
            stride=self.stride,
            padding=1,
            groups=self.groups,
            dilation=3,
            bn_channels=3 * width,
            name="conv_1",
            **common,
        )(out, train)
        out = ConvSequence(
            self.planes * self.expansion,
            kernel_size=1,
            dilation=1,
            bn_channels=3 * self.planes * self.expansion,
            norm_layer=self.norm_layer,
            drop_layer=self.drop_layer,
            conv_layer=TridentConv2d,
            dtype=self.dtype,
            name="conv_2",
        )(out, train)
        if self.downsample:
            identity = _Downsample(
                out.shape[-1], self.stride, self.avg_downsample, self.norm_layer, self.dtype, name="downsample"
            )(x, train)
        return self.act_layer(out + identity)


def _tridentnet(arch: str, pretrained: bool, progress: bool, num_blocks, out_chans, **kwargs: Any) -> Model:
    model = Model(ResNet(Tridentneck, num_blocks, out_chans, num_repeats=3, **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def tridentnet50(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """TridentNet-50 (reference tridentnet.py:155-167)."""
    return _tridentnet("tridentnet50", pretrained, progress, [3, 4, 6, 3], [64, 128, 256, 512], **kwargs)
