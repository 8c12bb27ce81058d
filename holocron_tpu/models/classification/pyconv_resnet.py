"""PyConvResNet / PyConvHGResNet (`Duta et al. <https://arxiv.org/pdf/2006.11538.pdf>`_).

Reference: holocron/models/classification/pyconv_resnet.py. Bottlenecks whose middle
conv is a :class:`~holocron_tpu.nn.PyConv2d` pyramid; no stem max-pool; per-stage
group schedules.
"""

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax

from ...nn.modules.conv import PyConv2d
from ..core import Model
from ..presets import IMAGENETTE
from ..utils import ConvSequence, load_pretrained_params
from .resnet import ResNet, _Downsample

__all__ = ["PyBottleneck", "PyHGBottleneck", "pyconv_resnet50", "pyconvhg_resnet50"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "pyconv_resnet50": {**IMAGENETTE.__dict__, "input_shape": (224, 224, 3), "url": None},
    "pyconvhg_resnet50": {**IMAGENETTE.__dict__, "input_shape": (224, 224, 3), "url": None},
}


class PyBottleneck(nn.Module):
    """Bottleneck with a pyramidal middle conv (reference pyconv_resnet.py:33-98)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: Optional[Sequence[int]] = None
    base_width: int = 64
    dilation: int = 1
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    avg_downsample: bool = False
    zero_init_residual: bool = False
    num_levels: int = 2
    dense_groups: Optional[bool] = None  # None = PyConv2d's measured auto rule
    dtype: Optional[Any] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        groups = list(self.groups) if self.groups is not None else [1]
        width = int(self.planes * (self.base_width / 64.0)) * min(groups)
        identity = x
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "dtype": self.dtype,
        }
        out = ConvSequence(width, kernel_size=1, name="conv_0", **common)(x, train)

        def pyconv_factory(out_channels, kernel_size, *, stride, padding, dilation, groups, use_bias, dtype, name):
            return PyConv2d(
                out_channels,
                kernel_size,
                num_levels=self.num_levels,
                padding=padding,
                groups=groups,
                use_bias=use_bias,
                stride=stride,
                dense_groups=self.dense_groups,
                dtype=dtype,
                name=name,
            )

        out = ConvSequence(
            width,
            kernel_size=3,
            stride=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            groups=groups,
            conv_layer=pyconv_factory,
            name="conv_1",
            **common,
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


class PyHGBottleneck(PyBottleneck):
    """Higher-capacity variant with expansion 2 (reference pyconv_resnet.py:101-103)."""

    expansion = 2


def _pyconvresnet(
    arch: str,
    pretrained: bool,
    progress: bool,
    block,
    num_blocks,
    out_chans,
    width_per_group: int,
    groups: Sequence[Sequence[int]],
    **kwargs: Any,
) -> Model:
    model = Model(
        ResNet(
            block,
            num_blocks,
            out_chans,
            stem_pool=False,
            width_per_group=width_per_group,
            block_args=[{"num_levels": len(group), "groups": tuple(group)} for group in groups],
            **kwargs,
        )
    )
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def pyconv_resnet50(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """PyConvResNet-50 (reference pyconv_resnet.py:135-157)."""
    return _pyconvresnet(
        "pyconv_resnet50",
        pretrained,
        progress,
        PyBottleneck,
        [3, 4, 6, 3],
        [64, 128, 256, 512],
        64,
        [[1, 4, 8, 16], [1, 4, 8], [1, 4], [1]],
        **kwargs,
    )


def pyconvhg_resnet50(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """PyConvHGResNet-50 (reference pyconv_resnet.py:160-182)."""
    return _pyconvresnet(
        "pyconvhg_resnet50",
        pretrained,
        progress,
        PyHGBottleneck,
        [3, 4, 6, 3],
        [128, 256, 512, 1024],
        2,
        [[32, 32, 32, 32], [32, 64, 64], [32, 64], [32]],
        **kwargs,
    )
