"""UNet3+ (`Huang et al. <https://arxiv.org/pdf/2004.08790.pdf>`_).

Reference: holocron/models/segmentation/unet3p.py — full-scale aggregation: each decoder
row concatenates maxpool-downsampled shallower encoder features, the skip, and
bilinear-upsampled deeper decoder features, all projected to ``base_chan``.
"""

from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import kaiming_normal
from ..core import Model
from ..layers import max_pool2d
from ..utils import ConvSequence, load_pretrained_params
from .unet import DownPath, upsample2d

__all__ = ["UNet3p", "unet3p"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "unet3p": {"arch": "UNet3p", "layout": [64, 128, 256, 512, 1024], "url": None},
}


class FSAggreg(nn.Module):
    """Full-scale aggregation block (reference unet3p.py:24-87)."""

    num_encoder: int
    num_decoder: int
    base_chan: int
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, downfeats: List[jax.Array], feat: jax.Array, upfeats: List[jax.Array], train: bool = False):
        if len(downfeats) != self.num_encoder or len(upfeats) != self.num_decoder:
            raise ValueError(
                f"Expected {self.num_encoder} encoding & {self.num_decoder} decoding features, "
                f"received: {len(downfeats)} & {len(upfeats)}"
            )
        conv_kw = {"kernel_init": kaiming_normal(), "dtype": self.dtype}
        parts = []
        for idx, downfeat in enumerate(downfeats):
            pool = 2 ** (len(downfeats) - idx)
            d = max_pool2d(downfeat, pool, pool)
            parts.append(nn.Conv(self.base_chan, (3, 3), padding=1, name=f"down_{idx}", **conv_kw)(d))
        if self.num_encoder > 0:
            parts.append(nn.Conv(self.base_chan, (3, 3), padding=1, name="skip", **conv_kw)(feat))
        else:
            parts.append(feat)
        for idx, upfeat in enumerate(upfeats):
            u = upsample2d(upfeat, 2 ** (idx + 1), "bilinear")
            parts.append(nn.Conv(self.base_chan, (3, 3), padding=1, name=f"up_{idx}", **conv_kw)(u))
        x = jnp.concatenate(parts, axis=-1)
        depth = self.num_encoder + 1 + self.num_decoder
        return ConvSequence(
            depth * self.base_chan,
            kernel_size=3,
            padding=1,
            act_layer=self.act_layer,
            norm_layer=self.norm_layer,
            drop_layer=self.drop_layer,
            conv_layer=self.conv_layer,
            dtype=self.dtype,
            name="block",
        )(x, train)


class UNet3p(nn.Module):
    """UNet3+ (reference unet3p.py:90-159)."""

    layout: Sequence[int]
    in_channels: int = 3
    num_classes: int = 10
    act_layer: Callable = jax.nn.relu
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
        xs: List[jax.Array] = []
        for idx, out_chan in enumerate(self.layout):
            xs.append(DownPath(out_chan, idx > 0, 1, name=f"encoder_{idx}", **common)(xs[-1] if xs else x, train))

        # full-scale expansive path, deepest decoder row first (reference unet3p.py:153-155)
        for row in range(len(self.layout) - 2, -1, -1):
            xs[row] = FSAggreg(
                num_encoder=row,
                num_decoder=len(self.layout) - 1 - row,
                base_chan=self.layout[0] if row > 0 else self.layout[0],
                name=f"decoder_{row}",
                **common,
            )(xs[:row], xs[row], xs[row + 1 :], train)

        return nn.Conv(
            self.num_classes, (1, 1), kernel_init=kaiming_normal(), dtype=self.dtype, name="classifier"
        )(xs[0])


def _unet(arch: str, pretrained: bool, progress: bool, **kwargs: Any) -> Model:
    model = Model(UNet3p(default_cfgs[arch]["layout"], **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def unet3p(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """UNet3+ (reference unet3p.py:170-186)."""
    return _unet("unet3p", pretrained, progress, **kwargs)
