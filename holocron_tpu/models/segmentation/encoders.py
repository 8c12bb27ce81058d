"""Feature-pyramid encoders for DynamicUNet.

The reference wraps torchvision backbones with IntermediateLayerGetter
(holocron/models/segmentation/unet.py:404-412); here the encoders are feature-returning
modules sharing the classification zoo's block definitions and naming (so converted
backbone checkpoints load onto them).
"""

from math import ceil
from typing import Any, Callable, List, Optional, Tuple

import flax.linen as nn
import jax

from ..classification.resnet import BasicBlock
from ..classification.rexnet import ReXBlock
from ..layers import max_pool2d
from ..utils import ConvSequence

__all__ = ["ReXNetFeatures", "ResNet34Features"]


class ResNet34Features(nn.Module):
    """ResNet-34 pyramid: post-stem activation + the four stage outputs (matching the
    reference's ["relu", "layer1".."layer4"] tap points)."""

    act_layer: Callable = jax.nn.relu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        feats = []
        x = ConvSequence(
            64, kernel_size=7, stride=2, padding=3, act_layer=self.act_layer, norm_layer=True,
            dtype=self.dtype, name="stem_0",
        )(x, train)
        feats.append(x)
        x = max_pool2d(x, 3, 2, 1)
        in_planes = 64
        for i, (nb, planes) in enumerate(zip([3, 4, 6, 3], [64, 128, 256, 512])):
            stride = 1 if i == 0 else 2
            for j in range(nb):
                block_stride = stride if j == 0 else 1
                needs_ds = j == 0 and (stride != 1 or in_planes != planes)
                x = BasicBlock(
                    planes=planes,
                    stride=block_stride,
                    downsample=needs_ds,
                    act_layer=self.act_layer,
                    dtype=self.dtype,
                    name=f"layer_{i}_{j}",
                )(x, train)
            in_planes = planes
            feats.append(x)
        return feats


class ReXNetFeatures(nn.Module):
    """ReXNet feature pyramid: stem + ReXBlocks, returning the outputs of the blocks
    listed in ``out_blocks`` (reference tap indices map to blocks 0/2/4/10/15 for the
    1.3x backbone, holocron/models/segmentation/unet.py:29-31)."""

    width_mult: float = 1.3
    depth_mult: float = 1.0
    out_blocks: Tuple[int, ...] = (0, 2, 4, 10, 15)
    in_planes: int = 16
    final_planes: int = 180
    use_se: bool = True
    se_ratio: int = 12
    act_layer: Callable = jax.nn.silu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
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

        x = ConvSequence(
            chans[0], kernel_size=3, stride=2, padding=1, act_layer=self.act_layer, norm_layer=True,
            dtype=self.dtype, name="stem",
        )(x, train)
        feats = []
        t = 1
        for i, (c, s, se) in enumerate(zip(chans[1:], strides, ses)):
            x = ReXBlock(
                channels=c, t=t, stride=s, use_se=se, se_ratio=self.se_ratio, dtype=self.dtype, name=f"block_{i}"
            )(x, train)
            t = 6
            if i in self.out_blocks:
                feats.append(x)
        return feats
