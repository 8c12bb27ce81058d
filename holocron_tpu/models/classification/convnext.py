"""ConvNeXt (`Liu et al. <https://arxiv.org/pdf/2201.03545.pdf>`_), atto..xl variants.

Reference: holocron/models/classification/convnext.py. Blocks: 7x7 depthwise -> LN ->
1x1 x4 + GELU -> 1x1 + LayerScale + StochasticDepth, residual without post-activation;
patchify stem; LN + 2x2/s2 downsample between stages; LN + linear head.
"""

from enum import Enum
from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..utils import _checkpoint, _configure_model

__all__ = [
    "ConvNeXt",
    "ConvNeXt_Atto_Checkpoint",
    "convnext_atto",
    "convnext_base",
    "convnext_femto",
    "convnext_large",
    "convnext_nano",
    "convnext_pico",
    "convnext_small",
    "convnext_tiny",
    "convnext_xl",
]

# torch nn.GELU defaults to the exact erf formulation
gelu_exact = partial(jax.nn.gelu, approximate=False)
trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)


def stochastic_depth(x: jax.Array, p: float, key: Optional[jax.Array], train: bool) -> jax.Array:
    """Row-mode stochastic depth (torchvision's StochasticDepth, used at
    reference convnext.py:110)."""
    if not train or p == 0.0 or key is None:
        return x
    survival = 1.0 - p
    mask = jax.random.bernoulli(key, survival, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / survival


class LayerScale(nn.Module):
    """Learnable channel-wise scaling (reference convnext.py:44-52)."""

    scale: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.constant(self.scale), (x.shape[-1],))
        return x * weight


class Bottlenext(nn.Module):
    """ConvNeXt block (reference convnext.py:55-113)."""

    chan_expansion: int = 4
    stochastic_depth_prob: float = 0.1
    layer_scale: float = 1e-6
    act_layer: Callable = gelu_exact
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inplanes = x.shape[-1]
        out = nn.Conv(
            inplanes,
            (7, 7),
            padding=3,
            feature_group_count=inplanes,
            use_bias=True,
            kernel_init=trunc_normal_02,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(out)
        out = nn.Conv(
            inplanes * self.chan_expansion,
            (1, 1),
            use_bias=True,
            kernel_init=trunc_normal_02,
            dtype=self.dtype,
            name="pwconv1",
        )(out)
        out = self.act_layer(out)
        out = nn.Conv(
            inplanes, (1, 1), use_bias=True, kernel_init=trunc_normal_02, dtype=self.dtype, name="pwconv2"
        )(out)
        out = LayerScale(self.layer_scale, name="layer_scale")(out)
        key = self.make_rng("dropout") if (train and self.stochastic_depth_prob > 0.0) else None
        out = stochastic_depth(out, self.stochastic_depth_prob, key, train)
        return x + out


class ConvNeXt(nn.Module):
    """ConvNeXt body (reference convnext.py:116-189)."""

    num_blocks: Sequence[int]
    planes: Sequence[int]
    num_classes: int = 10
    in_channels: int = 3
    act_layer: Callable = gelu_exact
    stochastic_depth_prob: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # patchify stem
        x = nn.Conv(
            self.planes[0],
            (4, 4),
            strides=(4, 4),
            use_bias=True,
            kernel_init=trunc_normal_02,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        block_idx = 0
        tot_blocks = sum(self.num_blocks)
        out_planes = list(self.planes[1:]) + [self.planes[-1]]
        for s, (nb, planes, oplanes) in enumerate(zip(self.num_blocks, self.planes, out_planes)):
            for j in range(nb):
                sd_prob = self.stochastic_depth_prob * (block_idx + j) / (tot_blocks - 1.0)
                x = Bottlenext(
                    stochastic_depth_prob=sd_prob,
                    act_layer=self.act_layer,
                    dtype=self.dtype,
                    name=f"stage_{s}_block_{j}",
                )(x, train)
            if planes != oplanes:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"stage_{s}_down_norm")(x)
                x = nn.Conv(
                    oplanes,
                    (2, 2),
                    strides=(2, 2),
                    use_bias=True,
                    kernel_init=trunc_normal_02,
                    dtype=self.dtype,
                    name=f"stage_{s}_down_conv",
                )(x)
            block_idx += nb

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, kernel_init=trunc_normal_02, dtype=self.dtype, name="head")(x)


def _convnext(checkpoint: Optional[Checkpoint], progress: bool, num_blocks, out_chans, **kwargs: Any) -> Model:
    return _configure_model(Model(ConvNeXt(num_blocks, out_chans, **kwargs)), checkpoint, progress=progress)


class ConvNeXt_Atto_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="convnext_atto",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/convnext_atto_224-f38217e7.pth",
        acc1=0.8759,
        acc5=0.9832,
        sha256="f38217e7361060e6fe00e8fa95b0e8774150190eed9e55c812bbd3b6ab378ce9",
        size=13535258,
        num_params=3377730,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch convnext_atto --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def convnext_atto(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-Atto (reference convnext.py:223-249)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, ConvNeXt_Atto_Checkpoint.DEFAULT.value)
    return _convnext(checkpoint, progress, [2, 2, 6, 2], [40, 80, 160, 320], **kwargs)


def convnext_femto(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-Femto (reference convnext.py:252-268)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [2, 2, 6, 2], [48, 96, 192, 384], **kwargs)


def convnext_pico(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-Pico (reference convnext.py:271-287)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [2, 2, 6, 2], [64, 128, 256, 512], **kwargs)


def convnext_nano(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-Nano (reference convnext.py:290-306)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [2, 2, 8, 2], [80, 160, 320, 640], **kwargs)


def convnext_tiny(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-T (reference convnext.py:309-325)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [3, 3, 9, 3], [96, 192, 384, 768], **kwargs)


def convnext_small(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-S (reference convnext.py:328-344)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [3, 3, 27, 3], [96, 192, 384, 768], **kwargs)


def convnext_base(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-B (reference convnext.py:347-363)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [3, 3, 27, 3], [128, 256, 512, 1024], **kwargs)


def convnext_large(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-L (reference convnext.py:366-382)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [3, 3, 27, 3], [192, 384, 768, 1536], **kwargs)


def convnext_xl(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """ConvNeXt-XL (reference convnext.py:385-401)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _convnext(checkpoint, progress, [3, 3, 27, 3], [256, 512, 1024, 2048], **kwargs)
