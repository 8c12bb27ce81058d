"""MobileOne (`Vasu et al. <https://arxiv.org/pdf/2206.04040.pdf>`_), s0-s3.

Reference: holocron/models/classification/mobileone.py. Train form: over-parametrized
depth-wise blocks (BN branch + strided 1x1-dw branch + k 3x3-dw branches) and point-wise
blocks (BN branch + k 1x1 branches); ``reparametrize`` fuses each into a single conv —
pure pytree math, mirroring the torch fuse path (mobileone.py:69-97 / :121-146).
"""

from enum import Enum
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import kaiming_normal
from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..layers import BatchNorm2d
from ..utils import _checkpoint, _configure_model, fuse_conv_bn

__all__ = [
    "MobileOne",
    "MobileOne_S0_Checkpoint",
    "MobileOne_S1_Checkpoint",
    "MobileOne_S2_Checkpoint",
    "MobileOne_S3_Checkpoint",
    "mobileone_s0",
    "mobileone_s1",
    "mobileone_s2",
    "mobileone_s3",
]


class DepthConvBlock(nn.Module):
    """Reparametrizeable depth-wise block (reference mobileone.py:31-97)."""

    num_blocks: int
    stride: int = 1
    deploy: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = x.shape[-1]
        conv_kw = {
            "feature_group_count": channels,
            "use_bias": False,
            "kernel_init": kaiming_normal(),
            "dtype": self.dtype,
        }
        if self.deploy:
            return nn.Conv(
                channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                feature_group_count=channels,
                use_bias=True,
                kernel_init=kaiming_normal(),
                dtype=self.dtype,
                name="rep",
            )(x)
        out = 0.0
        if self.stride == 1:
            out = out + BatchNorm2d(dtype=self.dtype, name="bn")(x, train)
        b = nn.Conv(channels, (1, 1), strides=(self.stride, self.stride), name="conv_s_conv", **conv_kw)(x)
        out = out + BatchNorm2d(dtype=self.dtype, name="conv_s_bn")(b, train)
        for i in range(self.num_blocks):
            b = nn.Conv(
                channels, (3, 3), strides=(self.stride, self.stride), padding=1, name=f"conv_{i}_conv", **conv_kw
            )(x)
            out = out + BatchNorm2d(dtype=self.dtype, name=f"conv_{i}_bn")(b, train)
        return out


class PointConvBlock(nn.Module):
    """Reparametrizeable point-wise block (reference mobileone.py:100-146)."""

    out_channels: int
    num_blocks: int
    deploy: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        if self.deploy:
            return nn.Conv(
                self.out_channels, (1, 1), use_bias=True, kernel_init=kaiming_normal(), dtype=self.dtype, name="rep"
            )(x)
        out = 0.0
        if self.out_channels == in_channels:
            out = out + BatchNorm2d(dtype=self.dtype, name="bn")(x, train)
        for i in range(self.num_blocks):
            b = nn.Conv(
                self.out_channels,
                (1, 1),
                use_bias=False,
                kernel_init=kaiming_normal(),
                dtype=self.dtype,
                name=f"conv_{i}_conv",
            )(x)
            out = out + BatchNorm2d(dtype=self.dtype, name=f"conv_{i}_bn")(b, train)
        return out


class MobileOneBlock(nn.Module):
    """Depth-wise block -> act -> point-wise block -> act (reference mobileone.py:149-178)."""

    out_channels: int
    overparam_factor: int = 1
    stride: int = 1
    act_layer: Callable = jax.nn.relu
    deploy: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = DepthConvBlock(self.overparam_factor, self.stride, self.deploy, self.dtype, name="depth")(x, train)
        x = self.act_layer(x)
        x = PointConvBlock(self.out_channels, self.overparam_factor, self.deploy, self.dtype, name="point")(x, train)
        return self.act_layer(x)


def _fuse_depth_block(params: dict, stats: dict, num_blocks: int, eps: float = 1e-5) -> dict:
    """Fuses a DepthConvBlock into one biased 3x3 depthwise conv (mobileone.py:69-97)."""
    any_kernel = params["conv_0_conv"]["kernel"]  # (3, 3, 1, C)
    channels = any_kernel.shape[-1]
    kernel = jnp.zeros((3, 3, 1, channels), any_kernel.dtype)
    bias = jnp.zeros((channels,), any_kernel.dtype)
    if "bn" in params:  # identity BN branch
        scale = params["bn"]["scale"] / jnp.sqrt(stats["bn"]["var"] + eps)
        kernel = kernel.at[1, 1, 0].add(scale)
        bias = bias + params["bn"]["bias"] - scale * stats["bn"]["mean"]
    k1, b1 = fuse_conv_bn(
        params["conv_s_conv"]["kernel"],
        params["conv_s_bn"]["scale"],
        params["conv_s_bn"]["bias"],
        stats["conv_s_bn"]["mean"],
        stats["conv_s_bn"]["var"],
        eps=eps,
    )
    kernel = kernel.at[1:2, 1:2].add(k1)
    bias = bias + b1
    for i in range(num_blocks):
        k3, b3 = fuse_conv_bn(
            params[f"conv_{i}_conv"]["kernel"],
            params[f"conv_{i}_bn"]["scale"],
            params[f"conv_{i}_bn"]["bias"],
            stats[f"conv_{i}_bn"]["mean"],
            stats[f"conv_{i}_bn"]["var"],
            eps=eps,
        )
        kernel = kernel + k3
        bias = bias + b3
    return {"rep": {"kernel": kernel, "bias": bias}}


def _fuse_point_block(params: dict, stats: dict, num_blocks: int, eps: float = 1e-5) -> dict:
    """Fuses a PointConvBlock into one biased 1x1 conv (mobileone.py:121-146)."""
    any_kernel = params["conv_0_conv"]["kernel"]  # (1, 1, in, out)
    in_c, out_c = any_kernel.shape[-2:]
    kernel = jnp.zeros((1, 1, in_c, out_c), any_kernel.dtype)
    bias = jnp.zeros((out_c,), any_kernel.dtype)
    if "bn" in params:
        scale = params["bn"]["scale"] / jnp.sqrt(stats["bn"]["var"] + eps)
        kernel = kernel.at[0, 0, jnp.arange(in_c), jnp.arange(out_c)].add(scale)
        bias = bias + params["bn"]["bias"] - scale * stats["bn"]["mean"]
    for i in range(num_blocks):
        k, b = fuse_conv_bn(
            params[f"conv_{i}_conv"]["kernel"],
            params[f"conv_{i}_bn"]["scale"],
            params[f"conv_{i}_bn"]["bias"],
            stats[f"conv_{i}_bn"]["mean"],
            stats[f"conv_{i}_bn"]["var"],
            eps=eps,
        )
        kernel = kernel + k
        bias = bias + b
    return {"rep": {"kernel": kernel, "bias": bias}}


class MobileOne(nn.Module):
    """MobileOne body (reference mobileone.py:181-235)."""

    num_blocks: Sequence[int]
    width_multipliers: Sequence[float]
    overparam_factor: int = 1
    num_classes: int = 10
    in_channels: int = 3
    act_layer: Callable = jax.nn.relu
    deploy: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        base_planes = [64, 128, 256, 512]
        planes = [round(mult * chans) for mult, chans in zip(self.width_multipliers, base_planes)]
        in_planes = min(64, planes[0])
        x = MobileOneBlock(
            in_planes, self.overparam_factor, 2, self.act_layer, self.deploy, self.dtype, name="features_0"
        )(x, train)
        for s, (nb, p) in enumerate(zip(self.num_blocks, planes)):
            for j in range(nb):
                x = MobileOneBlock(
                    p,
                    self.overparam_factor,
                    2 if j == 0 else 1,
                    self.act_layer,
                    self.deploy,
                    self.dtype,
                    name=f"features_{s + 1}_{j}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)

    def reparametrize(self, variables: dict) -> Tuple["MobileOne", dict]:
        """Fuses every block (reference mobileone.py:228-235)."""
        if self.deploy:
            raise AssertionError("model is already reparametrized")

        def fuse(variables: dict) -> dict:
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            new_params = {}
            for name, bp in params.items():
                if name.startswith("features_"):
                    new_params[name] = {
                        "depth": _fuse_depth_block(bp["depth"], stats[name]["depth"], self.overparam_factor),
                        "point": _fuse_point_block(bp["point"], stats[name]["point"], self.overparam_factor),
                    }
                else:
                    new_params[name] = bp
            return {"params": new_params}

        return self.clone(deploy=True), jax.jit(fuse)(variables)


def _mobileone(
    checkpoint: Optional[Checkpoint], progress: bool, width_multipliers, overparam_factor: int, **kwargs: Any
) -> Model:
    module = MobileOne([2, 8, 10, 1], width_multipliers, overparam_factor, **kwargs)
    return _configure_model(Model(module), checkpoint, progress=progress)


class MobileOne_S0_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="mobileone_s0",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/mobileone_s0_224-9ddd1fe9.pth",
        acc1=0.8808,
        acc5=0.9883,
        sha256="9ddd1fe9d6c0a73d3c4d51d3c967a8a27ff5e545705afc557b4d4ac0f34395cb",
        size=17708169,
        num_params=4277991,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch mobileone_s0 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class MobileOne_S1_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="mobileone_s1",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/mobileone_s1_224-d4ec5433.pth",
        acc1=0.9126,
        acc5=0.9918,
        sha256="d4ec5433cff3d55d562b7a35fc0c95568ff8f4591bf822dd3e699535bdff90eb",
        size=14594817,
        num_params=3555188,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch mobileone_s1 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class MobileOne_S2_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="mobileone_s2",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/mobileone_s2_224-b748859c.pth",
        acc1=0.9131,
        acc5=0.9921,
        sha256="b748859c45a636ea22f0f68a3b7e75e5fb6ffb31178a5a3137931a21b4c41697",
        size=23866479,
        num_params=5854324,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch mobileone_s2 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class MobileOne_S3_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="mobileone_s3",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/mobileone_s3_224-7f357baf.pth",
        acc1=0.9106,
        acc5=0.9931,
        sha256="7f357baf0754136b4a02e7aec4129874db93ee462f43588b77def730db0b2bca",
        size=33080943,
        num_params=8140276,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch mobileone_s3 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def mobileone_s0(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """MobileOne-S0 (reference mobileone.py:269-295)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, MobileOne_S0_Checkpoint.DEFAULT.value)
    return _mobileone(checkpoint, progress, [0.75, 1.0, 1.0, 2.0], 4, **kwargs)


def mobileone_s1(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """MobileOne-S1 (reference mobileone.py:317-343)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, MobileOne_S1_Checkpoint.DEFAULT.value)
    return _mobileone(checkpoint, progress, [1.5, 1.5, 2.0, 2.5], 1, **kwargs)


def mobileone_s2(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """MobileOne-S2 (reference mobileone.py:365-391)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, MobileOne_S2_Checkpoint.DEFAULT.value)
    return _mobileone(checkpoint, progress, [1.5, 2.0, 2.5, 4.0], 1, **kwargs)


def mobileone_s3(pretrained: bool = False, checkpoint: Optional[Checkpoint] = None, progress: bool = True, **kwargs: Any) -> Model:
    """MobileOne-S3 (reference mobileone.py:413-439)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, MobileOne_S3_Checkpoint.DEFAULT.value)
    return _mobileone(checkpoint, progress, [2.0, 2.5, 3.0, 4.0], 1, **kwargs)
