"""U-Net family (`Ronneberger et al. <https://arxiv.org/pdf/1505.04597.pdf>`_) +
fastai-style DynamicUNet over arbitrary encoders.

Reference: holocron/models/segmentation/unet.py. NHWC; upsampling uses
``jax.image.resize`` (bilinear; the reference's ``align_corners=True`` has no XLA
equivalent — a documented divergence) or transposed convs; the Dynamic variant needs no
dummy-forward shape probing (channels are inferred at trace time).
"""

from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import kaiming_normal
from ..core import Model
from ..layers import max_pool2d
from ..utils import ConvSequence, load_pretrained_params

__all__ = ["DynamicUNet", "UNet", "unet", "unet2", "unet_rexnet13", "unet_tvresnet34", "unet_tvvgg11"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "unet": {"encoder_layout": [64, 128, 256, 512], "url": None},
    "unet2": {"encoder_layout": [64, 128, 256, 512], "url": None},
    "unet_vgg11": {"url": None},
    "unet_tvresnet34": {"url": None},
    "unet_rexnet13": {
        # block indices of the rexnet1_3x feature pyramid (reference unet.py:29-31)
        "backbone_blocks": [0, 2, 4, 10, 15],
        "url": "https://github.com/frgfm/Holocron/releases/download/v0.1.3/unet_rexnet13_256-38315ff3.pth",
    },
}


def upsample2d(x: jax.Array, factor: int = 2, method: str = "bilinear") -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), method=method)


def pixel_shuffle(x: jax.Array, factor: int = 2) -> jax.Array:
    """NHWC pixel shuffle matching torch's channel ordering (c-major)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, rh, w, rw, c
    return x.reshape(n, h * r, w * r, c // (r * r))


def _center_crop(feat: jax.Array, target_hw) -> jax.Array:
    """Crops the contracting-path features to the expansive size (reference unet.py:92-101)."""
    dh = feat.shape[1] - target_hw[0]
    dw = feat.shape[2] - target_hw[1]
    h0 = dh // 2 if dh > 0 else 0
    w0 = dw // 2 if dw > 0 else 0
    return feat[:, h0 : h0 + target_hw[0], w0 : w0 + target_hw[1], :]


class DownPath(nn.Module):
    """(Optional maxpool) + two 3x3 conv blocks (reference unet.py:36-55)."""

    out_chan: int
    downsample: bool = True
    padding: int = 0
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
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
        if self.downsample:
            x = max_pool2d(x, 2, 2)
        x = ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_0", **common)(x, train)
        return ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_1", **common)(x, train)


class UpPath(nn.Module):
    """Upsample + crop-concat skip(s) + two conv blocks (reference unet.py:58-103)."""

    out_chan: int
    bilinear_upsampling: bool = True
    padding: int = 0
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, downfeats, upfeat: jax.Array, train: bool = False) -> jax.Array:
        if not isinstance(downfeats, (list, tuple)):
            downfeats = [downfeats]
        if self.bilinear_upsampling:
            upfeat = upsample2d(upfeat, 2, "bilinear")
        else:
            upfeat = nn.ConvTranspose(
                self.out_chan, (2, 2), strides=(2, 2), kernel_init=kaiming_normal(), dtype=self.dtype, name="upconv"
            )(upfeat)
        downfeats = [_center_crop(f, upfeat.shape[1:3]) for f in downfeats]
        x = jnp.concatenate([*downfeats, upfeat], axis=-1)
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        x = ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_0", **common)(x, train)
        return ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_1", **common)(x, train)


class UNet(nn.Module):
    """Plain U-Net (reference unet.py:140-227)."""

    layout: Sequence[int]
    in_channels: int = 3
    num_classes: int = 10
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    same_padding: bool = True
    bilinear_upsampling: bool = True
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
        pad = int(self.same_padding)
        xs: List[jax.Array] = []
        for idx, out_chan in enumerate(self.layout):
            xs.append(
                DownPath(out_chan, idx > 0, pad, name=f"encoder_{idx}", **common)(xs[-1] if xs else x, train)
            )
        # bridge: maxpool + expand/contract convs (reference unet.py:181-189)
        b = max_pool2d(xs[-1], 2, 2)
        b = ConvSequence(2 * self.layout[-1], kernel_size=3, padding=1, name="bridge_0", **common)(b, train)
        b = ConvSequence(self.layout[-1], kernel_size=3, padding=1, name="bridge_1", **common)(b, train)

        rev = list(self.layout)[::-1]
        out_chans = [c // 2 if self.bilinear_upsampling else c for c in rev[:-1]] + [self.layout[0]]
        x = b
        for idx, out_chan in enumerate(out_chans):
            x = UpPath(out_chan, self.bilinear_upsampling, pad, name=f"decoder_{idx}", **common)(
                xs.pop(), x, train
            )
        return nn.Conv(self.num_classes, (1, 1), kernel_init=kaiming_normal(), dtype=self.dtype, name="classifier")(x)


class UBlock(nn.Module):
    """fastai-style up block: 1x1 conv + pixel shuffle, BN'd skip, two convs
    (reference unet.py:229-280)."""

    out_chan: int
    padding: int = 0
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, downfeat: jax.Array, upfeat: jax.Array, train: bool = False) -> jax.Array:
        from ..layers import BatchNorm2d

        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        up_chan = upfeat.shape[-1]
        up = ConvSequence(up_chan * 4, kernel_size=1, name="up_conv", **common)(upfeat, train)
        up = pixel_shuffle(up, 2)
        if downfeat.shape[1:3] != up.shape[1:3]:
            # torch-legacy nearest (src = floor(dst * in/out), reference unet.py:276):
            # differs from jax.image.resize's half-pixel convention whenever this path
            # DOWNSCALES (the bottom decoder block shrinks its 2x-upsampled features
            # back to the skip's size — e.g. 4x4 -> 2x2 picks pixels 0/2, not 1/3)
            h, w = up.shape[1:3]
            rows = jnp.floor(jnp.arange(downfeat.shape[1]) * (h / downfeat.shape[1])).astype(jnp.int32)
            cols = jnp.floor(jnp.arange(downfeat.shape[2]) * (w / downfeat.shape[2])).astype(jnp.int32)
            up = up[:, rows][:, :, cols]
        down = BatchNorm2d(dtype=self.dtype, name="bn")(downfeat, train)
        x = self.act_layer(jnp.concatenate([down, up], axis=-1))
        x = ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_0", **common)(x, train)
        return ConvSequence(self.out_chan, kernel_size=3, padding=self.padding, name="conv_1", **common)(x, train)


class UNetBackbone(nn.Module):
    """Contracting path returning the per-stage feature pyramid (reference unet.py:106-137
    features; used as the ``unet2`` encoder)."""

    layout: Sequence[int]
    in_channels: int = 3
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    same_padding: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        feats = []
        for idx, out_chan in enumerate(self.layout):
            x = DownPath(
                out_chan,
                idx > 0,
                int(self.same_padding),
                self.act_layer,
                self.norm_layer,
                self.drop_layer,
                self.conv_layer,
                self.dtype,
                name=f"encoder_{idx}",
            )(x, train)
            feats.append(x)
        return feats


class VGG11Features(nn.Module):
    """Minimal VGG-11 feature pyramid (replaces the torchvision backbone of
    ``unet_tvvgg11``; returns features after conv1 and each pooled stage)."""

    act_layer: Callable = jax.nn.relu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        cfg = [(64,), (128,), (256, 256), (512, 512), (512, 512)]
        feats = []
        for s, widths in enumerate(cfg):
            if s > 0:
                x = max_pool2d(x, 2, 2)
            for j, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=1, kernel_init=kaiming_normal(), dtype=self.dtype, name=f"conv_{s}_{j}")(x)
                x = self.act_layer(x)
            feats.append(x)
        return feats


class DynamicUNet(nn.Module):
    """U-Net over an arbitrary encoder returning a feature pyramid
    (reference unet.py:282-377). Channel plumbing is trace-time inferred — the
    reference's dummy-forward shape probing (unet.py:314-322) is unnecessary here.
    """

    encoder: nn.Module
    num_classes: int = 10
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    same_padding: bool = True
    final_upsampling: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ..layers import BatchNorm2d

        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        xs = list(self.encoder(x, train))
        chans = [f.shape[-1] for f in xs]

        b = BatchNorm2d(dtype=self.dtype, name="bridge_bn")(xs[-1], train)
        b = self.act_layer(b)
        b = ConvSequence(2 * chans[-1], kernel_size=3, padding=1, name="bridge_0", **common)(b, train)
        b = ConvSequence(chans[-1], kernel_size=3, padding=1, name="bridge_1", **common)(b, train)

        layout = chans[::-1][1:] + [chans[0]]
        pad = int(self.same_padding)
        xcur = b
        for idx, out_chan in enumerate(layout):
            xcur = UBlock(out_chan, pad, name=f"decoder_{idx}", **common)(xs.pop(), xcur, train)
        if self.final_upsampling:
            xcur = ConvSequence(xcur.shape[-1] * 4, kernel_size=1, name="final_up_conv", **common)(xcur, train)
            xcur = pixel_shuffle(xcur, 2)
        return nn.Conv(
            self.num_classes, (1, 1), kernel_init=kaiming_normal(), dtype=self.dtype, name="classifier"
        )(xcur)


def _unet(arch: str, pretrained: bool, progress: bool, **kwargs: Any) -> Model:
    model = Model(UNet(default_cfgs[arch]["encoder_layout"], **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def unet(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """U-Net (reference unet.py:383-399)."""
    return _unet("unet", pretrained, progress, **kwargs)


def _dynamic_unet(arch: str, encoder: nn.Module, pretrained: bool, progress: bool, num_classes: int = 21, **kwargs: Any) -> Model:
    model = Model(DynamicUNet(encoder, num_classes=num_classes, **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def unet2(pretrained: bool = False, progress: bool = True, in_channels: int = 3, **kwargs: Any) -> Model:
    """U-Net with fastai-style upscaling over the plain encoder (reference unet.py:420-441)."""
    encoder = UNetBackbone(default_cfgs["unet2"]["encoder_layout"], in_channels=in_channels)
    return _dynamic_unet("unet2", encoder, pretrained, progress, **kwargs)


def unet_tvvgg11(pretrained: bool = False, pretrained_backbone: bool = True, progress: bool = True, **kwargs: Any) -> Model:
    """DynamicUNet over a VGG-11 encoder (reference unet.py:444-464)."""
    return _dynamic_unet("unet_vgg11", VGG11Features(), pretrained, progress, **kwargs)


def unet_tvresnet34(pretrained: bool = False, pretrained_backbone: bool = True, progress: bool = True, **kwargs: Any) -> Model:
    """DynamicUNet over a ResNet-34 encoder (reference unet.py:467-487)."""
    from .encoders import ResNet34Features

    kwargs["final_upsampling"] = kwargs.get("final_upsampling", True)
    return _dynamic_unet("unet_tvresnet34", ResNet34Features(), pretrained, progress, **kwargs)


def unet_rexnet13(
    pretrained: bool = False, pretrained_backbone: bool = True, progress: bool = True, in_channels: int = 3, **kwargs: Any
) -> Model:
    """DynamicUNet over a ReXNet-1.3x encoder (reference unet.py:490-513)."""
    from .encoders import ReXNetFeatures

    kwargs["final_upsampling"] = kwargs.get("final_upsampling", True)
    kwargs["act_layer"] = kwargs.get("act_layer", jax.nn.silu)
    encoder = ReXNetFeatures(width_mult=1.3, out_blocks=tuple(default_cfgs["unet_rexnet13"]["backbone_blocks"]))
    return _dynamic_unet("unet_rexnet13", encoder, pretrained, progress, **kwargs)
