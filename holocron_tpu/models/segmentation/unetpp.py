"""UNet+ / UNet++ (`Zhou et al. <https://arxiv.org/pdf/1912.05074.pdf>`_).

Reference: holocron/models/segmentation/unetpp.py — the nested cascade (UNet+) and the
dense skip grid (UNet++), translated loop-for-loop (all Python-level control flow over
statically-shaped features).
"""

from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax

from ...nn.init import kaiming_normal
from ..core import Model
from ..layers import max_pool2d
from ..utils import ConvSequence, load_pretrained_params
from .unet import DownPath, UpPath

__all__ = ["UNetp", "UNetpp", "unetp", "unetpp"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "unetp": {"arch": "UNetp", "layout": [64, 128, 256, 512], "url": None},
    "unetpp": {"arch": "UNetpp", "layout": [64, 128, 256, 512], "url": None},
}


class _NestedUNet(nn.Module):
    """Shared encoder/bridge plumbing for the nested variants."""

    layout: Sequence[int]
    in_channels: int = 3
    num_classes: int = 10
    act_layer: Callable = jax.nn.relu
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    def _common(self):
        return {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }

    def _encode(self, x, train):
        common = self._common()
        xs = []
        for idx, out_chan in enumerate(self.layout):
            xs.append(DownPath(out_chan, idx > 0, 1, name=f"encoder_{idx}", **common)(xs[-1] if xs else x, train))
        b = max_pool2d(xs[-1], 2, 2)
        b = ConvSequence(2 * self.layout[-1], kernel_size=3, padding=1, name="bridge_0", **common)(b, train)
        b = ConvSequence(self.layout[-1], kernel_size=3, padding=1, name="bridge_1", **common)(b, train)
        return xs, b

    def _classify(self, x):
        return nn.Conv(self.num_classes, (1, 1), kernel_init=kaiming_normal(), dtype=self.dtype, name="classifier")(x)


class UNetp(_NestedUNet):
    """UNet+: nested cascade where each row refines with the level below
    (reference unetpp.py:25-101)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = self._common()
        xs, bridge = self._encode(x, train)
        xs.append(bridge)

        num_rows = len(self.layout)
        for j in range(num_rows):
            for i in range(len(xs) - 1):
                up_feat = xs[i + 1] if (i + 2) < len(xs) else xs.pop()
                # decoder[-1-i] indexes rows bottom-up in the reference; our naming is
                # decoder_{level}_{cell}: level i (shallow=0), cell j
                xs[i] = UpPath(self.layout[i], True, 1, name=f"decoder_{i}_{j}", **common)(xs[i], up_feat, train)
        return self._classify(xs.pop())


class UNetpp(_NestedUNet):
    """UNet++: dense skip grid — each cell sees all previous cells of its row
    (reference unetpp.py:104-181)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = self._common()
        enc, bridge = self._encode(x, train)
        xs: List[List[jax.Array]] = [[f] for f in enc]
        xs.append([bridge])

        num_rows = len(self.layout)
        for j in range(num_rows):
            for i in range(len(xs) - 1):
                up_feat = xs[i + 1][j] if (i + 2) < len(xs) else xs.pop()[-1]
                xs[i].append(
                    UpPath(self.layout[i], True, 1, name=f"decoder_{i}_{j}", **common)(xs[i], up_feat, train)
                )
        return self._classify(xs.pop()[-1])


def _unet(arch: str, pretrained: bool, progress: bool, **kwargs: Any) -> Model:
    unet_type = {"UNetp": UNetp, "UNetpp": UNetpp}[default_cfgs[arch]["arch"]]
    model = Model(unet_type(default_cfgs[arch]["layout"], **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def unetp(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """UNet+ (reference unetpp.py:199-214)."""
    return _unet("unetp", pretrained, progress, **kwargs)


def unetpp(pretrained: bool = False, progress: bool = True, **kwargs: Any) -> Model:
    """UNet++ (reference unetpp.py:217-232)."""
    return _unet("unetpp", pretrained, progress, **kwargs)
