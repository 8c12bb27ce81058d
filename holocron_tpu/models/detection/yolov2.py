"""YOLOv2 (`Redmon & Farhadi <https://pjreddie.com/media/files/papers/YOLO9000.pdf>`_).

Reference: holocron/models/detection/yolov2.py — Darknet-19 body with the passthrough
feature stacked via space-to-depth, 5 K-means anchor priors, sigmoid-offset /
anchor-exp decoding; shares the vectorized YOLOv1/v2 loss.
"""

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.functional import concat_downsample2d
from ...nn.init import kaiming_normal
from ..classification.darknetv2 import DarknetBodyV2, leaky_relu_01
from ..classification.darknetv2 import Darknet19_Checkpoint
from ..layers import FrozenBatchNorm2d
from ..utils import ConvSequence, load_pretrained_params
from .yolo import DetectionModel, yolo_v12_losses

__all__ = ["YOLOv2", "yolov2"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "yolov2": {"arch": "YOLOv2", "backbone_url": Darknet19_Checkpoint.DEFAULT.value.meta.url, "url": None},
}

# K-means priors from the darknet yolov2-voc config, normalized by the 13x13 grid
# (reference yolov2.py:64-75)
DEFAULT_ANCHORS: Tuple[Tuple[float, float], ...] = tuple(
    (aw / 13, ah / 13)
    for aw, ah in [(1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892), (9.47112, 4.84053), (11.2364, 10.0071)]
)


class YOLOv2(nn.Module):
    """YOLOv2 (reference yolov2.py:30-252)."""

    layout: Sequence[Tuple[int, int]]
    num_classes: int = 20
    in_channels: int = 3
    stem_chanels: int = 32
    anchors: Tuple[Tuple[float, float], ...] = DEFAULT_ANCHORS
    passthrough_ratio: int = 8
    lambda_obj: float = 1.0
    lambda_noobj: float = 0.5
    lambda_class: float = 1.0
    lambda_coords: float = 5.0
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    backbone_norm_layer: Optional[Any] = None
    dtype: Optional[Any] = None

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)

    @nn.compact
    def __call__(self, x: jax.Array, target: Optional[Dict[str, jax.Array]] = None, train: bool = False):
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        backbone_norm = self.backbone_norm_layer if self.backbone_norm_layer is not None else self.norm_layer
        out, passthrough = DarknetBodyV2(
            self.layout, self.in_channels, self.stem_chanels, True, self.act_layer, backbone_norm,
            self.drop_layer, self.conv_layer, self.dtype, name="backbone",
        )(x, train)

        top = self.layout[-1][0]
        out = ConvSequence(top, kernel_size=3, padding=1, name="block5_0", **common)(out, train)
        out = ConvSequence(top, kernel_size=3, padding=1, name="block5_1", **common)(out, train)

        passthrough = ConvSequence(
            self.layout[-2][0] // self.passthrough_ratio, kernel_size=1, name="passthrough", **common
        )(passthrough, train)
        passthrough = concat_downsample2d(passthrough, 2)

        out = jnp.concatenate([passthrough, out], axis=-1)
        out = ConvSequence(top, kernel_size=3, padding=1, name="block6", **common)(out, train)

        num_anchors = self.num_anchors
        out = nn.Conv(
            num_anchors * (5 + self.num_classes),
            (1, 1),
            kernel_init=kaiming_normal(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="head",
        )(out)

        b, h, w, _ = out.shape
        out = out.reshape(b, h, w, num_anchors, 5 + self.num_classes)
        b_scores = jax.nn.softmax(out[..., -self.num_classes :], axis=-1)

        anchors = jnp.asarray(self.anchors, out.dtype)  # (A, 2)
        c_x = jnp.arange(w, dtype=out.dtype).reshape(1, 1, -1, 1)
        c_y = jnp.arange(h, dtype=out.dtype).reshape(1, -1, 1, 1)
        b_x = (jax.nn.sigmoid(out[..., 0]) + c_x) / w
        b_y = (jax.nn.sigmoid(out[..., 1]) + c_y) / h
        b_w = anchors[:, 0].reshape(1, 1, 1, -1) * jnp.exp(out[..., 2])
        b_h = anchors[:, 1].reshape(1, 1, 1, -1) * jnp.exp(out[..., 3])
        b_o = jax.nn.sigmoid(out[..., 4])

        xy = jnp.stack([b_x, b_y], axis=-1)
        wh = jnp.stack([b_w, b_h], axis=-1)
        pred_xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)

        if target is not None:
            return yolo_v12_losses(
                pred_xyxy, xy, wh, b_o, b_scores, target,
                self.lambda_obj, self.lambda_noobj, self.lambda_class, self.lambda_coords,
            )
        return (
            pred_xyxy.reshape(b, -1, 4),
            b_o.reshape(b, -1),
            b_scores.reshape(b, -1, self.num_classes),
        )


def _yolo(arch: str, pretrained: bool, progress: bool, pretrained_backbone: bool, layout, **kwargs: Any) -> DetectionModel:
    if pretrained:
        pretrained_backbone = False
    model = DetectionModel(YOLOv2(layout, **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained_backbone:
        load_pretrained_params(model, default_cfgs[arch]["backbone_url"], progress, key_filter="features.")
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def yolov2(pretrained: bool = False, progress: bool = True, pretrained_backbone: bool = True, **kwargs: Any) -> DetectionModel:
    """YOLOv2 (reference yolov2.py:279-332)."""
    if pretrained_backbone:
        # freeze the pretrained backbone's normalization (reference yolov2.py:311)
        kwargs["backbone_norm_layer"] = lambda c, name=None: FrozenBatchNorm2d(name=name)
    return _yolo(
        "yolov2",
        pretrained,
        progress,
        pretrained_backbone,
        [(64, 0), (128, 1), (256, 1), (512, 2), (1024, 2)],
        **kwargs,
    )
