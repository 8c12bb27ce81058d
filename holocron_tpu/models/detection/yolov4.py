"""YOLOv4 (`Bochkovskiy et al. <https://arxiv.org/pdf/2004.10934.pdf>`_).

Reference: holocron/models/detection/yolov4.py — CSPDarknet-53 backbone (3 feature
scales), SPP + PAN neck, three scale-specific Yolo layers (scale_xy decode, anchor
assignment by wh-IoU, CIoU box loss, BCE class loss). The reference's per-image target
assignment (yolov4.py:338-389) is replaced by dense masked tensors over padded GT.
"""

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.modules.downsample import SPP
from ...nn.modules.dropblock import DropBlock2d
from ...ops.boxes import ciou_loss
from ..classification.darknetv4 import CSPDarknet53_Mish_Checkpoint, DarknetBodyV4
from ..layers import FrozenBatchNorm2d
from ..utils import ConvSequence, load_pretrained_params
from ._utils import box_iou_pairwise
from .yolo import DetectionModel

__all__ = ["PAN", "Neck", "YOLOv4", "YoloLayer", "Yolov4Head", "yolov4"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "yolov4": {"arch": "YOLOv4", "backbone_url": CSPDarknet53_Mish_Checkpoint.DEFAULT.value.meta.url, "url": None},
}

# COCO anchor priors, normalized by the 608 input (reference yolov4.py:448-467)
DEFAULT_ANCHORS = tuple(
    tuple((aw / 608, ah / 608) for aw, ah in scale)
    for scale in (
        ((12, 16), (19, 36), (40, 28)),
        ((36, 75), (76, 55), (72, 146)),
        ((142, 110), (192, 243), (459, 401)),
    )
)


class PAN(nn.Module):
    """Path-aggregation block (reference yolov4.py:31-139)."""

    act_layer: Callable = jax.nn.leaky_relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, up: jax.Array, train: bool = False) -> jax.Array:
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        half = x.shape[-1] // 2
        out = ConvSequence(half, kernel_size=1, name="conv1", **common)(x, train)
        n, h, w, c = out.shape
        out = jax.image.resize(out, (n, h * 2, w * 2, c), method="nearest")
        lateral = ConvSequence(half, kernel_size=1, name="conv2", **common)(up, train)
        out = jnp.concatenate([lateral, out], axis=-1)
        out = ConvSequence(half, kernel_size=1, name="convs_0", **common)(out, train)
        out = ConvSequence(2 * half, kernel_size=3, padding=1, name="convs_1", **common)(out, train)
        out = ConvSequence(half, kernel_size=1, name="convs_2", **common)(out, train)
        out = ConvSequence(2 * half, kernel_size=3, padding=1, name="convs_3", **common)(out, train)
        return ConvSequence(half, kernel_size=1, name="convs_4", **common)(out, train)


class Neck(nn.Module):
    """FPN conv stack + SPP(5/9/13) + two PAN stages (reference yolov4.py:142-230)."""

    act_layer: Callable = jax.nn.leaky_relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        deep = feats[2]
        c = deep.shape[-1]
        out = ConvSequence(c // 2, kernel_size=1, name="fpn_0", **common)(deep, train)
        out = ConvSequence(c, kernel_size=3, padding=1, name="fpn_1", **common)(out, train)
        out = ConvSequence(c // 2, kernel_size=1, name="fpn_2", **common)(out, train)
        out = SPP(kernel_sizes=(5, 9, 13), name="spp")(out)
        out = ConvSequence(c // 2, kernel_size=1, name="fpn_3", **common)(out, train)
        out = ConvSequence(c, kernel_size=3, padding=1, name="fpn_4", **common)(out, train)
        out = ConvSequence(c // 2, kernel_size=1, name="fpn_5", **common)(out, train)

        aux1 = PAN(name="pan1", **common)(out, feats[1], train)
        aux2 = PAN(name="pan2", **common)(aux1, feats[0], train)
        return aux2, aux1, out


class YoloLayer:
    """Scale-specific decode / target building / losses (reference yolov4.py:232-443).

    A plain (parameter-free) helper: decode + losses are pure functions of the head
    output and the padded ground truth.
    """

    def __init__(
        self,
        anchors: Sequence[Tuple[float, float]],
        num_classes: int = 80,
        scale_xy: float = 1.0,
        iou_thresh: float = 0.213,
        lambda_obj: float = 1.0,
        lambda_noobj: float = 0.001,
        lambda_class: float = 0.1,
        lambda_coords: float = 1.0,
        ignore_thresh: float = 0.5,
    ) -> None:
        self.anchors = tuple(anchors)
        self.num_classes = num_classes
        self.scale_xy = scale_xy
        self.iou_thresh = iou_thresh
        self.lambda_obj = lambda_obj
        self.lambda_noobj = lambda_noobj
        self.lambda_class = lambda_class
        self.lambda_coords = lambda_coords
        self.ignore_thresh = ignore_thresh

    def format_outputs(self, output: jax.Array):
        """Decode raw head output (NHWC) to boxes/objectness/class logits
        (reference yolov4.py:269-300)."""
        b, h, w, _ = output.shape
        num_anchors = len(self.anchors)
        output = output.reshape(b, h, w, num_anchors, 5 + self.num_classes)
        anchors = jnp.asarray(self.anchors, output.dtype)

        c_x = jnp.arange(w, dtype=output.dtype).reshape(1, 1, -1, 1)
        c_y = jnp.arange(h, dtype=output.dtype).reshape(1, -1, 1, 1)
        b_xy = self.scale_xy * jax.nn.sigmoid(output[..., :2]) - 0.5 * (self.scale_xy - 1)
        b_x = (b_xy[..., 0] + c_x) / w
        b_y = (b_xy[..., 1] + c_y) / h
        # clip wh to [0, 2] to avoid exp overflow (yolov4.py:289-291)
        b_wh = jnp.clip(jnp.exp(output[..., 2:4]) * anchors.reshape(1, 1, 1, -1, 2), 0.0, 2.0)
        xy = jnp.stack([b_x, b_y], axis=-1)
        top_left = xy - 0.5 * b_wh
        boxes = jnp.concatenate([top_left, top_left + b_wh], axis=-1)
        b_o = output[..., 4]  # logits
        b_scores = output[..., 5:]  # logits
        return boxes, b_o, b_scores

    def compute_losses(self, pred_boxes, b_o, b_scores, target) -> Dict[str, jax.Array]:
        """Vectorized form of the reference's `_build_targets` + `_compute_losses`
        (yolov4.py:338-421).

        A/B-verified vs the reference on identical raw outputs: obj/clf exact,
        noobj ≤2e-7 modulo two reference bugs we fix — their ignore-thresh write
        (yolov4.py:386-387) lands on an advanced-indexing copy (no-op), and their CIoU
        αv never lands (masked addcdiv_ on a copy), making their bbox loss DIoU.
        """
        b, h, w, num_anchors = b_o.shape
        anchors = jnp.asarray(self.anchors, pred_boxes.dtype)

        def per_image(pboxes, po, pscores, gtb, gtl, gtm):
            gt_xy = (gtb[:, :2] + gtb[:, 2:]) / 2.0
            gt_wh = jnp.clip(gtb[:, 2:] - gtb[:, :2], 0.0)
            cx = jnp.clip((gt_xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
            cy = jnp.clip((gt_xy[:, 1] * h).astype(jnp.int32), 0, h - 1)
            # anchor choice by wh-only IoU (yolov4.py:357-361)
            inter = jnp.minimum(gt_wh[:, None, 0], anchors[None, :, 0]) * jnp.minimum(
                gt_wh[:, None, 1], anchors[None, :, 1]
            )
            union = gt_wh[:, 0:1] * gt_wh[:, 1:2] + anchors[None, :, 0] * anchors[None, :, 1] - inter
            a_star = jnp.argmax(inter / jnp.maximum(union, 1e-12), axis=1)

            gtm_f = gtm.astype(pboxes.dtype)
            obj_mask = jnp.zeros((h, w, num_anchors), bool).at[cy, cx, a_star].max(gtm)
            noobj_mask = jnp.ones((h, w, num_anchors), pboxes.dtype)
            noobj_mask = noobj_mask.at[cy, cx, :].multiply(jnp.where(gtm, 0.0, 1.0)[:, None])

            # per-prediction best GT (yolov4.py:367-380)
            iou = box_iou_pairwise(pboxes.reshape(-1, 4), gtb)  # (HWA, M)
            iou = jnp.where(gtm[None, :], iou, -1.0)
            best_iou = jnp.max(iou, axis=1).reshape(h, w, num_anchors)
            best_gt = jnp.argmax(iou, axis=1).reshape(h, w, num_anchors)
            target_o = jnp.where(obj_mask, jnp.clip(best_iou, 0.0), 0.0)
            target_labels = gtl[best_gt]
            target_scores = jax.nn.one_hot(target_labels, self.num_classes, dtype=pboxes.dtype)
            target_scores = target_scores * obj_mask[..., None]
            # ignore confident predictions in the noobj penalty (yolov4.py:378-380)
            noobj_mask = noobj_mask * (best_iou < self.ignore_thresh)

            po_sig = jax.nn.sigmoid(po)
            obj_loss = jnp.sum(jnp.where(obj_mask, (po_sig - target_o) ** 2, 0.0))
            noobj_loss = jnp.sum(noobj_mask * po_sig**2)

            # CIoU box loss: min over GTs at responsible positions (yolov4.py:390-399).
            # Padded GT rows are all-zero boxes, and CIoU's aspect-ratio term computes
            # arctan(0/0) = NaN on them; masking the RESULT is not enough under
            # autodiff (the vjp multiplies a 0 cotangent by a NaN partial -> NaN
            # gradient for every parameter, every step). Substitute a unit box for
            # masked rows BEFORE the box math — the loss values are unchanged because
            # masked columns are overwritten with +inf and never win the min.
            safe_gtb = jnp.where(gtm[:, None], gtb, jnp.asarray([0.0, 0.0, 1.0, 1.0], gtb.dtype))
            ciou = ciou_loss(pboxes.reshape(-1, 4), safe_gtb)  # (HWA, M)
            ciou = jnp.where(gtm[None, :], ciou, jnp.inf)
            min_ciou = jnp.min(ciou, axis=1).reshape(h, w, num_anchors)
            has_gt = jnp.any(gtm)
            bbox_loss = jnp.where(has_gt, jnp.sum(jnp.where(obj_mask, min_ciou, 0.0)), 0.0)

            # BCE-with-logits class loss, mean over classes, summed over positions
            bce = jnp.maximum(pscores, 0) - pscores * target_scores + jnp.log1p(jnp.exp(-jnp.abs(pscores)))
            clf_loss = jnp.sum(jnp.where(obj_mask, jnp.mean(bce, axis=-1), 0.0))
            return obj_loss, noobj_loss, bbox_loss, clf_loss

        obj, noobj, bbox, clf = jax.vmap(per_image)(
            pred_boxes, b_o, b_scores, target["boxes"], target["labels"], target["mask"]
        )
        return {
            "obj_loss": self.lambda_obj * jnp.sum(obj) / b,
            "noobj_loss": self.lambda_noobj * jnp.sum(noobj) / b,
            "bbox_loss": self.lambda_coords * jnp.sum(bbox) / b,
            "clf_loss": self.lambda_class * jnp.sum(clf) / b,
        }

    def __call__(self, output: jax.Array, target=None):
        boxes, b_o, b_scores = self.format_outputs(output)
        if target is not None:
            return self.compute_losses(boxes, b_o, b_scores, target)
        b = boxes.shape[0]
        return (
            jnp.clip(boxes, 0.0, 1.0).reshape(b, -1, 4),
            jax.nn.sigmoid(b_o).reshape(b, -1),
            jax.nn.sigmoid(b_scores).reshape(b, -1, self.num_classes),
        )


class Yolov4Head(nn.Module):
    """Three-scale detection head with cross-scale feature reuse and zero-initialized
    prediction convs (reference yolov4.py:445-641)."""

    num_classes: int = 80
    anchors: Any = DEFAULT_ANCHORS
    act_layer: Callable = jax.nn.leaky_relu
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    dtype: Optional[Any] = None

    def _pred_conv(self, name: str):
        return nn.Conv(
            (5 + self.num_classes) * 3,
            (1, 1),
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, feats, target=None, train: bool = False):
        if len(self.anchors) != 3:
            raise AssertionError(f"The number of anchors is expected to be 3. received: {len(self.anchors)}")
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        no_drop = {**common, "drop_layer": None}

        o1 = ConvSequence(256, kernel_size=3, padding=1, name="head1_0", **no_drop)(feats[0], train)
        o1 = self._pred_conv("head1_1")(o1)

        h2 = ConvSequence(256, kernel_size=3, padding=1, stride=2, name="pre_head2", **common)(feats[0], train)
        h2 = jnp.concatenate([h2, feats[1]], axis=-1)
        h2 = ConvSequence(256, kernel_size=1, name="head2_1_0", **common)(h2, train)
        h2 = ConvSequence(512, kernel_size=3, padding=1, name="head2_1_1", **common)(h2, train)
        h2 = ConvSequence(256, kernel_size=1, name="head2_1_2", **common)(h2, train)
        h2 = ConvSequence(512, kernel_size=3, padding=1, name="head2_1_3", **common)(h2, train)
        h2 = ConvSequence(256, kernel_size=1, name="head2_1_4", **common)(h2, train)
        o2 = ConvSequence(512, kernel_size=3, padding=1, name="head2_2_0", **no_drop)(h2, train)
        o2 = self._pred_conv("head2_2_1")(o2)

        h3 = ConvSequence(512, kernel_size=3, padding=1, stride=2, name="pre_head3", **common)(h2, train)
        h3 = jnp.concatenate([h3, feats[2]], axis=-1)
        h3 = ConvSequence(512, kernel_size=1, name="head3_0", **common)(h3, train)
        h3 = ConvSequence(1024, kernel_size=3, padding=1, name="head3_1", **common)(h3, train)
        h3 = ConvSequence(512, kernel_size=1, name="head3_2", **common)(h3, train)
        h3 = ConvSequence(1024, kernel_size=3, padding=1, name="head3_3", **common)(h3, train)
        h3 = ConvSequence(512, kernel_size=1, name="head3_4", **common)(h3, train)
        h3 = ConvSequence(1024, kernel_size=3, padding=1, name="head3_5", **common)(h3, train)
        o3 = self._pred_conv("head3_6")(h3)

        yolo1 = YoloLayer(self.anchors[0], num_classes=self.num_classes, scale_xy=1.2)
        yolo2 = YoloLayer(self.anchors[1], num_classes=self.num_classes, scale_xy=1.1)
        yolo3 = YoloLayer(self.anchors[2], num_classes=self.num_classes, scale_xy=1.05)

        y1, y2, y3 = yolo1(o1, target), yolo2(o2, target), yolo3(o3, target)
        if target is not None:
            return {k: y1[k] + y2[k] + y3[k] for k in y1}
        # concatenate the per-scale candidates (reference yolov4.py:625-636)
        return tuple(jnp.concatenate([a, b, c], axis=1) for a, b, c in zip(y1, y2, y3))


class YOLOv4(nn.Module):
    """YOLOv4 (reference yolov4.py:643-691): CSP backbone -> SPP/PAN neck -> 3-scale head."""

    layout: Sequence[Tuple[int, int]]
    num_classes: int = 80
    in_channels: int = 3
    stem_channels: int = 32
    anchors: Any = DEFAULT_ANCHORS
    act_layer: Callable = jax.nn.mish
    norm_layer: Optional[Any] = True
    drop_layer: Optional[Callable] = DropBlock2d
    conv_layer: Optional[Callable] = None
    backbone_norm_layer: Optional[Any] = None
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, target: Optional[Dict[str, jax.Array]] = None, train: bool = False):
        backbone_norm = self.backbone_norm_layer if self.backbone_norm_layer is not None else self.norm_layer
        feats = DarknetBodyV4(
            self.layout, self.in_channels, self.stem_channels, 3, self.act_layer, backbone_norm,
            self.drop_layer, self.conv_layer, self.dtype, name="backbone",
        )(x, train)
        common = {
            "act_layer": self.act_layer,
            "norm_layer": self.norm_layer,
            "drop_layer": self.drop_layer,
            "conv_layer": self.conv_layer,
            "dtype": self.dtype,
        }
        x20, x13, x6 = Neck(name="neck", **common)(feats, train)
        return Yolov4Head(self.num_classes, self.anchors, name="head", **common)((x20, x13, x6), target, train)


def _yolo(arch: str, pretrained: bool, progress: bool, pretrained_backbone: bool, layout, **kwargs: Any) -> DetectionModel:
    if pretrained:
        pretrained_backbone = False
    model = DetectionModel(YOLOv4(layout, **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained_backbone:
        load_pretrained_params(model, default_cfgs[arch]["backbone_url"], progress, key_filter="features.")
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def yolov4(pretrained: bool = False, progress: bool = True, pretrained_backbone: bool = True, **kwargs: Any) -> DetectionModel:
    """YOLOv4 (reference yolov4.py:694-764)."""
    if pretrained_backbone:
        kwargs["backbone_norm_layer"] = lambda c, name=None: FrozenBatchNorm2d(name=name)
    return _yolo(
        "yolov4",
        pretrained,
        progress,
        pretrained_backbone,
        [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)],
        **kwargs,
    )
