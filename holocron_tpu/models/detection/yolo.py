"""YOLOv1 (`Redmon et al. <https://pjreddie.com/media/files/papers/yolo_1.pdf>`_) and the
shared detection machinery.

Reference: holocron/models/detection/yolo.py. The reference's per-image Python
assignment loops (:89-123) are replaced by a fully vectorized, vmapped assignment over
padded ground truth (SURVEY.md hard part #1); NMS is the fixed-size masked
implementation in ``_utils``.
"""

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..classification.darknet import DarknetBodyV1, leaky_relu_01
from ..classification.darknet import default_cfgs as dark_cfgs
from ..core import Model
from ..utils import ConvSequence, load_pretrained_params
from ._utils import box_iou_pairwise, detections_to_list, pad_targets, post_process

__all__ = ["DetectionModel", "YOLOv1", "yolov1"]

default_cfgs: Dict[str, Dict[str, Any]] = {
    "yolov1": {"arch": "YOLOv1", "backbone": dark_cfgs["darknet24"], "url": None},
}


def yolo_v12_losses(
    pred_xyxy: jax.Array,  # (B, H, W, A, 4) absolute xyxy
    pred_xy: jax.Array,  # (B, H, W, A, 2) absolute centers
    pred_wh: jax.Array,  # (B, H, W, A, 2) absolute sizes
    pred_o: jax.Array,  # (B, H, W, A)
    pred_scores: jax.Array,  # (B, H, W, A, C)
    target: Dict[str, jax.Array],
    lambda_obj: float = 1.0,
    lambda_noobj: float = 0.5,
    lambda_class: float = 1.0,
    lambda_coords: float = 5.0,
    ignore_high_iou: bool = False,
) -> Dict[str, jax.Array]:
    """Vectorized YOLOv1/v2 multi-part loss (reference yolo.py:48-133).

    Per GT box: the anchor in the center cell with highest IoU is responsible
    (objectness target = that IoU; coords/class regressed there); everything else pays
    the no-objectness penalty.

    Intentional divergence: the reference's wh term (yolo.py:115-119) uses the full
    ``gt_wh`` matrix instead of ``gt_wh[_idx]`` — a broadcast bug that cross-sums every
    GT's size against each assigned anchor whenever an image has >1 GT box. We pair
    each GT with its own responsible anchor (the paper's Eq. 3). A/B on identical
    predictions: obj/noobj/clf match the reference ≤2e-7; bbox matches exactly for
    single-GT images and diverges only through this bug for multi-GT ones.
    """
    b, h, w, num_anchors = pred_o.shape

    def per_image(pxyxy, pxy, pwh, po, pscores, gtb, gtl, gtm):
        gt_xy = (gtb[:, :2] + gtb[:, 2:]) / 2.0
        gt_wh = jnp.clip(gtb[:, 2:] - gtb[:, :2], 0.0)
        cx = jnp.clip((gt_xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((gt_xy[:, 1] * h).astype(jnp.int32), 0, h - 1)

        cell_boxes = pxyxy[cy, cx]  # (M, A, 4)
        iou = jax.vmap(lambda g, c: box_iou_pairwise(g[None], c)[0])(gtb, cell_boxes)  # (M, A)
        anchor = jnp.argmax(iou, axis=1)
        iou_best = jnp.max(iou, axis=1)
        gtm_f = gtm.astype(pxyxy.dtype)

        # objectness (reference yolo.py:110)
        obj = jnp.sum(gtm_f * (iou_best - po[cy, cx, anchor]) ** 2)
        # classification: squared error over all the cell's anchors (yolo.py:106-108)
        onehot = jax.nn.one_hot(gtl, pscores.shape[-1], dtype=pxyxy.dtype)
        clf = jnp.sum(gtm_f[:, None, None] * (onehot[:, None, :] - pscores[cy, cx]) ** 2)
        # box regression (yolo.py:112-119)
        sel_xy = pxy[cy, cx, anchor]
        sel_wh = pwh[cy, cx, anchor]
        bbox = jnp.sum(gtm_f[:, None] * (gt_xy - sel_xy) ** 2)
        # safe-subgradient sqrt: when a sigmoid-decoded wh underflows to exactly 0.0
        # (saturated head early in from-scratch training), d/dx sqrt(clip(x, 0)) is
        # 0 * inf = NaN and one batch poisons every gradient. Forward value is
        # identical to sqrt(clip(wh, 0)); the subgradient at wh <= 0 is defined as 0.
        # (The reference's torch.sqrt at 0 has the same inf gradient — yolo.py:115-119
        # — it just never trains v1 from a saturated random init.)
        wh_pos = sel_wh > 0.0
        sqrt_wh = jnp.sqrt(jnp.where(wh_pos, sel_wh, 1.0)) * wh_pos.astype(pxyxy.dtype)
        bbox += jnp.sum(gtm_f[:, None] * (jnp.sqrt(gt_wh) - sqrt_wh) ** 2)

        # no-objectness mask: responsible anchors excluded (yolo.py:104, 121-126)
        noobj_mask = jnp.ones((h, w, num_anchors), pxyxy.dtype)
        noobj_mask = noobj_mask.at[cy, cx, anchor].multiply(jnp.where(gtm, 0.0, 1.0))
        if ignore_high_iou:
            all_iou = box_iou_pairwise(pxyxy.reshape(-1, 4), gtb)  # (HWA, M)
            best = jnp.max(jnp.where(gtm[None, :], all_iou, 0.0), axis=1).reshape(h, w, num_anchors)
            noobj_mask = noobj_mask * (best < 0.5)
        noobj = jnp.sum(noobj_mask * po**2)
        return obj, noobj, bbox, clf

    obj, noobj, bbox, clf = jax.vmap(per_image)(
        pred_xyxy, pred_xy, pred_wh, pred_o, pred_scores, target["boxes"], target["labels"], target["mask"]
    )
    return {
        "obj_loss": lambda_obj * jnp.sum(obj) / b,
        "noobj_loss": lambda_noobj * jnp.sum(noobj) / b,
        "bbox_loss": lambda_coords * jnp.sum(bbox) / b,
        "clf_loss": lambda_class * jnp.sum(clf) / b,
    }


class DetectionModel(Model):
    """Model bundle for detectors: torch-like forward semantics over jitted internals.

    ``model(x)`` (eval) returns the reference's list of {boxes, scores, labels} dicts;
    ``model(x, target)`` returns the loss dict. Ground truth may be a reference-style
    list of dicts (padded on host to ``max_boxes``) or pre-padded arrays.
    """

    def __init__(self, module, variables=None, default_cfg=None, max_boxes: int = 50, seed: int = 0) -> None:
        super().__init__(module, variables, default_cfg, seed)
        self.max_boxes = max_boxes
        self._loss_fn = None

    def _pad(self, target):
        if isinstance(target, (list, tuple)):
            for t in target:
                boxes = np.asarray(t["boxes"], dtype=np.float32)
                if boxes.size and (boxes.min() < 0 or boxes.max() > 1):
                    raise ValueError("Ground truth boxes are expected to have values between 0 and 1.")
            return pad_targets(target, self.max_boxes)
        return target

    def __call__(self, x, target=None, train: bool = False, rngs=None):
        if train and target is None:
            raise ValueError("`target` needs to be specified in training mode")
        if isinstance(x, (list, tuple)):
            x = jnp.stack([jnp.asarray(im) for im in x], axis=0)
        x = jnp.asarray(x)
        self._ensure_init(x)

        if target is not None:
            padded = self._pad(target)
            if self._loss_fn is None:
                module = self.module
                self._loss_fn = jax.jit(
                    lambda variables, inp, tgt: module.apply(variables, inp, tgt, train=False)
                )
            return self._loss_fn(self.variables, x, jax.tree.map(jnp.asarray, dict(padded)))

        if self._eval_fn is None:
            module = self.module
            self._eval_fn = jax.jit(lambda variables, inp: module.apply(variables, inp, train=False))
        boxes, b_o, b_scores = self._eval_fn(self.variables, x)
        nms_thresh = getattr(self.module, "rpn_nms_thresh", 0.7)
        score_thresh = getattr(self.module, "box_score_thresh", 0.05)
        padded_dets = post_process(boxes, b_o, b_scores, nms_thresh, score_thresh)
        return detections_to_list(padded_dets)

    def _ensure_init(self, x: jax.Array) -> None:
        if self.variables is None:
            key = jax.random.key(self._seed)
            dummy = jnp.zeros(x.shape, x.dtype)
            self.variables = jax.jit(lambda k, inp: self.module.init(k, inp, train=False))(key, dummy)


class YOLOv1(nn.Module):
    """YOLOv1 (reference yolo.py:218-378): Darknet-24 body, conv block4, fully-connected
    head predicting a 7x7 grid of (num_anchors * 5 + num_classes)."""

    layout: Sequence[Sequence[int]]
    num_classes: int = 20
    in_channels: int = 3
    stem_channels: int = 64
    num_anchors: int = 2
    lambda_obj: float = 1.0
    lambda_noobj: float = 0.5
    lambda_class: float = 1.0
    lambda_coords: float = 5.0
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    head_hidden_nodes: int = 512
    act_layer: Callable = leaky_relu_01
    norm_layer: Optional[Any] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    backbone_norm_layer: Optional[Any] = None
    dtype: Optional[Any] = None

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
        out = DarknetBodyV1(
            self.layout, self.in_channels, self.stem_channels, self.act_layer, backbone_norm,
            dtype=self.dtype, name="backbone",
        )(x, train)
        out = ConvSequence(1024, kernel_size=3, padding=1, name="block4_0", **common)(out, train)
        out = ConvSequence(1024, kernel_size=3, padding=1, stride=2, name="block4_1", **common)(out, train)
        out = ConvSequence(1024, kernel_size=3, padding=1, name="block4_2", **common)(out, train)
        out = ConvSequence(1024, kernel_size=3, padding=1, name="block4_3", **common)(out, train)

        h, w = out.shape[1], out.shape[2]
        out = out.reshape(out.shape[0], -1)
        out = nn.Dense(self.head_hidden_nodes, dtype=self.dtype, name="classifier_0")(out)
        out = self.act_layer(out)
        out = nn.Dropout(0.5, deterministic=not train)(out)
        out = nn.Dense(h * w * (self.num_anchors * 5 + self.num_classes), dtype=self.dtype, name="classifier_1")(out)

        b = out.shape[0]
        out = out.reshape(b, h, w, self.num_anchors * 5 + self.num_classes)
        # classification scores shared across the cell's anchors (yolo.py:324-329)
        b_scores = jax.nn.softmax(out[..., -self.num_classes :], axis=-1)[..., None, :]
        b_scores = jnp.repeat(b_scores, self.num_anchors, axis=3)
        box_o = jax.nn.sigmoid(out[..., : self.num_anchors * 5].reshape(b, h, w, self.num_anchors, 5))
        b_coords = box_o[..., :4]  # xy cell-relative, wh absolute
        b_o = box_o[..., 4]

        # decode to absolute xyxy (yolo.py:134-157)
        c_x = jnp.arange(w, dtype=b_coords.dtype).reshape(1, 1, -1, 1)
        c_y = jnp.arange(h, dtype=b_coords.dtype).reshape(1, -1, 1, 1)
        b_x = (b_coords[..., 0] + c_x) / w
        b_y = (b_coords[..., 1] + c_y) / h
        xy = jnp.stack([b_x, b_y], axis=-1)
        wh = b_coords[..., 2:]
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
    model = DetectionModel(YOLOv1(layout, **kwargs))
    model.default_cfg = default_cfgs[arch]
    if pretrained_backbone:
        load_pretrained_params(model, default_cfgs[arch]["backbone"]["url"], progress, key_filter="features.")
    if pretrained:
        load_pretrained_params(model, default_cfgs[arch]["url"], progress)
    return model


def yolov1(pretrained: bool = False, progress: bool = True, pretrained_backbone: bool = True, **kwargs: Any) -> DetectionModel:
    """YOLOv1 (reference yolo.py:403-478)."""
    return _yolo(
        "yolov1",
        pretrained,
        progress,
        pretrained_backbone,
        [[192], [128, 256, 256, 512], [*([256, 512] * 4), 512, 1024], [512, 1024] * 2],
        **kwargs,
    )
