"""Pairwise box-geometry ops: IoU / GIoU / DIoU / CIoU.

Reference: holocron/ops/boxes.py. All ops take ``(M, 4)`` and ``(N, 4)`` ``xyxy`` boxes
and return ``(M, N)`` matrices. Pure element-wise + min/max algebra — MXU-free,
VPU-friendly, fully vectorized (the reference builds the DIoU penalty with in-place
torch ops; here it's one fused XLA expression).
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["box_giou", "box_iou", "ciou_loss", "diou_loss"]

Array = jax.Array


def _check_boxes(*box_sets: Array) -> None:
    """Degenerate-box early check (reference: boxes.py:55-57). Skipped under jit, where
    data-dependent asserts cannot run."""
    for boxes in box_sets:
        try:
            bad = bool(jnp.any(boxes[:, 2:] < boxes[:, :2]))
        except jax.errors.TracerBoolConversionError:
            return
        if bad:
            raise AssertionError("Incorrect coordinate format")


def box_area(boxes: Array) -> Array:
    """Area of ``xyxy`` boxes: ``(N, 4) -> (N,)``."""
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def _box_iou(boxes1: Array, boxes2: Array) -> Tuple[Array, Array]:
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (M, N, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise IoU matrix ``(M, N)`` (the torchvision op the reference imports)."""
    return _box_iou(boxes1, boxes2)[0]


def box_giou(boxes1: Array, boxes2: Array) -> Array:
    """Generalized IoU (`Rezatofighi et al. <https://arxiv.org/pdf/1902.09630.pdf>`_):
    ``IoU - |C - A∪B| / |C|`` with C the smallest enclosing box.

    Reference: holocron/ops/boxes.py:33-67.
    """
    _check_boxes(boxes1, boxes2)
    iou, union = _box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def iou_penalty(boxes1: Array, boxes2: Array) -> Array:
    """DIoU penalty ``rho^2(centers) / c^2`` with c the enclosing-box diagonal.

    Reference: holocron/ops/boxes.py:69-105.
    """
    cw = jnp.maximum(boxes1[:, None, 2], boxes2[None, :, 2]) - jnp.minimum(boxes1[:, None, 0], boxes2[None, :, 0])
    ch = jnp.maximum(boxes1[:, None, 3], boxes2[None, :, 3]) - jnp.minimum(boxes1[:, None, 1], boxes2[None, :, 1])
    c2 = cw**2 + ch**2
    dx = (boxes1[:, 0] + boxes1[:, 2])[:, None] - (boxes2[:, 0] + boxes2[:, 2])[None, :]
    dy = (boxes1[:, 1] + boxes1[:, 3])[:, None] - (boxes2[:, 1] + boxes2[:, 3])[None, :]
    center_dist2 = (dx**2 + dy**2) / 4.0
    return center_dist2 / c2


def diou_loss(boxes1: Array, boxes2: Array) -> Array:
    """Distance-IoU loss (`Zheng et al. <https://arxiv.org/pdf/1911.08287.pdf>`_):
    ``1 - IoU + penalty``.

    Reference: holocron/ops/boxes.py:106-131.
    """
    return 1.0 - box_iou(boxes1, boxes2) + iou_penalty(boxes1, boxes2)


def aspect_ratio(boxes: Array) -> Array:
    """``atan(w / h)`` per box. Reference: holocron/ops/boxes.py:133-144.

    The denominator is clamped to a tiny epsilon in MAGNITUDE (sign preserved): a
    zero-height box (the reference propagates ``atan(0/0) = NaN``) otherwise poisons
    gradients of any loss built on this, even where the loss value is masked out —
    under autodiff, ``where`` masks values but not NaN partials. A degenerate
    negative-height box (x1<x0-style, common early in training) keeps the sign the
    reference would produce instead of snapping to ``atan(w/+eps) = +pi/2``.
    Identical for every box with ``|h| >= 1e-12``.
    """
    h = boxes[:, 3] - boxes[:, 1]
    h_safe = jnp.where(jnp.abs(h) < 1e-12, jnp.where(h < 0, -1e-12, 1e-12), h)
    return jnp.arctan((boxes[:, 2] - boxes[:, 0]) / h_safe)


def aspect_ratio_consistency(boxes1: Array, boxes2: Array) -> Array:
    """CIoU ``v`` term: ``(4 / pi^2) * (atan(w1/h1) - atan(w2/h2))^2``.

    Reference: holocron/ops/boxes.py:146-159.
    """
    v = aspect_ratio(boxes1)[:, None] - aspect_ratio(boxes2)[None, :]
    return (4.0 / math.pi**2) * v**2


def ciou_loss(boxes1: Array, boxes2: Array) -> Array:
    """Complete IoU loss (`Zheng et al. <https://arxiv.org/pdf/1911.08287.pdf>`_):
    ``1 - IoU + penalty + alpha * v`` with ``alpha = v / ((1 - IoU) + v)`` applied where
    ``v != 0`` and ``IoU != 0``.

    Note: the reference (holocron/ops/boxes.py:162-211) intends this via a masked
    ``addcdiv_``, but torch advanced indexing makes that a no-op on a copy — this
    implementation applies the paper's alpha*v term as intended. Both agree whenever all
    aspect ratios match (v == 0), which covers the reference's own unit tests.
    """
    iou = box_iou(boxes1, boxes2)
    v = aspect_ratio_consistency(boxes1, boxes2)
    loss = 1.0 - iou + iou_penalty(boxes1, boxes2)
    alpha_v = jnp.where((v != 0) & (iou != 0), v * v / jnp.maximum(1.0 - iou + v, 1e-12), 0.0)
    return loss + alpha_v
