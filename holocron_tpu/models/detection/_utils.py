"""Jit-compatible detection infrastructure.

The reference's detection stack is dynamic-shaped: per-image Python loops for target
assignment (holocron/models/detection/yolo.py:89-123, yolov4.py:338-389) and torchvision
NMS. On TPU everything must be static-shaped:

- ground truth is padded to ``max_boxes`` with a validity mask,
- assignment loops become masked gathers/scatters vmapped over the batch,
- NMS is a fixed-size greedy loop over score-sorted candidates,
- detections come back as fixed-size arrays + keep mask; a host-side helper converts
  them to the reference's list-of-dicts.
"""

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["detections_to_list", "masked_nms", "pad_targets", "post_process", "box_iou_pairwise"]


def pad_targets(target: List[Dict], max_boxes: int = 50, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Pads a reference-style list of {boxes, labels} dicts to fixed-size arrays."""
    b = len(target)
    boxes = np.zeros((b, max_boxes, 4), dtype=dtype)
    labels = np.zeros((b, max_boxes), dtype=np.int32)
    mask = np.zeros((b, max_boxes), dtype=bool)
    for i, t in enumerate(target):
        tb = np.asarray(t["boxes"], dtype=dtype).reshape(-1, 4)
        n = min(tb.shape[0], max_boxes)
        boxes[i, :n] = tb[:n]
        labels[i, :n] = np.asarray(t["labels"]).reshape(-1)[:n]
        mask[i, :n] = True
    return {"boxes": boxes, "labels": labels, "mask": mask}


def box_iou_pairwise(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """IoU of ``(..., M, 4)`` vs ``(..., N, 4)`` -> ``(..., M, N)`` (safe denominator)."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def masked_nms(boxes: jax.Array, scores: jax.Array, valid: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy NMS over fixed-size candidates; returns the keep mask.

    Matches torchvision ``nms`` semantics on the valid subset: candidates are visited in
    score order, each suppressing later overlapping candidates.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]
    iou = box_iou_pairwise(sorted_boxes, sorted_boxes)

    def body(i, keep):
        # candidate i survives iff no kept earlier candidate overlaps it
        suppressed = jnp.any(keep & (jnp.arange(k) < i) & (iou[i] > iou_threshold))
        return keep.at[i].set(sorted_valid[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("rpn_nms_thresh", "box_score_thresh", "pre_nms_topk"))
def post_process(
    boxes: jax.Array,
    b_o: jax.Array,
    b_scores: jax.Array,
    rpn_nms_thresh: float = 0.7,
    box_score_thresh: float = 0.05,
    pre_nms_topk: int = 1024,
    obj_thresh: float = 0.5,
) -> Dict[str, jax.Array]:
    """Objectness filter -> score threshold -> top-k -> NMS, on probability-space inputs.

    Mirrors the reference post-processing (yolo.py:159-215 / yolov4.py:303-337) with
    fixed-size outputs: ``boxes (B, K, 4)``, ``scores``, ``labels``, ``keep`` mask.
    ``pre_nms_topk`` caps the NMS candidate set — the greedy pass needs an O(K^2) IoU
    matrix, which at 608px inputs (~21k raw candidates) would otherwise blow HBM.
    ``obj_thresh`` is the reference's hard-coded objectness gate (yolo.py:196
    ``b_o >= 0.5``), exposed so evaluation harnesses can rank weakly-trained models.
    """
    boxes = jnp.clip(boxes, 0.0, 1.0)
    scores = jnp.max(b_scores, axis=-1) * b_o
    labels = jnp.argmax(b_scores, axis=-1)
    valid = (b_o >= obj_thresh) & (scores >= box_score_thresh)

    k = min(pre_nms_topk, boxes.shape[1])
    ranked = jnp.where(valid, scores, -jnp.inf)
    _, top_idx = jax.lax.top_k(ranked, k)  # (B, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_scores = jnp.take_along_axis(scores, top_idx, axis=1)
    top_labels = jnp.take_along_axis(labels, top_idx, axis=1)
    top_valid = jnp.take_along_axis(valid, top_idx, axis=1)
    keep = jax.vmap(lambda bx, sc, va: masked_nms(bx, sc, va, rpn_nms_thresh))(
        top_boxes, top_scores, top_valid
    )
    return {"boxes": top_boxes, "scores": top_scores, "labels": top_labels, "keep": keep}


def detections_to_list(padded: Dict[str, jax.Array]) -> List[Dict[str, np.ndarray]]:
    """Host-side conversion of padded detections to the reference's list-of-dicts."""
    boxes = np.asarray(padded["boxes"])
    scores = np.asarray(padded["scores"])
    labels = np.asarray(padded["labels"])
    keep = np.asarray(padded["keep"])
    out = []
    for i in range(boxes.shape[0]):
        k = keep[i]
        # order by descending score like torchvision nms output
        order = np.argsort(-scores[i][k])
        out.append({
            "boxes": boxes[i][k][order],
            "scores": scores[i][k][order],
            "labels": labels[i][k][order].astype(np.int64),
        })
    return out
