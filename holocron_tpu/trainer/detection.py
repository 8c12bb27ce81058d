"""Object detection trainer.

Reference: holocron/trainer/detection.py — IoU-based GT/prediction assignment producing
localization / classification / detection error rates. Assignment runs on host numpy at
eval time (it is inherently dynamic-shaped); the training loss stays fully jitted.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import box_iou
from .core import Trainer

__all__ = ["DetectionTrainer", "assign_iou"]


def assign_iou(gt_boxes: np.ndarray, pred_boxes: np.ndarray, iou_threshold: float = 0.5) -> Tuple[List[int], List[int]]:
    """Assigns GT boxes to predictions by IoU (reference detection.py:17-32)."""
    iou = np.asarray(box_iou(jnp.asarray(gt_boxes), jnp.asarray(pred_boxes)))
    best = iou.max(axis=1)
    best_idx = iou.argmax(axis=1)
    gt_kept = best >= iou_threshold
    kept_pred = best_idx[gt_kept]
    assign_unique = np.unique(kept_pred)
    if kept_pred.shape[0] == assign_unique.shape[0]:
        return list(np.arange(gt_boxes.shape[0])[gt_kept]), list(kept_pred)
    gt_indices, pred_indices = [], []
    kept_vals = best[gt_kept]
    kept_gt_ids = np.arange(gt_boxes.shape[0])[gt_kept]
    for pred_idx in assign_unique:
        selection = kept_vals[kept_pred == pred_idx].argmax()
        gt_indices.append(int(kept_gt_ids[kept_pred == pred_idx][selection]))
        pred_indices.append(int(pred_idx))
    return gt_indices, pred_indices


class DetectionTrainer(Trainer):
    """Object detection trainer (reference detection.py:35-126).

    The model protocol: ``module.apply(vars, x, target, train=True)`` returns a loss
    dict; ``model(x)`` (eval) returns per-image detection dicts with ``boxes`` (xyxy),
    ``labels`` and ``scores`` numpy arrays.
    """

    def _make_loss_forward(self, module, mutable):
        """Swaps the loss computation only: detection modules take the target in the
        forward and return a loss dict (summed here, reference detection.py:66-74).
        The shared train-step body in the base class keeps remat and the frozen-BN
        stats mask working for detection too."""

        def loss_forward(variables, x, target, rng):
            if mutable:
                loss_dict, updates = module.apply(
                    variables, x, target, train=True, mutable=mutable, rngs={"dropout": rng}
                )
            else:
                loss_dict = module.apply(variables, x, target, train=True, rngs={"dropout": rng})
                updates = {}
            loss = sum(jnp.asarray(v, jnp.float32) for v in loss_dict.values())
            return loss, updates

        return loss_forward

    @staticmethod
    def _eval_metrics_str(eval_metrics: Dict[str, Optional[float]]) -> str:
        loc_str = f"{eval_metrics['loc_err']:.2%}" if isinstance(eval_metrics["loc_err"], float) else "N/A"
        clf_str = f"{eval_metrics['clf_err']:.2%}" if isinstance(eval_metrics["clf_err"], float) else "N/A"
        det_str = f"{eval_metrics['det_err']:.2%}" if isinstance(eval_metrics["det_err"], float) else "N/A"
        return f"Loc error: {loc_str} | Clf error: {clf_str} | Det error: {det_str}"

    def evaluate(self, iou_threshold: float = 0.5) -> Dict[str, Optional[float]]:
        """IoU-assignment error rates (reference detection.py:84-126).

        Multi-host: each process evaluates only its own val-loader shard
        (``num_shards="auto"`` in the CLI), then the integer counters are summed
        across processes — every host returns the SAME metrics, which the fit
        loop's save-on-best decision (a collective under tensor parallelism)
        depends on.
        """
        loc_assigns = 0
        correct, clf_error, loc_fn, loc_fp, num_samples = 0, 0, 0, 0, 0
        for x, target in self.val_loader:
            detections = self.model(jnp.asarray(x))
            for dets, t in zip(detections, target):
                t_boxes = np.asarray(t["boxes"])
                d_boxes = np.asarray(dets["boxes"])
                if t_boxes.shape[0] > 0 and d_boxes.shape[0] > 0:
                    gt_indices, pred_indices = assign_iou(t_boxes, d_boxes, iou_threshold)
                    loc_assigns += len(gt_indices)
                    correct_ = int(
                        (np.asarray(t["labels"])[gt_indices] == np.asarray(dets["labels"])[pred_indices]).sum()
                    )
                else:
                    gt_indices, pred_indices = [], []
                    correct_ = 0
                correct += correct_
                clf_error += len(gt_indices) - correct_
                loc_fn += t_boxes.shape[0] - len(gt_indices)
                loc_fp += d_boxes.shape[0] - len(pred_indices)
            num_samples += sum(np.asarray(t["boxes"]).shape[0] for t in target)

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            counters = np.array(
                [loc_assigns, correct, clf_error, loc_fn, loc_fp, num_samples], np.int64
            )
            loc_assigns, correct, clf_error, loc_fn, loc_fp, num_samples = (
                int(v) for v in np.asarray(multihost_utils.process_allgather(counters)).sum(0)
            )

        nb_preds = num_samples - loc_fn + loc_fp
        loc_err = 1 - 2 * loc_assigns / (nb_preds + num_samples) if nb_preds + num_samples > 0 else None
        clf_err = 1 - correct / loc_assigns if loc_assigns > 0 else None
        det_err = 1 - 2 * correct / (nb_preds + num_samples) if nb_preds + num_samples > 0 else None
        return {"loc_err": loc_err, "clf_err": clf_err, "det_err": det_err, "val_loss": loc_err}
