"""Semantic segmentation trainer.

Reference: holocron/trainer/segmentation.py — confusion matrix via bincount giving
global accuracy and mean IoU, with ignore_index handling.
"""

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .core import Trainer

__all__ = ["SegmentationTrainer"]


class SegmentationTrainer(Trainer):
    """Semantic segmentation trainer (reference segmentation.py:15-85).

    Model outputs are NHWC logits ``(N, H, W, C)``; targets are ``(N, H, W)`` ints.
    """

    def __init__(self, *args: Any, num_classes: int = 10, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.num_classes = num_classes

    def evaluate(self, ignore_index: int = 255) -> Dict[str, float]:
        forward, _ = self._eval_fns()
        criterion = self.criterion
        nc = self.num_classes

        @jax.jit
        def conf_update(out, target):
            pred = jnp.argmax(out, axis=-1).reshape(-1)
            tgt = target.reshape(-1)
            k = (tgt >= 0) & (tgt < nc)
            inds = jnp.where(k, nc * tgt + pred, nc * nc)  # invalid -> overflow bin
            return jnp.bincount(inds, length=nc * nc + 1)[: nc * nc].reshape(nc, nc)

        val_loss, num_valid_batches = 0.0, 0
        conf_mat = np.zeros((nc, nc), dtype=np.int64)
        for x, target in self.val_loader:
            bs = int(np.shape(x)[0])  # true size before any mesh padding
            x, target = self.to_device(x, target)
            self.model._ensure_init(x)  # supports evaluate-before-fit (--test-only)
            out = forward(self.model.variables, x)
            if isinstance(out, jax.Array) and not out.is_fully_addressable:
                # multi-host: gather every host's real rows (a tail slice can't
                # drop the per-shard padding of a global array). The dense-logit
                # host round-trip is the price of the gather — multi-host only;
                # single-host stays on device below.
                out = jnp.asarray(self._host_batch(out, bs))
                target = jnp.asarray(self._host_batch(target, bs))
            else:
                out = out[:bs]
                target = jnp.asarray(target)[:bs]
            loss = float(criterion(out, target))
            if math.isfinite(loss):
                val_loss += loss
                num_valid_batches += 1
            conf_mat += np.asarray(conf_update(out, target))

        val_loss /= max(num_valid_batches, 1)
        diag = np.diag(conf_mat)
        acc_global = diag.sum() / max(conf_mat.sum(), 1)
        denom = conf_mat.sum(1) + conf_mat.sum(0) - diag
        mean_iou = float(np.mean(diag / np.maximum(denom, 1)))
        return {"val_loss": val_loss, "acc_global": float(acc_global), "mean_iou": mean_iou}

    @staticmethod
    def _eval_metrics_str(eval_metrics: Dict[str, float]) -> str:
        return (
            f"Validation loss: {eval_metrics['val_loss']:.4} "
            f"(Acc: {eval_metrics['acc_global']:.2%} | Mean IoU: {eval_metrics['mean_iou']:.2%})"
        )
