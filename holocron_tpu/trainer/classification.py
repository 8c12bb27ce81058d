"""Classification trainers.

Reference: holocron/trainer/classification.py.
"""

import math
from typing import Any, Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .core import Trainer

__all__ = ["BinaryClassificationTrainer", "ClassificationTrainer"]


class ClassificationTrainer(Trainer):
    """Image classification trainer (reference classification.py:21-158)."""

    is_binary: bool = False

    def evaluate(self) -> Dict[str, float]:
        """Top-1/top-5 accuracy + NaN-safe validation loss (classification.py:43-72)."""
        forward, _ = self._eval_fns()
        criterion = self.criterion
        val_loss, top1, top5, num_samples, num_valid_batches = 0.0, 0, 0, 0, 0
        for x, target in self.val_loader:
            bs = int(np.shape(x)[0])  # true LOCAL size before any mesh padding
            x, target = self.to_device(x, target)
            self.model._ensure_init(x)  # supports evaluate-before-fit (--test-only)
            # _host_batch drops mesh padding AND (multi-host) gathers every host's
            # real rows, so the metrics below always cover the full validation view
            out = self._host_batch(forward(self.model.variables, x), bs)
            target_np = jax.tree.map(lambda t: self._host_batch(t, bs), target)
            loss = float(criterion(jnp.asarray(out), jax.tree.map(jnp.asarray, target_np)))
            if math.isfinite(loss):
                val_loss += loss
                num_valid_batches += 1
            # top-5 clamps to the class count (torch's topk would error on <5 classes)
            k = min(5, out.shape[1])
            pred = np.argsort(out, axis=1)[:, ::-1][:, :k]
            correct = pred == np.asarray(target_np).reshape(-1, 1)
            top1 += int(correct[:, 0].sum())
            top5 += int(correct.any(axis=1).sum())
            num_samples += out.shape[0]
        val_loss /= max(num_valid_batches, 1)
        return {"val_loss": val_loss, "acc1": top1 / num_samples, "acc5": top5 / num_samples}

    @staticmethod
    def _eval_metrics_str(eval_metrics: Dict[str, float]) -> str:
        return (
            f"Validation loss: {eval_metrics['val_loss']:.4} "
            f"(Acc@1: {eval_metrics['acc1']:.2%}, Acc@5: {eval_metrics['acc5']:.2%})"
        )

    def plot_top_losses(
        self,
        mean: Tuple[float, float, float],
        std: Tuple[float, float, float],
        classes: Union[Sequence[str], None] = None,
        num_samples: int = 12,
        **kwargs: Any,
    ) -> None:
        """Streaming top-k worst training samples, shown unnormalized
        (reference classification.py:84-158)."""
        if not self.is_binary and classes is None:
            raise AssertionError("arg 'classes' must be specified for multi-class classification")
        if jax.process_count() > 1:
            # the streaming top-k mixes device losses with HOST images by index;
            # under multi-host each host only holds its loader shard's images
            raise NotImplementedError("plot_top_losses is a single-host visualization utility")
        forward, _ = self._eval_fns()

        losses = np.zeros(num_samples, dtype=np.float32)
        preds = np.zeros(num_samples, dtype=int)
        probs = np.zeros(num_samples, dtype=np.float32)
        targets = np.zeros(num_samples, dtype=np.float32 if self.is_binary else int)
        images = [None] * num_samples

        for x, target in self.train_loader:
            x_dev, target_dev = self.to_device(x, target)
            self.model._ensure_init(x_dev)
            logits = forward(self.model.variables, x_dev)
            # per-sample (unreduced) criterion
            crit_red = getattr(self.criterion, "reduction", None)
            if crit_red is not None:
                self.criterion.reduction = "none"
                batch_loss = np.asarray(self.criterion(logits, target_dev))
                self.criterion.reduction = crit_red
            else:
                batch_loss = np.asarray(self.criterion(logits, target_dev))
            # to_device may have wrap-padded the device batch to the mesh multiple;
            # drop the padded tail so indices line up with the host x/target
            bs = int(np.shape(x)[0])
            logits = logits[:bs]
            batch_loss = batch_loss[:bs]
            if self.is_binary:
                batch_loss = batch_loss.reshape(batch_loss.shape[0], -1).mean(-1)
                probs_ = np.asarray(jax.nn.sigmoid(logits)).squeeze(-1)
            else:
                probs_ = np.asarray(jax.nn.softmax(logits, axis=1)).max(axis=1)

            if np.any(batch_loss > losses.min()):
                idcs = np.concatenate((losses, batch_loss)).argsort()[-num_samples:]
                kept_idcs = [idx for idx in idcs if idx < num_samples]
                added_idcs = [idx - num_samples for idx in idcs if idx >= num_samples]
                losses = np.concatenate((losses[kept_idcs], batch_loss[added_idcs]))
                probs = np.concatenate((probs[kept_idcs], probs_[added_idcs]))
                if not self.is_binary:
                    preds = np.concatenate((preds[kept_idcs], np.asarray(logits).argmax(1)[added_idcs]))
                targets = np.concatenate((targets[kept_idcs], np.asarray(target)[added_idcs]))
                imgs = np.asarray(x)[added_idcs] * np.asarray(std) + np.asarray(mean)
                images = [images[idx] for idx in kept_idcs] + [np.clip(img, 0, 1) for img in imgs]

        idcs_ = losses.argsort()[::-1]
        losses, preds, probs, targets = losses[idcs_], preds[idcs_], probs[idcs_], targets[idcs_]
        images = [images[idx] for idx in idcs_]

        import matplotlib.pyplot as plt

        num_cols = 4
        num_rows = math.ceil(num_samples / num_cols)
        _, axes = plt.subplots(num_rows, num_cols, figsize=(20, 5))
        for idx, (img, pred, prob, tgt, loss) in enumerate(zip(images, preds, probs, targets, losses)):
            row = int(idx / num_cols)
            col = idx - num_cols * row
            if img is not None:
                axes[row][col].imshow(img)
            if self.is_binary:
                axes[row][col].title.set_text(f"{loss:.3} / {prob:.2} / {tgt:.2}")
            else:
                axes[row][col].title.set_text(f"{loss:.3} / {classes[pred]} ({prob:.1%}) / {classes[tgt]}")
            axes[row][col].axis("off")
        plt.show(**kwargs)


class BinaryClassificationTrainer(ClassificationTrainer):
    """Binary classification trainer (reference classification.py:162-232)."""

    is_binary: bool = True

    def _build_train_step(self) -> None:
        # targets are cast to the logits dtype and broadcast like them
        user_criterion = self.criterion
        self.criterion = lambda out, target: user_criterion(
            out, jnp.reshape(target.astype(out.dtype), out.shape)
        )
        try:
            super()._build_train_step()
        finally:
            self._binary_criterion = self.criterion
            self.criterion = user_criterion

    def evaluate(self) -> Dict[str, float]:
        forward, _ = self._eval_fns()
        val_loss, top1, num_samples, num_valid_batches = 0.0, 0.0, 0, 0
        for x, target in self.val_loader:
            bs = int(np.shape(x)[0])  # true size before any mesh padding
            x, target = self.to_device(x, target)
            self.model._ensure_init(x)  # supports evaluate-before-fit (--test-only)
            out_np = self._host_batch(forward(self.model.variables, x), bs)
            t_np = np.reshape(self._host_batch(target, bs).astype(out_np.dtype), out_np.shape)
            loss = float(self.criterion(jnp.asarray(out_np), jnp.asarray(t_np)))
            if math.isfinite(loss):
                val_loss += loss
                num_valid_batches += 1
            top1 += float(((t_np >= 0.5) == (1 / (1 + np.exp(-out_np)) >= 0.5)).sum()) / out_np[0].size
            num_samples += out_np.shape[0]
        val_loss /= max(num_valid_batches, 1)
        return {"val_loss": val_loss, "acc": top1 / num_samples}

    @staticmethod
    def _eval_metrics_str(eval_metrics: Dict[str, float]) -> str:
        return f"Validation loss: {eval_metrics['val_loss']:.4} (Acc: {eval_metrics['acc']:.2%})"
