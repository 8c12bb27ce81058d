"""Batch collation utilities.

Reference: holocron/utils/data/collate.py.
"""

from typing import Optional, Tuple

import numpy as np

__all__ = ["Mixup"]


class Mixup:
    """MixUp collate (`Zhang et al. <https://arxiv.org/pdf/1710.09412.pdf>`_): one-hot
    targets, ``Beta(alpha, alpha)`` mixing factor, batch-shuffled convex combination.

    Host-side (numpy) — runs in the input pipeline, like the reference's collate fn
    (holocron/utils/data/collate.py:16-64). Randomness comes from a numpy Generator
    (pass ``seed`` for determinism).

    >>> mix = Mixup(num_classes=10, alpha=0.4)
    >>> images, soft_targets = mix(images, hard_targets)
    """

    def __init__(self, num_classes: int, alpha: float = 0.2, seed: Optional[int] = None) -> None:
        self.num_classes = num_classes
        if alpha < 0:
            raise ValueError("`alpha` only takes positive values")
        self.alpha = alpha
        self._rng = np.random.default_rng(seed)

    def __call__(self, inputs: np.ndarray, targets: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        inputs = np.asarray(inputs)
        targets = np.asarray(targets)
        # uint8 inputs (the 4x-lighter host->device transfer path) mix in f32 and
        # round back: mixing commutes with the affine normalization applied
        # on-device, so rounding is the only (sub-quantum) deviation
        is_u8 = inputs.dtype == np.uint8
        soft_dtype = np.float32 if is_u8 else inputs.dtype
        if targets.ndim == 1:
            if self.num_classes > 1:
                targets = np.eye(self.num_classes, dtype=soft_dtype)[targets]
            elif self.num_classes == 1:
                targets = targets[:, None]
        targets = targets.astype(soft_dtype)

        if self.alpha == 0:
            return inputs, targets
        lam = float(self._rng.beta(self.alpha, self.alpha))
        index = self._rng.permutation(inputs.shape[0])
        if is_u8:
            mixed = lam * inputs.astype(np.float32) + (1 - lam) * inputs[index].astype(np.float32)
            mixed_inputs = np.clip(np.rint(mixed), 0, 255).astype(np.uint8)
        else:
            mixed_inputs = lam * inputs + (1 - lam) * inputs[index]
        mixed_targets = lam * targets + (1 - lam) * targets[index]
        return mixed_inputs, mixed_targets
