"""Loss criteria as lightweight callables.

Reference: holocron/nn/modules/loss.py. These carry no learnable parameters, so rather
than Flax modules they are plain dataclass-style callables wrapping the pure functions in
:mod:`holocron_tpu.nn.functional` — directly usable inside jitted train steps.
"""

from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp

from .. import functional as F

__all__ = [
    "ClassBalancedWrapper",
    "ComplementCrossEntropy",
    "DiceLoss",
    "FocalLoss",
    "MultiLabelCrossEntropy",
    "MutualChannelLoss",
    "PolyLoss",
]

Array = jax.Array


class _Loss:
    """Weight / ignore_index / reduction plumbing (holocron/nn/modules/loss.py:25-47)."""

    def __init__(
        self,
        weight: Optional[Union[float, List[float], Array]] = None,
        ignore_index: int = -100,
        reduction: str = "mean",
    ) -> None:
        if isinstance(weight, (float, int)) and not isinstance(weight, bool):
            self.weight: Optional[Array] = jnp.asarray([weight, 1 - weight], dtype=jnp.float32)
        elif isinstance(weight, (list, tuple)):
            self.weight = jnp.asarray(weight, dtype=jnp.float32)
        elif weight is not None:
            self.weight = jnp.asarray(weight)
        else:
            self.weight = None
        self.ignore_index = ignore_index
        if reduction not in ("none", "mean", "sum"):
            raise NotImplementedError("argument reduction received an incorrect input")
        self.reduction = reduction


class FocalLoss(_Loss):
    """Focal loss criterion (holocron/nn/modules/loss.py:50-86)."""

    def __init__(self, gamma: float = 2.0, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.gamma = gamma

    def __call__(self, x: Array, target: Array) -> Array:
        return F.focal_loss(x, target, self.weight, self.ignore_index, self.reduction, self.gamma)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(gamma={self.gamma}, reduction='{self.reduction}')"


class MultiLabelCrossEntropy(_Loss):
    """Cross-entropy with dense targets (holocron/nn/modules/loss.py:89-106)."""

    def __call__(self, x: Array, target: Array) -> Array:
        return F.multilabel_cross_entropy(x, target, self.weight, self.ignore_index, self.reduction)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(reduction='{self.reduction}')"


class ComplementCrossEntropy(_Loss):
    """Complement cross-entropy criterion (holocron/nn/modules/loss.py:109-129)."""

    def __init__(self, gamma: float = -1.0, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.gamma = gamma

    def __call__(self, x: Array, target: Array) -> Array:
        return F.complement_cross_entropy(x, target, self.weight, self.ignore_index, self.reduction, self.gamma)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(gamma={self.gamma}, reduction='{self.reduction}')"


class ClassBalancedWrapper:
    """Class-balanced reweighting (`Cui et al. <https://arxiv.org/pdf/1901.05555.pdf>`_):
    scales (or sets) the wrapped criterion's class weights by ``(1-beta)/(1-beta^n)``.

    Reference: holocron/nn/modules/loss.py:132-166.
    """

    def __init__(self, criterion: _Loss, num_samples: Array, beta: float = 0.99) -> None:
        self.criterion = criterion
        self.beta = beta
        cb_weights = (1 - beta) / (1 - beta ** jnp.asarray(num_samples, dtype=jnp.float32))
        if self.criterion.weight is None:
            self.criterion.weight = cb_weights
        else:
            self.criterion.weight = self.criterion.weight * cb_weights

    def __call__(self, x: Array, target: Array) -> Array:
        return self.criterion(x, target)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.criterion!r}, beta={self.beta})"


class MutualChannelLoss(_Loss):
    """Mutual channel loss criterion (holocron/nn/modules/loss.py:169-199).

    The CWA channel masks need randomness: pass a ``key``; without one a fixed key is
    used (deterministic masks).
    """

    def __init__(
        self,
        weight: Optional[Union[float, List[float], Array]] = None,
        ignore_index: int = -100,
        reduction: str = "mean",
        xi: int = 2,
        alpha: float = 1.0,
    ) -> None:
        super().__init__(weight, ignore_index, reduction)
        self.xi = xi
        self.alpha = alpha

    def __call__(self, x: Array, target: Array, key: Optional[Array] = None) -> Array:
        if key is None:
            key = jax.random.key(0)
        return F.mutual_channel_loss(
            x, target, key, self.weight, self.ignore_index, self.reduction, self.xi, self.alpha
        )

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(reduction='{self.reduction}', xi={self.xi}, alpha={self.alpha})"


class DiceLoss(_Loss):
    """Dice loss criterion (holocron/nn/modules/loss.py:202-226)."""

    def __init__(
        self,
        weight: Optional[Union[float, List[float], Array]] = None,
        gamma: float = 1.0,
        eps: float = 1e-8,
    ) -> None:
        super().__init__(weight)
        self.gamma = gamma
        self.eps = eps

    def __call__(self, x: Array, target: Array) -> Array:
        return F.dice_loss(x, target, self.weight, self.gamma, self.eps)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(reduction='{self.reduction}', gamma={self.gamma}, eps={self.eps})"


class PolyLoss(_Loss):
    """Poly1 loss criterion (holocron/nn/modules/loss.py:229-254)."""

    def __init__(self, *args: Any, eps: float = 2.0, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.eps = eps

    def __call__(self, x: Array, target: Array) -> Array:
        return F.poly_loss(x, target, self.eps, self.weight, self.ignore_index, self.reduction)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(eps={self.eps}, reduction='{self.reduction}')"
