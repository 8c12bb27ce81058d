"""Adan (`Xie et al. <https://arxiv.org/pdf/2208.06677.pdf>`_): Nesterov momentum on
gradient differences with three EMAs and a decoupled weight-decay divide.

Reference: holocron/optim/adan.py:16-199. One intentional divergence: the reference
never writes the current gradient back into ``state["prev_grad"]`` (it stays zero, so
its gradient-difference term degenerates to the gradient itself); here ``prev_grad``
is updated every step as the paper specifies.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import lr_at, tree_zeros

__all__ = ["Adan", "adan"]


class AdanState(NamedTuple):
    count: jax.Array
    mu: optax.Updates  # EMA of grads (beta1)
    delta: optax.Updates  # EMA of grad differences (beta2)
    nu: optax.Updates  # EMA of (g + beta2*delta_g)^2 (beta3)
    max_nu: optax.Updates
    prev_grad: optax.Updates


def adan(
    lr: float = 1e-3,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    beta1, beta2, beta3 = betas

    def init_fn(params):
        z = tree_zeros(params)
        return AdanState(jnp.zeros([], jnp.int32), z, tree_zeros(params), tree_zeros(params), tree_zeros(params), z)

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("Adan requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count
        bc3 = 1.0 - beta3**count

        def leaf_update(g, p, m, d, v, max_v, pg):
            grad = g + weight_decay * p if weight_decay != 0 else g
            new_m = beta1 * m + (1 - beta1) * grad
            delta_grad = grad - pg
            new_d = beta2 * d + (1 - beta2) * delta_grad
            tmp = grad + beta2 * delta_grad
            new_v = beta3 * v + (1 - beta3) * tmp * tmp
            if amsgrad:
                new_max_v = jnp.maximum(max_v, new_v)
                denom = jnp.sqrt(new_max_v) / jnp.sqrt(bc3) + eps
            else:
                new_max_v = max_v
                denom = jnp.sqrt(new_v) / jnp.sqrt(bc3) + eps
            pt = (new_m / bc1 + beta2 * new_d / bc2) / denom
            # the decoupled WD divide: p_new = (p - lr*pt) / (1 + wd*lr); expressed as an
            # additive update on p
            new_p = (p - lr_t * pt) / (1 + weight_decay * lr_t) if weight_decay != 0 else p - lr_t * pt
            return new_p - p, new_m, new_d, new_v, new_max_v, grad

        out = jax.tree.map(
            leaf_update, updates, params, state.mu, state.delta, state.nu, state.max_nu, state.prev_grad
        )
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), AdanState(count, pick(1), pick(2), pick(3), pick(4), pick(5))

    return optax.GradientTransformation(init_fn, update_fn)


Adan = adan
