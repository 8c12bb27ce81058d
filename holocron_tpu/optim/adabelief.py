"""AdaBelief (`Zhuang et al. <https://arxiv.org/pdf/2010.07468.pdf>`_): second moment of
the gradient *residual* ``(g - m)^2`` instead of ``g^2``.

Reference: holocron/optim/adabelief.py:16-167.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import lr_at, tree_zeros

__all__ = ["AdaBelief", "adabelief"]


class AdaBeliefState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    max_nu: optax.Updates


def adabelief(
    lr: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        return AdaBeliefState(jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("AdaBelief requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count

        def leaf_update(g, p, m, v, max_v):
            grad = g + weight_decay * p if weight_decay != 0 else g
            new_m = beta1 * m + (1 - beta1) * grad
            residual = grad - new_m
            new_v = beta2 * v + (1 - beta2) * residual * residual
            if amsgrad:
                new_max_v = jnp.maximum(max_v, new_v)
                denom = jnp.sqrt(new_max_v) / jnp.sqrt(bc2) + eps
            else:
                new_max_v = max_v
                denom = jnp.sqrt(new_v) / jnp.sqrt(bc2) + eps
            return -(lr_t / bc1) * new_m / denom, new_m, new_v, new_max_v

        out = jax.tree.map(leaf_update, updates, params, state.mu, state.nu, state.max_nu)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), AdaBeliefState(count, pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init_fn, update_fn)


AdaBelief = adabelief
