"""AdEMAMix (`Pagliardini et al. <https://arxiv.org/pdf/2409.03137.pdf>`_): two first
moments — a fast EMA (beta1) and a slow EMA (beta3) mixed by ``alpha``.

Reference: holocron/optim/ademamix.py:16-176.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import lr_at, tree_zeros

__all__ = ["AdEMAMix", "ademamix"]


class AdEMAMixState(NamedTuple):
    count: jax.Array
    mu_fast: optax.Updates
    mu_slow: optax.Updates
    nu: optax.Updates


def ademamix(
    lr: float = 1e-3,
    betas: Tuple[float, float, float] = (0.9, 0.999, 0.9999),
    alpha: float = 5.0,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    beta1, beta2, beta3 = betas

    def init_fn(params):
        return AdEMAMixState(jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("AdEMAMix requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count

        def leaf_update(g, p, m1, m2, v):
            grad = g + weight_decay * p if weight_decay != 0 else g
            new_m1 = beta1 * m1 + (1 - beta1) * grad
            new_v = beta2 * v + (1 - beta2) * grad * grad
            new_m2 = beta3 * m2 + (1 - beta3) * grad
            denom = jnp.sqrt(new_v) / jnp.sqrt(bc2) + eps
            return -lr_t * (new_m1 / bc1 + alpha * new_m2) / denom, new_m1, new_m2, new_v

        out = jax.tree.map(leaf_update, updates, params, state.mu_fast, state.mu_slow, state.nu)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), AdEMAMixState(count, pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init_fn, update_fn)


AdEMAMix = ademamix
