"""TAdam (`Ilboudo et al. <https://arxiv.org/pdf/2003.00179.pdf>`_): Adam with a
Student-t robust first moment.

Reference: holocron/optim/tadam.py:16-212 — per-leaf scalar weights ``w_t`` built from
the normalized gradient deviation, accumulated in ``W_t`` (init ``beta1/(1-beta1)``).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import lr_at, tree_zeros

__all__ = ["TAdam", "tadam"]


class TAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    big_w: optax.Updates  # per-leaf scalar accumulator W_t
    max_nu: optax.Updates


def tadam(
    lr: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
    dof: Optional[float] = None,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        big_w = jax.tree.map(lambda p: jnp.full((), beta1 / (1 - beta1), jnp.float32), params)
        return TAdamState(
            jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params), big_w, tree_zeros(params)
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("TAdam requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count

        def leaf_update(g, p, m, v, big_w, max_v):
            d = float(p.size) if dof is None else dof
            grad = g + weight_decay * p if weight_decay != 0 else g
            w_t = jnp.sum(jnp.square(grad - m) / (v + eps))
            w_t = (d + p.size) / (w_t + d)
            new_m = m * (big_w / (big_w + w_t)) + (w_t * grad) / (big_w + w_t)
            new_big_w = big_w * (2 * beta1 - 1) / beta1 + w_t
            new_v = beta2 * v + (1 - beta2) * grad * grad
            if amsgrad:
                new_max_v = jnp.maximum(max_v, new_v)
                denom = jnp.sqrt(new_max_v) / jnp.sqrt(bc2) + eps
            else:
                new_max_v = max_v
                denom = jnp.sqrt(new_v) / jnp.sqrt(bc2) + eps
            update = -(lr_t / bc1) * new_m / denom
            return update, new_m, new_v, new_big_w, new_max_v

        out = jax.tree.map(leaf_update, updates, params, state.mu, state.nu, state.big_w, state.max_nu)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), TAdamState(count, pick(1), pick(2), pick(3), pick(4))

    return optax.GradientTransformation(init_fn, update_fn)


TAdam = tadam
