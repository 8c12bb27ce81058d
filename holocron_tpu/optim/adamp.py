"""AdamP (`Heo et al. <https://arxiv.org/pdf/2006.08217.pdf>`_): Adam whose update is
projected off the radial direction when the param/grad cosine similarity is small.

Reference: holocron/optim/adamp.py:17-191 (projection at :185-189).
"""

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import l2_norm, lr_at, tree_zeros

__all__ = ["AdamP", "adamp"]


class AdamPState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    max_nu: optax.Updates


def adamp(
    lr: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
    delta: float = 0.1,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        return AdamPState(jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("AdamP requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count

        def leaf_update(g, p, m, v, max_v):
            grad = g + weight_decay * p if weight_decay != 0 else g
            new_m = beta1 * m + (1 - beta1) * grad
            new_v = beta2 * v + (1 - beta2) * grad * grad
            if amsgrad:
                new_max_v = jnp.maximum(max_v, new_v)
                denom = jnp.sqrt(new_max_v) / jnp.sqrt(bc2) + eps
            else:
                new_max_v = max_v
                denom = jnp.sqrt(new_v) / jnp.sqrt(bc2) + eps
            pt = (new_m / bc1) / denom
            # radial projection when cos(p, grad) < delta / sqrt(numel) (adamp.py:185-189)
            cos_sim = jnp.sum(p * grad) / jnp.maximum(l2_norm(p) * l2_norm(grad), 1e-20)
            normalized_p = p / (l2_norm(p) + eps)
            projected = pt - jnp.sum(normalized_p * pt) * normalized_p
            pt = jnp.where(cos_sim < delta / math.sqrt(p.size), projected, pt)
            return -lr_t * pt, new_m, new_v, new_max_v

        out = jax.tree.map(leaf_update, updates, params, state.mu, state.nu, state.max_nu)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), AdamPState(count, pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init_fn, update_fn)


AdamP = adamp
