"""LAMB (`You et al. <https://arxiv.org/pdf/1904.00962.pdf>`_) as an optax transform.

Reference: holocron/optim/lamb.py:14-137 — Adam direction (no bias correction) with a
trust ratio ``phi(||p||) / ||update||`` where phi clamps to ``scale_clip`` (0, 10).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import ScaleByState, l2_norm, lr_at, safe_local_lr, tree_zeros

__all__ = ["LAMB", "lamb"]


def lamb(
    lr: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    scale_clip: Optional[Tuple[float, float]] = None,
) -> optax.GradientTransformation:
    if not callable(lr) and lr < 0.0:
        raise ValueError(f"Invalid learning rate: {lr}")
    if eps < 0.0:
        raise ValueError(f"Invalid epsilon value: {eps}")
    for i, beta in enumerate(betas):
        if not 0.0 <= beta < 1.0:
            raise ValueError(f"Invalid beta parameter at index {i}: {beta}")
    clip_lo, clip_hi = scale_clip if scale_clip is not None else (0.0, 10.0)
    beta1, beta2 = betas

    def init_fn(params):
        return ScaleByState(jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("LAMB requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g, state.nu, updates)

        def leaf_update(m, v, p):
            update = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0:
                update = update + weight_decay * p
            phi_p = jnp.clip(l2_norm(p), clip_lo, clip_hi)
            local_lr = safe_local_lr(phi_p, l2_norm(update))
            return -lr_t * local_lr * update

        new_updates = jax.tree.map(leaf_update, mu, nu, params)
        return new_updates, ScaleByState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


LAMB = lamb
