"""RaLars (`Liu et al. RAdam <https://arxiv.org/pdf/1908.03265.pdf>`_ + LARS scaling).

Reference: holocron/optim/ralars.py:13-140 — RAdam variance rectification (SMA > 4
branch becomes a ``where`` under jit) with a LARS trust ratio on the resulting update.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import ScaleByState, l2_norm, lr_at, safe_local_lr, tree_zeros

__all__ = ["RaLars", "ralars"]


def ralars(
    lr: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    force_adaptive_momentum: bool = False,
    scale_clip: Optional[Tuple[float, float]] = None,
) -> optax.GradientTransformation:
    if not callable(lr) and lr < 0.0:
        raise ValueError(f"Invalid learning rate: {lr}")
    clip_lo, clip_hi = scale_clip if scale_clip is not None else (0.0, 10.0)
    beta1, beta2 = betas
    sma_inf = 2.0 / (1 - beta2) - 1.0

    def init_fn(params):
        return ScaleByState(jnp.zeros([], jnp.int32), tree_zeros(params), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("RaLars requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g, state.nu, updates)

        bc1 = 1.0 - beta1**count
        bc2 = 1.0 - beta2**count
        sma_t = sma_inf - 2.0 * count * (1 - bc2) / bc2
        # variance rectification (guarded so the sqrt stays finite when sma_t <= 4)
        r_num = jnp.maximum((sma_t - 4) * (sma_t - 2) * sma_inf, 0.0)
        r_den = (sma_inf - 4) * (sma_inf - 2) * jnp.maximum(sma_t, 1e-12)
        r_t = jnp.sqrt(r_num / r_den)

        def leaf_update(m, v, p):
            adaptive = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            if force_adaptive_momentum:
                fallback = adaptive
            else:
                fallback = m / bc1
            update = jnp.where(sma_t > 4, r_t * adaptive, fallback)
            if weight_decay != 0:
                update = update + weight_decay * p
            phi_p = jnp.clip(l2_norm(p), clip_lo, clip_hi)
            local_lr = safe_local_lr(phi_p, l2_norm(update))
            return -lr_t * local_lr * update

        new_updates = jax.tree.map(leaf_update, mu, nu, params)
        return new_updates, ScaleByState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


RaLars = ralars
