"""LARS (`You et al. <https://arxiv.org/pdf/1708.03888.pdf>`_) as an optax transform.

Reference: holocron/optim/lars.py:14-135. Per-leaf trust ratio
``local_lr = ||p|| / (||g|| + wd*||p||)`` (1 in degenerate cases) applied to an
SGD+momentum body, matching torch's first-step momentum-buffer initialization.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ._common import l2_norm, lr_at, safe_local_lr, tree_zeros

__all__ = ["LARS", "lars"]


class LarsState(NamedTuple):
    count: jax.Array
    momentum_buffer: optax.Updates


def lars(
    lr: float = 1e-3,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    scale_clip: Optional[Tuple[float, float]] = None,
) -> optax.GradientTransformation:
    if not callable(lr) and (not isinstance(lr, float) or lr < 0.0):
        raise ValueError(f"Invalid learning rate: {lr}")
    if momentum < 0.0:
        raise ValueError(f"Invalid momentum value: {momentum}")
    if weight_decay < 0.0:
        raise ValueError(f"Invalid weight_decay value: {weight_decay}")
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("Nesterov momentum requires a momentum and zero dampening")

    def init_fn(params):
        return LarsState(jnp.zeros([], jnp.int32), tree_zeros(params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("LARS requires params")
        count = state.count + 1
        lr_t = lr_at(lr, state.count)  # 0-based: optax convention, first step uses schedule(0)

        def leaf_update(g, p, buf):
            p_norm = l2_norm(p)
            g_norm = l2_norm(g)
            d_p = g + weight_decay * p
            denom = g_norm + weight_decay * p_norm
            local_lr = safe_local_lr(p_norm, denom)
            if momentum == 0:
                return -lr_t * local_lr * d_p, buf
            # torch seeds the buffer with the raw first-step gradient (lars.py:125-127)
            new_buf = jnp.where(state.count == 0, d_p, momentum * buf + (1 - dampening) * d_p)
            d = d_p + momentum * new_buf if nesterov else new_buf
            return -lr_t * local_lr * d, new_buf

        flat = jax.tree.map(leaf_update, updates, params, state.momentum_buffer)
        new_updates = jax.tree.map(lambda pair: pair[0], flat, is_leaf=lambda x: isinstance(x, tuple) and not hasattr(x, "_fields"))
        new_buf = jax.tree.map(lambda pair: pair[1], flat, is_leaf=lambda x: isinstance(x, tuple) and not hasattr(x, "_fields"))
        return new_updates, LarsState(count, new_buf)

    return optax.GradientTransformation(init_fn, update_fn)


# reference-compatible alias (the torch class name)
LARS = lars
