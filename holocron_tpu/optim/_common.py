"""Shared helpers for the optimizer zoo."""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["ScaleByState", "bias_correction", "l2_norm", "lr_at", "safe_local_lr", "tree_zeros"]


class ScaleByState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def tree_zeros(params):
    return jax.tree.map(jnp.zeros_like, params)


def l2_norm(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(jnp.square(x)))


def safe_local_lr(p_norm: jax.Array, denom: jax.Array) -> jax.Array:
    """LARS-style trust ratio with the reference's degenerate-case fallback to 1."""
    return jnp.where((p_norm == 0) | (denom == 0), 1.0, p_norm / jnp.where(denom == 0, 1.0, denom))


def bias_correction(beta: float, count: jax.Array) -> jax.Array:
    return 1.0 - beta**count


def lr_at(lr, count):
    """Resolves a learning rate that may be an optax-style schedule (count -> value)."""
    return lr(count) if callable(lr) else lr
