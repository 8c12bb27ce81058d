"""Optimizer wrappers: Lookahead and Scout.

Reference: holocron/optim/wrapper.py. Both keep slow weights synchronized every
``sync_period`` fast steps via ``slow += sync_rate * (fast - slow)`` then copy back.
Scout (:138-283, experimental) additionally buffers the fast-weight trajectory and
adapts the sync rate from the update-coherence statistic
``mean(std(updates) / max|update - mean|)``.

As optax wrappers, the sync branch is a jit-friendly ``where`` on the step counter.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["Lookahead", "Scout", "lookahead", "scout"]


def _check_args(sync_rate: float, sync_period: int) -> None:
    if sync_rate < 0 or sync_rate > 1:
        raise ValueError(f"expected positive float lower than 1 as sync_rate, received: {sync_rate}")
    if not isinstance(sync_period, int) or sync_period < 1:
        raise ValueError(f"expected positive integer as sync_period, received: {sync_period}")


class LookaheadState(NamedTuple):
    base_state: optax.OptState
    slow_params: optax.Params
    count: jax.Array


def lookahead(
    base_optimizer: optax.GradientTransformation,
    sync_rate: float = 0.5,
    sync_period: int = 6,
) -> optax.GradientTransformation:
    """Lookahead (`Zhang et al. <https://arxiv.org/pdf/1907.08610.pdf>`_),
    reference wrapper.py:15-135."""
    _check_args(sync_rate, sync_period)

    def init_fn(params):
        return LookaheadState(base_optimizer.init(params), jax.tree.map(jnp.asarray, params), jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("Lookahead requires params")
        base_updates, base_state = base_optimizer.update(updates, state.base_state, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def leaf(slow, p, u):
            fast = p + u
            new_slow = jnp.where(sync, slow + sync_rate * (fast - slow), slow)
            new_param = jnp.where(sync, new_slow, fast)
            return new_param - p, new_slow

        out = jax.tree.map(leaf, state.slow_params, params, base_updates)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        new_updates = jax.tree.map(lambda t: t[0], out, is_leaf=is_tup)
        new_slow = jax.tree.map(lambda t: t[1], out, is_leaf=is_tup)
        return new_updates, LookaheadState(base_state, new_slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


class ScoutState(NamedTuple):
    base_state: optax.OptState
    slow_params: optax.Params
    buffer: optax.Params  # per-leaf trajectory: (sync_period + 1, *shape)
    count: jax.Array


def scout(
    base_optimizer: optax.GradientTransformation,
    sync_rate: float = 0.5,
    sync_period: int = 6,
) -> optax.GradientTransformation:
    """Scout (experimental Lookahead variant with coherence-adaptive sync rate),
    reference wrapper.py:138-283."""
    _check_args(sync_rate, sync_period)

    def init_fn(params):
        buffer = jax.tree.map(lambda p: jnp.tile(p[None], (sync_period + 1,) + (1,) * p.ndim), params)
        return ScoutState(
            base_optimizer.init(params),
            jax.tree.map(jnp.asarray, params),
            buffer,
            jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("Scout requires params")
        base_updates, base_state = base_optimizer.update(updates, state.base_state, params)
        count = state.count + 1
        slot = ((count - 1) % sync_period) + 1
        sync = (count % sync_period) == 0

        fast = jax.tree.map(lambda p, u: p + u, params, base_updates)
        buffer = jax.tree.map(lambda b, f: b.at[slot].set(f), state.buffer, fast)

        # update coherence: per-leaf mean of std / max-abs-deviation of consecutive
        # fast-weight updates over the period (wrapper.py:213-226)
        def leaf_similarity(b):
            diffs = b[1:] - b[:-1]
            std = jnp.std(diffs, axis=0, ddof=1)
            max_dev = jnp.max(jnp.abs(diffs - jnp.mean(diffs, axis=0)), axis=0)
            return jnp.mean(jnp.where(max_dev > 0, std / jnp.where(max_dev > 0, max_dev, 1.0), 0.0))

        sims = [leaf_similarity(b) for b in jax.tree.leaves(buffer)]
        coherence = sum(sims) / len(sims)
        rate = jnp.maximum(1.0 - coherence, sync_rate)

        def leaf(slow, p, f, b):
            new_slow = jnp.where(sync, slow + rate * (f - slow), slow)
            new_param = jnp.where(sync, new_slow, f)
            # on sync the buffer restarts from the synced weights
            new_b = jnp.where(sync, jnp.tile(new_param[None], (sync_period + 1,) + (1,) * p.ndim), b)
            return new_param - p, new_slow, new_b

        out = jax.tree.map(leaf, state.slow_params, params, fast, buffer)
        is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")  # noqa: E731
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)  # noqa: E731
        return pick(0), ScoutState(base_state, pick(1), pick(2), count)

    return optax.GradientTransformation(init_fn, update_fn)


Lookahead = lookahead
Scout = scout
