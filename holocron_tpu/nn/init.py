"""Parameter initializers matching the reference's init scheme.

Reference: holocron/nn/init.py:10-24 — kaiming-normal fan-out for convolutions,
ones/zeros for normalization layers. In the functional JAX design, initialization is an
initializer function handed to each module rather than a post-hoc tree walk, so
``init_module``'s role is played by these initializers being the package-wide defaults.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["init_module", "kaiming_normal", "zeros", "ones"]


def _gain(nonlinearity: str, param: float = 0.01) -> float:
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1 + param**2))
    if nonlinearity in ("linear", "conv2d", "sigmoid"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    raise ValueError(f"unsupported nonlinearity: {nonlinearity}")


def kaiming_normal(nonlinearity: str = "relu", neg_slope: float = 0.01):
    """He-normal initializer with ``mode='fan_out'`` for HWIO conv kernels.

    For a kernel of shape ``(kh, kw, in_c/groups, out_c)`` the fan-out is
    ``out_c * kh * kw`` — identical to torch's ``kaiming_normal_(mode='fan_out')`` on an
    ``(out_c, in_c/groups, kh, kw)`` weight (holocron/nn/init.py:18).
    """
    gain = _gain(nonlinearity, neg_slope)

    def init(key: jax.Array, shape, dtype: Any = jnp.float32) -> jax.Array:
        receptive = 1
        for d in shape[:-2]:
            receptive *= d
        fan_out = shape[-1] * receptive
        std = gain / math.sqrt(fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones


def init_module(variables, nonlinearity: str = "relu", key=None):
    """Re-initializes a variables tree the reference way (holocron/nn/init.py:10-24):
    kaiming-normal fan-out for conv/dense kernels, ones/zeros for norm scale/bias.

    Functional analog of the torch in-place tree walk — returns a new variables pytree.
    """
    key = key if key is not None else jax.random.key(0)
    initializer = kaiming_normal(nonlinearity)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    keys = jax.random.split(key, max(len(flat), 1))
    new_leaves = []
    for (path, leaf), k in zip(flat, keys):
        names = [str(getattr(p, "key", p)) for p in path]
        last = names[-1] if names else ""
        if last == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            new_leaves.append(initializer(k, leaf.shape, leaf.dtype))
        elif last == "scale":
            new_leaves.append(jnp.ones_like(leaf))
        elif last == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
