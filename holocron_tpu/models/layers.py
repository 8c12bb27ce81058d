"""Shared low-level layers: batch norm with torch-matching semantics, activation
registry, and small helpers used across the model zoo."""

import inspect
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.functional import hard_mish, nl_relu

__all__ = ["BatchNorm2d", "FrozenBatchNorm2d", "act_fn", "apply_layer", "avg_pool2d", "max_pool2d"]


def max_pool2d(x: jax.Array, kernel_size: int, stride: int, padding: int = 0) -> jax.Array:
    """torch-style max pool on NHWC input."""
    init_val = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        init_val,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(
    x: jax.Array,
    kernel_size: int,
    stride: int,
    padding: int = 0,
    ceil_mode: bool = False,
    count_include_pad: bool = True,
) -> jax.Array:
    """torch-style average pool on NHWC input (incl. ceil_mode and
    count_include_pad=False semantics, needed by ResNet-D's shortcut pooling)."""
    h, w = x.shape[1], x.shape[2]

    def out_size(size: int) -> int:
        eff = size + 2 * padding - kernel_size
        return -(-eff // stride) + 1 if ceil_mode else eff // stride + 1

    oh, ow = out_size(h), out_size(w)
    # high-side padding so the window grid produces exactly (oh, ow) outputs
    pad_h_hi = max(0, (oh - 1) * stride + kernel_size - h - padding)
    pad_w_hi = max(0, (ow - 1) * stride + kernel_size - w - padding)
    dims = (1, kernel_size, kernel_size, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, pad_h_hi), (padding, pad_w_hi), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    if count_include_pad and not ceil_mode:
        return summed / (kernel_size * kernel_size)
    counts = jax.lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts


class BatchNorm2d(nn.Module):
    """Batch normalization over NHWC inputs with torch-compatible statistics:
    ``momentum`` follows torch's convention (new = (1-m)*old + m*batch) and the running
    variance uses the unbiased estimator, so converted torch checkpoints reproduce
    exactly. Stats are computed in float32 regardless of the compute dtype.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            # One-pass batch stats: E[x2] - E[x]2 lets XLA fuse both reductions into a
            # single sweep over the activations — measured 2x faster than the
            # sequential mean-then-var form, saving ~0.4 ms fwd+bwd per BN at RepVGG
            # stage-0 shapes (docs/PERF.md "BN batch stats"). The inputs are shifted
            # by the running mean first (a per-channel constant, fused into the same
            # sweep): the cancellation error of E[x2]-E[x]2 grows ~(mean/std)^2, and
            # in steady training mean(x)-running_mean ~ 0, so the shifted form is
            # well-conditioned regardless of the raw activation mean. Clamped at 0
            # so rsqrt never sees a negative from rounding.
            xf = x.astype(jnp.float32)
            shift = ra_mean.value
            xs = xf - shift
            mean_s = jnp.mean(xs, axis=(0, 1, 2))
            var = jnp.maximum(jnp.mean(jnp.square(xs), axis=(0, 1, 2)) - jnp.square(mean_s), 0.0)
            mean = mean_s + shift
            if not self.is_initializing():
                n = x.size / c
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * n / max(n - 1, 1)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class FrozenBatchNorm2d(nn.Module):
    """BatchNorm with statistics and affine params frozen (used when training detection
    heads on a pretrained backbone, cf. torchvision's FrozenBatchNorm2d referenced at
    holocron/models/detection/yolov2.py:311)."""

    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        # stored as non-trainable state so optimizers never touch them
        scale = self.variable("batch_stats", "scale", lambda: jnp.ones((c,), jnp.float32))
        bias = self.variable("batch_stats", "bias", lambda: jnp.zeros((c,), jnp.float32))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        y = (x.astype(jnp.float32) - mean.value) * jax.lax.rsqrt(var.value + self.epsilon)
        y = y * scale.value + bias.value
        return y.astype(self.dtype or x.dtype)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": jax.nn.mish,
    "gelu": jax.nn.gelu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "hard_mish": hard_mish,
    "nl_relu": nl_relu,
    "sigmoid": jax.nn.sigmoid,
}


def act_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    """Resolves an activation function by name."""
    if name not in _ACTIVATIONS:
        raise ValueError(f"unknown activation: {name}")
    return _ACTIVATIONS[name]


def apply_layer(layer: Callable, x: jax.Array, train: bool = False) -> jax.Array:
    """Calls ``layer(x)``, forwarding ``train`` when the callable accepts it."""
    try:
        sig = inspect.signature(layer if not isinstance(layer, nn.Module) else type(layer).__call__)
        takes_train = "train" in sig.parameters
    except (TypeError, ValueError):
        takes_train = False
    return layer(x, train=train) if takes_train else layer(x)
