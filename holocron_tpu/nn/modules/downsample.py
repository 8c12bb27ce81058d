"""Pooling / downsampling modules (NHWC, Flax linen).

Reference: holocron/nn/modules/downsample.py.
"""

from math import comb
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import functional as F

__all__ = [
    "SPP",
    "BlurPool2d",
    "ConcatDownsample2d",
    "ConcatDownsample2dJit",
    "GlobalAvgPool2d",
    "GlobalMaxPool2d",
    "ZPool",
]


class ConcatDownsample2d(nn.Module):
    """Loss-less space-to-depth downsampling from `YOLO9000
    <https://pjreddie.com/media/files/papers/YOLO9000.pdf>`_.

    Reference: holocron/nn/modules/downsample.py:26-43. On TPU this is a free
    reshape/transpose (no jit-scripted variant needed — XLA folds it).
    """

    scale_factor: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return F.concat_downsample2d(x, self.scale_factor)


class GlobalAvgPool2d(nn.Module):
    """Global average pooling (`TResNet <https://arxiv.org/pdf/2003.13630.pdf>`_ fast pool).

    NHWC: ``(N, H, W, C) -> (N, C)`` when ``flatten`` else ``(N, 1, 1, C)``.
    Reference: holocron/nn/modules/downsample.py:58-78.
    """

    flatten: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = jnp.mean(x, axis=(1, 2))
        return out if self.flatten else out[:, None, None, :]


class GlobalMaxPool2d(nn.Module):
    """Global max pooling counterpart of :class:`GlobalAvgPool2d`.

    Reference: holocron/nn/modules/downsample.py:81-100.
    """

    flatten: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = jnp.max(x, axis=(1, 2))
        return out if self.flatten else out[:, None, None, :]


class BlurPool2d(nn.Module):
    """Anti-aliased downsampling (`Zhang <https://arxiv.org/pdf/1904.11486.pdf>`_):
    reflect-pad then a fixed binomial depthwise filter with stride.

    The binomial kernel is a trace-time constant baked into the compiled program — the
    TPU analog of the reference's per-device filter cache
    (holocron/nn/modules/downsample.py:106-152).
    """

    kernel_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kernel_size <= 1:
            raise AssertionError
        channels = x.shape[-1]
        k = self.kernel_size
        # binomial coefficients of (0.5 + 0.5 z)^(k-1)
        coeffs = jnp.asarray([comb(k - 1, i) / 2 ** (k - 1) for i in range(k)], dtype=x.dtype)
        filt2d = coeffs[:, None] * coeffs[None, :]
        # depthwise HWIO kernel: (kh, kw, 1, C)
        kernel = jnp.tile(filt2d[:, :, None, None], (1, 1, 1, channels))
        pad = ((self.stride - 1) + (k - 1)) // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels,
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (`He et al. <https://arxiv.org/pdf/1406.4729.pdf>`_):
    concat of identity and stride-1 max pools with growing kernels.

    Reference: holocron/nn/modules/downsample.py:154-167. NHWC.

    When ``cascade`` is on (default) and the kernel list allows it (all odd, strictly
    increasing, even gaps), each pyramid level is pooled FROM THE PREVIOUS LEVEL with
    the small delta window instead of from ``x`` with the full window — exact by the
    stride-1 max composition identity ``mp_b(mp_a(x)) == mp_{a+b-1}(x)`` under -inf
    same-padding. On TPU this matters for the BACKWARD pass: XLA lowers stride-1
    max-pool gradients to ``select-and-scatter`` whose cost scales with the window
    area, and the yolov4@416 train-step trace showed SPP(5,9,13)'s 81- and 169-point
    windows costing 28 ms/step (19% of the step); cascading runs three 25-point
    windows instead (measured table in docs/PERF.md). Subgradient routing at exact
    ties may differ from the direct form; values are bit-identical.
    """

    kernel_sizes: Sequence[int]
    cascade: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min

        def pool(src: jax.Array, k: int) -> jax.Array:
            pad = k // 2
            return jax.lax.reduce_window(
                src,
                init,
                jax.lax.max,
                window_dimensions=(1, k, k, 1),
                window_strides=(1, 1, 1, 1),
                padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
            )

        ks = list(self.kernel_sizes)
        gaps = [b - a for a, b in zip([1] + ks[:-1], ks)]  # identity level has k=1
        cascadable = self.cascade and all(k % 2 == 1 for k in ks) and all(g > 0 and g % 2 == 0 for g in gaps)
        feats = [x]
        for k, gap in zip(ks, gaps):
            feats.append(pool(feats[-1], gap + 1) if cascadable else pool(x, k))
        return jnp.concatenate(feats, axis=-1)


class ZPool(nn.Module):
    """Z-pool from `"Rotate to Attend" <https://arxiv.org/pdf/2010.03045.pdf>`_:
    concat(max, mean) along ``axis`` (default: channel axis in NHWC).

    Reference: holocron/nn/modules/downsample.py:170-183.
    """

    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return F.z_pool(x, self.axis)


# API-parity alias: the reference ships a torchscripted variant
# (holocron/nn/modules/downsample.py:44-55); under jit everything is compiled, so the
# plain module IS the "jit" version.
ConcatDownsample2dJit = ConcatDownsample2d
