"""Device-side preprocessing: one fused XLA op from uint8 bytes to model-ready tensors.

The BASELINE target fuses the reference's host-side chain (resize -> dtype convert ->
normalize, holocron/transforms + api/app/vision.py:35-53) into a single jitted program
that runs on-device: uint8 NHWC in HBM -> bilinear resize -> scale -> normalize ->
(optional) bf16 cast, all fused by XLA into one kernel, overlapping with the model when
pipelined.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["fused_preprocess"]


@partial(jax.jit, static_argnames=("size", "mean", "std", "dtype", "interpolation"))
def fused_preprocess(
    images: jax.Array,
    size: Tuple[int, int],
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
    std: Tuple[float, ...] = (0.229, 0.224, 0.225),
    dtype=jnp.bfloat16,
    interpolation: str = "bilinear",
) -> jax.Array:
    """uint8 ``(N, H, W, C)`` -> normalized ``(N, size[0], size[1], C)`` in ``dtype``."""
    n, _, _, c = images.shape
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (n, size[0], size[1], c), method=interpolation)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(dtype)
