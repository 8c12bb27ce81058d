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

__all__ = ["fused_preprocess", "space_to_depth_batch"]


def space_to_depth_batch(images, scale: int = 2):
    """Host-side space-to-depth: numpy ``(N, H, W, C)`` -> ``(N, H/s, W/s, s*s*C)``.

    Channel order ``(sh, sw, c)`` matches :func:`holocron_tpu.nn.functional.
    concat_downsample2d`, so the result feeds RepVGG's ``s2d_input`` deploy form
    directly — the device never pays the rearrange's HBM round trip (the
    MLPerf-style TPU input-layout optimization). Same total bytes as the plain
    layout; works on uint8 and float batches alike.
    """
    import numpy as np

    x = np.asarray(images)
    n, h, w, c = x.shape
    s = scale
    if h % s or w % s:
        raise ValueError("spatial size must be a multiple of scale")
    x = x.reshape(n, h // s, s, w // s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x.reshape(n, h // s, w // s, s * s * c))


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
