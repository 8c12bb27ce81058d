"""Attention modules (NHWC, Flax linen).

Reference: holocron/nn/modules/attention.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import functional as F
from ..init import kaiming_normal

__all__ = ["SAM", "DimAttention", "TripletAttention"]


class SAM(nn.Module):
    """Spatial attention from CBAM (`Woo et al. <https://arxiv.org/pdf/1807.06521.pdf>`_)
    as modified in YOLOv4: ``x * sigmoid(conv1x1(x))``.

    Reference: holocron/nn/modules/attention.py:17-30.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gate = nn.Conv(1, (1, 1), kernel_init=kaiming_normal(), name="conv")(x)
        return x * jax.nn.sigmoid(gate)


class DimAttention(nn.Module):
    """Attention gate across one axis: Z-pool over ``axis`` -> 7x7 conv -> BN -> sigmoid.

    ``axis`` follows NHWC indices: 3 = channel (the reference's dim=1), 1 = H, 2 = W.
    The reference transposes the attended axis into the channel slot and back
    (holocron/nn/modules/attention.py:33-57); here the attended axis is swapped to the
    last position so the 7x7 conv runs over the remaining two axes.
    """

    axis: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.axis != 3:
            x = jnp.swapaxes(x, self.axis, 3)
        pooled = F.z_pool(x, axis=-1)  # (..., 2)
        gate = nn.Conv(1, (7, 7), padding=3, use_bias=False, kernel_init=kaiming_normal(), name="conv")(pooled)
        gate = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5, name="bn")(gate)
        out = x * jax.nn.sigmoid(gate)
        if self.axis != 3:
            out = jnp.swapaxes(out, self.axis, 3)
        return out


class TripletAttention(nn.Module):
    """Triplet attention (`Misra et al. <https://arxiv.org/pdf/2010.03045.pdf>`_):
    mean of :class:`DimAttention` over the channel, height and width axes.

    Reference: holocron/nn/modules/attention.py:60-77.
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x_c = DimAttention(axis=3, name="c_branch")(x, train)
        x_h = DimAttention(axis=1, name="h_branch")(x, train)
        x_w = DimAttention(axis=2, name="w_branch")(x, train)
        return (x_c + x_h + x_w) / 3.0
