"""Activation modules (NHWC, Flax linen).

Reference: holocron/nn/modules/activation.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import functional as F
from ..init import kaiming_normal

__all__ = ["FReLU", "HardMish", "NLReLU"]


class HardMish(nn.Module):
    """HardMish activation (`H-Mish <https://github.com/digantamisra98/H-Mish>`_):
    ``f(x) = x/2 * min(2, max(0, x + 2))``.

    Reference: holocron/nn/modules/activation.py:28-38.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return F.hard_mish(x)


class NLReLU(nn.Module):
    """Natural-log ReLU (`Liu & Di <https://arxiv.org/pdf/1908.03682.pdf>`_):
    ``f(x) = ln(1 + beta * max(0, x))``.

    Reference: holocron/nn/modules/activation.py:41-55.
    """

    beta: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return F.nl_relu(x, self.beta)


class FReLU(nn.Module):
    """Funnel activation (`Ma et al. <https://arxiv.org/pdf/2007.11824.pdf>`_):
    ``max(x, BN(depthwise_conv(x)))``.

    Reference: holocron/nn/modules/activation.py:58-81. NHWC input ``(N, H, W, C)``.
    """

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = x.shape[-1]
        out = nn.Conv(
            channels,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            feature_group_count=channels,
            kernel_init=kaiming_normal(),
            name="conv",
        )(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(out)
        return jnp.maximum(x, out)
