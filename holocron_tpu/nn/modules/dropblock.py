"""Structured dropout (NHWC, Flax linen).

Reference: holocron/nn/modules/dropblock.py.
"""

import flax.linen as nn
import jax

from .. import functional as F

__all__ = ["DropBlock2d"]


class DropBlock2d(nn.Module):
    """DropBlock (`Ghiasi et al. <https://arxiv.org/pdf/1810.12890.pdf>`_).

    ``p`` is the probability of dropping an activation value. Faithful to the reference
    including its double division: the module passes ``p / block_size**2`` (the
    ``drop_prob`` property, holocron/nn/modules/dropblock.py:33-35) into the functional,
    which divides by ``block_size**2`` again (functional.py:480-481) — so the effective
    center-sampling rate is ``p / block_size**4``. Randomness comes from the
    ``'dropout'`` RNG stream.
    """

    p: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not train or self.p == 0.0:
            return x
        key = self.make_rng("dropout")
        return F.dropblock2d(x, key, self.p / self.block_size**2, self.block_size, training=True)
